"""The physics engine: one fused sim step (PD drive + contact + ABA +
integration), all inside jit.

Replaces the reference's per-substep C++ boundary crossings
(set_dof_position_target_tensor / simulate / refresh_* at
legged_robot.py:93-99): here a sim step is a pure function
``(state, params, targets) -> (state', SimInfo)`` that XLA fuses end to
end. The env layer scans it ``decimation`` times per policy step.

Two drive modes, matching the reference:
- position drive (the fork's active path, legged_robot.py:93-95): PD
  torque to clipped position targets, evaluated every inner substep with
  implicit damping (PhysX DOF_MODE_POS equivalent);
- torque drive (_compute_torques path, :370-392, used by ANYmal's SEA
  net): torque held over the sim dt.

Inner substeps subdivide the 5 ms sim dt for penalty-contact stability
(PhysX gets away with 5 ms because TGS solves contacts implicitly; an
explicit penalty needs ~1 ms).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from legged_gym_tpu.physics.aba import aba
from legged_gym_tpu.physics.contact import (ContactConfig,
                                            accumulate_body_forces,
                                            accumulate_link_wrenches,
                                            contact_forces)
from legged_gym_tpu.physics.integrator import integrate
from legged_gym_tpu.physics.kinematics import (contact_point_kinematics,
                                               forward_kinematics)


@dataclasses.dataclass(frozen=True)
class SimConfig:
    dt: float = 0.005                 # sim dt (reference sim.dt)
    substeps: int = 4                 # inner contact substeps per sim dt
    gravity: tuple = (0.0, 0.0, -9.81)
    contact: ContactConfig = dataclasses.field(default_factory=ContactConfig)
    # joint-limit spring-damper (PhysX enforces URDF position limits as
    # hard constraints; without this a clipped PD can windmill a leg past
    # its limits and pump energy unboundedly — observed blow-up)
    limit_stiffness: float = 300.0    # N*m/rad beyond the URDF limit
    limit_damping: float = 6.0
    # joint velocity cap (PhysX maxJointVelocity analog); scaled on top
    # of the URDF velocity limit
    vel_limit_scale: float = 2.0
    # base velocity backstops (Isaac asset max_angular/linear_velocity
    # default 1000, legged_robot_config.py:120-121; lower values only
    # bound runaway states, never normal locomotion)
    max_base_ang_vel: float = 100.0
    max_base_lin_vel: float = 100.0
    # joint-space inertia floor added to the ABA diagonal D [kg m^2].
    # Physically the reflected rotor inertia (~gear^2 * rotor ~ 0.004 for
    # go1-class actuators); numerically essential: without it D = s^T I^A s
    # can reach f32 cancellation scale for light distal links and 1/D
    # amplifies rounding into +-30000 rad/s^2 qdd noise (measured: TPU and
    # CPU f32 disagreed by 200% on qdd while agreeing to 1e-7 on inputs)
    armature_floor: float = 0.005


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SimInfo:
    body_forces: jnp.ndarray   # (3, nb, N) net contact force per report body
    torques: jnp.ndarray       # (nq, N) applied joint torques (sensor)


class Engine:
    """Bound to a compiled model + terrain + static gains; methods are pure
    and jit-traceable (self is closed over as compile-time constants)."""

    def __init__(self, model, sim: SimConfig, grid=None, kp=None, kd=None,
                 fixed_base=False, lin_damping=0.0, ang_damping=0.0,
                 self_collision=False):
        """lin_damping / ang_damping: Isaac asset linear_damping /
        angular_damping (legged_robot.py:663-671) — PhysX scales each
        rigid body's velocity by (1 - c*dt) per step, i.e. a
        mass-proportional drag wrench f = -c*m*v, n = -c*I*w; applied
        here per link as external wrenches. self_collision: Isaac
        asset.self_collisions == 0 (bitwise filter at actor creation,
        legged_robot.py:711-720) — sphere-set self-contact between
        collision points on distinct non-adjacent links."""
        self.model = model
        self.sim = sim
        self.grid = grid
        self.fixed_base = fixed_base
        self.lin_damping = float(lin_damping)
        self.ang_damping = float(ang_damping)
        self.sc_pairs = None
        if self_collision and len(model.cp_link):
            from legged_gym_tpu.physics.contact import (
                self_collision_candidate_pairs)
            self.sc_pairs = self_collision_candidate_pairs(model)
        nq = model.nq
        import numpy as np
        self.kp = np.zeros(nq) if kp is None else np.asarray(kp, float)
        self.kd = np.zeros(nq) if kd is None else np.asarray(kd, float)
        self.torque_limit = np.asarray(model.dof_effort, float)
        self.dt_inner = sim.dt / sim.substeps
        # Per-contact-point effective (apparent) mass for the implicit
        # impulse contact law. Must be a LOWER bound on the true apparent
        # mass in any direction, else the stopping impulse over-corrects
        # and reverses the approach velocity (energy injection — observed
        # as robots launching to 20+ m). For a point on a rotating link
        # the apparent mass is ~I/r^2 about the parent joint, typically
        # far below the link mass for light distal links.
        # exact single-link worst case: 1/m_app = 1/m + max over unit
        # force directions n of (p x n)^T I_O^-1 (p x n); p x n spans the
        # plane perpendicular to p, so the max is |p|^2 times the largest
        # eigenvalue of I_O^-1 restricted to that plane
        link_mass = np.zeros(model.nl)
        link_I_O = np.zeros((model.nl, 3, 3))
        for li in range(model.nl):
            params = np.zeros(10)
            for b in range(model.n_orig):
                if model.contrib_link[b] == li:
                    params += model.contrib[b]
            link_mass[li] = params[0]
            link_I_O[li] = np.array([[params[4], params[5], params[6]],
                                     [params[5], params[7], params[8]],
                                     [params[6], params[8], params[9]]])
        m_eff = []
        for k in range(len(model.cp_link)):
            li = int(model.cp_link[k])
            m = max(link_mass[li], 1e-6)
            inv_m = 1.0 / m
            p = model.cp_pos[k]
            r2 = float(np.dot(p, p))
            if li > 0 and r2 > 1e-6:
                I_inv = np.linalg.inv(link_I_O[li] + 1e-10 * np.eye(3))
                phat = p / np.sqrt(r2)
                # orthonormal basis of the plane perpendicular to p
                a = np.array([1.0, 0.0, 0.0])
                if abs(phat[0]) > 0.9:
                    a = np.array([0.0, 1.0, 0.0])
                u1 = np.cross(phat, a)
                u1 /= np.linalg.norm(u1)
                u2 = np.cross(phat, u1)
                B = np.stack([u1, u2], axis=1)
                lam = np.linalg.eigvalsh(B.T @ I_inv @ B).max()
                inv_m = inv_m + r2 * lam
            m_eff.append(1.0 / inv_m)
        self.cp_m_eff = np.asarray(m_eff) if m_eff else np.zeros(0)
        # tangential (friction-cap) apparent mass; refined separately by
        # calibrate_contact_mass — lateral leg inertia is far below the
        # normal-direction servo-stiffened inertia, and using the normal
        # mass for the friction cap over-corrects slip into chatter
        self.cp_m_eff_t = self.cp_m_eff.copy()
        # per-point pushout-velocity cap (refined by calibrate_contact_mass:
        # the static contact force is bounded by m_eff*vmax/dt, so a scalar
        # cap must be raised for points whose weight share exceeds it)
        self.cp_vmax = np.full(len(self.cp_m_eff),
                               sim.contact.max_pushout_vel)
        # one-way static-support spring stiffness per point (sized by
        # calibrate_contact_mass; zero = impulse-only law)
        self.cp_k_static = np.zeros(len(self.cp_m_eff))
        # implicit joint-space diagonal: URDF damping + PD kd + dt*kp,
        # plus the armature floor (rotor-inertia regularization)
        self._imp_pd = (self.dt_inner
                        * (self.kd + self.dt_inner * self.kp
                           + np.asarray(model.dof_damping))
                        + sim.armature_floor)[:, None]
        self._imp_passive = (self.dt_inner
                             * np.asarray(model.dof_damping)
                             + sim.armature_floor)[:, None]
        self._has_joint_damping = bool(np.any(model.dof_damping != 0.0))

    def filter_self_collision_pairs(self, q0, margin=1.2):
        """Drop self-collision candidate pairs that are at or near
        overlap in the robot's DEFAULT pose: the sphere set
        over-approximates the real collision meshes near the hips, and
        a rest-pose overlap would inject permanent spurious forces that
        PhysX's exact mesh geometry never produces. Pairs are kept only
        if their default-pose center distance exceeds ``margin`` times
        the radius sum."""
        if self.sc_pairs is None or not len(self.sc_pairs):
            return
        import numpy as np
        from legged_gym_tpu.physics.state import PhysicsState
        m = self.model

        def rest_pos():
            q = jnp.asarray(q0, jnp.float32)[:, None]
            phys = PhysicsState(
                pos=jnp.zeros((3, 1), jnp.float32).at[2].set(100.0),
                quat=jnp.asarray([0.0, 0.0, 0.0, 1.0],
                                 jnp.float32)[:, None],
                vel=jnp.zeros((6, 1), jnp.float32), q=q,
                qd=jnp.zeros((m.nq, 1), jnp.float32))
            fk = forward_kinematics(m, phys)
            cp_pos, _ = contact_point_kinematics(m, fk)
            return cp_pos[:, :, 0]

        pos = np.asarray(jax.jit(rest_pos)())                  # (3, P)
        i, j = self.sc_pairs[:, 0], self.sc_pairs[:, 1]
        dist = np.linalg.norm(pos[:, i] - pos[:, j], axis=0)
        rsum = m.cp_radius[i] + m.cp_radius[j]
        keep = dist > margin * rsum
        self.sc_pairs = self.sc_pairs[keep]

    def calibrate_contact_mass(self, q0, inertia_params_fn,
                               safety=0.7, drive="pd"):
        """Replace the analytic apparent-mass LOWER bound with a numeric
        probe of the true step-response mass at every collision point.

        drive: which joint impedance the probe includes — "pd" for
        position-drive robots (step_pos_targets: the implicit servo
        dt*(kd+dt*kp) dominates the response) or "torque" for robots
        stepped through step_torques (SEA / actuator-net / V / T drives):
        those run with the PASSIVE impedance only, and probing with the
        PD impedance overestimates the apparent mass ~up to the servo
        ratio — the stopping impulse then over-corrects every substep and
        the stance micro-bounces (measured on anymal: foot force
        flickering 0<->350 N at ~3-step period, anchors ratcheting).

        The analytic bound (above) ignores the implicit PD servo
        impedance dt*(kd + dt*kp) + armature, which at 5 ms dominates the
        rigid-body term: for a go1 foot the true apparent mass is ~0.61 kg
        vs the 0.089 kg bound — a 6.9x underestimate that made the
        implicit contact law 7x too soft (measured 15 mm standing
        penetration; the calf collision points then drag on the ground
        and the reference's collision penalty fires continuously,
        zeroing the whole reward under only_positive_rewards).

        Probe: one engine substep (PD holding the pose, no contact) per
        collision point, with a unit world-z force at that point;
        m_app = F * dt / dv_z. Runs one tiny batched jit at construction
        (batch = #points x #poses). The probe sweeps POSES q0 * s for
        s in {1.0, 0.7, 1.3} and keeps the MINIMUM response mass: resets
        draw q = q0 * U(0.5, 1.5) (legged_robot.py:399-413) and heavy
        robots sag far from q0 under load, and an apparent mass measured
        only at q0 overestimates in flexed poses — the stopping impulse
        then over-corrects and bounces (measured on aliengo: 2.5 m/s
        rebound from a 1.6 m/s landing). `safety` keeps the estimate a
        lower bound between the probed poses.

        q0: (nq,) calibration joint positions (env default_dof_pos).
        inertia_params_fn: n -> nominal link-inertia pytree with batch n.
        """
        m = self.model
        P = len(m.cp_link)
        if P == 0:
            return
        import numpy as np
        from legged_gym_tpu.physics.kinematics import (
            contact_point_kinematics, forward_kinematics)
        from legged_gym_tpu.physics.state import PhysicsState

        POSE_SCALES = (1.0, 0.7, 1.3)

        def probe_at(q_pose):
            n = 3 * P         # env (3k + a): unit force along axis a at
            dtype = jnp.float32   # point k
            q = jnp.broadcast_to(
                jnp.asarray(q_pose, dtype)[:, None], (m.nq, n))
            pos = jnp.zeros((3, n), dtype).at[2].set(100.0)  # airborne
            quat = jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype)[:, None], (4, n))
            phys = PhysicsState(pos=pos, quat=quat,
                                vel=jnp.zeros((6, n), dtype),
                                q=q, qd=jnp.zeros((m.nq, n), dtype))
            params = inertia_params_fn(n)
            tau = jnp.zeros((m.nq, n), dtype)  # PD at target: servo
            # impedance enters via implicit_d below
            fk = forward_kinematics(m, phys)
            cp_pos, _ = contact_point_kinematics(m, fk)
            pt = jnp.tile(jnp.eye(P, dtype=dtype), (1, 3))     # (P, 3P)
            ax = jnp.repeat(jnp.eye(3, dtype=dtype), P, axis=1)  # (3, 3P)
            f_pts = ax[:, None, :] * pt[None]                  # (3, P, 3P)
            link_f, link_n = accumulate_link_wrenches(m, fk, cp_pos, f_pts)
            implicit_d = jnp.asarray(
                self._imp_pd if drive == "pd" else self._imp_passive,
                dtype)
            a0, qdd = aba(m, params, fk, phys.qd, tau, f_ext_w=link_f,
                          n_ext_w=link_n, gravity=(0.0, 0.0, 0.0),
                          fixed_base=self.fixed_base,
                          implicit_d=implicit_d)
            new = integrate(phys, a0, qdd, self.dt_inner)
            fk2 = forward_kinematics(m, new)
            _, cp_vel2 = contact_point_kinematics(m, fk2)
            # dv along the probe axis of point k in env 3k+a
            karo = jnp.arange(P)
            dv = jnp.stack([cp_vel2[a][karo, a * P + karo]
                            for a in range(3)])                # (3, P)
            return self.dt_inner / jnp.maximum(dv, 1e-9)

        def probe():
            qs = jnp.stack([jnp.asarray(q0, jnp.float32) * s
                            for s in POSE_SCALES])
            # clamp probe poses to the hard limits (aliengo's calf
            # default sits 0.05 rad from its stop; 1.3x would violate)
            qs = jnp.clip(qs, jnp.asarray(m.dof_lower, jnp.float32),
                          jnp.asarray(m.dof_upper, jnp.float32))
            return jnp.min(jax.vmap(probe_at)(qs), axis=0)

        m_num = np.asarray(jax.jit(probe)())                   # (3, P)
        self.cp_m_eff = np.maximum(self.cp_m_eff, safety * m_num[2])
        self.cp_m_eff_t = np.maximum(
            np.minimum(self.cp_m_eff_t, self.cp_m_eff),
            safety * np.minimum(m_num[0], m_num[1]))
        # STATIC support: the impulse term alone bounds each point's
        # static force at m_eff*vmax/dt, too weak for heavy robots
        # (ANYmal: ~127 N weight share per foot vs ~100 N at vmax=0.5) —
        # they sink until shank points drag (r2: 140 mm penetration,
        # constant collision penalty, zero reward). r2 raised vmax per
        # point instead, but a large velocity bias RELAUNCHES deep
        # landings at ~vmax (aliengo: sustained 1 m/s ballistic hops —
        # the collapse/convulsion cycle). PhysX avoids this by resolving
        # penetration POSITIONALLY (TGS position iterations impart no
        # kinetic energy; the velocity bias is capped separately by
        # max_depenetration_velocity). Our analog: a ONE-WAY support
        # spring (contact.py k_static) that carries the static load at
        # millimeter depths but applies NO force while the point
        # separates — it stores no return energy, so landings stay
        # plastic and vmax stays at its small config value.
        W = self.model.total_mass * 9.81
        self.cp_k_static = np.full(
            P, 1.2 * 0.3 * W / 0.005)   # one point carries 1.2x a
        #                                 four-foot share at 5 mm depth

    # ---- one inner substep ----
    def _substep(self, state, inertia_params, friction, tau_fn, implicit_d,
                 patch=None, f_ws=None):
        fk = forward_kinematics(self.model, state)
        f_pts = ws_out = None
        if len(self.model.cp_link):
            cp_pos, cp_vel = contact_point_kinematics(self.model, fk)
            out = contact_forces(self.model, self.grid, self.sim.contact,
                                  cp_pos, cp_vel, friction,
                                  dt=self.dt_inner, m_eff=self.cp_m_eff,
                                  m_eff_t=self.cp_m_eff_t,
                                  v_max=self.cp_vmax, f_prev=f_ws,
                                  patch=patch,
                                  k_static=self.cp_k_static)
            # anchored-friction mode returns (forces, new anchors)
            f_pts, ws_out = out if isinstance(out, tuple) else (out, None)
            if self.sc_pairs is not None and len(self.sc_pairs):
                from legged_gym_tpu.physics.contact import (
                    self_collision_forces)
                f_pts = f_pts + self_collision_forces(
                    self.model, self.sc_pairs, cp_pos, cp_vel,
                    self.dt_inner, self.cp_m_eff)
            link_f, link_n = accumulate_link_wrenches(self.model, fk,
                                                      cp_pos, f_pts)
            body_forces = accumulate_body_forces(self.model, f_pts)
        else:
            link_f = link_n = None
            body_forces = jnp.zeros((3, self.model.num_bodies, state.n),
                                    state.pos.dtype)
        if self.lin_damping != 0.0 or self.ang_damping != 0.0:
            # PhysX body damping analog: mass/inertia-proportional drag
            # per link, as world-frame external wrenches about each
            # link origin (fk velocities are link-frame)
            par = jnp.moveaxis(inertia_params, 1, 0)       # (10, nl, N)
            from legged_gym_tpu.ops import lin as _lin
            v_w = _lin.mv(fk.R_w, fk.v_lin)                # (3, nl, N)
            f_d = -self.lin_damping * par[0][None] * v_w
            w = fk.v_ang
            Iw = jnp.stack([
                par[4] * w[0] + par[5] * w[1] + par[6] * w[2],
                par[5] * w[0] + par[7] * w[1] + par[8] * w[2],
                par[6] * w[0] + par[8] * w[1] + par[9] * w[2]])
            n_d = -self.ang_damping * _lin.mv(fk.R_w, Iw)
            link_f = f_d if link_f is None else link_f + f_d
            link_n = n_d if link_n is None else link_n + n_d
        tau = tau_fn(state)
        tau_total = tau
        if self._has_joint_damping:
            tau_total = tau_total - jnp.asarray(
                self.model.dof_damping, state.pos.dtype)[:, None] * state.qd
        # joint-limit spring-damper (implicitly damped when active)
        k_lim, c_lim = self.sim.limit_stiffness, self.sim.limit_damping
        if k_lim > 0:
            lo = jnp.asarray(self.model.dof_lower,
                             state.pos.dtype)[:, None]
            hi = jnp.asarray(self.model.dof_upper,
                             state.pos.dtype)[:, None]
            over = jnp.maximum(state.q - hi, 0.0)
            under = jnp.maximum(lo - state.q, 0.0)
            active = ((over > 0) | (under > 0)).astype(state.pos.dtype)
            tau_total = tau_total + k_lim * (under - over) \
                - c_lim * active * state.qd
            implicit_d = implicit_d + self.dt_inner * (
                c_lim + self.dt_inner * k_lim) * active
        a0, qdd = aba(self.model, inertia_params, fk, state.qd, tau_total,
                      f_ext_w=link_f, n_ext_w=link_n,
                      gravity=self.sim.gravity, fixed_base=self.fixed_base,
                      implicit_d=implicit_d)
        vcap = None
        if self.sim.vel_limit_scale:
            vcap = jnp.asarray(self.model.dof_vel_limit
                               * self.sim.vel_limit_scale,
                               state.pos.dtype)[:, None]
        new_state = integrate(state, a0, qdd, self.dt_inner, qd_cap=vcap,
                              base_ang_cap=self.sim.max_base_ang_vel,
                              base_lin_cap=self.sim.max_base_lin_vel,
                              q_lower=jnp.asarray(
                                  self.model.dof_lower,
                                  state.pos.dtype)[:, None],
                              q_upper=jnp.asarray(
                                  self.model.dof_upper,
                                  state.pos.dtype)[:, None])
        return new_state, SimInfo(body_forces=body_forces, torques=tau), \
            ws_out

    def _run_substeps(self, state, inertia_params, friction, tau_fn,
                      implicit_d, patch=None, f_ws=None):
        track_ws = f_ws is not None

        def body(carry, _):
            s, _info, ws = carry
            s2, info2, f_pts = self._substep(s, inertia_params, friction,
                                             tau_fn, implicit_d,
                                             patch=patch,
                                             f_ws=ws if track_ws else None)
            ws2 = f_pts if track_ws else ws
            return (s2, info2, ws2), None

        nb, nq, n = self.model.num_bodies, self.model.nq, state.n
        info0 = SimInfo(body_forces=jnp.zeros((3, nb, n), state.pos.dtype),
                        torques=jnp.zeros((nq, n), state.pos.dtype))
        (state, info, f_ws), _ = jax.lax.scan(
            body, (state, info0, f_ws), None, length=self.sim.substeps)
        if track_ws:
            return state, info, f_ws
        return state, info

    # ---- public drive modes (one sim dt each) ----
    def step_pos_targets(self, state, inertia_params, friction, targets,
                         patch=None, f_ws=None):
        """Position-drive sim step (reference legged_robot.py:93-96).

        targets: (nq, N), already scaled/offset/clipped by the env
        (_compute_poses semantics, legged_robot.py:394-397).
        patch: optional per-env TerrainPatch (fast contact sampling).
        """
        kp = jnp.asarray(self.kp, state.pos.dtype)[:, None]
        kd_eff = jnp.asarray(self.kd + self.dt_inner * self.kp,
                             state.pos.dtype)[:, None]
        lim = jnp.asarray(self.torque_limit, state.pos.dtype)[:, None]

        def tau_fn(s):
            return jnp.clip(kp * (targets - s.q) - kd_eff * s.qd, -lim, lim)

        return self._run_substeps(state, inertia_params, friction, tau_fn,
                                  jnp.asarray(self._imp_pd, state.pos.dtype),
                                  patch=patch, f_ws=f_ws)

    def step_torques(self, state, inertia_params, friction, tau,
                     patch=None, f_ws=None):
        """Torque-drive sim step: tau (nq, N) held over the sim dt, clipped
        to the URDF effort limits (reference _compute_torques:392)."""
        lim = jnp.asarray(self.torque_limit, state.pos.dtype)[:, None]
        tau_c = jnp.clip(tau, -lim, lim)

        def tau_fn(s):
            return tau_c

        return self._run_substeps(state, inertia_params, friction, tau_fn,
                                  jnp.asarray(self._imp_passive,
                                              state.pos.dtype),
                                  patch=patch, f_ws=f_ws)
