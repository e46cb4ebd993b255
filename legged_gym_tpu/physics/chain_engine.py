"""Chain-layout fast engine: the whole decimation loop as one function.

Wraps chain_step.run_decimation_chain (plain XLA) and pallas_step (the
fused TPU kernel) behind the same interface as Engine.step_pos_targets,
but for the FULL policy-step physics (decimation x substeps) in one
call. Handles the joint-order <-> chain-layout conversions (one-hot
matmuls, no scatters); the per-report-body net contact forces (the
sensor tensor) are accumulated inside the fused step itself.

Reference correspondence: replaces the decimation loop around
``gym.simulate`` (legged_robot.py:89-99) with one fused device program.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from legged_gym_tpu.physics import chain_step
from legged_gym_tpu.physics.contact import ANCHOR_SENTINEL
from legged_gym_tpu.physics.chains import (NotChainStructured,
                                           build_chain_model)
from legged_gym_tpu.physics.state import PhysicsState

# default standalone contact window: 1.6 m per env (go1-class contact
# points stay within ~0.55 m of the base — calf joint limits prevent full
# extension — plus drift margin; queries clamp to the window edge). The
# env passes its own cached-window size instead (LeggedEnv.patch_cache_S).
CONTACT_PATCH_S = 16


class ChainEngine:
    """Built from a physics.engine.Engine; raises NotChainStructured if
    the model doesn't decompose (caller falls back to the general
    engine)."""

    def __init__(self, engine, decimation, plane_per_step=True,
                 patch_S=CONTACT_PATCH_S):
        model = engine.model
        sim = engine.sim
        if engine.fixed_base:
            raise NotChainStructured("fixed base")
        if not sim.contact.implicit:
            raise NotChainStructured("explicit contact not supported")
        cm = build_chain_model(model, engine.cp_m_eff,
                               engine.cp_m_eff_t, engine.cp_vmax,
                               k_static=engine.cp_k_static)
        self.engine = engine
        self.model = model
        self.cm = cm
        L, K, nq = cm.L, cm.K, model.nq

        def lvl(arr, fill=0.0):
            out = np.full((L, K), fill, float)
            out[cm.active] = np.asarray(arr, float)[cm.J[cm.active]]
            return out

        self.cc = chain_step.ChainConsts(
            cm=cm,
            dt_inner=engine.dt_inner,
            substeps=sim.substeps,
            decimation=decimation,
            gravity=tuple(sim.gravity),
            kp=lvl(engine.kp),
            kd_eff=lvl(engine.kd + engine.dt_inner * engine.kp),
            effort=lvl(engine.torque_limit),
            implicit_d=lvl(engine._imp_pd[:, 0]),
            limit_stiffness=sim.limit_stiffness,
            limit_damping=sim.limit_damping,
            lower=lvl(model.dof_lower, fill=-1e9),
            upper=lvl(model.dof_upper, fill=1e9),
            qd_cap=lvl(model.dof_vel_limit * sim.vel_limit_scale, fill=1e9),
            base_ang_cap=sim.max_base_ang_vel,
            base_lin_cap=sim.max_base_lin_vel,
            mu_terrain=sim.contact.terrain_friction,
            slip_velocity=sim.contact.slip_velocity,
            baumgarte=sim.contact.baumgarte,
            max_pushout_vel=sim.contact.max_pushout_vel,
            border_size=0.0,      # set by bind_grid
            horizontal_scale=1.0,
            wall_thresh=0.0,      # set by bind_grid
            patch_S=patch_S,
            plane_per_step=plane_per_step,
            warm_start=sim.contact.warm_start,
            anchor_beta=sim.contact.anchor_beta,
            anchor_vmax=sim.contact.anchor_vmax,
            anchor_stale2=sim.contact.anchor_stale2,
            anchor_release_depth=sim.contact.anchor_release_depth)

        # joint-order <-> level-layout one-hot matrices (no gathers)
        M = np.zeros((L * K, nq), np.float32)
        for l in range(L):
            for k in range(K):
                if cm.J[l, k] >= 0:
                    M[l * K + k, cm.J[l, k]] = 1.0
        self._to_lvl = M                 # (L*K, nq); q_lvl = M @ q
        self._from_lvl = M.T             # (nq, L*K)

        # link_params row order for level layout
        self._li_flat = cm.LI.reshape(-1)               # (L*K,)
        self._lvl_mask = cm.active.astype(np.float32)   # (L, K)

    def bind_grid(self, grid):
        """Set heightfield geometry (None = flat plane)."""
        import dataclasses
        if grid is None:
            self.cc = dataclasses.replace(self.cc, border_size=0.0,
                                          horizontal_scale=1.0,
                                          wall_thresh=0.0)
        else:
            self.cc = dataclasses.replace(
                self.cc, border_size=grid.border_size,
                horizontal_scale=grid.horizontal_scale,
                wall_thresh=getattr(grid, "wall_thresh", 0.0))
        self.grid = grid

    # ------------------------------------------------------ conversions

    def to_level(self, x):
        """(nq, N) -> (L, K, N)."""
        cm = self.cm
        return (jnp.asarray(self._to_lvl, x.dtype) @ x).reshape(
            cm.L, cm.K, x.shape[-1])

    def from_level(self, x_lvl):
        """(L, K, N) -> (nq, N)."""
        cm = self.cm
        return jnp.asarray(self._from_lvl, x_lvl.dtype) @ \
            x_lvl.reshape(cm.L * cm.K, x_lvl.shape[-1])

    def level_link_params(self, link_params):
        """(nl, 10, N) -> (lp_base (10, N), lp_lvl (L, 10, K, N))."""
        cm = self.cm
        lp = jnp.take(link_params, jnp.asarray(self._li_flat), axis=0)
        lp = lp.reshape(cm.L, cm.K, 10, link_params.shape[-1])
        lp = jnp.moveaxis(lp, 2, 1)                      # (L, 10, K, N)
        lp = lp * jnp.asarray(self._lvl_mask, lp.dtype)[:, None, :, None]
        return link_params[0], lp

    def extract_contact_patch(self, grid, x, y):
        """(ph (S,S,N), r0 (N,), c0 (N,)) contact window per env; plane
        (zeros) when grid is None. Fallback for callers without a cached
        window (MPC, tests) — per-env extraction is slow on this backend;
        the env passes its cached window via ``contact_patch`` instead."""
        import jax
        S = self.cc.patch_S
        n = x.shape[-1]
        if grid is None:
            z = jnp.zeros((S, S, n), x.dtype)
            zi = jnp.zeros((n,), jnp.int32)
            return z, zi, zi
        hs = grid.horizontal_scale
        R, C = grid.height.shape
        r0 = jnp.clip(((x + grid.border_size) / hs).astype(jnp.int32)
                      - S // 2, 0, R - S)
        c0 = jnp.clip(((y + grid.border_size) / hs).astype(jnp.int32)
                      - S // 2, 0, C - S)
        h = jax.vmap(lambda r, c: jax.lax.dynamic_slice(
            grid.height, (r, c), (S, S)))(r0, c0)        # (N, S, S)
        return jnp.transpose(h, (1, 2, 0)), r0, c0

    # ------------------------------------------------------- public step

    def init_anchors(self, n, dtype=jnp.float32):
        """Far-sentinel static-friction anchors, one (3, S, K, N) array
        per point group. The 1e6 sentinel is > sqrt(anchor_stale2) from
        ANY reachable contact point, so the stale rule re-snaps on first
        touch regardless of where the robot spawns (zeros would be
        adopted as valid by a foot touching down within 10 cm of the
        world origin and pull it toward (0,0,0)). None when the contact
        law runs without warm start."""
        if not self.cc.warm_start:
            return None
        return [jnp.full((3,) + g.offs.shape[:2] + (n,), ANCHOR_SENTINEL,
                         dtype) for g in self.cm.groups]

    def step_decimation_torque_fn(self, state: PhysicsState, link_params,
                                  friction, tau_fn, carry,
                                  use_pallas=False, contact_patch=None,
                                  anchors=None):
        """Fused torque-drive policy step for per-sim-dt actuator nets
        (ANYmal SEA LSTM, anymal.py:71-81): the decimation loop runs as
        ``decimation`` one-sim-dt fused segments (Pallas mega-kernel on
        TPU), with ``tau_fn`` — an arbitrary jit-traceable function
        ``(q (nq,N), qd (nq,N), carry) -> (tau (nq,N), carry')`` —
        evaluated between segments in plain XLA. One XLA program per
        policy step; the physics stays in the kernel, only the tiny
        actuator matmul lives outside.

        Returns (state', torques (nq, N) last segment,
        body_forces (3, nb, N), carry'[, anchors']).
        """
        import dataclasses as dc
        if not hasattr(self, "_cc_sea"):
            # decimation=1 torque-mode consts with PASSIVE implicit
            # impedance (Engine.step_torques runs without the PD servo
            # term; using _imp_pd here would over-damp the SEA drive)
            L, K = self.cm.L, self.cm.K
            imp = np.zeros((L, K), float)
            imp[self.cm.active] = np.asarray(
                self.engine._imp_passive[:, 0],
                float)[self.cm.J[self.cm.active]]
            self._cc_sea = dc.replace(self.cc, decimation=1,
                                      torque_mode=True, implicit_d=imp)
        cc = self._cc_sea
        lp_base, lp_lvl = self.level_link_params(link_params)
        if contact_patch is not None:
            ph, r0, c0 = contact_patch
        else:
            ph, r0, c0 = self.extract_contact_patch(
                self.grid, state.pos[0], state.pos[1])
        track_anchors = cc.warm_start and anchors is not None
        if use_pallas:
            from legged_gym_tpu.physics.pallas_step import CHUNK
            n = state.pos.shape[-1]
            if n > CHUNK and n % 128:
                use_pallas = False
        if use_pallas:
            from legged_gym_tpu.physics.pallas_step import \
                run_decimation_pallas as run
        else:
            run = None

        pos, quat, vel = state.pos, state.quat, state.vel
        q, qd = state.q, state.qd
        q_lvl, qd_lvl = self.to_level(q), self.to_level(qd)
        tau_last = body_f = None
        for _ in range(self.cc.decimation):
            tau, carry = tau_fn(q, qd, carry)
            tau_lvl = self.to_level(tau)
            if run is not None:
                out = run(cc, lp_base, lp_lvl, friction, tau_lvl,
                          ph, r0, c0, pos, quat, vel, q_lvl, qd_lvl,
                          anchors=anchors)
            else:
                out = chain_step.run_decimation_chain(
                    cc, lp_base, lp_lvl, friction, tau_lvl,
                    ph, r0, c0, pos, quat, vel, q_lvl, qd_lvl,
                    anchors=anchors)
            if track_anchors:
                pos, quat, vel, q_lvl, qd_lvl, tau_l, body_f, anchors = out
            else:
                pos, quat, vel, q_lvl, qd_lvl, tau_l, body_f = out
            q, qd = self.from_level(q_lvl), self.from_level(qd_lvl)
            tau_last = self.from_level(tau_l)
        new_state = PhysicsState(pos=pos, quat=quat, vel=vel, q=q, qd=qd)
        if track_anchors:
            return new_state, tau_last, body_f, carry, anchors
        return new_state, tau_last, body_f, carry

    def step_decimation_pos(self, state: PhysicsState, link_params,
                            friction, targets, use_pallas=False,
                            contact_patch=None, anchors=None):
        """Full policy-step physics (decimation x substeps), position
        drive. Returns (state', torques (nq, N), body_forces (3, nb, N))
        — body_forces is the net-contact-force sensor of the last
        substep (reference legged_robot.py:115,509). With
        ``cc.warm_start`` and ``anchors`` (init_anchors layout), returns
        a 4th element: the updated anchors."""
        lp_base, lp_lvl = self.level_link_params(link_params)
        q_lvl = self.to_level(state.q)
        qd_lvl = self.to_level(state.qd)
        tgt_lvl = self.to_level(targets)
        if contact_patch is not None:
            ph, r0, c0 = contact_patch
        else:
            ph, r0, c0 = self.extract_contact_patch(
                self.grid, state.pos[0], state.pos[1])

        track_anchors = self.cc.warm_start and anchors is not None
        n = state.pos.shape[-1]
        if use_pallas:
            from legged_gym_tpu.physics.pallas_step import CHUNK
            if n > CHUNK and n % 128:
                use_pallas = False     # misaligned env axis: use the twin
        if use_pallas:
            from legged_gym_tpu.physics.pallas_step import \
                run_decimation_pallas
            out = run_decimation_pallas(
                self.cc, lp_base, lp_lvl, friction, tgt_lvl,
                ph, r0, c0, state.pos, state.quat, state.vel,
                q_lvl, qd_lvl, anchors=anchors)
        else:
            out = chain_step.run_decimation_chain(
                self.cc, lp_base, lp_lvl, friction, tgt_lvl,
                ph, r0, c0, state.pos, state.quat, state.vel,
                q_lvl, qd_lvl, anchors=anchors)
        if track_anchors:
            pos, quat, vel, q_lvl, qd_lvl, tau_lvl, body_f, anchors = out
        else:
            pos, quat, vel, q_lvl, qd_lvl, tau_lvl, body_f = out

        new_state = PhysicsState(pos=pos, quat=quat, vel=vel,
                                 q=self.from_level(q_lvl),
                                 qd=self.from_level(qd_lvl))
        if track_anchors:
            return new_state, self.from_level(tau_lvl), body_f, anchors
        return new_state, self.from_level(tau_lvl), body_f
