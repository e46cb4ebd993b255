"""Penalty contact vs heightfield / plane (batch-last, jit-traceable).

TPU-native replacement for PhysX contact generation + TGS solve
(reference: heightfield/trimesh collision set up at legged_robot.py:610-643,
net contact forces read at :115,509). Collision geometry is the compiled
sphere set from model/robot.py (feet = real spheres, boxes = corner points,
capsules = end spheres).

Model: spring-damper normal force along the terrain normal + regularized
Coulomb friction, evaluated per point, accumulated (a) per dynamic link as
world wrenches for the ABA and (b) per report body for the contact-force
sensor tensor the env consumes (termination, collision penalties,
feet_air_time — legged_robot.py:143-148, 895-897, 941-949).

Friction combine follows PhysX 'average' mode, as noted in the reference
config (anymal_c_flat_config.py:59): mu = (mu_env + mu_terrain) / 2.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from legged_gym_tpu.terrain.heightfield import (patch_sample_bilinear,
                                                sample_bilinear)


@dataclasses.dataclass(frozen=True)
class ContactConfig:
    stiffness: float = 5000.0      # N/m (explicit mode only)
    damping: float = 150.0         # N s/m (explicit mode only)
    slip_velocity: float = 0.05    # m/s, Coulomb regularization knee
    terrain_friction: float = 1.0  # static friction of the ground
    restitution: float = 0.0       # kept for config parity (zero anyway)
    # implicit mode (default; lets the engine run 1-2 substeps per 5 ms
    # like PhysX TGS): inelastic Baumgarte impulse law
    #     f_n = (m_eff / dt) * max(0, baumgarte * depth / dt - v_n)
    # — exactly the force that cancels the approach velocity and pushes
    # out at baumgarte * depth/dt, so impacts are PLASTIC by construction
    # (restitution 0, matching the reference config) and the law is
    # unconditionally stable at any dt. A naive stiff spring instead
    # bounces near-elastically at 2.5 ms and training learns to ride the
    # velocity caps (observed). Friction gain is capped at m_eff/dt (one
    # step can at most stop the slip, never reverse it).
    implicit: bool = True
    baumgarte: float = 1.0         # pushout gain; static penetration
    # d* = W dt^2 / (m_eff * baumgarte) ~= 1.4 mm for a go1 foot with the
    # numerically calibrated m_eff (engine.calibrate_contact_mass)
    max_pushout_vel: float = 0.5   # [m/s] cap on the Baumgarte pushout
    # velocity so deep spawn penetrations are resolved over a few steps
    # instead of launching the robot
    # Anchored static friction (see contact_forces): carry per-point
    # tangential anchors so a loaded stance sticks instead of creeping at
    # ~F*dt/m_t. The anchor restoring force uses the SAME implicit
    # impulse form as the normal direction (f = m_t/dt * (v_target - v),
    # v_target = -beta*offset/dt), so its effective stiffness
    # m_t*beta/dt^2 auto-scales with the calibrated tangential mass and
    # the law is unconditionally stable (per-substep offset decay factor
    # 1-beta in the point-mass limit). Off by default for reference-
    # parity robots; required by aliengo's wide near-straight stance
    # (~15 N sustained lateral load per foot). Supported by the general
    # engine AND the chain/Pallas fast path (chain_step.py).
    warm_start: bool = False
    anchor_beta: float = 0.5           # offset-correction gain per substep
    anchor_vmax: float = 1.0           # [m/s] cap on the anchor pull
    anchor_stale2: float = 0.01        # [m^2] snap anchors further than this
    # geometric anchor release: the anchor survives while the point stays
    # within this clearance of the surface, so landing micro-hops do not
    # re-snap it at a displaced position (each re-snap ratchets a loaded
    # stance outward). Heavy robots rebound harder at spawn — widen it.
    anchor_release_depth: float = 0.005   # [m]


# Fresh/reset anchor value: farther than sqrt(anchor_stale2) from any
# reachable contact point, so the stale rule re-snaps on first touch no
# matter where the robot spawns (a zero anchor is VALID for a foot within
# 10 cm of the world origin and would drag it toward (0,0,0)).
ANCHOR_SENTINEL = 1e6


def contact_forces(model, grid, cfg, cp_pos, cp_vel, friction,
                   dt=None, m_eff=None, m_eff_t=None, v_max=None,
                   f_prev=None, patch=None, k_static=None):
    """Compute per-point world contact forces (stacked layout).

    Args:
      model: RobotModel.
      grid: TerrainGrid or None (flat plane z=0).
      cfg: ContactConfig.
      cp_pos / cp_vel: (3, P, N) world position/velocity of the collision
        points (from kinematics.contact_point_kinematics).
      friction: (N,) per-env friction coefficient (domain randomized,
        reference legged_robot.py:259-282).
      dt: substep length (required when cfg.implicit).
      m_eff: (P,) effective mass per point (owning-link nominal mass).

    Returns:
      f_pts (3, P, N) world forces per collision point; with
      cfg.warm_start and f_prev given, returns (f_pts, new_anchors).
    """
    x, y, z = cp_pos[0], cp_pos[1], cp_pos[2]            # (P, N)
    if patch is not None and grid is not None:
        h, dhdx, dhdy = patch_sample_bilinear(grid, patch, x, y)
    else:
        h, dhdx, dhdy = sample_bilinear(grid, x, y)

    # unit terrain normal
    inv_norm = 1.0 / jnp.sqrt(1.0 + dhdx * dhdx + dhdy * dhdy)
    nx, ny, nz = -dhdx * inv_norm, -dhdy * inv_norm, inv_norm

    r = jnp.asarray(model.cp_radius, cp_pos.dtype)[:, None]  # (P, 1)
    # signed penetration of the sphere along the normal
    depth = r + (h - z) * nz
    active = depth > 0.0

    vx, vy, vz = cp_vel[0], cp_vel[1], cp_vel[2]
    v_n = vx * nx + vy * ny + vz * nz
    if cfg.implicit:
        me = jnp.asarray(m_eff, cp_pos.dtype)[:, None]          # (P, 1)
        # direction-aware apparent mass (see chain_step.py:
        # contact_force_from_plane) — the calibrated vertical mass
        # over-corrects on tilted terrain normals (slope-landing
        # restitution); harmonically blend toward the tangential mass
        if m_eff_t is not None:
            met_n = jnp.asarray(m_eff_t, cp_pos.dtype)[:, None]
            me = 1.0 / (nz * nz / me + (1.0 - nz * nz) / met_n)
        # per-point cap (Engine.cp_vmax): static support force is
        # bounded by m_eff*vmax/dt, so the cap is raised per point to
        # carry its weight share (see calibrate_contact_mass)
        vmax = (cfg.max_pushout_vel if v_max is None
                else jnp.asarray(v_max, cp_pos.dtype)[:, None])
        v_push = jnp.minimum(cfg.baumgarte * depth / dt, vmax)
        fn_raw = (me / dt) * jnp.maximum(v_push - v_n, 0.0)
        if k_static is not None:
            # ONE-WAY static-support spring (PhysX TGS position-
            # correction analog, engine.calibrate_contact_mass): carries
            # the standing load at mm depths but applies NO force while
            # the point separates faster than 5 cm/s — stores no return
            # energy, landings stay plastic (the r2 vmax-raise instead
            # relaunched deep landings at ~1 m/s on aliengo)
            # depth saturates at 15 mm: deep penetrations (landing
            # overshoot, stepping into a stair face) resolve via the
            # capped impulse term instead of a huge spring kick
            ks = jnp.asarray(k_static, cp_pos.dtype)[:, None]
            fn_raw = fn_raw + (ks * jnp.minimum(depth, 0.015)
                               * (v_n < 0.05))
    else:
        fn_raw = jnp.maximum(
            cfg.stiffness * depth - cfg.damping * v_n, 0.0)
    fn_mag = jnp.where(active, fn_raw, 0.0)

    # tangential velocity and regularized Coulomb friction
    vtx = vx - v_n * nx
    vty = vy - v_n * ny
    vtz = vz - v_n * nz
    vt = jnp.sqrt(vtx * vtx + vty * vty + vtz * vtz)
    mu = 0.5 * (friction[None, :] + cfg.terrain_friction)
    # |f_t| = mu f_n * vt / (vt + v_slip): saturating, zero at rest
    ft_over_vt = mu * fn_mag / (vt + cfg.slip_velocity)
    if cfg.implicit:
        # impulse cap: one substep can at most stop the slip. Uses the
        # TANGENTIAL apparent mass (lateral leg inertia), which is far
        # below the servo-stiffened normal mass — capping with the
        # normal mass over-corrects slip and rings the leg laterally.
        met = me if m_eff_t is None else jnp.asarray(
            m_eff_t, cp_pos.dtype)[:, None]
        ft_over_vt = jnp.minimum(ft_over_vt, met / dt)

    fx = fn_mag * nx - ft_over_vt * vtx
    fy = fn_mag * ny - ft_over_vt * vty
    fz = fn_mag * nz - ft_over_vt * vtz

    if cfg.warm_start and f_prev is not None:
        # ANCHORED static friction. The capped viscous law above is the
        # per-point implicit slip stop: it removes THIS substep's slip
        # but cannot cancel a persistent driving force, so a loaded
        # stance creeps at vt ~= F*dt/m_t (aliengo: ~0.2 m/s lateral —
        # the stance splays and collapses); a pure force-bias warm start
        # ratchets (force memory has no restoring term). Instead carry a
        # tangential ANCHOR per point (f_prev is (3, P, N) anchor
        # positions) and apply the same implicit impulse law as the
        # normal direction: the target velocity pulls the point back to
        # its anchor at beta*offset/dt (capped), and the impulse that
        # achieves it — (m_t/dt)(v_target - v_t) — is clipped to the
        # Coulomb cone. Effective stiffness m_t*beta/dt^2 (~1e5 N/m for
        # an aliengo foot at 1.25 ms) holds a 15 N lateral load with
        # ~0.2 mm of drift; a fixed explicit spring either creeps (too
        # soft) or rings the light distal links (too stiff) — this form
        # is deadbeat-stable by the same argument as the Baumgarte
        # normal law. When the cone clips, the anchor is dragged to
        # stay consistent (classic return mapping). Airborne points
        # snap their anchor to the current position, as do stale
        # anchors (> sqrt(anchor_stale2) away: resets/teleports zero
        # the carry).
        met = me if m_eff_t is None else jnp.asarray(
            m_eff_t, cp_pos.dtype)[:, None]
        f, ax = anchored_tangential(
            cfg, cp_pos, fn_mag, mu,
            jnp.stack([vtx, vty, vtz]),
            jnp.stack([nx, ny, nz]), met, dt,
            jnp.asarray(f_prev, cp_pos.dtype), depth=depth)
        return f + fn_mag[None] * jnp.stack([nx, ny, nz]), ax

    return jnp.stack([fx, fy, fz])                       # (3, P, N)


def anchored_tangential(cfg, cp_pos, fn_mag, mu, vt_vec, n_vec, m_t, dt,
                        anchor, depth=None):
    """Implicit anchored static friction, shared by the stacked path and
    the chain/Pallas path (chain_step.contact_force_from_plane).

    Args (leading point axes arbitrary, env axis last):
      cp_pos (3, ...): world point positions; fn_mag (...): normal force;
      mu (...): friction coefficient; vt_vec (3, ...): tangential
      velocity; n_vec (3, ...): unit terrain normal; m_t: tangential
      apparent mass (broadcastable); anchor (3, ...): anchor positions;
      depth (...): signed penetration — anchors release GEOMETRICALLY
      (point > 5 mm clear of the surface), not on momentary normal-force
      dropouts: fn_mag flickers to zero during stance micro-bounces, and
      releasing then re-snapping the anchor each flicker ratchets a
      loaded stance outward (measured on aliengo: the splay the anchors
      exist to stop).

    Returns (f_t (3, ...) tangential force, new_anchor (3, ...)).
    """
    dxa = cp_pos[0] - anchor[0]
    dya = cp_pos[1] - anchor[1]
    dza = cp_pos[2] - anchor[2]
    near = ((fn_mag > 0.0) if depth is None
            else (depth > -cfg.anchor_release_depth))
    stale = (dxa * dxa + dya * dya + dza * dza) > cfg.anchor_stale2
    fresh = (~near) | stale
    dxa = jnp.where(fresh, 0.0, dxa)
    dya = jnp.where(fresh, 0.0, dya)
    dza = jnp.where(fresh, 0.0, dza)
    nx, ny, nz = n_vec[0], n_vec[1], n_vec[2]
    # tangential projection of the anchor offset
    dn = dxa * nx + dya * ny + dza * nz
    dxa, dya, dza = dxa - dn * nx, dya - dn * ny, dza - dn * nz
    # implicit anchor impulse: f = (m_t/dt) (v_target - v_t),
    # v_target = -beta * offset / dt, |v_target| <= anchor_vmax
    d_mag = jnp.sqrt(dxa * dxa + dya * dya + dza * dza) + 1e-12
    v_pull = jnp.minimum(cfg.anchor_beta * d_mag / dt, cfg.anchor_vmax)
    g = m_t / dt
    ftx = g * (-v_pull * dxa / d_mag - vt_vec[0])
    fty = g * (-v_pull * dya / d_mag - vt_vec[1])
    ftz = g * (-v_pull * dza / d_mag - vt_vec[2])
    ft_mag = jnp.sqrt(ftx * ftx + fty * fty + ftz * ftz) + 1e-9
    scale = jnp.minimum(1.0, mu * fn_mag / ft_mag)
    f_t = jnp.stack([ftx * scale, fty * scale, ftz * scale])
    # new anchor: sliding (scale < 1) drags it so the remembered offset
    # stays consistent with the clipped force; sticking keeps it. While
    # the point is UNLOADED but still geometrically near (fn flickers to
    # zero during stance micro-bounces), keep the remembered anchor
    # untouched: the cone scale is ~0 then, and dragging the anchor to
    # cp_pos each flicker erases the offset — the ratchet that walks a
    # bouncing stance outward ~1 cm per flicker (measured on anymal).
    off = jnp.stack([dxa, dya, dza]) * scale[None]
    loaded = fn_mag > 1e-3
    new_anchor = jnp.where(
        fresh[None], cp_pos,
        jnp.where(loaded[None], cp_pos - off, anchor))
    return f_t, new_anchor


def accumulate_body_forces(model, f_pts):
    """Per-report-body net contact force (3, nb, N) — the analogue of
    Isaac's net_contact_force tensor. One scatter-add along the tiny
    body axis."""
    nb = model.num_bodies
    out = jnp.zeros((3, nb) + f_pts.shape[2:], f_pts.dtype)
    return out.at[:, model.cp_body].add(f_pts)


def accumulate_link_wrenches(model, fk, cp_pos, f_pts):
    """World wrenches (force (3, nl, N), torque about link origin
    (3, nl, N)) accumulated per link via scatter-add."""
    li = model.cp_link
    arm = cp_pos - fk.p_w[:, li]                         # (3, P, N)
    n = jnp.stack([
        arm[1] * f_pts[2] - arm[2] * f_pts[1],
        arm[2] * f_pts[0] - arm[0] * f_pts[2],
        arm[0] * f_pts[1] - arm[1] * f_pts[0],
    ])
    nl = model.nl
    link_f = jnp.zeros((3, nl) + f_pts.shape[2:], f_pts.dtype)
    link_n = jnp.zeros_like(link_f)
    return link_f.at[:, li].add(f_pts), link_n.at[:, li].add(n)


# ---------------------------------------------------------------- self-collision

def self_collision_candidate_pairs(model):
    """Host-side candidate pair list for sphere-set self-collision.

    The reference enables intra-actor collision through PhysX's bitwise
    filter when asset.self_collisions == 0 (legged_robot.py:711-720,
    e.g. anymal_c_flat_config.py:42); PhysX always filters bodies joined
    by a joint. Equivalent here: all collision-point pairs on distinct,
    non-parent-child links. Pairs that already overlap (or nearly so)
    in the robot's default pose are dropped by
    ``filter_rest_overlapping_pairs`` — our sphere set over-approximates
    the real meshes near the hips, and a rest-pose overlap would inject
    spurious permanent forces PhysX's exact geometry never produces.

    Returns (Q, 2) int32 point-index pairs.
    """
    P = len(model.cp_link)
    pairs = []
    for i in range(P):
        for j in range(i + 1, P):
            li, lj = int(model.cp_link[i]), int(model.cp_link[j])
            if li == lj:
                continue
            if (model.link_parent[li] == lj
                    or model.link_parent[lj] == li):
                continue
            # exclude the base (link 0): its contact force is the
            # termination signal (terminate_after_contacts_on), and the
            # coarse base/thigh spheres (0.10 + 0.06 m for ANYmal) fire
            # at separations where PhysX's exact hulls never touch — a
            # normal crouch then reads as base contact and terminates
            # (measured: anymal_c_flat eplen stuck at ~120 vs ~640 by
            # iter 60 without). Limb-limb pairs are the behavior the
            # filter exists for (leg crossing) and keep their exact
            # sphere fidelity.
            if li == 0 or lj == 0:
                continue
            pairs.append((i, j))
    return np.array(pairs, np.int32).reshape(-1, 2)


def self_collision_forces(model, pairs, cp_pos, cp_vel, dt, m_eff,
                          v_max=0.2):
    """Sphere-sphere self-contact forces with the same implicit-impulse
    law as the terrain contact: stop the approach velocity plus a
    capped pushout bias, scaled by the pair's reduced apparent mass.
    Frictionless (link-on-link friction is negligible for keeping limbs
    from interpenetrating, which is what the reference's PhysX filter
    buys); energy-dissipative by construction (impulse never exceeds
    the stopping impulse + bias).

    pairs: (Q, 2) from self_collision_candidate_pairs (possibly rest-
      filtered); cp_pos/cp_vel: (3, P, N); m_eff: (P,) calibrated
      apparent masses (Engine.cp_m_eff).
    Returns f_pts (3, P, N) to ADD to the terrain contact forces before
    wrench/body accumulation (so net_contact_force-style reporting and
    the collision penalty see self-contacts, as in Isaac).
    """
    dtype = cp_pos.dtype
    i = pairs[:, 0]
    j = pairs[:, 1]
    r = jnp.asarray(model.cp_radius, dtype)
    rsum = (r[i] + r[j])[:, None]                       # (Q, 1)
    d = cp_pos[:, i] - cp_pos[:, j]                     # (3, Q, N)
    dist = jnp.sqrt(jnp.sum(d * d, axis=0) + 1e-12)     # (Q, N)
    nrm = d / dist[None]
    overlap = rsum - dist
    v_rel = cp_vel[:, i] - cp_vel[:, j]
    v_n = jnp.sum(nrm * v_rel, axis=0)                  # + = separating
    me = jnp.asarray(m_eff, dtype)
    m_ij = (1.0 / (1.0 / jnp.maximum(me[i], 1e-6)
                   + 1.0 / jnp.maximum(me[j], 1e-6)))[:, None]
    bias = jnp.minimum(overlap / dt, v_max)
    jmag = jnp.where(overlap > 0.0,
                     m_ij * jnp.maximum(bias - v_n, 0.0) / dt,
                     0.0)                               # (Q, N) force mag
    f = nrm * jmag[None]                                # (3, Q, N)
    out = jnp.zeros_like(cp_pos)
    return out.at[:, i].add(f).at[:, j].add(-f)
