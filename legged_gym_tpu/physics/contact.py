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
    # EXPERIMENTAL anchored static friction (see contact_forces): carry
    # per-point tangential anchors so a loaded stance sticks instead of
    # creeping at ~F*dt/m_t. Off by default: it holds moderate stances
    # but does not yet stabilize near-singular leg geometries (aliengo),
    # and the chain/Pallas path does not support the carry.
    warm_start: bool = False
    anchor_stiffness: float = 2000.0   # N/m tangential stick spring


def contact_forces(model, grid, cfg, cp_pos, cp_vel, friction,
                   dt=None, m_eff=None, m_eff_t=None, v_max=None,
                   f_prev=None, patch=None):
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
        # per-point cap (Engine.cp_vmax): static support force is
        # bounded by m_eff*vmax/dt, so the cap is raised per point to
        # carry its weight share (see calibrate_contact_mass)
        vmax = (cfg.max_pushout_vel if v_max is None
                else jnp.asarray(v_max, cp_pos.dtype)[:, None])
        v_push = jnp.minimum(cfg.baumgarte * depth / dt, vmax)
        fn_raw = (me / dt) * jnp.maximum(v_push - v_n, 0.0)
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
        # positions): while stuck, a spring-damper to the anchor holds
        # the point; when the spring force leaves the Coulomb cone the
        # force is clipped and the anchor is dragged to stay consistent
        # (classic penalty stick). Airborne points snap their anchor to
        # the current position, as do stale anchors (> 10 cm away:
        # resets/teleports zero the carry).
        anchor = jnp.asarray(f_prev, cp_pos.dtype)
        dxa = cp_pos[0] - anchor[0]
        dya = cp_pos[1] - anchor[1]
        dza = cp_pos[2] - anchor[2]
        in_contact = fn_mag > 0.0
        stale = (dxa * dxa + dya * dya + dza * dza) > 0.01
        fresh = (~in_contact) | stale
        dxa = jnp.where(fresh, 0.0, dxa)
        dya = jnp.where(fresh, 0.0, dya)
        dza = jnp.where(fresh, 0.0, dza)
        # tangential projection of the anchor offset
        dn = dxa * nx + dya * ny + dza * nz
        dxa, dya, dza = dxa - dn * nx, dya - dn * ny, dza - dn * nz
        k_t = cfg.anchor_stiffness
        ftx = -k_t * dxa - ft_over_vt * vtx
        fty = -k_t * dya - ft_over_vt * vty
        ftz = -k_t * dza - ft_over_vt * vtz
        ft_mag = jnp.sqrt(ftx * ftx + fty * fty + ftz * ftz) + 1e-9
        scale = jnp.minimum(1.0, mu * fn_mag / ft_mag)
        fx = fn_mag * nx + ftx * scale
        fy = fn_mag * ny + fty * scale
        fz = fn_mag * nz + ftz * scale
        # new anchor: sliding (scale < 1) drags it so the spring force
        # equals the clipped force; sticking keeps it
        ax = jnp.where(fresh[None], cp_pos,
                       cp_pos - jnp.stack([dxa, dya, dza]) * scale[None])
        return jnp.stack([fx, fy, fz]), ax

    return jnp.stack([fx, fy, fz])                       # (3, P, N)


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
