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

from legged_gym_tpu.terrain.heightfield import sample_bilinear


@dataclasses.dataclass(frozen=True)
class ContactConfig:
    stiffness: float = 5000.0      # N/m
    damping: float = 150.0         # N s/m (normal)
    slip_velocity: float = 0.05    # m/s, Coulomb regularization knee
    terrain_friction: float = 1.0  # static friction of the ground
    restitution: float = 0.0       # kept for config parity (unused)


def contact_forces(model, grid, cfg, cp_pos, cp_vel, friction):
    """Compute per-point world contact forces.

    Args:
      model: RobotModel.
      grid: TerrainGrid or None (flat plane z=0).
      cfg: ContactConfig.
      cp_pos / cp_vel: (P, 3, N) world position/velocity of the collision
        points (from kinematics.contact_point_kinematics).
      friction: (N,) per-env friction coefficient (domain randomized,
        reference legged_robot.py:259-282).

    Returns:
      (f_pts (P, 3, N) world forces,
       body_forces (nb, 3, N) accumulated per report body,
       link_f (nl, 3, N), link_n (nl, 3, N) world wrenches about link
       origins — requires link world poses, so the torque arm is taken
       about the POINT and moments are assembled by the caller; here we
       return per-point forces and let engine.py do the wrench assembly.)
    """
    x, y, z = cp_pos[:, 0], cp_pos[:, 1], cp_pos[:, 2]   # (P, N)
    h, dhdx, dhdy = sample_bilinear(grid, x, y)

    # unit terrain normal
    inv_norm = 1.0 / jnp.sqrt(1.0 + dhdx * dhdx + dhdy * dhdy)
    nx, ny, nz = -dhdx * inv_norm, -dhdy * inv_norm, inv_norm

    r = jnp.asarray(model.cp_radius, cp_pos.dtype)[:, None]  # (P, 1)
    # signed penetration of the sphere along the normal
    depth = r + (h - z) * nz
    active = depth > 0.0

    vx, vy, vz = cp_vel[:, 0], cp_vel[:, 1], cp_vel[:, 2]
    v_n = vx * nx + vy * ny + vz * nz
    fn_mag = jnp.where(active,
                       jnp.maximum(cfg.stiffness * depth - cfg.damping * v_n,
                                   0.0),
                       0.0)

    # tangential velocity and regularized Coulomb friction
    vtx = vx - v_n * nx
    vty = vy - v_n * ny
    vtz = vz - v_n * nz
    vt = jnp.sqrt(vtx * vtx + vty * vty + vtz * vtz)
    mu = 0.5 * (friction[None, :] + cfg.terrain_friction)
    # |f_t| = mu f_n * vt / (vt + v_slip): saturating, zero at rest
    ft_over_vt = mu * fn_mag / (vt + cfg.slip_velocity)

    fx = fn_mag * nx - ft_over_vt * vtx
    fy = fn_mag * ny - ft_over_vt * vty
    fz = fn_mag * nz - ft_over_vt * vtz
    f_pts = jnp.stack([fx, fy, fz], axis=1)               # (P, 3, N)
    return f_pts


def accumulate_body_forces(model, f_pts):
    """Per-report-body net contact force (nb, 3, N) — the analogue of
    Isaac's net_contact_force tensor."""
    nb = model.num_bodies
    out = [None] * nb
    for k in range(f_pts.shape[0]):
        b = int(model.cp_body[k])
        out[b] = f_pts[k] if out[b] is None else out[b] + f_pts[k]
    zero = jnp.zeros_like(f_pts[0])
    return jnp.stack([o if o is not None else zero for o in out])


def accumulate_link_wrenches(model, fk, cp_pos, f_pts):
    """World wrenches (force, torque about link origin) per link."""
    nl = model.nl
    zero = jnp.zeros_like(f_pts[0])
    link_f = [zero] * nl
    link_n = [zero] * nl
    for k in range(f_pts.shape[0]):
        li = int(model.cp_link[k])
        f = f_pts[k]
        arm = cp_pos[k] - fk.p_w[li]
        n = jnp.stack([
            arm[1] * f[2] - arm[2] * f[1],
            arm[2] * f[0] - arm[0] * f[2],
            arm[0] * f[1] - arm[1] * f[0],
        ])
        link_f[li] = link_f[li] + f
        link_n[li] = link_n[li] + n
    return jnp.stack(link_f), jnp.stack(link_n)
