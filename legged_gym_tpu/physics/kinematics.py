"""Forward kinematics over the link tree — stacked, level-parallel,
batch-last.

Layout rule: matrix axes FIRST, entity axis second-to-last, env axis LAST:
``R_w (3, 3, nl, N)``, ``p_w (3, nl, N)``. Every ops/lin function indexes
the leading matrix axes and broadcasts the rest, so one call processes a
whole tree LEVEL (all 4 legs of a quadruped at once). This shrinks the
sequential op chain from O(nq) to O(tree depth) — the physics is
latency-bound on TPU (tiny tensors, long dependency chains), so chain
length is the cost model, not FLOPs.

Levels are precomputed on the host from the parent table
(``tree_levels``); within a level all joints are independent.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from legged_gym_tpu.ops import lin, quat as quat_ops


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FK:
    R_w: jnp.ndarray     # (3, 3, nl, N) link world rotations
    p_w: jnp.ndarray     # (3, nl, N) link world positions
    v_ang: jnp.ndarray   # (3, nl, N) angular velocity, LINK frame
    v_lin: jnp.ndarray   # (3, nl, N) origin velocity, LINK frame
    R_loc: jnp.ndarray   # (3, 3, nq, N) child-in-parent joint rotations
    p_loc: jnp.ndarray   # (3, nq, N) child-in-parent joint offsets


def tree_levels(model):
    """Joint indices grouped by tree depth: list of int np.ndarrays.
    Joint j moves link j+1; depth(link) = depth(parent) + 1."""
    depth = np.zeros(model.nl, np.int32)
    for li in range(1, model.nl):
        depth[li] = depth[model.link_parent[li]] + 1
    levels = []
    for d in range(1, depth.max() + 1 if model.nl > 1 else 1):
        levels.append(np.nonzero(depth[1:] == d)[0].astype(np.int32))
    return levels


def _axis_rotations(axes, angles):
    """Rodrigues for a stack of constant unit axes.

    axes: (L, 3) host constants; angles: (L, N) -> (3, 3, L, N)."""
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    oc = 1.0 - c
    x = axes[:, 0][:, None]
    y = axes[:, 1][:, None]
    z = axes[:, 2][:, None]
    return jnp.stack([
        jnp.stack([c + x * x * oc, x * y * oc - z * s, x * z * oc + y * s]),
        jnp.stack([y * x * oc + z * s, c + y * y * oc, y * z * oc - x * s]),
        jnp.stack([z * x * oc - y * s, z * y * oc + x * s, c + z * z * oc]),
    ])


def forward_kinematics(model, state) -> FK:
    """model: RobotModel (host constants), state: PhysicsState (batch-last)."""
    n = state.pos.shape[-1]
    dtype = state.pos.dtype
    nl, nq = model.nl, model.nq

    R_w = jnp.zeros((3, 3, nl, n), dtype)
    p_w = jnp.zeros((3, nl, n), dtype)
    v_ang = jnp.zeros((3, nl, n), dtype)
    v_lin = jnp.zeros((3, nl, n), dtype)
    R_loc = jnp.zeros((3, 3, nq, n), dtype)
    p_loc = jnp.zeros((3, nq, n), dtype)

    R_w = R_w.at[:, :, 0].set(quat_ops.to_matrix(state.quat))
    p_w = p_w.at[:, 0].set(state.pos)
    v_ang = v_ang.at[:, 0].set(state.vel[0:3])
    v_lin = v_lin.at[:, 0].set(state.vel[3:6])

    for idx in tree_levels(model):
        li = idx + 1
        pi = model.link_parent[li]
        axes = model.joint_axis[idx]                      # (L, 3) host
        Rj = jnp.asarray(model.joint_rot[idx], dtype)     # (L, 3, 3)
        Rj = jnp.moveaxis(Rj, 0, 2)[..., None]            # (3, 3, L, 1)
        pj = jnp.asarray(model.joint_pos[idx].T, dtype)[:, :, None]  # (3,L,1)
        q_l = state.q[idx]                                # (L, N)
        qd_l = state.qd[idx]
        axis_c = jnp.asarray(axes.T, dtype)[:, :, None]   # (3, L, 1)
        prism = model.joint_is_prismatic[idx]             # (L,) host bools

        R_rot = _axis_rotations(axes, q_l)                # (3,3,L,N)
        if prism.any():
            # mixed levels: prismatic joints keep identity rotation and
            # translate along the axis (rare; handled by host-side select)
            pm = jnp.asarray(prism, dtype)[:, None]
            eye = lin.eye(R_rot.shape[2:], dtype)
            R_rot = R_rot * (1 - pm) + eye * pm
            p = pj + axis_c * (q_l * pm)[None]
            S_ang = axis_c * (1 - pm)[None]
            S_lin = axis_c * pm[None]
        else:
            p = jnp.broadcast_to(pj, (3, len(idx), n))
            S_ang = axis_c
            S_lin = jnp.zeros((3, len(idx), 1), dtype)

        R = lin.mm(Rj, R_rot)                             # (3,3,L,N)
        R_loc = R_loc.at[:, :, idx].set(R)
        p_loc = p_loc.at[:, idx].set(jnp.broadcast_to(p, (3, len(idx), n)))

        Rp = R_w[:, :, pi]                                # parent world rot
        R_w = R_w.at[:, :, li].set(lin.mm(Rp, R))
        p_w = p_w.at[:, li].set(p_w[:, pi] + lin.mv(Rp, p))

        w_p = v_ang[:, pi]
        vl_p = v_lin[:, pi]
        v_ang = v_ang.at[:, li].set(lin.mtv(R, w_p) + S_ang * qd_l[None])
        v_lin = v_lin.at[:, li].set(
            lin.mtv(R, vl_p + quat_ops.cross(w_p, p)) + S_lin * qd_l[None])

    return FK(R_w=R_w, p_w=p_w, v_ang=v_ang, v_lin=v_lin,
              R_loc=R_loc, p_loc=p_loc)


def body_world_positions(model, fk):
    """World positions of all report-body frames: (3, nb, N)."""
    li = model.body_link
    off = jnp.asarray(model.body_pos.T, fk.p_w.dtype)[:, :, None]  # (3,nb,1)
    return fk.p_w[:, li] + lin.mv(fk.R_w[:, :, li], off)


def contact_point_kinematics(model, fk):
    """World position and velocity of every collision point:
    (pos (3, P, N), vel (3, P, N)) — one gather, no Python loop."""
    li = model.cp_link
    off = jnp.asarray(model.cp_pos.T, fk.p_w.dtype)[:, :, None]    # (3,P,1)
    R = fk.R_w[:, :, li]                                           # (3,3,P,N)
    pos = fk.p_w[:, li] + lin.mv(R, off)
    v_local = fk.v_lin[:, li] + quat_ops.cross(fk.v_ang[:, li], off)
    vel = lin.mv(R, v_local)
    return pos, vel
