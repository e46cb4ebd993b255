"""Forward kinematics over the link tree, batch-last.

Computes world poses and link-frame spatial velocities for every dynamic
link, plus the per-joint local transforms consumed by the ABA dynamics.
Static Python loop over the (small, fixed) link tree — unrolled at trace
time, every op an elementwise vector op over the trailing env axis.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from legged_gym_tpu.ops import lin, quat as quat_ops


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FK:
    # per-link world pose; lists of length nl with (3,3,N)/(3,N) entries
    R_w: list
    p_w: list
    # per-link spatial velocity (omega, v at link origin) in LINK frame
    v_ang: list
    v_lin: list
    # per-joint local child-in-parent transform (R (3,3,N), p (3,N) or const)
    R_loc: list
    p_loc: list


def _axis_rotation(axis, angle):
    """Rodrigues rotation about constant unit axis: (3,3) x (N,) -> (3,3,N)."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    one_c = 1.0 - c
    x, y, z = float(axis[0]), float(axis[1]), float(axis[2])
    return jnp.stack([
        jnp.stack([c + x * x * one_c, x * y * one_c - z * s, x * z * one_c + y * s]),
        jnp.stack([y * x * one_c + z * s, c + y * y * one_c, y * z * one_c - x * s]),
        jnp.stack([z * x * one_c - y * s, z * y * one_c + x * s, c + z * z * one_c]),
    ])


def forward_kinematics(model, state) -> FK:
    """model: RobotModel (host constants), state: PhysicsState (batch-last)."""
    n = state.pos.shape[-1]
    dtype = state.pos.dtype

    R_w = [None] * model.nl
    p_w = [None] * model.nl
    v_ang = [None] * model.nl
    v_lin = [None] * model.nl
    R_loc = [None] * model.nq
    p_loc = [None] * model.nq

    R_w[0] = quat_ops.to_matrix(state.quat)
    p_w[0] = state.pos
    v_ang[0] = state.vel[0:3]
    v_lin[0] = state.vel[3:6]

    for j in range(model.nq):
        li = j + 1
        pi = int(model.link_parent[li])
        axis = model.joint_axis[j]
        Rj = jnp.asarray(model.joint_rot[j], dtype)[:, :, None]  # (3,3,1)
        pj = jnp.asarray(model.joint_pos[j], dtype)[:, None]     # (3,1)
        qj = state.q[j]
        qdj = state.qd[j]
        axis_c = jnp.asarray(axis, dtype)[:, None]

        if model.joint_is_prismatic[j]:
            R = jnp.broadcast_to(Rj, (3, 3, n))
            p = pj + lin.mv(Rj, axis_c * qj[None])
            S_ang = jnp.zeros((3, n), dtype)
            S_lin = jnp.broadcast_to(axis_c, (3, n))
        else:
            R = lin.mm(Rj, _axis_rotation(axis, qj))
            p = jnp.broadcast_to(pj, (3, n))
            S_ang = jnp.broadcast_to(axis_c, (3, n))
            S_lin = jnp.zeros((3, n), dtype)

        R_loc[j] = R
        p_loc[j] = p
        # world pose
        R_w[li] = lin.mm(R_w[pi], R)
        p_w[li] = p_w[pi] + lin.mv(R_w[pi], p)
        # velocity: v_c = X v_p + S qd  (X = child<-parent motion transform)
        w_p, vl_p = v_ang[pi], v_lin[pi]
        v_ang[li] = lin.mtv(R, w_p) + S_ang * qdj[None]
        v_lin[li] = lin.mtv(R, vl_p + quat_ops.cross(w_p, p)) + S_lin * qdj[None]

    return FK(R_w=R_w, p_w=p_w, v_ang=v_ang, v_lin=v_lin,
              R_loc=R_loc, p_loc=p_loc)


def body_world_positions(model, fk):
    """World positions of all report-body frames: (nb, 3, N)."""
    out = []
    for b in range(model.num_bodies):
        li = int(model.body_link[b])
        off = jnp.asarray(model.body_pos[b], fk.p_w[0].dtype)[:, None]
        out.append(fk.p_w[li] + lin.mv(fk.R_w[li], off))
    return jnp.stack(out)


def contact_point_kinematics(model, fk):
    """World position and velocity of every collision point.

    Returns (pos (P, 3, N), vel (P, 3, N)).
    """
    pos, vel = [], []
    for k in range(len(model.cp_link)):
        li = int(model.cp_link[k])
        off = jnp.asarray(model.cp_pos[k], fk.p_w[0].dtype)[:, None]
        x = fk.p_w[li] + lin.mv(fk.R_w[li], off)
        # point velocity in world: R (v_lin + w x off)
        v_local = fk.v_lin[li] + quat_ops.cross(fk.v_ang[li], off)
        v = lin.mv(fk.R_w[li], v_local)
        pos.append(x)
        vel.append(v)
    return jnp.stack(pos), jnp.stack(vel)
