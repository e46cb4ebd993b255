"""Physics state pytree (batch-last layout).

Replaces the reference's engine-owned GPU tensors + gymtorch aliasing
(legged_robot.py:503-553): here the state IS a JAX pytree, so "indexed
resets" become masked `where` writes and the whole step stays inside jit.

Conventions:
- env batch axis is LAST everywhere (TPU lane axis);
- quaternions are xyzw (Isaac convention);
- ``pos``/``quat`` are the base link frame in world coordinates;
- ``vel`` is the base spatial velocity **in base coordinates**,
  stacked (omega(3), v_origin(3)) -> shape (6, N). World-frame views
  (Isaac root_states[7:13]) are provided by helpers below.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from legged_gym_tpu.ops import quat as quat_ops


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PhysicsState:
    pos: jnp.ndarray      # (3, N) base origin, world
    quat: jnp.ndarray     # (4, N) xyzw, base->world
    vel: jnp.ndarray      # (6, N) (omega, v) in base frame
    q: jnp.ndarray        # (nq, N) joint positions
    qd: jnp.ndarray       # (nq, N) joint velocities

    @property
    def n(self):
        return self.pos.shape[-1]

    def world_lin_vel(self):
        return quat_ops.rotate(self.quat, self.vel[3:6])

    def world_ang_vel(self):
        return quat_ops.rotate(self.quat, self.vel[0:3])

    def base_lin_vel(self):
        """Base-frame linear velocity (what the reference computes as
        quat_rotate_inverse(base_quat, root_lin_vel), legged_robot.py:123)."""
        return self.vel[3:6]

    def base_ang_vel(self):
        return self.vel[0:3]

    @staticmethod
    def from_world_vel(pos, quat, lin_vel_w, ang_vel_w, q, qd):
        omega_b = quat_ops.rotate_inverse(quat, ang_vel_w)
        v_b = quat_ops.rotate_inverse(quat, lin_vel_w)
        return PhysicsState(pos=pos, quat=quat,
                            vel=jnp.concatenate([omega_b, v_b], axis=0),
                            q=q, qd=qd)

    @staticmethod
    def zeros(nq, n, dtype=jnp.float32):
        return PhysicsState(
            pos=jnp.zeros((3, n), dtype),
            quat=jnp.concatenate([jnp.zeros((3, n), dtype),
                                  jnp.ones((1, n), dtype)], axis=0),
            vel=jnp.zeros((6, n), dtype),
            q=jnp.zeros((nq, n), dtype),
            qd=jnp.zeros((nq, n), dtype),
        )
