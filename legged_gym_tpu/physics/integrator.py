"""Semi-implicit (symplectic) Euler integrator, batch-last.

Matches the reference's physics rate: dt = 0.005 s, 1 substep
(legged_robot_config.py:193-194). Velocities update first, positions
integrate with the NEW velocities. Base spatial velocity lives in base
coordinates, where v_dot equals the spatial acceleration returned by ABA
(the apparent-derivative identity, RBDA sec. 2.11), so the update is a
plain axpy.
"""
import jax.numpy as jnp

from legged_gym_tpu.ops import quat as quat_ops
from legged_gym_tpu.physics.state import PhysicsState


def integrate(state: PhysicsState, a_base, qdd, dt, qd_cap=None,
              base_ang_cap=None, base_lin_cap=None, q_lower=None,
              q_upper=None) -> PhysicsState:
    """Velocity caps are applied BEFORE the position update (PhysX
    maxJointVelocity / max_angular_velocity / max_linear_velocity
    analogs — they also keep runaway states finite).

    q_lower/q_upper: hard joint limits enforced as a PLASTIC projection
    (PhysX treats URDF limits as hard constraints): q clamps to the
    limit and the outward joint velocity zeroes. A finite limit SPRING
    instead stores the impact energy and returns it — measured on
    aliengo (default calf 0.054 rad from its stop): landings drove the
    calf 0.28 rad past the limit and the spring catapulted the robot at
    up to 2.5 m/s. Projection removes exactly the overshoot energy."""
    vel = state.vel + dt * a_base
    if base_ang_cap is not None:
        vel = vel.at[0:3].set(jnp.clip(vel[0:3], -base_ang_cap,
                                       base_ang_cap))
    if base_lin_cap is not None:
        vel = vel.at[3:6].set(jnp.clip(vel[3:6], -base_lin_cap,
                                       base_lin_cap))
    qd = state.qd + dt * qdd
    if qd_cap is not None:
        qd = jnp.clip(qd, -qd_cap, qd_cap)
    pos = state.pos + dt * quat_ops.rotate(state.quat, vel[3:6])
    quat = quat_ops.integrate(state.quat, vel[0:3], dt)
    q = state.q + dt * qd
    if q_lower is not None:
        qc = jnp.clip(q, q_lower, q_upper)
        qd = jnp.where((q > q_upper) & (qd > 0.0), 0.0, qd)
        qd = jnp.where((q < q_lower) & (qd < 0.0), 0.0, qd)
        q = qc
    return PhysicsState(pos=pos, quat=quat, vel=vel, q=q, qd=qd)
