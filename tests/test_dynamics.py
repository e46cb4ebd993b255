"""Analytic validation of the Featherstone dynamics (no contacts).

The reference establishes physics correctness implicitly through PhysX;
here the dynamics is ours, so we test against closed-form mechanics:
pendulum acceleration, energy conservation, free-fall, momentum
conservation for a tumbling free body.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_gym_tpu.model.robot import compile_model
from legged_gym_tpu.physics.aba import aba
from legged_gym_tpu.physics.integrator import integrate
from legged_gym_tpu.physics.kinematics import forward_kinematics
from legged_gym_tpu.physics.params import broadcast_nominal
from legged_gym_tpu.physics.state import PhysicsState

URDF_PENDULUM = """
<robot name="pendulum">
  <link name="base"><inertial><mass value="1"/>
    <inertia ixx="1" ixy="0" ixz="0" iyy="1" iyz="0" izz="1"/></inertial></link>
  <link name="bob"><inertial><origin xyz="0 0 -1"/><mass value="2"/>
    <inertia ixx="1e-9" ixy="0" ixz="0" iyy="1e-9" iyz="0" izz="1e-9"/></inertial></link>
  <joint name="hinge" type="revolute">
    <parent link="base"/><child link="bob"/>
    <origin xyz="0 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-10" upper="10" effort="100" velocity="100"/>
  </joint>
</robot>
"""

URDF_DOUBLE = """
<robot name="double">
  <link name="base"><inertial><mass value="1"/>
    <inertia ixx="1" ixy="0" ixz="0" iyy="1" iyz="0" izz="1"/></inertial></link>
  <link name="l1"><inertial><origin xyz="0.2 0 -0.5"/><mass value="1.5"/>
    <inertia ixx="0.02" ixy="0.001" ixz="0" iyy="0.03" iyz="0.002" izz="0.01"/></inertial></link>
  <link name="l2"><inertial><origin xyz="0 0 -0.4"/><mass value="0.7"/>
    <inertia ixx="0.01" ixy="0" ixz="0.001" iyy="0.015" iyz="0" izz="0.005"/></inertial></link>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="0 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-10" upper="10" effort="100" velocity="100"/></joint>
  <joint name="j2" type="revolute">
    <parent link="l1"/><child link="l2"/>
    <origin xyz="0 0 -1"/><axis xyz="1 0 0"/>
    <limit lower="-10" upper="10" effort="100" velocity="100"/></joint>
</robot>
"""

URDF_FREE = """
<robot name="freebody">
  <link name="base"><inertial><origin xyz="0.1 -0.05 0.02"/><mass value="3"/>
    <inertia ixx="0.04" ixy="0.002" ixz="-0.001" iyy="0.09" iyz="0.003" izz="0.12"/></inertial></link>
</robot>
"""


def make(urdf_text, tmp_path, name):
    p = tmp_path / f"{name}.urdf"
    p.write_text(urdf_text)
    return compile_model(str(p))


def step_fn(model, fixed_base, gravity=(0, 0, -9.81), dt=1e-3):
    def step(state, tau):
        fk = forward_kinematics(model, state)
        a0, qdd = aba(model, broadcast_nominal(model, state.n), fk,
                      state.qd, tau, gravity=gravity, fixed_base=fixed_base)
        return integrate(state, a0, qdd, dt)
    return jax.jit(step)


def rollout_fn(model, fixed_base, gravity=(0, 0, -9.81), dt=1e-3):
    """Jitted n-step rollout (lax.fori_loop) — keeps tests fast on CPU."""
    def step(state, tau):
        fk = forward_kinematics(model, state)
        a0, qdd = aba(model, broadcast_nominal(model, state.n), fk,
                      state.qd, tau, gravity=gravity, fixed_base=fixed_base)
        return integrate(state, a0, qdd, dt)

    @jax.jit
    def rollout(state, tau, n):
        return jax.lax.fori_loop(0, n, lambda i, s: step(s, tau), state)
    return rollout


def test_pendulum_acceleration(tmp_path):
    model = make(URDF_PENDULUM, tmp_path, "pend")
    assert model.nq == 1
    state = PhysicsState.zeros(1, 4)
    theta = jnp.asarray([[0.0, 0.3, 1.0, -0.7]])
    state = PhysicsState(pos=state.pos, quat=state.quat, vel=state.vel,
                         q=theta, qd=jnp.zeros((1, 4)))
    fk = forward_kinematics(model, state)
    _, qdd = aba(model, broadcast_nominal(model, 4), fk, state.qd,
                 jnp.zeros((1, 4)), fixed_base=True)
    # point mass at distance 1 below hinge, rotation about +y:
    # at q=0 bob hangs straight down; qdd = -(g/l) sin(q)
    expected = -9.81 * np.sin(np.asarray(theta[0]))
    np.testing.assert_allclose(np.asarray(qdd[0]), expected, rtol=1e-4, atol=1e-5)


def test_pendulum_energy_conservation(tmp_path):
    model = make(URDF_PENDULUM, tmp_path, "pend")
    rollout = rollout_fn(model, fixed_base=True)
    state = PhysicsState.zeros(1, 1)
    state = PhysicsState(pos=state.pos, quat=state.quat, vel=state.vel,
                         q=jnp.asarray([[2.0]]), qd=jnp.zeros((1, 1)))
    tau = jnp.zeros((1, 1))

    def energy(s):
        th, om = float(s.q[0, 0]), float(s.qd[0, 0])
        return 0.5 * 2.0 * om ** 2 + 2.0 * 9.81 * (1 - np.cos(th)) * 1.0

    e0 = energy(state)
    state = rollout(state, tau, 2000)
    assert abs(energy(state) - e0) / e0 < 2e-3


def test_double_pendulum_energy(tmp_path):
    model = make(URDF_DOUBLE, tmp_path, "double")
    rollout = rollout_fn(model, fixed_base=True)
    state = PhysicsState.zeros(2, 1)
    state = PhysicsState(pos=state.pos, quat=state.quat, vel=state.vel,
                         q=jnp.asarray([[1.2], [0.4]]), qd=jnp.asarray([[0.0], [0.5]]))
    tau = jnp.zeros((2, 1))

    def energy(s):
        fk = forward_kinematics(model, s)
        ke = 0.0
        pe = 0.0
        from legged_gym_tpu.physics.params import nominal_link_params
        from legged_gym_tpu.ops import lin
        params = np.asarray(nominal_link_params(model))
        for li in range(model.nl):
            m, h = params[li, 0], params[li, 1:4]
            I = np.array([[params[li, 4], params[li, 5], params[li, 6]],
                          [params[li, 5], params[li, 7], params[li, 8]],
                          [params[li, 6], params[li, 8], params[li, 9]]])
            w = np.asarray(fk.v_ang[:, li])[:, 0]
            v = np.asarray(fk.v_lin[:, li])[:, 0]
            ke += 0.5 * (w @ I @ w) + 0.5 * m * (v @ v) + m * (w @ np.cross(h / max(m, 1e-12), v))
            R = np.asarray(fk.R_w[:, :, li])[:, :, 0]
            p = np.asarray(fk.p_w[:, li])[:, 0]
            if m > 0:
                com_w = p + R @ (h / m)
                pe += m * 9.81 * com_w[2]
        return ke + pe

    e0 = energy(state)
    state = rollout(state, tau, 3000)
    e1 = energy(state)
    assert abs(e1 - e0) < 2e-2 * max(abs(e0), 1.0)


def test_free_fall(tmp_path):
    model = make(URDF_FREE, tmp_path, "free")
    rollout = rollout_fn(model, fixed_base=False, dt=1e-3)
    state = PhysicsState.zeros(0, 3)
    tau = jnp.zeros((0, 3))
    state = rollout(state, tau, 100)
    # after 0.1 s: v_z = -0.981
    np.testing.assert_allclose(np.asarray(state.world_lin_vel()[2]),
                               -0.981, rtol=1e-3)
    # com-offset body must not rotate in free fall (gravity acts at com)
    np.testing.assert_allclose(np.asarray(state.vel[0:3]), 0.0, atol=1e-6)


def test_free_body_momentum_conservation(tmp_path):
    # tumbling body, no gravity: world angular momentum and KE conserved
    model = make(URDF_FREE, tmp_path, "free")
    rollout = rollout_fn(model, fixed_base=False, gravity=(0, 0, 0), dt=2e-4)
    state = PhysicsState.zeros(0, 1)
    w0 = jnp.asarray([[1.0], [2.0], [0.5]])
    state = PhysicsState(pos=state.pos, quat=state.quat,
                         vel=jnp.concatenate([w0, jnp.zeros((3, 1))], axis=0),
                         q=state.q, qd=state.qd)
    tau = jnp.zeros((0, 1))

    from legged_gym_tpu.physics.params import nominal_link_params
    params = np.asarray(nominal_link_params(model))[0]
    m, h = params[0], params[1:4]
    I_O = np.array([[params[4], params[5], params[6]],
                    [params[5], params[7], params[8]],
                    [params[6], params[8], params[9]]])

    def momentum_energy(s):
        from legged_gym_tpu.ops import quat as qo
        R = np.asarray(qo.to_matrix(s.quat))[:, :, 0]
        w = np.asarray(s.vel[0:3])[:, 0]
        v = np.asarray(s.vel[3:6])[:, 0]
        n_m = I_O @ w + np.cross(h, v)
        f_m = m * v - np.cross(h, w)
        p = np.asarray(s.pos)[:, 0]
        L_world = R @ n_m + np.cross(p, R @ f_m)
        ke = 0.5 * w @ (I_O @ w) + 0.5 * m * v @ v + w @ np.cross(h, v)
        return L_world, ke

    L0, e0 = momentum_energy(state)
    state = rollout(state, tau, 5000)
    L1, e1 = momentum_energy(state)
    np.testing.assert_allclose(L1, L0, rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(e1, e0, rtol=5e-3)


def test_go1_model_compiles():
    model = compile_model(
        "/root/reference/resources/robots/go1/urdf/go1.urdf")
    assert model.nq == 12
    assert model.nl == 13
    # doc order: FR, FL, RR, RL with (hip, thigh, calf) each
    assert model.dof_names[0] == "FR_hip_joint"
    assert model.dof_names[2] == "FR_calf_joint"
    hips = [i for i, n in enumerate(model.dof_names) if "hip" in n]
    assert hips == [0, 3, 6, 9]
    feet = model.match_bodies("foot")
    assert len(feet) == 4
    assert len(model.match_bodies("base")) == 1
    assert len(model.match_bodies("thigh")) >= 4
    # total mass ~ 12 kg (trunk 5.204 + 4*(0.591+0.92+0.131+0.06) + sensors)
    assert 11.0 < model.total_mass < 13.5
    # limits from go1.urdf:88-94
    np.testing.assert_allclose(model.dof_effort, 23.7)
    np.testing.assert_allclose(model.dof_vel_limit, 30.1)
    np.testing.assert_allclose(model.dof_lower[0], -1.0471975512)


def test_go1_standing_under_torque_balance(tmp_path):
    """Go1 fixed in the air: PD torques drive joints to the target."""
    model = compile_model(
        "/root/reference/resources/robots/go1/urdf/go1.urdf")
    n = 2
    default = {"hip": 0.0, "thigh": 0.9, "calf": -1.8}
    q0 = np.array([default["hip" if "hip" in d else
                           "thigh" if "thigh" in d else "calf"]
                   for d in model.dof_names])
    q = jnp.asarray(np.tile(q0[:, None], (1, n)))
    state = PhysicsState.zeros(12, n)
    state = PhysicsState(pos=state.pos, quat=state.quat, vel=state.vel,
                         q=q, qd=state.qd)
    kp, kd = 30.0, 2.0
    target = q + 0.1

    def step(s):
        fk = forward_kinematics(model, s)
        tau = kp * (target - s.q) - kd * s.qd
        a0, qdd = aba(model, broadcast_nominal(model, n), fk, s.qd, tau,
                      fixed_base=True)
        return integrate(s, a0, qdd, 0.002)

    state = jax.jit(
        lambda s: jax.lax.fori_loop(0, 1500, lambda i, x: step(x), s))(state)
    # gravity sag keeps a small error; PD should get within ~0.1 rad
    err = np.abs(np.asarray(state.q - target))
    assert err.max() < 0.12
