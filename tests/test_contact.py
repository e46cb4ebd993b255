"""Contact + engine integration: a Go1 dropped on flat ground must settle
standing (the reference's own smoke criterion — scripts/test_env.py drives
exactly this scenario and a human eyeballs it; here we assert it)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_gym_tpu.model.robot import compile_model
from legged_gym_tpu.physics.engine import Engine, SimConfig
from legged_gym_tpu.physics.params import broadcast_nominal
from legged_gym_tpu.physics.state import PhysicsState

GO1 = "/root/reference/resources/robots/go1/urdf/go1.urdf"
DEFAULTS = {"hip": 0.1, "thigh": 0.8, "calf": -1.5}


@pytest.fixture(scope="module")
def setup():
    model = compile_model(GO1)
    kp = np.array([30.0 if "hip" in d else 50.0 for d in model.dof_names])
    kd = np.full(model.nq, 2.0)
    engine = Engine(model, SimConfig(), grid=None, kp=kp, kd=kd)
    return model, engine


def default_q(model, n):
    q0 = np.array([DEFAULTS["hip" if "hip" in d else
                            "thigh" if "thigh" in d else "calf"]
                   for d in model.dof_names], np.float32)
    return jnp.tile(jnp.asarray(q0)[:, None], (1, n))


def test_go1_settles_standing(setup):
    model, engine = setup
    n = 4
    q = default_q(model, n)
    s = PhysicsState.zeros(model.nq, n)
    s = PhysicsState(pos=s.pos.at[2].set(0.34), quat=s.quat, vel=s.vel,
                     q=q, qd=s.qd)
    params = broadcast_nominal(model, n)
    friction = jnp.ones(n)
    targets = q

    def sim_step(carry, _):
        st, _ = carry
        st, info = engine.step_pos_targets(st, params, friction, targets)
        return (st, info), None

    @jax.jit
    def run(s0):
        nb, nq = model.num_bodies, model.nq
        from legged_gym_tpu.physics.engine import SimInfo
        info0 = SimInfo(body_forces=jnp.zeros((3, nb, n)),
                        torques=jnp.zeros((nq, n)))
        (st, info), _ = jax.lax.scan(sim_step, (s0, info0), None, length=400)
        return st, info

    s1, info = run(s)   # 2 s
    z = np.asarray(s1.pos[2])
    assert np.all(z > 0.22) and np.all(z < 0.40), f"base z={z}"
    # upright: projected gravity mostly -z
    from legged_gym_tpu.ops import quat as qo
    g_b = qo.rotate_inverse(s1.quat, jnp.asarray([0., 0., -1.])[:, None] *
                            jnp.ones((3, n)))
    assert np.all(np.asarray(g_b[2]) < -0.98)
    # settled: small velocities
    assert float(jnp.abs(s1.vel).max()) < 0.2
    # vertical contact force balances weight
    fz_tot = np.asarray(info.body_forces[2].sum(axis=0))
    weight = model.total_mass * 9.81
    np.testing.assert_allclose(fz_tot, weight, rtol=0.15)
    # feet carry the load
    feet = model.match_bodies("foot")
    fz_feet = np.asarray(info.body_forces[2, feet].sum(axis=0))
    np.testing.assert_allclose(fz_feet, weight, rtol=0.2)
    # base never touches
    base = model.match_bodies("base")[0]
    assert float(jnp.abs(info.body_forces[:, base]).max()) < 1.0


def test_friction_holds_on_flat(setup):
    """Standing robot must not drift horizontally (regularized Coulomb)."""
    model, engine = setup
    n = 2
    q = default_q(model, n)
    s = PhysicsState.zeros(model.nq, n)
    s = PhysicsState(pos=s.pos.at[2].set(0.31), quat=s.quat, vel=s.vel,
                     q=q, qd=s.qd)
    params = broadcast_nominal(model, n)
    friction = jnp.ones(n)

    @jax.jit
    def run(s0):
        def body(st, _):
            st, info = engine.step_pos_targets(st, params, friction, q)
            return st, None
        return jax.lax.scan(body, s0, None, length=600)[0]

    s1 = run(s)
    xy_drift = np.asarray(jnp.abs(s1.pos[:2])).max()
    assert xy_drift < 0.05, f"drift {xy_drift}"


def test_torque_drive_mode(setup):
    """Gravity-compensating torque mode keeps the robot from instantly
    collapsing; zero torque lets the legs fold."""
    model, engine = setup
    n = 2
    q = default_q(model, n)
    s = PhysicsState.zeros(model.nq, n)
    s = PhysicsState(pos=s.pos.at[2].set(0.31), quat=s.quat, vel=s.vel,
                     q=q, qd=s.qd)
    params = broadcast_nominal(model, n)
    friction = jnp.ones(n)

    @jax.jit
    def run(s0):
        def body(st, _):
            st, _ = engine.step_torques(st, params, friction,
                                        jnp.zeros((model.nq, n)))
            return st, None
        return jax.lax.scan(body, s0, None, length=200)[0]

    s1 = run(s)
    # with zero torques the base must sink well below standing height
    assert float(s1.pos[2].max()) < 0.2
    # but not through the floor
    assert float(s1.pos[2].min()) > -0.05


def test_anchored_tangential_keeps_anchor_when_unloaded():
    """Normal-force flicker must NOT erase the remembered anchor offset:
    with fn=0 but the point still geometrically near the surface, the
    anchor stays put (the r4 ratchet fix — per-flicker anchor wipes
    walked anymal's loaded stance outward ~1 cm per micro-bounce)."""
    from legged_gym_tpu.physics.contact import (ContactConfig,
                                                anchored_tangential)
    cfg = ContactConfig(warm_start=True)
    cp = jnp.asarray([[0.001], [0.0], [0.0]])          # 1 mm from anchor
    anchor = jnp.zeros((3, 1))
    n_vec = jnp.asarray([[0.0], [0.0], [1.0]])
    vt = jnp.zeros((3, 1))
    m_t = jnp.asarray([1.0])
    # loaded: the anchor pulls back and (sticking) keeps the offset
    f_l, a_l = anchored_tangential(cfg, cp, jnp.asarray([100.0]),
                                   jnp.asarray([1.0]), vt, n_vec, m_t,
                                   0.005, anchor, depth=jnp.asarray([0.001]))
    assert float(f_l[0, 0]) < 0.0                      # pulls toward anchor
    np.testing.assert_allclose(np.asarray(a_l), np.asarray(anchor),
                               atol=1e-6)
    # UNLOADED but near (fn=0, depth within release clearance): force is
    # zero and the anchor must be KEPT, not dragged to cp
    f_u, a_u = anchored_tangential(cfg, cp, jnp.asarray([0.0]),
                                   jnp.asarray([1.0]), vt, n_vec, m_t,
                                   0.005, anchor, depth=jnp.asarray([-0.001]))
    np.testing.assert_allclose(np.asarray(f_u), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_u), np.asarray(anchor),
                               atol=1e-6)
    # geometrically RELEASED (beyond anchor_release_depth): re-snaps to cp
    _, a_r = anchored_tangential(cfg, cp, jnp.asarray([0.0]),
                                 jnp.asarray([1.0]), vt, n_vec, m_t,
                                 0.005, anchor, depth=jnp.asarray([-0.05]))
    np.testing.assert_allclose(np.asarray(a_r), np.asarray(cp), atol=1e-6)


def test_anchor_sentinel_far_from_origin():
    """Fresh/reset anchors sit at the far sentinel so a foot touching
    down near the world origin does not adopt a zero anchor as valid
    (ADVICE r3: a zero anchor within 10 cm of (0,0,0) pulled the foot
    toward the origin)."""
    from legged_gym_tpu.physics.contact import (ANCHOR_SENTINEL,
                                                ContactConfig)
    assert ANCHOR_SENTINEL ** 2 > ContactConfig().anchor_stale2 * 1e6


def test_contact_mass_calibration_matches_drive():
    """Torque-driven robots (SEA nets step through step_torques with
    PASSIVE joint impedance) must calibrate a smaller apparent mass than
    the PD probe — probing with the servo impedance over-corrects the
    stopping impulse and micro-bounces the stance (measured on anymal)."""
    from legged_gym_tpu.assets import resolve
    model = compile_model(resolve("{ASSETS}/robots/go1/urdf/go1.urdf"))
    kp = np.full(model.nq, 80.0)
    kd = np.full(model.nq, 2.0)

    def probe(drive):
        eng = Engine(model, SimConfig(dt=0.005, substeps=1), kp=kp, kd=kd)
        eng.calibrate_contact_mass(
            np.zeros(model.nq),
            lambda n: broadcast_nominal(model, n, jnp.float32),
            drive=drive)
        return eng.cp_m_eff.copy()

    m_pd = probe("pd")
    m_tq = probe("torque")
    assert (m_tq <= m_pd + 1e-6).all()
    # the servo impedance must actually matter for the DISTAL (foot)
    # points — base points are rigid-body dominated and barely move
    assert m_tq.min() < 0.75 * m_pd.min()
