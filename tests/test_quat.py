import jax.numpy as jnp
import numpy as np

from legged_gym_tpu.ops import lin, quat


def rand_quat(rng, n):
    q = rng.normal(size=(4, n))
    return jnp.asarray(q / np.linalg.norm(q, axis=0))


def test_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    q = rand_quat(rng, 16)
    v = jnp.asarray(rng.normal(size=(3, 16)))
    R = quat.to_matrix(q)
    np.testing.assert_allclose(quat.rotate(q, v), lin.mv(R, v),
                               rtol=1e-5, atol=1e-5)


def test_rotate_inverse_is_inverse():
    rng = np.random.default_rng(1)
    q = rand_quat(rng, 8)
    v = jnp.asarray(rng.normal(size=(3, 8)))
    np.testing.assert_allclose(quat.rotate_inverse(q, quat.rotate(q, v)), v,
                               rtol=1e-5, atol=1e-5)


def test_mul_composes_rotations():
    rng = np.random.default_rng(2)
    a, b = rand_quat(rng, 8), rand_quat(rng, 8)
    v = jnp.asarray(rng.normal(size=(3, 8)))
    np.testing.assert_allclose(quat.rotate(quat.mul(a, b), v),
                               quat.rotate(a, quat.rotate(b, v)),
                               rtol=1e-5, atol=1e-5)


def test_yaw_rotate_preserves_z_and_yaw():
    # a quaternion with known yaw
    ang = 0.7
    q = quat.from_axis_angle(np.array([0.0, 0.0, 1.0]), jnp.asarray([ang]))
    v = jnp.asarray([[1.0], [0.0], [0.3]])
    out = quat.yaw_rotate(q, v)
    np.testing.assert_allclose(out[:, 0],
                               [np.cos(ang), np.sin(ang), 0.3],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(quat.yaw(q)[0]), ang, rtol=1e-6)


def test_wrap_to_pi():
    a = jnp.asarray([0.0, np.pi + 0.1, -np.pi - 0.1, 2 * np.pi, 3.0])
    w = quat.wrap_to_pi(a)
    np.testing.assert_allclose(
        w, [0.0, -np.pi + 0.1, np.pi - 0.1, 0.0, 3.0], atol=1e-6)


def test_solve33_and_solve66():
    rng = np.random.default_rng(3)
    n = 5
    A = rng.normal(size=(3, 3, n))
    A = A + np.transpose(A, (1, 0, 2)) + 6 * np.eye(3)[:, :, None]
    b = rng.normal(size=(3, n))
    x = np.asarray(lin.solve33(jnp.asarray(A), jnp.asarray(b)))
    for i in range(n):
        np.testing.assert_allclose(A[:, :, i] @ x[:, i], b[:, i],
                                   rtol=1e-4, atol=1e-4)

    AA = rng.normal(size=(3, 3, n)); AA = AA + AA.transpose(1, 0, 2) + 8 * np.eye(3)[:, :, None]
    BB = rng.normal(size=(3, 3, n)); BB = BB + BB.transpose(1, 0, 2) + 8 * np.eye(3)[:, :, None]
    AB = 0.3 * rng.normal(size=(3, 3, n))
    bt, bb = rng.normal(size=(3, n)), rng.normal(size=(3, n))
    xt, xb = lin.solve66_sym(*map(jnp.asarray, (AA, AB, BB, bt, bb)))
    xt, xb = np.asarray(xt), np.asarray(xb)
    for i in range(n):
        M = np.block([[AA[:, :, i], AB[:, :, i]], [AB[:, :, i].T, BB[:, :, i]]])
        sol = np.concatenate([xt[:, i], xb[:, i]])
        np.testing.assert_allclose(M @ sol, np.concatenate([bt[:, i], bb[:, i]]),
                                   rtol=1e-3, atol=1e-3)


def test_integrate_quaternion():
    import jax
    q0 = jnp.asarray([[0.0], [0.0], [0.0], [1.0]])
    omega = jnp.asarray([[0.0], [0.0], [1.0]])
    q = jax.jit(lambda q: jax.lax.fori_loop(
        0, 100, lambda i, x: quat.integrate(x, omega, 0.001), q))(q0)
    np.testing.assert_allclose(float(quat.yaw(q)[0]), 0.1, rtol=1e-3)
