"""Actuator-net parity: JAX reimplementations vs the TorchScript originals
(resources/actuator_nets/*.pt), on random inputs."""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

SEA_PT = "/root/reference/resources/actuator_nets/anydrive_v3_lstm.pt"
GO1_PT = "/root/reference/resources/actuator_nets/go1_net.pt"

needs_assets = pytest.mark.skipif(
    not os.path.exists(SEA_PT), reason="reference assets not mounted")


@needs_assets
def test_sea_lstm_matches_torchscript():
    from legged_gym_tpu.actuators.sea_lstm import SEANet

    net = SEANet(SEA_PT)
    B = 7
    rng = np.random.default_rng(0)
    h = np.zeros((2, B, 8), np.float32)
    c = np.zeros((2, B, 8), np.float32)
    m = torch.jit.load(SEA_PT, map_location="cpu")

    state = net.init_state(B)
    for step in range(4):
        pos_err = rng.normal(size=B).astype(np.float32)
        vel = rng.normal(size=B).astype(np.float32)

        x = torch.zeros(B, 1, 2)
        x[:, 0, 0] = torch.from_numpy(pos_err)
        x[:, 0, 1] = torch.from_numpy(vel)
        with torch.inference_mode():
            tau_t, (h_t, c_t) = m(x, (torch.from_numpy(h),
                                      torch.from_numpy(c)))
        h, c = h_t.numpy(), c_t.numpy()

        tau_j, state = net(pos_err, vel, state)
        np.testing.assert_allclose(np.asarray(tau_j), tau_t.numpy(),
                                   rtol=1e-4, atol=1e-5)
    # hidden state layout: ours (2, 8, B) vs torch (2, B, 8)
    np.testing.assert_allclose(
        np.asarray(state[0]).transpose(0, 2, 1), h, rtol=1e-4, atol=1e-5)


@needs_assets
def test_uninet_core_matches_torchscript():
    from legged_gym_tpu.actuators.uninet import UniNet

    net = UniNet(GO1_PT)
    m = torch.jit.load(GO1_PT, map_location="cpu")
    rng = np.random.default_rng(1)
    x = rng.normal(size=(30, 5)).astype(np.float32)
    with torch.inference_mode():
        out_t = m(torch.from_numpy(x.T)).numpy()
    out_j = np.asarray(net.core(x))
    np.testing.assert_allclose(out_j.T, out_t, rtol=1e-4, atol=1e-5)


@needs_assets
def test_uninet_history_interleave():
    """Input layout must be [q_err(5), dq(5)] per joint (go1.py:100-103):
    after one call with zero history, slot 4 of each 5-block holds the
    newest normalized sample."""
    import jax.numpy as jnp

    from legged_gym_tpu.actuators import uninet as U

    net = U.UniNet(GO1_PT)
    n = 3
    state = net.init_state(n)
    tq = jnp.zeros((12, n))
    q = jnp.ones((12, n)) * 0.1
    qd = jnp.ones((12, n)) * 0.2
    _, state = net(tq, q, qd, state)
    pe = np.asarray(state["pos_err"])
    expected = ((0.0 - 0.1) - U.POS_ERR_MEAN[0]) / U.POS_ERR_STD[0]
    np.testing.assert_allclose(pe[0, -1, :], expected, rtol=1e-5)
    assert (pe[:, :-1, :] == 0).all()
