"""Learning smoke: locomotion reward must IMPROVE, not merely compute.

Round-1 regression this gates: physics produced a constant collision
penalty that zeroed the whole reward under only_positive_rewards, so PPO
had a flat gradient and 800-iteration runs never moved
episode/tracking_lin_vel (reference converges Go1 in <=800 iters,
train.py:40-43).  A short flat-terrain Go1 run must show the tracking
reward rising by a solid multiple over its starting window.

Slow (~4 min on the 1-core CPU host) but it is the only test on the axis
that actually matters.
"""
import jax
import numpy as np

from legged_gym_tpu import registry
from legged_gym_tpu.rl.runner import PPORunner
from legged_gym_tpu.utils import helpers


def test_go1_flat_tracking_improves():
    helpers.set_seed(1)
    cfg, tcfg = registry.get_cfgs("go1")
    cfg.env.num_envs = 64
    env, _ = registry.make_env(cfg=cfg)
    runner = PPORunner(env, tcfg, log_dir=None, seed=1)
    runner._ensure_env_state(init_at_random_ep_len=True)

    track = []
    for _ in range(40):
        (runner.train_state, runner.env_state, runner.obs,
         m) = runner.learn_fn(runner.train_state, runner.env_state,
                              runner.obs)
        track.append(float(np.asarray(
            m["episode"]["tracking_lin_vel"])))
        assert np.isfinite(float(np.asarray(m["loss"])))

    first = np.mean(track[:10])
    last = np.mean(track[-10:])
    # measured on this seed: 0.029 -> 0.088 (3.1x). Gate at 2x so noise
    # does not flake the suite while a flat-gradient regression (ratio
    # ~1.0) still fails loudly.
    assert last > 2.0 * first, (
        f"tracking_lin_vel did not improve: first10={first:.5f} "
        f"last10={last:.5f}")
