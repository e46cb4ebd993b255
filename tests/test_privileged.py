"""Privileged observations / asymmetric critic.

Reference contract: VecEnv returns privileged_obs alongside obs and the
critic may consume it (base_task.py:70-78,101-110; rsl_rl routes
privileged_obs as critic_obs in OnPolicyRunner). The reference allocates
the buffer but ships no producer; here the layout is
[noiseless obs, ground friction, base-mass scale, feet contact forces].
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_gym_tpu import registry
from legged_gym_tpu.rl.ppo import init_train_state, make_learn_fn

GO1_PRIV = 48 + 2 + 12   # obs + (friction, base mass) + 3x4 feet forces


def _make(n=8, priv=GO1_PRIV):
    cfg, tcfg = registry.get_cfgs("go1")
    cfg.env.num_envs = n
    cfg.env.num_privileged_obs = priv
    env, cfg = registry.make_env(cfg=cfg)
    return env, cfg, tcfg


def test_priv_obs_shape_and_content():
    env, cfg, _ = _make()
    state, obs = env.reset(jax.random.PRNGKey(0))
    state, tr = env.step(state, jnp.zeros((env.num_envs, env.num_actions)))
    assert tr.privileged_obs is not None
    assert tr.privileged_obs.shape == (env.num_envs, GO1_PRIV)
    p = np.asarray(tr.privileged_obs)
    assert np.isfinite(p).all()
    # friction slot carries the per-env randomized friction
    np.testing.assert_allclose(p[:, 48], np.asarray(state.friction),
                               rtol=1e-6)
    # the noiseless half tracks the noisy obs to within the noise scale
    d = np.abs(p[:, :48] - np.asarray(tr.obs))
    assert d.max() < 2.0 * float(np.max(np.abs(env.noise_vec))) + 1e-6


def test_wrong_priv_dim_raises():
    with pytest.raises(ValueError, match="privileged layout"):
        _make(priv=17)


def test_asymmetric_critic_trains():
    env, cfg, tcfg = _make(n=8)
    ts = init_train_state(jax.random.PRNGKey(0), env.obs_dim,
                          env.num_actions, tcfg.policy, tcfg.algorithm,
                          critic_obs_dim=env.num_privileged_obs)
    assert ts.params["critic"][0]["w"].shape[0] == GO1_PRIV
    learn = jax.jit(make_learn_fn(env, tcfg.policy, tcfg.algorithm,
                                  num_steps=8))
    state, obs = env.reset(jax.random.PRNGKey(1))
    state, tr = env.step(state, jnp.zeros((env.num_envs, env.num_actions)))
    pack = (tr.obs, tr.privileged_obs)
    for _ in range(2):
        ts, state, pack, metrics = learn(ts, state, pack)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["value_loss"]))
