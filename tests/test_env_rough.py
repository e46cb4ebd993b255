"""Rough-terrain env: heightfield contact, 235-dim obs with height scan,
terrain + command curricula (reference rough-terrain configuration,
legged_robot_config.py:45-68)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_gym_tpu import registry

N = 4


@pytest.fixture(scope="module")
def env():
    cfg, _ = registry.get_cfgs("go1")
    cfg.env.num_envs = N
    cfg.env.num_observations = 235
    cfg.terrain.mesh_type = "heightfield"
    cfg.terrain.measure_heights = True
    cfg.terrain.curriculum = True
    cfg.terrain.num_rows = 3
    cfg.terrain.num_cols = 2
    cfg.terrain.border_size = 5.0
    cfg.terrain.max_init_terrain_level = 1
    cfg.commands.curriculum = True
    cfg.noise.add_noise = False
    cfg.domain_rand.push_robots = False
    e, _ = registry.make_env(cfg=cfg)
    return e


def test_rough_obs_and_step(env):
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (N, 235)
    assert np.isfinite(np.asarray(obs)).all()
    # height-scan block occupies the last 187 slots, clipped to +-5
    h = np.asarray(obs)[:, 48:]
    assert h.shape[1] == 187
    assert (np.abs(h) <= 5.0 + 1e-5).all()

    step = jax.jit(env.step)
    for _ in range(3):
        state, tr = step(state, jnp.zeros((N, env.num_actions)))
    assert np.isfinite(np.asarray(tr.obs)).all()
    assert np.isfinite(np.asarray(tr.reward)).all()


def test_terrain_curriculum_moves_levels(env):
    state, _ = env.reset(jax.random.PRNGKey(1))
    # force a timeout reset with zero distance walked and a nonzero
    # command -> move_down -> level decreases (or stays at 0)
    lvl0 = np.asarray(state.terrain_level).copy()
    state = dataclasses.replace(
        state,
        episode_length=jnp.full((N,), env.max_episode_length, jnp.int32),
        commands=state.commands.at[0].set(1.0).at[1].set(0.0))
    state, tr = jax.jit(env.step)(state, jnp.zeros((N, env.num_actions)))
    assert np.asarray(tr.done).all()
    lvl1 = np.asarray(state.terrain_level)
    assert (lvl1 <= lvl0).all()
    # origins must match the looked-up terrain cell for the new level
    origins = np.asarray(state.env_origin)
    expect = env.terrain_origins[lvl1, env.terrain_types].T
    np.testing.assert_allclose(origins, expect, atol=1e-5)


def test_spawn_origins_on_terrain(env):
    state, _ = env.reset(jax.random.PRNGKey(2))
    org = np.asarray(state.env_origin)
    # origins are inside the terrain extent
    assert (org[0] > 0).all() and (org[1] > 0).all()
    assert (org[0] < env.cfg.terrain.num_rows * env.cfg.terrain.terrain_length).all()
