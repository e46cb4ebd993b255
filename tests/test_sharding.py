"""Multi-chip sharding correctness (VERDICT r2 weak #5 / next-step #5).

Builds the 8-virtual-device CPU mesh (tests/conftest.py forces
--xla_force_host_platform_device_count=8), shards the ROUGH-config env
state over the env axis, runs the FULL PPO learn_iteration twice, and
asserts (a) finiteness and (b) agreement with the unsharded run of the
same seed — the sharded program is the same math with psums inserted by
the SPMD partitioner, so results must match to f32 reduction-order
tolerance.

Reference correspondence: the reference has no working multi-device
path (--horovod is dead, helpers.py:162); this is the TPU-native
replacement (SURVEY.md §2.4) and the in-suite guard for
__graft_entry__.dryrun_multichip.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_gym_tpu import registry
from legged_gym_tpu.parallel import (env_mesh, replicate, shard_batch,
                                     shard_env_state)
from legged_gym_tpu.rl.ppo import init_train_state, make_learn_fn

N_DEVICES = 8
NUM_ENVS = 16


def _build():
    cfg, train_cfg = registry.get_cfgs("go1")
    cfg.env.num_envs = NUM_ENVS
    train_cfg.runner.num_steps_per_env = 4
    # rough config: height scan + curricula + pushes + trimesh walls —
    # the full sharded surface (patch-cache one-hot matmuls, curriculum
    # lookups, the GLOBAL command-curriculum reduction)
    cfg.env.num_observations = 235
    cfg.terrain.mesh_type = "trimesh"
    cfg.terrain.measure_heights = True
    cfg.terrain.curriculum = True
    cfg.terrain.num_rows = 3
    cfg.terrain.num_cols = 2
    env, _ = registry.make_env(cfg=cfg)
    return env, train_cfg


@pytest.mark.slow
def test_sharded_learn_matches_unsharded():
    if len(jax.devices()) < N_DEVICES:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    env, train_cfg = _build()
    learn = jax.jit(make_learn_fn(env, train_cfg.policy,
                                  train_cfg.algorithm,
                                  train_cfg.runner.num_steps_per_env))

    def init():
        ts = init_train_state(jax.random.PRNGKey(0), env.obs_dim,
                              env.num_actions, train_cfg.policy,
                              train_cfg.algorithm)
        env_state, obs = env.reset(jax.random.PRNGKey(1))
        return ts, env_state, obs

    # ---- unsharded reference ----
    ts, env_state, obs = init()
    for _ in range(2):
        ts, env_state, obs, metrics_ref = learn(ts, env_state, obs)
    ref_loss = float(np.asarray(metrics_ref["loss"]))
    ref_params = jax.tree.map(np.asarray, ts.params)

    # ---- sharded over the env mesh ----
    mesh = env_mesh(N_DEVICES)
    ts, env_state, obs = init()
    env_state = shard_env_state(env_state, mesh, env.num_envs)
    obs = shard_batch(obs, mesh)
    ts = replicate(ts, mesh)
    with mesh:
        for _ in range(2):
            ts, env_state, obs, metrics = learn(ts, env_state, obs)
        jax.block_until_ready(metrics["loss"])

    # state actually sharded over 8 devices
    sharding = env_state.physics.q.sharding
    assert len(sharding.device_set) == N_DEVICES, sharding

    loss = float(np.asarray(metrics["loss"]))
    assert np.isfinite(loss)
    for k in ("mean_step_reward", "kl", "value_loss"):
        assert np.isfinite(float(np.asarray(metrics[k]))), k

    # same math, different reduction order: tight-but-not-bitwise match
    assert abs(loss - ref_loss) < 1e-4 * max(1.0, abs(ref_loss)), \
        (loss, ref_loss)
    sh_params = jax.tree.map(np.asarray, ts.params)
    err = max(np.max(np.abs(a - b))
              for a, b in zip(jax.tree.leaves(ref_params),
                              jax.tree.leaves(sh_params)))
    assert err < 1e-4, f"sharded-vs-unsharded param drift {err:.2e}"
