"""Scaling-efficiency benchmark: rollout throughput at 1, 2, 4, ... chips
with the env axis sharded over the mesh (BASELINE.json: >=80% efficiency
at N>=2). On a single-chip host this exercises the virtual CPU mesh; on a
pod slice it measures real ICI scaling.

    python -m legged_gym_tpu.scripts.bench_scaling --num_envs 1024
"""
import argparse
import json
import time

import numpy as np


def run(num_envs, devices_list=None, steps=20):
    import jax
    import jax.numpy as jnp

    from legged_gym_tpu import registry
    from legged_gym_tpu.parallel import env_mesh, shard_env_state
    from legged_gym_tpu.utils.cache import setup_jax

    setup_jax()
    n_dev = len(jax.devices())
    devices_list = devices_list or [d for d in (1, 2, 4, 8, 16, 32)
                                    if d <= n_dev]
    cfg, _ = registry.get_cfgs("go1")
    cfg.env.num_envs = num_envs
    env, _ = registry.make_env(cfg=cfg)

    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            a = jax.random.normal(k, (num_envs, env.num_actions),
                                  jnp.float32)
            state, tr = env.step(state, a)
            return (state, key), tr.reward.mean()
        (state, key), r = jax.lax.scan(body, (state, key), None,
                                       length=steps)
        return state, r.mean()

    results = {}
    base = None
    for nd in devices_list:
        mesh = env_mesh(nd)
        state, _ = env.reset(jax.random.PRNGKey(0))
        state = shard_env_state(state, mesh, num_envs)
        roll = jax.jit(rollout)
        key = jax.random.PRNGKey(1)
        state, r = roll(state, key)       # compile
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        state, r = roll(state, key)
        jax.block_until_ready(r)
        dt = time.perf_counter() - t0
        rate = num_envs * steps / dt
        if base is None:
            base = rate / nd
        results[nd] = {"env_steps_per_s": round(rate, 1)}
        # a VIRTUAL mesh (N devices on one host/core) cannot scale
        # compute, so rate/(nd*base) would only measure serialization.
        # There the honest sharding-health metric is overhead vs the
        # unsharded run of the SAME total envs: speedup >= 1 means the
        # partitioned program adds no collective/layout cost. On real
        # multi-chip meshes report classic weak efficiency.
        virtual = (jax.devices()[0].platform == "cpu"
                   and jax.process_count() == 1)
        if virtual:
            results[nd]["sharding_speedup_vs_unsharded"] = round(
                rate / (base * devices_list[0]), 3)
        else:
            results[nd]["efficiency"] = round(rate / (nd * base), 3)
        print(json.dumps({"devices": nd, **results[nd]}))
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num_envs", type=int, default=1024)
    p.add_argument("--cpu_mesh", action="store_true",
                   help="use 8 virtual CPU devices")
    a = p.parse_args()
    if a.cpu_mesh:
        import os
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    run(a.num_envs)
