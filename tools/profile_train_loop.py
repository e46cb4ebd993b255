"""Profile the training loop on the real chip: where do 0.61 s/iter go?

Measures, at the flagship go1_rough 1800(->1920)-env config:
  A. current runner behavior: learn_fn + per-leaf float() fetch each iter
  B. learn_fn dispatched K times, ONE device_get at the end (pipelined)
  C. rollout-only program for reference (the bench's 35 ms figure)
"""
import time

from legged_gym_tpu.utils.cache import setup_jax

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from legged_gym_tpu import registry  # noqa: E402

K = 10


def main():
    cfg, train_cfg = registry.get_cfgs("go1")
    # flagship rough config (BASELINE.json config 2), as train_flagship.py
    cfg.env.num_envs = 1800
    cfg.env.num_observations = 235
    cfg.terrain.mesh_type = "heightfield"
    cfg.terrain.measure_heights = True
    cfg.terrain.curriculum = True
    env, _ = registry.make_env(cfg=cfg, seed=0)
    from legged_gym_tpu.rl.runner import PPORunner
    runner = PPORunner(env, train_cfg, log_dir=None)
    runner._ensure_env_state()

    ts, es, obs = runner.train_state, runner.env_state, runner.obs
    fn = runner.learn_fn

    # compile
    t0 = time.perf_counter()
    ts, es, obs, m = fn(ts, es, obs)
    _ = float(np.asarray(m["loss"]))
    print(f"compile+first: {time.perf_counter()-t0:.2f}s")

    # A: current behavior (per-leaf float fetch each iteration)
    t0 = time.perf_counter()
    for _ in range(K):
        ts, es, obs, m = fn(ts, es, obs)
        mm = jax.tree.map(lambda x: float(np.asarray(x)), m)
    dtA = (time.perf_counter() - t0) / K
    print(f"A per-leaf fetch each iter : {dtA*1e3:8.1f} ms/iter "
          f"({46080/dtA:,.0f} steps/s)")

    # A2: single device_get each iteration
    t0 = time.perf_counter()
    for _ in range(K):
        ts, es, obs, m = fn(ts, es, obs)
        mm = jax.device_get(m)
    dtA2 = (time.perf_counter() - t0) / K
    print(f"A2 device_get each iter    : {dtA2*1e3:8.1f} ms/iter "
          f"({46080/dtA2:,.0f} steps/s)")

    # B: dispatch K iters, fetch once at the end
    t0 = time.perf_counter()
    for _ in range(K):
        ts, es, obs, m = fn(ts, es, obs)
    mm = jax.device_get(m)
    dtB = (time.perf_counter() - t0) / K
    print(f"B fetch once per {K:2d} iters  : {dtB*1e3:8.1f} ms/iter "
          f"({46080/dtB:,.0f} steps/s)")

    # B2: same but fetch the full metrics dict of every iter afterwards
    t0 = time.perf_counter()
    ms = []
    for _ in range(K):
        ts, es, obs, m = fn(ts, es, obs)
        ms.append(m)
    mm = jax.device_get(ms)
    dtB2 = (time.perf_counter() - t0) / K
    print(f"B2 deferred fetch all      : {dtB2*1e3:8.1f} ms/iter "
          f"({46080/dtB2:,.0f} steps/s)")


if __name__ == "__main__":
    main()
