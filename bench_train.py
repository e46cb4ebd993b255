"""Training-throughput benchmark: FULL PPO iterations (24-step rollout +
GAE + 20-minibatch update + metric reduction + per-iteration metrics
logging through the runner's pipelined fetch) at the flagship config —
go1 rough terrain, 1800(->1920) envs, 235-dim obs, both curricula
(BASELINE.json config 2; reference recommended scale README.md:37,49).

Prints ONE JSON line:
  {"metric": "go1_rough_train_policy_steps_per_s_1800env", "value": N,
   "unit": "policy-steps/s", ...}

The rollout-only figure lives in bench.py; this measures the number a
user actually experiences when training end-to-end, runner included.
The reference's training loop (rsl_rl OnPolicyRunner.learn via
task_registry.py:160-167) is the moral baseline; it publishes no
steps/s, so vs_baseline uses the same Isaac estimate as bench.py
scaled by the reference's rollout fraction (rollout == the env.step
cost there; the PPO update adds on top, so this is conservative).
"""
import json
import time

from legged_gym_tpu.utils.cache import setup_jax

setup_jax()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from legged_gym_tpu import registry  # noqa: E402

N_ITERS = 60            # timed iterations (after warmup)
N_WARMUP = 5
ISAAC_BASELINE = 100000.0  # same estimate as bench.py (env-steps/s)


def main():
    cfg, train_cfg = registry.get_cfgs("go1")
    cfg.env.num_envs = 1800
    cfg.env.num_observations = 235
    cfg.terrain.mesh_type = "heightfield"
    cfg.terrain.measure_heights = True
    cfg.terrain.curriculum = True
    env, _ = registry.make_env(cfg=cfg, seed=0)

    from legged_gym_tpu.rl.runner import PPORunner
    runner = PPORunner(env, train_cfg, log_dir=None)

    steps_per_iter = train_cfg.runner.num_steps_per_env * env.num_envs

    # warmup (compile + steady-state pipeline)
    runner.learn(N_WARMUP, init_at_random_ep_len=True)

    # learn() ends by fetching its last pending metrics, so timing the
    # whole call measures fully-synced wall clock — no async tail.
    t0 = time.perf_counter()
    runner.learn(N_ITERS)
    dt = time.perf_counter() - t0

    value = steps_per_iter * N_ITERS / dt
    line = {
        "metric": "go1_rough_train_policy_steps_per_s_1800env",
        "value": round(value, 1),
        "unit": "policy-steps/s",
        "vs_baseline": round(value / ISAAC_BASELINE, 3),
        "iters": N_ITERS,
        "s_per_iter": round(dt / N_ITERS, 4),
        "num_envs": env.num_envs,
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
