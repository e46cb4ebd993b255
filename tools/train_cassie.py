"""Biped balance-first curriculum for Cassie.

From-scratch training under the reference config barely progresses
(episode length 27 -> 59 over 1500 iters: the policy learns to fall
cheaper, not to stand — a biped on line feet cannot balance with a
random-init policy, and the wide reference spawn randomization
(dof = default x U(0.5, 1.5), root vel U(-0.5, 0.5), trimesh) makes
every episode start unrecoverable).

Phase A (balance): flat plane, tight spawns (dof x U(0.9, 1.1), vel
0.1), low commanded speeds — the policy learns to stand and step.
Phase B: continues in-process under the full registered config
(trimesh + curricula + reference spawn ranges).

    python tools/train_cassie.py [--envs 1024] [--itersA 800] [--itersB 1500]
"""
import argparse

p = argparse.ArgumentParser()
p.add_argument("--envs", type=int, default=1024)
p.add_argument("--itersA", type=int, default=800)
p.add_argument("--itersB", type=int, default=1500)
p.add_argument("--seed", type=int, default=1)
p.add_argument("--run_name", type=str, default="cassie_curr")
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
from legged_gym_tpu.utils.cache import setup_jax  # noqa: E402

setup_jax()
import numpy as np  # noqa: E402

from legged_gym_tpu import registry  # noqa: E402
from legged_gym_tpu.utils import helpers  # noqa: E402

helpers.set_seed(args.seed)


def make(phase):
    cfg, tcfg = registry.get_cfgs("cassie")
    cfg.env.num_envs = args.envs
    tcfg.runner.save_interval = 200
    if phase == "A":
        cfg.terrain.mesh_type = "plane"      # keeps the 169-dim obs
        cfg.terrain.curriculum = False       # (height scan reads zeros)
        cfg.init_state.dof_spawn_range = [0.9, 1.1]
        cfg.init_state.spawn_vel = 0.1
        cfg.commands.ranges["lin_vel_x"] = [-0.3, 0.5]
        cfg.commands.ranges["lin_vel_y"] = [-0.2, 0.2]
        cfg.commands.ranges["ang_vel_yaw"] = [-0.5, 0.5]
        tcfg.runner.max_iterations = args.itersA
        tcfg.runner.run_name = f"{args.run_name}_A"
    else:
        tcfg.runner.max_iterations = args.itersB
        tcfg.runner.run_name = f"{args.run_name}_B"
    env, _ = registry.make_env(cfg=cfg, seed=args.seed)
    runner, tcfg = registry.make_runner(env, train_cfg=tcfg)
    return runner, tcfg


runnerA, tcfgA = make("A")
print(f"phase A (balance, plane) log_dir: {runnerA.log_dir}", flush=True)
runnerA.learn(tcfgA.runner.max_iterations, init_at_random_ep_len=True)

runnerB, tcfgB = make("B")
runnerB.train_state = runnerA.train_state
std = float(np.asarray(jax.device_get(
    runnerA.train_state.params["std"])).mean())
print(f"phase B (registered config) log_dir: {runnerB.log_dir}; "
      f"carried std={std:.3f}", flush=True)
runnerB.learn(tcfgB.runner.max_iterations, init_at_random_ep_len=True)
print("done.", flush=True)
