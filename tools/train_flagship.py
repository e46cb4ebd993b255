"""Flagship-scale training run (VERDICT r2 next-step #3): Go1 on the
full procedural heightfield with both curricula at the reference's
recommended scale (1800 envs -> 1920 after lane alignment), on the real
chip, logging metrics.jsonl + config.json + checkpoints to logs/.

    python tools/train_flagship.py [--task go1] [--envs 1800]
        [--iters 1500] [--trimesh] [--run_name r3_flagship]

Reference bar: README.md:30-49 (train go1 at 1800 envs, rough terrain);
terrain + curricula per legged_robot_config.py.
"""
import argparse

p = argparse.ArgumentParser()
p.add_argument("--task", type=str, default="go1")
p.add_argument("--envs", type=int, default=1800)
p.add_argument("--iters", type=int, default=1500)
p.add_argument("--seed", type=int, default=1)
p.add_argument("--trimesh", action="store_true",
               help="trimesh (vertical-face) terrain instead of heightfield")
p.add_argument("--run_name", type=str, default="flagship")
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
from legged_gym_tpu.utils.cache import setup_jax  # noqa: E402

setup_jax()

from legged_gym_tpu import registry  # noqa: E402
from legged_gym_tpu.utils import helpers  # noqa: E402

helpers.set_seed(args.seed)
cfg, train_cfg = registry.get_cfgs(args.task)
cfg.env.num_envs = args.envs
if args.task == "go1":
    # go1's registered config is the reference's FLAT recipe
    # (go1_config.py:37-39); the flagship rough variant is BASELINE.json
    # config 2 (heightfield + height scan + curricula)
    cfg.env.num_observations = 235
    cfg.terrain.mesh_type = "trimesh" if args.trimesh else "heightfield"
    cfg.terrain.measure_heights = True
    cfg.terrain.curriculum = True
elif args.trimesh:
    cfg.terrain.mesh_type = "trimesh"
train_cfg.runner.max_iterations = args.iters
train_cfg.runner.run_name = args.run_name
train_cfg.runner.save_interval = 250

env, _ = registry.make_env(cfg=cfg, seed=args.seed)
runner, train_cfg = registry.make_runner(env, train_cfg=train_cfg)
print(f"log_dir: {runner.log_dir}", flush=True)
runner.learn(train_cfg.runner.max_iterations, init_at_random_ep_len=True)
print("done.", flush=True)
