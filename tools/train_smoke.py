"""Learning smoke: flat Go1, small env count, N iterations; reports the
tracking_lin_vel trajectory. Usage:
    python tools/train_smoke.py [--envs 256] [--iters 150] [--tpu]
"""
import argparse
p = argparse.ArgumentParser()
p.add_argument("--envs", type=int, default=256)
p.add_argument("--iters", type=int, default=150)
p.add_argument("--tpu", action="store_true")
p.add_argument("--seed", type=int, default=1)
p.add_argument("--task", type=str, default="go1")
p.add_argument("--lr", type=float, default=None)
p.add_argument("--schedule", type=str, default=None)
p.add_argument("--entropy", type=float, default=None)
p.add_argument("--rough", action="store_true")
p.add_argument("--plane_per_dt", action="store_true",
               help="sample contact planes per sim dt (stair fidelity)")
args = p.parse_args()

import jax
if not args.tpu:
    jax.config.update("jax_platforms", "cpu")
from legged_gym_tpu.utils.cache import setup_jax
setup_jax()

from legged_gym_tpu import registry
from legged_gym_tpu.utils import helpers

helpers.set_seed(args.seed)
cfg, train_cfg = registry.get_cfgs(args.task)
cfg.env.num_envs = args.envs
if args.lr is not None:
    train_cfg.algorithm.learning_rate = args.lr
if args.schedule is not None:
    train_cfg.algorithm.schedule = args.schedule
if args.entropy is not None:
    train_cfg.algorithm.entropy_coef = args.entropy
if args.rough:
    cfg.env.num_observations = 235
    cfg.terrain.mesh_type = "heightfield"
    cfg.terrain.measure_heights = True
    cfg.terrain.curriculum = True
    cfg.terrain.num_rows = 4
    cfg.terrain.num_cols = 4
if args.plane_per_dt:
    cfg.sim.contact_plane_per_step = False
env, _ = registry.make_env(cfg=cfg)
from legged_gym_tpu.rl.runner import PPORunner
train_cfg.runner.save_interval = 10**9
runner = PPORunner(env, train_cfg, log_dir=None, seed=args.seed)

import numpy as np, time, json
hist = []
runner._ensure_env_state(init_at_random_ep_len=True)
t0 = time.time()
for it in range(args.iters):
    runner.train_state, runner.env_state, runner.obs, m = runner.learn_fn(
        runner.train_state, runner.env_state, runner.obs)
    m = jax.tree.map(lambda x: (np.asarray(x).tolist() if np.asarray(x).size > 1
                                else float(np.asarray(x))), m)
    hist.append(m)
    if it % 10 == 0 or it == args.iters - 1:
        print(f"it {it:4d} rew/step {m['mean_step_reward']:.5f} "
              f"track {m['episode'].get('tracking_lin_vel', 0):.4f} "
              f"eplen {m['mean_episode_length']:.0f} kl {m['kl']:.4f} "
              f"klmax {m['kl_max']:.3f} lr {m['lr']:.2e} "
              f"std {m['noise_std']:.3f}", flush=True)
print(f"wall {time.time()-t0:.0f}s")
first = np.mean([h["episode"].get("tracking_lin_vel", 0) for h in hist[:10]])
last = np.mean([h["episode"].get("tracking_lin_vel", 0) for h in hist[-10:]])
print(json.dumps({"track_first10": round(first, 5),
                  "track_last10": round(last, 5),
                  "improvement": round(last / max(first, 1e-9), 2)}))
