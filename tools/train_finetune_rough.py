"""Flagship rough-terrain training via terrain-curriculum warm start.

Training go1 on the procedural heightfield FROM SCRATCH falls into the
stand-still local optimum (tracking ~0.2, entropy rising): under
only_positive_rewards, the first steps toward walking on terrain cost
more than they earn and the gradient dies at zero. The flat-trained
walker, however, already walks BLIND across the level-0 heightfield at
0.5/0.6 m/s commanded (measured, /tmp transfer eval) — so the freeze is
an optimization trap, not physics. Classic cure: warm start.

This tool grafts a converged flat policy (48-dim obs) into the rough
network (235-dim): first-layer rows for the proprioceptive block copy
over, the 187 height-scan rows start at ZERO (the initial policy is
exactly the blind walker), deeper layers and the action-noise std copy
verbatim. Then it trains on the full curriculum terrain at flagship
scale.

    python tools/train_finetune_rough.py --ckpt logs/.../model_1500.ckpt \
        [--envs 1800] [--iters 2000]
"""
import argparse

p = argparse.ArgumentParser()
p.add_argument("--task", type=str, default="go1")
p.add_argument("--ckpt", type=str, required=True)
p.add_argument("--envs", type=int, default=1800)
p.add_argument("--iters", type=int, default=2000)
p.add_argument("--seed", type=int, default=1)
p.add_argument("--run_name", type=str, default="rough_warmstart")
p.add_argument("--trimesh", action="store_true")
p.add_argument("--cpu", action="store_true")
# gentle initial LR: the donor policy has a LOW action std (~0.4), so
# the first updates at the default 6e-4 blow KL to ~100 and wreck the
# grafted policy before the adaptive rule can react (measured: episode
# length crashed 1001 -> 101 in one iteration). Start small; the
# adaptive-KL rule raises it as the value function re-fits.
p.add_argument("--lr", type=float, default=3e-5)
# cassie's std RISES under the reference entropy_coef=0.01 (0.87->1.15
# over 8000 iters while quadrupeds anneal to ~0.35); allow overriding
# for continuation experiments.
p.add_argument("--entropy_coef", type=float, default=None)
# cassie's plateau shows per-update KL 2.4-3.5x the 0.01 target with lr
# pinned at the adaptive rule's 1e-5 floor (docs/CASSIE_NOTES.md);
# raising desired_kl tests whether the floor is the binding constraint.
p.add_argument("--desired_kl", type=float, default=None)
args = p.parse_args()

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
from legged_gym_tpu.utils.cache import setup_jax  # noqa: E402

setup_jax()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from legged_gym_tpu import registry  # noqa: E402
from legged_gym_tpu.rl.ppo import TrainState  # noqa: E402
from legged_gym_tpu.utils import helpers  # noqa: E402

helpers.set_seed(args.seed)
cfg, train_cfg = registry.get_cfgs(args.task)
cfg.env.num_envs = args.envs
if args.task == "go1":
    # go1's registered config is the reference flat recipe; build the
    # BASELINE rough variant. Other tasks (anymal_c_rough) keep their
    # own registered rough config.
    cfg.env.num_observations = 235
    cfg.terrain.mesh_type = "trimesh" if args.trimesh else "heightfield"
    cfg.terrain.measure_heights = True
    cfg.terrain.curriculum = True
train_cfg.runner.max_iterations = args.iters
train_cfg.runner.run_name = args.run_name
train_cfg.runner.save_interval = 250
train_cfg.algorithm.learning_rate = args.lr
if args.entropy_coef is not None:
    train_cfg.algorithm.entropy_coef = args.entropy_coef
if args.desired_kl is not None:
    train_cfg.algorithm.desired_kl = args.desired_kl

env, _ = registry.make_env(cfg=cfg, seed=args.seed)
runner, train_cfg = registry.make_runner(env, train_cfg=train_cfg)
print(f"log_dir: {runner.log_dir}", flush=True)

# ---- graft the flat policy into the 235-dim nets ----
import orbax.checkpoint as ocp  # noqa: E402

ckptr = ocp.PyTreeCheckpointer()
import os  # noqa: E402

flat = ckptr.restore(os.path.abspath(args.ckpt))
params = jax.device_get(runner.train_state.params)
fp = flat["params"]
n_flat = np.asarray(fp["actor"][0]["w"]).shape[0]
for head in ("actor", "critic"):
    w0 = np.zeros_like(np.asarray(params[head][0]["w"]))
    w0[:n_flat] = np.asarray(fp[head][0]["w"])
    params[head][0]["w"] = jnp.asarray(w0)
    params[head][0]["b"] = jnp.asarray(np.asarray(fp[head][0]["b"]))
    for i in range(1, len(params[head])):
        params[head][i]["w"] = jnp.asarray(np.asarray(fp[head][i]["w"]))
        params[head][i]["b"] = jnp.asarray(np.asarray(fp[head][i]["b"]))
params["std"] = jnp.asarray(np.asarray(fp["std"]))
ts = runner.train_state
runner.train_state = TrainState(params=params,
                                opt_state=ts.opt_state,
                                lr=ts.lr, key=ts.key)
print(f"grafted flat policy ({n_flat}-dim) into 235-dim nets; "
      f"std={float(np.asarray(params['std']).mean()):.3f}", flush=True)

runner.learn(train_cfg.runner.max_iterations, init_at_random_ep_len=True)
print("done.", flush=True)
