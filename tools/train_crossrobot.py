"""Cross-robot donor warm start (go1 -> aliengo).

Aliengo trained from scratch converges to the stand-still local optimum
(docs/runs/aliengo_1024: eplen 970/1001, tracking 0.31 but 0.0 m/s
achieved at eval): with only_positive_rewards, the first steps toward a
trot on its near-straight stance cost more (contact churn, lin_vel_z)
than they earn, so the gradient dies at standing. The same trap killed
go1-on-rough and ANYmal, and the same cure applies: warm-start from a
policy that already walks.

Go1 and aliengo share the interface exactly — 48-dim obs, 12 actions in
the same FL/FR/RL/RR hip/thigh/calf order, action_scale 0.25, identical
PD gains (aliengo_config.py vs go1_config.py stiffness/damping blocks),
actions and dof-pos observations both RELATIVE to the robot's own
default pose — so a converged go1 flat policy is a valid aliengo policy
that commands a go1-shaped trot around aliengo's stance. Graft verbatim,
then fine-tune under aliengo dynamics at a gentle initial LR (the donor
std is low, ~0.4; the default 6e-4 blows KL before adaptive-KL reacts —
same failure measured in tools/train_finetune_rough.py).

    python tools/train_crossrobot.py --ckpt logs/rough_go1/<run>/model_1000.ckpt \
        [--task aliengo] [--envs 1024] [--iters 1500]

Reference behavior to match: /root/reference/legged_gym/envs/aliengo/
aliengo_config.py:34-114 (trains like any quadruped; no warm start
needed under PhysX's stick-slip contact, which has true static friction).
"""
import argparse

p = argparse.ArgumentParser()
p.add_argument("--task", type=str, default="aliengo")
p.add_argument("--ckpt", type=str, required=True)
p.add_argument("--envs", type=int, default=1024)
p.add_argument("--iters", type=int, default=1500)
p.add_argument("--seed", type=int, default=1)
p.add_argument("--run_name", type=str, default="go1_donor")
p.add_argument("--lr", type=float, default=3e-5)
p.add_argument("--save_interval", type=int, default=250)
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
from legged_gym_tpu.utils.cache import setup_jax  # noqa: E402

setup_jax()
import os  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import orbax.checkpoint as ocp  # noqa: E402

from legged_gym_tpu import registry  # noqa: E402
from legged_gym_tpu.rl.ppo import TrainState  # noqa: E402
from legged_gym_tpu.utils import helpers  # noqa: E402

helpers.set_seed(args.seed)
cfg, train_cfg = registry.get_cfgs(args.task)
cfg.env.num_envs = args.envs
train_cfg.runner.max_iterations = args.iters
train_cfg.runner.run_name = args.run_name
train_cfg.runner.save_interval = args.save_interval
train_cfg.algorithm.learning_rate = args.lr

env, _ = registry.make_env(cfg=cfg, seed=args.seed)
runner, train_cfg = registry.make_runner(env, train_cfg=train_cfg)
print(f"log_dir: {runner.log_dir}", flush=True)

donor = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.ckpt))
dp = donor["params"]
params = jax.device_get(runner.train_state.params)
for head in ("actor", "critic"):
    for i in range(len(params[head])):
        dw, tw = np.asarray(dp[head][i]["w"]), np.asarray(
            params[head][i]["w"])
        assert dw.shape == tw.shape, (
            f"{head}[{i}] shape mismatch {dw.shape} vs {tw.shape}: "
            f"donor/target interface differs, graft is invalid")
        params[head][i]["w"] = jnp.asarray(dw)
        params[head][i]["b"] = jnp.asarray(np.asarray(dp[head][i]["b"]))
params["std"] = jnp.asarray(np.asarray(dp["std"]))
ts = runner.train_state
runner.train_state = TrainState(params=params, opt_state=ts.opt_state,
                                lr=ts.lr, key=ts.key)
print(f"grafted donor policy verbatim; "
      f"std={float(np.asarray(params['std']).mean()):.3f}", flush=True)

runner.learn(train_cfg.runner.max_iterations, init_at_random_ep_len=True)
print("done.", flush=True)
