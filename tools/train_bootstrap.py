"""Two-phase bootstrap training for reward-starved robots (ANYmal).

ANYmal's ~87 N*m/rad SEA drive sags under exploration until SHANK
collision points scuff, and the collision + lin_vel_z penalties then
zero-clip the total reward (only_positive_rewards) over most of the
visited state space. PPO's surrogate gradient dies there while the
entropy bonus keeps inflating the action std (measured: 1.0 -> 2.5 over
800 iters, tracking peaked 0.18 at iter 80 then collapsed) — the
early-termination spiral that only_positive_rewards exists to prevent
appears here in its mirror form.

Cure: phase 1 trains with only_positive_rewards=False so the penalties
themselves carry gradient (away from shank scuffing, vertical bounce and
termination — the exact behaviors that unlock the positive regime),
with a termination penalty to close the die-early loophole; phase 2
restores the registered (reference-parity) reward config and continues
from the phase-1 policy in-process.

    python tools/train_bootstrap.py --task anymal_c_flat \
        [--envs 1024] [--iters1 400] [--iters2 800]
"""
import argparse

p = argparse.ArgumentParser()
p.add_argument("--task", type=str, default="anymal_c_flat")
p.add_argument("--envs", type=int, default=1024)
p.add_argument("--iters1", type=int, default=400)
p.add_argument("--iters2", type=int, default=800)
p.add_argument("--seed", type=int, default=1)
p.add_argument("--run_name", type=str, default="bootstrap")
p.add_argument("--cpu", action="store_true")
p.add_argument("--wide_nets", action="store_true",
               help="rough-size [512,256,128] nets (graftable donor)")
p.add_argument("--save_interval", type=int, default=200)
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
    cfg, tcfg = registry.get_cfgs(args.task)
    cfg.env.num_envs = args.envs
    if args.wide_nets:
        tcfg.policy.actor_hidden_dims = [512, 256, 128]
        tcfg.policy.critic_hidden_dims = [512, 256, 128]
    tcfg.runner.save_interval = args.save_interval
    if phase == 1:
        cfg.rewards.only_positive_rewards = False
        # close the die-early loophole negative totals open
        cfg.rewards.scales["termination"] = -2.0
        tcfg.runner.max_iterations = args.iters1
        tcfg.runner.run_name = f"{args.run_name}_p1"
    else:
        tcfg.runner.max_iterations = args.iters2
        tcfg.runner.run_name = f"{args.run_name}_p2"
    env, _ = registry.make_env(cfg=cfg, seed=args.seed)
    runner, tcfg = registry.make_runner(env, train_cfg=tcfg)
    return runner, tcfg


runner1, tcfg1 = make(1)
print(f"phase 1 (only_positive=False) log_dir: {runner1.log_dir}",
      flush=True)
runner1.learn(tcfg1.runner.max_iterations, init_at_random_ep_len=True)

runner2, tcfg2 = make(2)
runner2.train_state = runner1.train_state
std = float(np.asarray(jax.device_get(
    runner1.train_state.params["std"])).mean())
print(f"phase 2 (registered rewards) log_dir: {runner2.log_dir}; "
      f"carried std={std:.3f}", flush=True)
runner2.learn(tcfg2.runner.max_iterations, init_at_random_ep_len=True)
print("done.", flush=True)
