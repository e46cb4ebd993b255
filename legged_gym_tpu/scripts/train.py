"""Training entry point (reference scripts/train.py:33-47).

    python -m legged_gym_tpu.scripts.train --task go1 --num_envs 1800
"""
from legged_gym_tpu import registry
from legged_gym_tpu.utils import helpers
from legged_gym_tpu.utils.cache import setup_jax


def train(args):
    setup_jax()
    helpers.set_seed(args.seed if args.seed is not None else 1)
    env, env_cfg = registry.make_env(name=args.task, args=args)
    runner, train_cfg = registry.make_runner(env, name=args.task, args=args)
    runner.learn(train_cfg.runner.max_iterations,
                 init_at_random_ep_len=True)


if __name__ == "__main__":
    train(helpers.get_args())
