"""Training entry point (reference scripts/train.py:33-47).

    python -m legged_gym_tpu.scripts.train --task go1 --num_envs 1800
"""
from legged_gym_tpu import registry
from legged_gym_tpu.utils import helpers
from legged_gym_tpu.utils.cache import setup_jax


def train(args):
    setup_jax()
    mesh = None
    if getattr(args, "multihost", False):
        # replaces the reference's dead --horovod flag (helpers.py:162)
        from legged_gym_tpu.parallel import init_multihost
        pid, pn = init_multihost(args.coordinator_address,
                                 args.num_processes, args.process_id)
        print(f"multihost: process {pid}/{pn}, "
              f"{len(__import__('jax').devices())} global devices")
    if getattr(args, "shard", False) or getattr(args, "multihost", False):
        from legged_gym_tpu.parallel import env_mesh
        mesh = env_mesh()
    helpers.set_seed(args.seed if args.seed is not None else 1)
    env, env_cfg = registry.make_env(name=args.task, args=args)
    runner, train_cfg = registry.make_runner(env, name=args.task,
                                             args=args, mesh=mesh)
    runner.learn(train_cfg.runner.max_iterations,
                 init_at_random_ep_len=True)


def main():
    """Console-script entry (pyproject.toml lgt-train)."""
    train(helpers.get_args())


if __name__ == "__main__":
    main()
