"""Env smoke harness (reference scripts/test_env.py + tests/test_env.py:
10-env zero-action loop + 1-env sinusoidal thigh sweep with PD-tracking
printout)."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from legged_gym_tpu import registry
from legged_gym_tpu.utils import helpers
from legged_gym_tpu.utils.cache import setup_jax


def smoke(args):
    setup_jax()
    cfg, _ = registry.get_cfgs(args.task)
    cfg.env.num_envs = min(cfg.env.num_envs, args.num_envs or 10)
    env, _ = registry.make_env(cfg=cfg)
    n = cfg.env.num_envs
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)

    # phase 1: zero actions (tests/test_env.py:42-52)
    for i in range(200):
        state, tr = step(state, jnp.zeros((n, env.num_actions)))
    z = np.asarray(state.physics.pos[2])
    print(f"zero-action: base z mean {z.mean():.3f} "
          f"(min {z.min():.3f} max {z.max():.3f}), "
          f"nan-free={bool(np.isfinite(np.asarray(tr.obs)).all())}")

    # phase 2: sinusoidal thigh action on env 0 (scripts/test_env.py:36-53)
    joint = 1
    worst = 0.0
    for i in range(200):
        a = np.zeros((n, env.num_actions), np.float32)
        a[:, joint] = 0.75 * math.sin(2 * math.pi * i / 100.0)
        state, tr = step(state, jnp.asarray(a))
        target = (a[0, joint] * env.cfg.control.action_scale
                  + env.default_dof_pos[joint])
        meas = float(np.asarray(state.physics.q[joint, 0]))
        worst = max(worst, abs(meas - target))
    print(f"sinusoid PD tracking: worst |err| {worst:.3f} rad")
    print("Done")


if __name__ == "__main__":
    smoke(helpers.get_args())
