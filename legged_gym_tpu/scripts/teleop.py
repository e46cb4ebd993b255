"""Interactive teleop: drive a trained policy with the keyboard
(the ROS-free analog of the reference's play_joy.py:15-217 — /joy
messages become WASD/QE keys; the ~50 ROS debug topics become a live
status line; commands flow through env.set_commands, the
_change_cmds equivalent).

Keys: w/s = +/- vx, a/d = +/- vy, q/e = +/- yaw rate, space = stop,
x = quit. Requires a TTY.
"""
import select
import sys
import termios
import tty

import jax
import numpy as np

from legged_gym_tpu import registry
from legged_gym_tpu.utils import helpers
from legged_gym_tpu.utils.cache import setup_jax

VX_STEP, VY_STEP, WZ_STEP = 0.1, 0.1, 0.1


def _read_key(timeout=0.0):
    if select.select([sys.stdin], [], [], timeout)[0]:
        return sys.stdin.read(1)
    return None


def teleop(args):
    setup_jax()
    env_cfg, train_cfg = registry.get_cfgs(args.task)
    env_cfg.env.num_envs = 1
    env_cfg.noise.add_noise = False
    env_cfg.domain_rand.push_robots = False
    env_cfg.commands.heading_command = False
    env_cfg.commands.resampling_time = 1e9   # manual commands only
    env, _ = registry.make_env(cfg=env_cfg)

    train_cfg.runner.resume = True
    runner, _ = registry.make_runner(env, train_cfg=train_cfg, args=args)
    policy = runner.get_inference_policy()
    step = jax.jit(env.step)

    state, obs = env.reset(jax.random.PRNGKey(0))
    vx = vy = wz = 0.0

    old = termios.tcgetattr(sys.stdin)
    tty.setcbreak(sys.stdin.fileno())
    try:
        while True:
            k = _read_key()
            if k == "x":
                break
            elif k == "w":
                vx += VX_STEP
            elif k == "s":
                vx -= VX_STEP
            elif k == "a":
                vy += VY_STEP
            elif k == "d":
                vy -= VY_STEP
            elif k == "q":
                wz += WZ_STEP
            elif k == "e":
                wz -= WZ_STEP
            elif k == " ":
                vx = vy = wz = 0.0
            state = env.set_commands(state, vx, vy, wz)
            state, tr = step(state, policy(obs))
            obs = tr.obs
            blv = np.asarray(state.physics.base_lin_vel())[:, 0]
            print(f"\rcmd ({vx:+.1f} {vy:+.1f} {wz:+.1f}) "
                  f"vel ({blv[0]:+.2f} {blv[1]:+.2f}) "
                  f"z {float(np.asarray(state.physics.pos[2, 0])):.2f}  ",
                  end="", flush=True)
    finally:
        termios.tcsetattr(sys.stdin, termios.TCSADRAIN, old)
        print()


if __name__ == "__main__":
    teleop(helpers.get_args())
