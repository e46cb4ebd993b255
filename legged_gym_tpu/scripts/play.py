"""Policy evaluation / deployment-export (reference scripts/play.py:33-128):
small env count, flattened terrain curriculum, DR/noise/push disabled,
loads the last checkpoint, exports the policy, rolls out and logs states.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from legged_gym_tpu import registry
from legged_gym_tpu.utils import helpers
from legged_gym_tpu.utils.logger import Logger

EXPORT_POLICY = True


def play(args, num_steps=1000):
    from legged_gym_tpu.utils.cache import setup_jax
    setup_jax()
    env_cfg, train_cfg = registry.get_cfgs(args.task)
    # override for evaluation (play.py:45-58)
    env_cfg.env.num_envs = min(env_cfg.env.num_envs,
                               args.num_envs or 25)
    env_cfg.terrain.num_rows = 5
    env_cfg.terrain.num_cols = 5
    env_cfg.terrain.curriculum = False
    env_cfg.noise.add_noise = False
    env_cfg.domain_rand.randomize_friction = False
    env_cfg.domain_rand.push_robots = False
    env_cfg.domain_rand.randomize_base_mass = False
    env_cfg.domain_rand.randomize_limb_mass = False

    args.num_envs = env_cfg.env.num_envs
    env, _ = registry.make_env(cfg=env_cfg, args=None)

    train_cfg.runner.resume = True
    runner, train_cfg = registry.make_runner(env, train_cfg=train_cfg,
                                             args=args, log_root="default")
    policy = runner.get_inference_policy()

    if EXPORT_POLICY:
        path = os.path.join(helpers.LOG_ROOT,
                            train_cfg.runner.experiment_name, "exported",
                            "policies", "policy.npz")
        runner.export_policy(path)
        print("Exported policy to:", path)

    logger = Logger(env.dt)
    robot_index = 0
    joint_index = 1
    stop_state_log = 100
    stop_rew_log = env.max_episode_length + 1

    record = bool(getattr(args, "record", False))
    rec_frames = []
    rec_steps = int(getattr(args, "record_steps", None) or 250)

    step_fn = jax.jit(env.step)
    state, obs = env.reset(jax.random.PRNGKey(0))
    for i in range(num_steps):
        actions = policy(obs)
        state, tr = step_fn(state, actions)
        obs = tr.obs
        if record and i < rec_steps:
            rec_frames.append((np.asarray(state.physics.pos),
                               np.asarray(state.physics.quat),
                               np.asarray(state.physics.q)))
        elif record and i == rec_steps:
            from legged_gym_tpu.utils.render import render_trajectory
            out = os.path.join(helpers.LOG_ROOT,
                               train_cfg.runner.experiment_name,
                               "exported", "rollout.gif")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            files = render_trajectory(env, rec_frames, out,
                                      env_index=robot_index,
                                      strip_every=10)
            print("Recorded rollout:", ", ".join(files))
        if i < stop_state_log:
            q = np.asarray(state.physics.q)
            qd = np.asarray(state.physics.qd)
            cmds = np.asarray(state.commands)
            blv = np.asarray(state.physics.base_lin_vel())
            bav = np.asarray(state.physics.base_ang_vel())
            taus = np.asarray(tr.torques)
            fz = np.asarray(tr.feet_contact_z)
            logger.log_states({
                "dof_torque": taus[joint_index, robot_index],
                "contact_forces_z": (fz[:, robot_index].sum()
                                     if fz.size else 0.0),
                "power": float(
                    (taus[:, robot_index] * qd[:, robot_index]).sum()),
                "dof_pos_target": float(np.asarray(actions)[robot_index,
                                                            joint_index]
                                        * env.cfg.control.action_scale),
                "dof_pos": q[joint_index, robot_index],
                "dof_vel": qd[joint_index, robot_index],
                "command_x": cmds[0, robot_index],
                "command_y": cmds[1, robot_index],
                "command_yaw": cmds[2, robot_index],
                "base_vel_x": blv[0, robot_index],
                "base_vel_y": blv[1, robot_index],
                "base_vel_z": blv[2, robot_index],
                "base_vel_yaw": bav[2, robot_index],
            })
        elif i == stop_state_log:
            logger.plot_states()
        if i < stop_rew_log:
            done_count = int(np.asarray(tr.episode_count))
            if done_count > 0:
                logger.log_rewards(
                    {k: float(v) for k, v in
                     jax.device_get(tr.episode_sums).items()}, done_count)
        elif i == stop_rew_log:
            logger.print_rewards()


def main():
    """Console-script entry (pyproject.toml lgt-play)."""
    play(helpers.get_args())


if __name__ == "__main__":
    main()
