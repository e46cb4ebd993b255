"""Diagnostic: vertical-bounce energy on rough terrain (the lin_vel_z
signal that swamped the r3 flagship run). Go1, zero actions, heightfield
with both curricula off, spawns across terrain types; reports mean
lin_vel_z^2 and per-term reward magnitudes.

    python tools/diag_rough_bounce.py [--tpu] [--steps 150] [--envs 64]
"""
import argparse

p = argparse.ArgumentParser()
p.add_argument("--tpu", action="store_true")
p.add_argument("--envs", type=int, default=64)
p.add_argument("--steps", type=int, default=150)
args = p.parse_args()

import jax  # noqa: E402

if not args.tpu:
    jax.config.update("jax_platforms", "cpu")
from legged_gym_tpu.utils.cache import setup_jax  # noqa: E402

setup_jax()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from legged_gym_tpu import registry  # noqa: E402

cfg, _ = registry.get_cfgs("go1")
cfg.env.num_envs = args.envs
cfg.env.num_observations = 235
cfg.terrain.mesh_type = "heightfield"
cfg.terrain.measure_heights = True
cfg.terrain.curriculum = True          # spawn rows = curriculum layout
cfg.noise.add_noise = False
cfg.domain_rand.push_robots = False
env, _ = registry.make_env(cfg=cfg)
state, _ = env.reset(jax.random.PRNGKey(0))
state = env.set_commands(state, 0.0, 0.0, 0.0)
n = env.num_envs


def body(s, _):
    s, tr = env.step(s, jnp.zeros((n, env.num_actions), jnp.float32))
    blv = s.physics.base_lin_vel()
    return s, dict(vz2=jnp.mean(blv[2] ** 2), rew=tr.reward.mean(),
                   done=tr.done.mean(), z=s.physics.pos[2].mean(),
                   qd=jnp.mean(jnp.abs(s.physics.qd)))


state, o = jax.jit(
    lambda s: jax.lax.scan(body, s, None, length=args.steps))(state)
o = jax.tree.map(np.asarray, o)
h = args.steps // 2
print(f"vz2 mean (settled): {o['vz2'][h:].mean():.5f} (m/s)^2 "
      f"-> lin_vel_z episode rate ~ {-2.0 * o['vz2'][h:].mean() * 50:.2f}/s")
print(f"|qd| mean: {o['qd'][h:].mean():.4f}  done/step: "
      f"{o['done'][h:].mean():.4f}  rew/step: {o['rew'][h:].mean():.5f}")
