"""Standing-quality regression across robot families.

Guards the round-1/round-2 failure class where a physics artifact
(soft contact mass, capped static support force, spawn penetration)
makes a robot sag/sink until penalized collision bodies touch the
ground, which zeroes the whole reward under only_positive_rewards and
silently flatlines training. Asserts, per robot: settles standing, no
terminations, no collision penalty, positive per-step reward.

(aliengo is excluded: known limitation — capped regularized friction
creeps laterally under its wide straight stance; see engine.py notes.)
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_gym_tpu import registry

ROBOTS = ["go1", "a1", "a1_src", "anymal_c_flat"]


@pytest.mark.parametrize("task", ROBOTS)
def test_stands_clean(task):
    cfg, _ = registry.get_cfgs(task)
    cfg.env.num_envs = 8
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.measure_heights = False
    cfg.env.num_observations = 48
    for f in ("randomize_friction", "randomize_base_mass",
              "randomize_limb_mass", "push_robots"):
        setattr(cfg.domain_rand, f, False)
    cfg.noise.add_noise = False
    env, cfg = registry.make_env(cfg=cfg)
    state, _ = env.reset(jax.random.PRNGKey(0))
    za = jnp.zeros((env.num_envs, env.num_actions))

    @jax.jit
    def roll(s):
        def body(c, _):
            c, tr = env.step(c, za)
            return c, (tr.reward, tr.done, c.physics.qd)
        return jax.lax.scan(body, s, None, length=60)

    state, (rew, done, qd) = roll(state)

    # settled window = last 20 steps
    qd_tail = np.abs(np.asarray(qd[-20:]))
    assert qd_tail.mean() < 0.15, f"{task}: standing jitter {qd_tail.mean()}"
    assert not np.asarray(done[-20:]).any(), f"{task}: terminations at stand"
    assert np.asarray(rew[-20:]).mean() > 1e-4, (
        f"{task}: no positive standing reward "
        f"({np.asarray(rew[-20:]).mean():.2e}) — collision penalty or "
        f"zero-clip regression")
    z = np.asarray(state.physics.pos[2])
    assert np.isfinite(z).all() and (z > 0.15).all(), f"{task}: fell (z={z})"
