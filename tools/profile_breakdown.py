"""Ablation profiler for the bench config: times the full step and
variants with individual subsystems disabled, to locate the residual
costs (VERDICT r2 next-steps #1: find the ~5% win).

Run on the real chip: python tools/profile_breakdown.py
"""
import time

import numpy as np

from legged_gym_tpu.utils.cache import setup_jax

setup_jax()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from legged_gym_tpu import registry  # noqa: E402

NUM_ENVS = 1800
N_STEPS = 50


def build_env(*overrides):
    cfg, _ = registry.get_cfgs("go1")
    cfg.env.num_envs = NUM_ENVS
    cfg.env.num_observations = 235
    cfg.terrain.mesh_type = "heightfield"
    cfg.terrain.measure_heights = True
    cfg.terrain.curriculum = True
    for k, v in zip(overrides[::2], overrides[1::2]):
        parts = k.split(".")
        o = cfg
        for p in parts[:-1]:
            o = getattr(o, p)
        setattr(o, parts[-1], v)
    env, _ = registry.make_env(cfg=cfg)
    return env


def time_rollout(env, label, mutate=None):
    if mutate:
        mutate(env)
    n = env.num_envs

    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            actions = jax.random.normal(k, (n, env.num_actions),
                                        jnp.float32)
            state, tr = env.step(state, actions)
            return (state, key), tr.reward.mean()

        (state, key), rews = jax.lax.scan(body, (state, key), None,
                                          length=N_STEPS)
        return state, rews.mean()

    rollout = jax.jit(rollout)
    state, _ = env.reset(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    state, r = rollout(state, key)
    float(np.asarray(r))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        state, r = rollout(state, key)
        float(np.asarray(r))
        best = min(best, time.perf_counter() - t0)
    ms = best / N_STEPS * 1e3
    rate = n * N_STEPS / best
    print(f"{label:34s} {ms:7.3f} ms/step  {rate/1e3:8.1f}k steps/s")
    return ms


def main():
    base = time_rollout(build_env(), "full step (bench)")

    # physics only: chain kernel in a scan, fixed targets, static patch
    env = build_env()
    ce = env.chain_engine
    state, _ = env.reset(jax.random.PRNGKey(0))
    phys0, lp, fric = state.physics, state.link_params, state.friction
    cpatch = (state.patch_T[8:32, 8:32], state.patch_r0 + 8,
              state.patch_c0 + 8)
    tgt = jnp.asarray(env.default_dof_pos, jnp.float32)[:, None] \
        * jnp.ones((1, env.num_envs), jnp.float32)

    def phys_roll(phys):
        def body(p, _):
            p, tau, bf = ce.step_decimation_pos(
                p, lp, fric, tgt, use_pallas=True, contact_patch=cpatch)
            return p, tau.mean()
        p, taus = jax.lax.scan(body, phys, None, length=N_STEPS)
        return p, taus.mean()

    phys_roll = jax.jit(phys_roll)
    p, r = phys_roll(phys0)
    float(np.asarray(r))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        p, r = phys_roll(phys0)
        float(np.asarray(r))
        best = min(best, time.perf_counter() - t0)
    ms = best / N_STEPS * 1e3
    print(f"{'physics kernel only':34s} {ms:7.3f} ms/step")

    time_rollout(build_env(), "no patch refresh (stale cache)",
                 mutate=lambda e: setattr(e, "patch_refresh", 10 ** 9))
    time_rollout(build_env("terrain.measure_heights", False,
                           "env.num_observations", 48),
                 "no height scan (48-dim obs)")
    time_rollout(build_env("noise.add_noise", False), "no obs noise")
    time_rollout(build_env("domain_rand.push_robots", False), "no pushes")

    def no_rewards(e):
        e.reward_names = []
        e.reward_scales = {k: v for k, v in e.reward_scales.items()
                           if k == "termination"}
    time_rollout(build_env(), "no reward terms", mutate=no_rewards)

    def no_reset_draw(e):
        orig = e._draw_reset_physics
        e._draw_reset_physics = lambda key, origins: orig(
            jax.random.PRNGKey(0), origins)
    time_rollout(build_env(), "cheap reset-draw rng", mutate=no_reset_draw)
    time_rollout(build_env("terrain.curriculum", False), "no terrain curriculum")
    print(f"base: {base:.3f} ms")


if __name__ == "__main__":
    main()
