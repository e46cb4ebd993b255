"""Diagnose why anymal_c_flat gets ~zero reward / collapsing episodes in
PPO while go1 (same pipeline) converges. Prints per-reward-term means,
base-height trace, torque stats and termination counts under (a) zero
actions, (b) exploration-scale random actions — for both the SEA-net
drive and the PD fallback.

Run on CPU: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/diag_anymal.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from legged_gym_tpu import registry


def build(task="anymal_c_flat", use_net=True):
    cfg, _ = registry.get_cfgs(task)
    cfg.env.num_envs = 8
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.measure_heights = False
    cfg.env.num_observations = 48
    for f in ("randomize_friction", "randomize_base_mass",
              "randomize_limb_mass", "push_robots"):
        setattr(cfg.domain_rand, f, False)
    cfg.noise.add_noise = False
    cfg.control.use_actuator_network = use_net
    env, cfg = registry.make_env(cfg=cfg)
    return env


def roll(env, steps, act_std, seed=0, vx=0.0):
    state, _ = env.reset(jax.random.PRNGKey(seed))
    state = env.set_commands(state, vx, 0.0, 0.0)
    key = jax.random.PRNGKey(seed + 1)

    @jax.jit
    def run(s, k):
        def body(c, kk):
            s, k = c
            a = act_std * jax.random.normal(
                kk, (env.num_envs, env.num_actions))
            s, tr = env.step(s, a)
            return (s, k), (tr.reward, tr.done, s.physics.pos[2],
                            tr.torques, s.episode_sums)
        keys = jax.random.split(k, steps)
        (s, _), out = jax.lax.scan(body, (s, k), keys)
        return s, out

    return run(state, key)


def report(name, env, steps=150, act_std=0.0, vx=0.0):
    state, (rew, done, z, tau, sums) = roll(env, steps, act_std, vx=vx)
    rew, done, z = map(np.asarray, (rew, done, z))
    tau = np.asarray(tau)
    print(f"\n=== {name} (std={act_std}, vx={vx}) ===")
    print(f"reward/step: {rew.mean():.5f}  terminations: {done.sum()}  "
          f"z: start {z[0].mean():.3f} end {z[-1].mean():.3f} "
          f"min {z.min():.3f}")
    print(f"|tau| mean {np.abs(tau).mean():.1f}  max {np.abs(tau).max():.1f}")
    # per-term mean contribution per step (episode_sums accumulate; take
    # last-step sums / steps — resets zero them, so only roughly right,
    # fine for sign/magnitude)
    terms = {k: float(np.asarray(v).mean()) / steps
             for k, v in jax.tree.map(lambda x: x[-1], sums).items()}
    for k in sorted(terms, key=lambda k: terms[k]):
        if abs(terms[k]) > 1e-6:
            print(f"  {k:24s} {terms[k]:+.5f}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "sea"):
        env = build(use_net=True)
        report("anymal SEA zero-action", env)
        report("anymal SEA explore", env, act_std=0.5)
        report("anymal SEA cmd 0.5", env, act_std=0.3, vx=0.5)
    if which in ("all", "pd"):
        env = build(use_net=False)
        report("anymal PD zero-action", env)
        report("anymal PD explore", env, act_std=0.5)
    if which in ("all", "go1"):
        env = build("go1", use_net=False)
        report("go1 PD zero-action", env)
        report("go1 PD explore", env, act_std=0.5)
