"""Diagnostic: physics quality + reward magnitudes for a standing Go1.

Usage: python tools/diag_standing.py [--substeps N] [--envs N] [--steps N]
       [--tpu] [--random-actions]
Runs flat-terrain Go1 with zero (or random) actions and reports:
- base height / lin vel / ang vel / qd statistics over time (jitter)
- per-term scaled reward means (what PPO actually sees)
- obs block min/max (to spot unnormalized blowups)
"""
import argparse, sys
import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--substeps", type=int, default=None)
p.add_argument("--envs", type=int, default=64)
p.add_argument("--steps", type=int, default=100)
p.add_argument("--tpu", action="store_true")
p.add_argument("--random-actions", action="store_true")
p.add_argument("--zero-cmd", action="store_true", help="force zero commands")
p.add_argument("--task", type=str, default="go1")
p.add_argument("--baumgarte", type=float, default=None)
p.add_argument("--safety", type=float, default=None)
args = p.parse_args()

import jax
if not args.tpu:
    # must happen BEFORE any backend touch (setup_jax calls
    # jax.default_backend, which would initialize the axon client)
    jax.config.update("jax_platforms", "cpu")
from legged_gym_tpu.utils.cache import setup_jax
setup_jax()
import jax.numpy as jnp
from legged_gym_tpu import registry

if args.baumgarte is not None:
    from legged_gym_tpu.physics.contact import ContactConfig
    from legged_gym_tpu.envs import legged_env as _LE
    _LE.LeggedEnv._default_contact = staticmethod(
        lambda: ContactConfig(baumgarte=args.baumgarte))
if args.safety is not None:
    from legged_gym_tpu.physics.engine import Engine as _E
    _orig_cal = _E.calibrate_contact_mass
    _E.calibrate_contact_mass = (
        lambda self, q0, fn, safety=args.safety: _orig_cal(self, q0, fn,
                                                           safety))

cfg, _ = registry.get_cfgs(args.task)
cfg.env.num_envs = args.envs
cfg.terrain.mesh_type = "plane"
cfg.terrain.measure_heights = False
cfg.env.num_observations = 48
cfg.terrain.curriculum = False
cfg.commands.curriculum = False
cfg.domain_rand.push_robots = False
cfg.noise.add_noise = False
if args.substeps is not None:
    cfg.sim.substeps = args.substeps
env, _ = registry.make_env(cfg=cfg)
n = env.num_envs
print(f"backend={jax.default_backend()} envs={n} substeps={cfg.sim.substeps} "
      f"decimation={cfg.control.decimation}", flush=True)

state, obs = env.reset(jax.random.PRNGKey(0))
if args.zero_cmd:
    state = env.set_commands(state, 0.0, 0.0, 0.0)

import dataclasses
def rollout(state, key, nsteps):
    def body(carry, _):
        state, key = carry
        key, k = jax.random.split(key)
        if args.random_actions:
            a = jax.random.normal(k, (n, env.num_actions), jnp.float32)
        else:
            a = jnp.zeros((n, env.num_actions), jnp.float32)
        state, tr = env.step(state, a)
        out = dict(
            z=state.physics.pos[2], vlin=state.physics.base_lin_vel(),
            vang=state.physics.base_ang_vel(), qd=state.physics.qd,
            rew=tr.reward, done=tr.done,
            ep_sums={k2: v for k2, v in tr.episode_sums.items()},
        )
        return (state, key), out
    (state, _), outs = jax.lax.scan(body, (state, key), None, length=nsteps)
    return state, outs

rollout_j = jax.jit(rollout, static_argnums=2)
state, outs = rollout_j(state, jax.random.PRNGKey(1), args.steps)
outs = jax.tree.map(np.asarray, outs)

T = args.steps
half = T // 2  # settle transient, report second half
z = outs["z"][half:]; vl = outs["vlin"][half:]; va = outs["vang"][half:]
qd = outs["qd"][half:]
print(f"\n-- settled stats (steps {half}..{T}) --")
print(f"base z:      mean={z.mean():.4f}  std={z.std():.4f}  min={z.min():.4f} max={z.max():.4f}")
print(f"|lin_vel|:   mean={np.abs(vl).mean():.4f}  p99={np.percentile(np.abs(vl),99):.4f} max={np.abs(vl).max():.4f}")
print(f"|ang_vel|:   mean={np.abs(va).mean():.4f}  p99={np.percentile(np.abs(va),99):.4f} max={np.abs(va).max():.4f}")
print(f"|qd|:        mean={np.abs(qd).mean():.4f}  p99={np.percentile(np.abs(qd),99):.4f} max={np.abs(qd).max():.4f}")
print(f"done frac/step: {outs['done'][half:].mean():.4f}")
print(f"reward/step (post-clip): mean={outs['rew'][half:].mean():.6f}")

# per-term scaled reward per step: episode_sums are already scaled sums of
# done envs / max_s; instead recompute from one extra step context... use
# deltas: run 1 more step and print tr episode term means is messy. Instead
# use env internals: step once and print per-term scaled reward directly.
from legged_gym_tpu.envs import legged_env as LE
a = jnp.zeros((n, env.num_actions), jnp.float32)
orig = LE.LeggedEnv._reward
def cap_step(state):
    captured = {}
    def cap(self, name, ctx):
        r = orig(self, name, ctx)
        captured[name] = r
        return r
    LE.LeggedEnv._reward = cap
    try:
        state2, tr = env.step(state, a)
    finally:
        LE.LeggedEnv._reward = orig
    return tr, captured
tr, captured = jax.jit(cap_step)(state)
print("\n-- per-term reward/step (scaled), single step after settling --")
tot = 0.0
for name in sorted(captured):
    v = float(np.asarray(captured[name]).mean()) * env.reward_scales[name]
    tot += v
    print(f"  {name:22s} {v:+.6f}")
print(f"  {'TOTAL(pre-clip)':22s} {tot:+.6f}")

print("\n-- obs stats --")
o = np.asarray(tr.obs)
print(f"obs: shape={o.shape} min={o.min():.2f} max={o.max():.2f} absmean={np.abs(o).mean():.3f} p99.9={np.percentile(np.abs(o),99.9):.2f}")
