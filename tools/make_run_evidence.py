"""Render committed run evidence from a training checkpoint.

Loads a checkpoint's raw params (no runner/template needed, so the
policy dims come from the checkpoint itself), rolls the deterministic
policy out in a play-style eval env (noise/DR/push off, curriculum
flattened), reports achieved velocity + terminations, renders gait.gif
+ gait_strip.png, and copies the run's metrics.jsonl + config.json into
docs/runs/<name>/.

    python tools/make_run_evidence.py --task anymal_c_flat \
        --ckpt logs/flat_anymal_c/<run>/model_800.ckpt \
        --out docs/runs/anymal_c_flat_1024 [--vx 0.6] [--cpu]
"""
import argparse
import os
import shutil

p = argparse.ArgumentParser()
p.add_argument("--task", required=True)
p.add_argument("--ckpt", required=True)
p.add_argument("--out", required=True)
p.add_argument("--vx", type=float, default=0.6)
p.add_argument("--steps", type=int, default=250)
p.add_argument("--envs", type=int, default=8)
p.add_argument("--env_index", type=int, default=0)
p.add_argument("--cpu", action="store_true")
p.add_argument("--rough", action="store_true",
               help="rough-terrain flagship overrides (height scan + "
                    "heightfield), as tools/train_flagship.py applies "
                    "for go1")
args = p.parse_args()

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
from legged_gym_tpu.utils.cache import setup_jax  # noqa: E402

setup_jax()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import orbax.checkpoint as ocp  # noqa: E402

from legged_gym_tpu import registry  # noqa: E402
from legged_gym_tpu.rl import networks as nets  # noqa: E402
from legged_gym_tpu.utils.render import render_trajectory  # noqa: E402

cfg, tcfg = registry.get_cfgs(args.task)
cfg.env.num_envs = args.envs
if args.rough:
    cfg.env.num_observations = 235
    cfg.terrain.mesh_type = "heightfield"
    cfg.terrain.measure_heights = True
cfg.terrain.num_rows = 5
cfg.terrain.num_cols = 5
cfg.terrain.curriculum = False
cfg.noise.add_noise = False
cfg.domain_rand.randomize_friction = False
cfg.domain_rand.push_robots = False
cfg.domain_rand.randomize_base_mass = False
cfg.domain_rand.randomize_limb_mass = False
env, cfg = registry.make_env(cfg=cfg)

# restore every leaf as a host numpy array so checkpoints saved on one
# backend (TPU) load on another (CPU render host) without sharding info
ckptr = ocp.PyTreeCheckpointer()
path = os.path.abspath(args.ckpt)
meta_tree = ckptr.metadata(path).item_metadata.tree
restore_args = jax.tree.map(
    lambda m: ocp.RestoreArgs(restore_type=np.ndarray)
    if getattr(m, "shape", None) is not None else ocp.RestoreArgs(),
    meta_tree)
ckpt = ckptr.restore(path, restore_args=restore_args)
params = jax.tree.map(jnp.asarray, ckpt["params"])
act = nets.activation_fn(tcfg.policy.activation)
policy = jax.jit(lambda obs: nets.actor_mean(params, obs, act))
step = jax.jit(env.step)

state, obs = env.reset(jax.random.PRNGKey(0))
state = env.set_commands(state, args.vx, 0.0, 0.0)
frames, dones, vxs = [], 0, []
for t in range(args.steps):
    state, tr = step(state, policy(obs))
    obs = tr.obs
    state = env.set_commands(state, args.vx, 0.0, 0.0)
    frames.append((np.asarray(state.physics.pos),
                   np.asarray(state.physics.quat),
                   np.asarray(state.physics.q)))
    dones += int(np.asarray(tr.done).sum())
    vxs.append(float(np.asarray(state.physics.base_lin_vel()[0]).mean()))

print(f"eval: cmd vx={args.vx} achieved {np.mean(vxs[50:]):.3f} m/s, "
      f"{dones} terminations over {args.steps} steps x {args.envs} envs",
      flush=True)

os.makedirs(args.out, exist_ok=True)
files = render_trajectory(env, frames, os.path.join(args.out, "gait.gif"),
                          env_index=args.env_index, strip_every=25)
print("rendered:", files, flush=True)
run_dir = os.path.dirname(os.path.abspath(args.ckpt))
for f in ("metrics.jsonl", "config.json"):
    src = os.path.join(run_dir, f)
    if os.path.exists(src):
        shutil.copy2(src, os.path.join(args.out, f))
        print("copied", f, flush=True)
