"""legged_gym_tpu — a TPU-native legged-robot rollout / RL / trajectory-optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Unitree's
``legged_gym`` (massively-parallel locomotion RL in Isaac Gym):

- articulated rigid-body physics (Featherstone ABA) as a pure, jitted,
  shardable function — no black-box engine, no host<->device crossings in
  the hot loop;
- batch-LAST ("structure of arrays") state layout so the env axis lives in
  TPU vector lanes at full occupancy;
- terrain, rewards, curricula, domain randomization, resets all inside jit
  (masked, fixed-shape, RNG-keyed);
- PPO and sampling-MPC consuming the same step function;
- multi-chip scaling via jax.sharding / shard_map over the env axis.

Reference behavioral spec: zerenluo123/legged_gym (see SURVEY.md).
"""
import os

LEGGED_GYM_TPU_ROOT_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEGGED_GYM_TPU_ENVS_DIR = os.path.join(LEGGED_GYM_TPU_ROOT_DIR, "legged_gym_tpu", "envs")

__version__ = "0.1.0"
