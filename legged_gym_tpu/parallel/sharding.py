"""Multi-chip scaling: shard the env axis over a device mesh.

The reference's only parallelism is the env batch on one GPU (its
--horovod flag is dead code, helpers.py:162; SURVEY.md §2.4). Here the env
axis is a first-class mesh axis: physics state / env state tensors are
batch-LAST, so they shard on their last dimension; policy-boundary arrays
(obs, actions, per-env scalars) are batch-first and shard on their first
dimension. Model params and optimizer state are replicated.

XLA's SPMD partitioner then propagates shardings through the fused
train step: per-env physics/rewards stay local to each chip, while the
few global reductions (advantage normalization, metric means, the global
command-curriculum decision — legged_robot.py:472-474) become psums over
ICI automatically. Gradients reduce via psum in the PPO update.
Multi-host: call jax.distributed.initialize() first; the same code runs
with a global mesh (DCN between hosts).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def init_multihost(coordinator_address=None, num_processes=None,
                   process_id=None):
    """Join a multi-host run via ``jax.distributed.initialize`` — the
    live replacement for the reference's dead ``--horovod`` flag
    (helpers.py:162). With no arguments, coordination is taken from the
    cluster environment (TPU pod metadata / JAX_COORDINATOR_ADDRESS);
    on GPU-style clusters pass all three explicitly. After this,
    ``env_mesh()`` with no args builds the GLOBAL mesh over every chip
    of every host and the same sharded train step runs SPMD across
    hosts (collectives ride ICI within a slice, DCN between slices).

    Returns (process_index, process_count)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def env_mesh(n_devices=None, devices=None):
    """1-D mesh over the env axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ENV_AXIS,))


def _spec_for(x, num_envs, batch_last):
    if not hasattr(x, "ndim") or x.ndim == 0:
        return P()
    if batch_last and x.shape[-1] == num_envs:
        return P(*([None] * (x.ndim - 1) + [ENV_AXIS]))
    if not batch_last and x.shape[0] == num_envs:
        return P(ENV_AXIS, *([None] * (x.ndim - 1)))
    return P()


def shard_env_state(state, mesh, num_envs):
    """Place an EnvState (batch-last pytree) on the mesh: arrays whose
    last axis is the env axis are sharded, everything else replicated."""
    def place(x):
        spec = _spec_for(x, num_envs, batch_last=True)
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(place, state)


def shard_batch(x, mesh):
    """Place a batch-first array (obs/actions) with the env axis first."""
    def place(a):
        spec = P(ENV_AXIS, *([None] * (a.ndim - 1))) if a.ndim else P()
        return jax.device_put(a, NamedSharding(mesh, spec))
    return jax.tree.map(place, x)


def replicate(x, mesh):
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), x)
