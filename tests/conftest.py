"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run without TPU hardware (and numerics are
exact f32 — the TPU backend defaults matmuls to bf16). Bench/scripts use
the real chip.

NOTE: this environment pins JAX_PLATFORMS=axon at interpreter start, so
the env var cannot be overridden from inside a process; use
jax.config.update("jax_platforms", ...) instead (it wins after import).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from legged_gym_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
