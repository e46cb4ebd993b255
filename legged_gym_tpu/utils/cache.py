"""Persistent XLA compilation cache: the fused env/train step is a large
program (~2-4 min cold compile on CPU backends); caching makes every
subsequent process start instantly. Call once before first jit."""
import os


def enable_compilation_cache(path=None):
    import jax
    path = path or os.environ.get(
        "LEGGED_GYM_TPU_CACHE",
        os.path.expanduser("~/.cache/legged_gym_tpu_xla"))
    # separate cache per backend: XLA:CPU AOT artifacts embed machine
    # features and poison caches shared across backend configs
    path = os.path.join(path, jax.default_backend())
    os.makedirs(path, exist_ok=True)
    _seed_from_repo(path, jax.default_backend())
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


def _seed_from_repo(path, backend):
    """Copy committed compile-cache entries (tools/seed_cache/<backend>/)
    into the live cache dir. The first TPU compile of the 1800-env bench
    program takes ~10-15 min on this host's remote compile service —
    far over any benchmark timeout — so the end-of-round ritual re-runs
    bench.py against final code and commits the resulting entries;
    a fresh machine/cache then starts warm. Stale entries (different
    code/jaxlib) simply never get cache hits and cost nothing."""
    import shutil
    seed = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))),
        "tools", "seed_cache", backend)
    if not os.path.isdir(seed):
        return
    for name in os.listdir(seed):
        dst = os.path.join(path, name)
        if not os.path.exists(dst):
            try:
                shutil.copy2(os.path.join(seed, name), dst)
            except OSError:
                pass


def setup_jax(matmul_precision="highest", cache=True):
    """Framework JAX defaults: persistent compile cache + full-f32 matmul
    precision (TPU matmuls default to bf16, which is too coarse for
    physics state and PPO ratio math; 'highest' = 6-pass bf16 ~ f32).

    NOTE: do NOT try to raise xla_tpu_scoped_vmem_limit_kib via
    XLA_FLAGS here — the CPU-client jaxlib build aborts on unknown TPU
    flags (measured: F parse_flags_from_env). The mega-kernel's VMEM
    headroom is granted per-kernel via CompilerParams(vmem_limit_bytes)
    in physics/pallas_step.py instead."""
    import jax
    if cache:
        enable_compilation_cache()
    if matmul_precision:
        jax.config.update("jax_default_matmul_precision", matmul_precision)
