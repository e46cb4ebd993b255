"""Microbench: per-env terrain-window extraction strategies on the real
chip. The refresh (vmap'd dynamic_slice) costs ~2.7 ms per call at 1920
envs = 0.68 ms/step amortized — the biggest non-physics cost in the
bench step (tools/profile_breakdown.py). Find a faster primitive.
"""
import time

import numpy as np

from legged_gym_tpu.utils.cache import setup_jax

setup_jax()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = 1920
S = 40
R, C = 1320, 2120
G = jnp.asarray(np.random.rand(R, C).astype(np.float32))
rng = np.random.default_rng(0)
r0 = jnp.asarray(rng.integers(0, R - 2 * S, N).astype(np.int32))
c0 = jnp.asarray(rng.integers(0, C - 2 * S, N).astype(np.int32))


REPS = 20   # loop the op inside one program so launch overhead and the
#             scalar fetch amortize away


def timeit(label, fn, *args):
    def run(*a):
        def body(carry, _):
            out = fn(*[x + carry.astype(x.dtype) for x in a])
            s = jnp.sum(out)
            return (s * 0).astype(jnp.int32), s
        carry, sums = jax.lax.scan(body, jnp.int32(0), None,
                                   length=REPS)
        return sums.sum()

    f = jax.jit(run)
    float(np.asarray(f(*args)))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        float(np.asarray(f(*args)))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:44s} {best/REPS*1e3:8.3f} ms")
    return jax.jit(fn)(*args)


# 1. current: vmap'd dynamic_slice
def v_dynslice(r0, c0):
    return jax.vmap(lambda r, c: jax.lax.dynamic_slice(G, (r, c), (S, S))
                    )(r0, c0)


# 2. advanced-indexing gather (N, S, S)
def v_advidx(r0, c0):
    ii = r0[:, None, None] + jnp.arange(S)[None, :, None]
    jj = c0[:, None, None] + jnp.arange(S)[None, None, :]
    return G[ii, jj]


# 3. row gather then column gather on flattened rows
def v_rowcol(r0, c0):
    rows = jnp.take(G, r0[:, None] + jnp.arange(S)[None, :],
                    axis=0)                     # (N, S, C)
    cols = c0[:, None, None] + jnp.arange(S)[None, None, :]
    return jnp.take_along_axis(rows, jnp.broadcast_to(cols, (N, S, S)),
                               axis=2)


# 4. two-level: block table gather (whole rows) + in-block matmul crop.
BS = S  # block stride = window size; superwindow 2S x 2S
nbr = -(-R // BS)
nbc = -(-C // BS)
Gp = jnp.pad(G, ((0, nbr * BS + S - R), (0, nbc * BS + S - C)))
blocks = jnp.stack([
    jax.lax.dynamic_slice(Gp, (br * BS, bc * BS), (2 * S, 2 * S)).ravel()
    for br in range(nbr) for bc in range(nbc)])      # (nb, 4*S*S)


def v_blocks(r0, c0):
    br = r0 // BS
    bc = c0 // BS
    fine_r = r0 - br * BS
    fine_c = c0 - bc * BS
    sw = jnp.take(blocks, br * nbc + bc, axis=0).reshape(N, 2 * S, 2 * S)
    # crop via one-hot matmuls: rows then cols
    iota = jnp.arange(2 * S)
    er = (iota[None, None, :] == (fine_r[:, None, None]
                                  + jnp.arange(S)[None, :, None])
          ).astype(jnp.float32)                      # (N, S, 2S)
    ec = (iota[None, None, :] == (fine_c[:, None, None]
                                  + jnp.arange(S)[None, :, None])
          ).astype(jnp.float32)                      # (N, S, 2S)
    t = jnp.einsum("nsr,nrc->nsc", er, sw,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("ntc,nsc->nst", ec, t,
                      preferred_element_type=jnp.float32)


# 5. one-hot against a per-cell static window table (the reset path's
# trick, for calibration: n_cells=200)
n_cells = 200
cells_t = jnp.asarray(np.random.rand(n_cells, S * S).astype(np.float32))
cell_idx = jnp.asarray(rng.integers(0, n_cells, N).astype(np.int32))


def v_cells(idx):
    onehot = (idx[:, None] == jnp.arange(n_cells)[None, :]
              ).astype(jnp.float32)
    return (onehot @ cells_t).reshape(N, S, S)


# 6. gather blocks via one-hot matmul instead of take (nb ~ 1800)
def v_blocks_mm(r0, c0):
    br = r0 // BS
    bc = c0 // BS
    fine_r = r0 - br * BS
    fine_c = c0 - bc * BS
    idx = br * nbc + bc
    onehot = (idx[:, None] == jnp.arange(blocks.shape[0])[None, :]
              ).astype(jnp.float32)
    sw = (onehot @ blocks).reshape(N, 2 * S, 2 * S)
    iota = jnp.arange(2 * S)
    er = (iota[None, None, :] == (fine_r[:, None, None]
                                  + jnp.arange(S)[None, :, None])
          ).astype(jnp.float32)
    ec = (iota[None, None, :] == (fine_c[:, None, None]
                                  + jnp.arange(S)[None, :, None])
          ).astype(jnp.float32)
    t = jnp.einsum("nsr,nrc->nsc", er, sw,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("ntc,nsc->nst", ec, t,
                      preferred_element_type=jnp.float32)


a = timeit("1 vmap dynamic_slice (current)", v_dynslice, r0, c0)
b = timeit("2 advanced-index gather", v_advidx, r0, c0)
print("   match:", bool(jnp.allclose(a, b)))
c = timeit("3 row-take + take_along_axis", v_rowcol, r0, c0)
print("   match:", bool(jnp.allclose(a, c)))
d = timeit("4 block-take + one-hot crop", v_blocks, r0, c0)
print("   match:", bool(jnp.allclose(a, d)))
timeit("5 static cell one-hot matmul (200 cells)", v_cells, cell_idx)
e = timeit("6 block one-hot + one-hot crop", v_blocks_mm, r0, c0)
print("   match:", bool(jnp.allclose(a, e)))
