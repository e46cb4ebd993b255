"""Batch-last small linear algebra (3x3 blocks), unrolled to elementwise ops.

Matrices are ``(3, 3, ...)``, vectors ``(3, ...)`` with the env batch in the
trailing axes. All products are written as explicit component sums so XLA
lowers them to vector multiply-adds over fully-occupied TPU lanes — a
``(N, 3, 3) @ (N, 3, 3)`` dot_general would pad 3 -> 128 lanes and waste
the machine. This module is the kernel-level foundation of the Featherstone
dynamics (physics/aba.py).
"""
import jax.numpy as jnp


def mv(A, v):
    """Matrix-vector: (3,3,...) @ (3,...) -> (3,...)."""
    return jnp.stack([
        A[0, 0] * v[0] + A[0, 1] * v[1] + A[0, 2] * v[2],
        A[1, 0] * v[0] + A[1, 1] * v[1] + A[1, 2] * v[2],
        A[2, 0] * v[0] + A[2, 1] * v[1] + A[2, 2] * v[2],
    ])


def mtv(A, v):
    """Transposed matrix-vector: A^T @ v."""
    return jnp.stack([
        A[0, 0] * v[0] + A[1, 0] * v[1] + A[2, 0] * v[2],
        A[0, 1] * v[0] + A[1, 1] * v[1] + A[2, 1] * v[2],
        A[0, 2] * v[0] + A[1, 2] * v[1] + A[2, 2] * v[2],
    ])


def mm(A, B):
    """Matrix-matrix: (3,3,...) @ (3,3,...)."""
    rows = []
    for i in range(3):
        row = []
        for j in range(3):
            row.append(A[i, 0] * B[0, j] + A[i, 1] * B[1, j] + A[i, 2] * B[2, j])
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def mtm(A, B):
    """A^T @ B."""
    rows = []
    for i in range(3):
        row = []
        for j in range(3):
            row.append(A[0, i] * B[0, j] + A[1, i] * B[1, j] + A[2, i] * B[2, j])
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def mmt(A, B):
    """A @ B^T."""
    rows = []
    for i in range(3):
        row = []
        for j in range(3):
            row.append(A[i, 0] * B[j, 0] + A[i, 1] * B[j, 1] + A[i, 2] * B[j, 2])
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def transpose(A):
    return jnp.stack([
        jnp.stack([A[0, 0], A[1, 0], A[2, 0]]),
        jnp.stack([A[0, 1], A[1, 1], A[2, 1]]),
        jnp.stack([A[0, 2], A[1, 2], A[2, 2]]),
    ])


def outer(a, b):
    """Outer product (3,...) x (3,...) -> (3,3,...)."""
    return jnp.stack([
        jnp.stack([a[0] * b[0], a[0] * b[1], a[0] * b[2]]),
        jnp.stack([a[1] * b[0], a[1] * b[1], a[1] * b[2]]),
        jnp.stack([a[2] * b[0], a[2] * b[1], a[2] * b[2]]),
    ])


def skew(v):
    """Skew-symmetric cross-product matrix ṽ with ṽ u = v × u."""
    z = jnp.zeros_like(v[0])
    return jnp.stack([
        jnp.stack([z, -v[2], v[1]]),
        jnp.stack([v[2], z, -v[0]]),
        jnp.stack([-v[1], v[0], z]),
    ])


def eye(batch_shape=(), dtype=jnp.float32):
    one = jnp.ones(batch_shape, dtype=dtype)
    zero = jnp.zeros(batch_shape, dtype=dtype)
    return jnp.stack([
        jnp.stack([one, zero, zero]),
        jnp.stack([zero, one, zero]),
        jnp.stack([zero, zero, one]),
    ])


def solve33(A, b):
    """Solve A x = b for a batch-last (3,3,...) system via explicit adjugate.

    Intended for small well-conditioned systems (e.g. the base angular
    block). Uses Cramer's rule — 3x3 only, fully elementwise.
    """
    c00 = A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1]
    c01 = A[1, 2] * A[2, 0] - A[1, 0] * A[2, 2]
    c02 = A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0]
    det = A[0, 0] * c00 + A[0, 1] * c01 + A[0, 2] * c02
    inv_det = 1.0 / det
    c10 = A[0, 2] * A[2, 1] - A[0, 1] * A[2, 2]
    c11 = A[0, 0] * A[2, 2] - A[0, 2] * A[2, 0]
    c12 = A[0, 1] * A[2, 0] - A[0, 0] * A[2, 1]
    c20 = A[0, 1] * A[1, 2] - A[0, 2] * A[1, 1]
    c21 = A[0, 2] * A[1, 0] - A[0, 0] * A[1, 2]
    c22 = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    x0 = (c00 * b[0] + c10 * b[1] + c20 * b[2]) * inv_det
    x1 = (c01 * b[0] + c11 * b[1] + c21 * b[2]) * inv_det
    x2 = (c02 * b[0] + c12 * b[1] + c22 * b[2]) * inv_det
    return jnp.stack([x0, x1, x2])


def inv33(A):
    """Explicit inverse of batch-last (3,3,...) matrices (adjugate/det)."""
    c00 = A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1]
    c01 = A[1, 2] * A[2, 0] - A[1, 0] * A[2, 2]
    c02 = A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0]
    det = A[0, 0] * c00 + A[0, 1] * c01 + A[0, 2] * c02
    inv_det = 1.0 / det
    c10 = A[0, 2] * A[2, 1] - A[0, 1] * A[2, 2]
    c11 = A[0, 0] * A[2, 2] - A[0, 2] * A[2, 0]
    c12 = A[0, 1] * A[2, 0] - A[0, 0] * A[2, 1]
    c20 = A[0, 1] * A[1, 2] - A[0, 2] * A[1, 1]
    c21 = A[0, 2] * A[1, 0] - A[0, 0] * A[1, 2]
    c22 = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    return jnp.stack([
        jnp.stack([c00, c10, c20]),
        jnp.stack([c01, c11, c21]),
        jnp.stack([c02, c12, c22]),
    ]) * inv_det


def solve66_sym(AA, AB, BB, b_top, b_bot):
    """Solve the symmetric 6x6 block system [[AA, AB], [AB^T, BB]] x = b.

    Used once per env per substep for the floating-base acceleration
    (Featherstone RBDA eq. 9.13). Solved by block elimination via the
    Schur complement of BB (the mass block, always well-conditioned):

        S = AA - AB BB^-1 AB^T
        x_top = S^-1 (b_top - AB BB^-1 b_bot)
        x_bot = BB^-1 (b_bot - AB^T x_top)
    """
    BBinv = inv33(BB)
    ABBinv = mm(AB, BBinv)
    S = AA - mmt(ABBinv, AB)
    rhs_top = b_top - mv(ABBinv, b_bot)
    x_top = solve33(S, rhs_top)
    x_bot = mv(BBinv, b_bot - mtv(AB, x_top))
    return x_top, x_bot


# ---- sparse / symmetry-aware variants (instruction-count reductions for
# the fused physics kernel: on the axon backend per-op overhead dominates,
# so fewer jnp calls = proportionally faster, see physics/pallas_step.py)

def skew_mm(v, X):
    """ṽ @ X for v (3,...), X (3,3,...): 2 mults per entry instead of 3
    (the skew matrix has a zero diagonal)."""
    x, y, z = v[0], v[1], v[2]
    return jnp.stack([
        jnp.stack([y * X[2, 0] - z * X[1, 0],
                   y * X[2, 1] - z * X[1, 1],
                   y * X[2, 2] - z * X[1, 2]]),
        jnp.stack([z * X[0, 0] - x * X[2, 0],
                   z * X[0, 1] - x * X[2, 1],
                   z * X[0, 2] - x * X[2, 2]]),
        jnp.stack([x * X[1, 0] - y * X[0, 0],
                   x * X[1, 1] - y * X[0, 1],
                   x * X[1, 2] - y * X[0, 2]]),
    ])


def mm_skew(X, v):
    """X @ ṽ for X (3,3,...), v (3,...)."""
    x, y, z = v[0], v[1], v[2]
    cols = []
    for i in range(3):
        cols.append([X[i, 1] * z - X[i, 2] * y,
                     X[i, 2] * x - X[i, 0] * z,
                     X[i, 0] * y - X[i, 1] * x])
    return jnp.stack([jnp.stack(c) for c in cols])


def congruence_sym(R, S):
    """R @ S @ R^T for SYMMETRIC S — computes the 6 unique entries of the
    (symmetric) result. ~25% fewer ops than mm(R, mmt(S, R))."""
    # T = S @ R^T  (full)
    T = mmt(S, R)
    out = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(i, 3):
            out[i][j] = (R[i, 0] * T[0, j] + R[i, 1] * T[1, j]
                         + R[i, 2] * T[2, j])
            if i != j:
                out[j][i] = out[i][j]
    return jnp.stack([jnp.stack(r) for r in out])


def outer_sym(a, scale):
    """scale * (a a^T) for a (3,...): 6 unique products."""
    d = [a[0] * scale, a[1] * scale, a[2] * scale]
    o01 = d[0] * a[1]
    o02 = d[0] * a[2]
    o12 = d[1] * a[2]
    return jnp.stack([
        jnp.stack([d[0] * a[0], o01, o02]),
        jnp.stack([o01, d[1] * a[1], o12]),
        jnp.stack([o02, o12, d[2] * a[2]]),
    ])
