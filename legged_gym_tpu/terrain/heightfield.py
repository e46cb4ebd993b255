"""Device-side heightfield queries (jit-traceable, batch-last).

Two samplers:
- ``sample_min3``: the reference's observation-scan rule — integer cell
  lookup taking the min of (r,c), (r+1,c), (r,c+1)
  (legged_robot.py:842-852);
- ``sample_bilinear``: C0 height + analytic in-cell gradient for the
  contact model (the bilinear patch gradient is free once the four
  corners are gathered).

``None`` grid means an infinite flat plane at z=0.
"""
import jax.numpy as jnp


def _cell_coords(grid, x, y):
    hs = grid.horizontal_scale
    fx = (x + grid.border_size) / hs
    fy = (y + grid.border_size) / hs
    R, C = grid.height.shape
    fx = jnp.clip(fx, 0.0, R - 2.001)
    fy = jnp.clip(fy, 0.0, C - 2.001)
    ix = jnp.floor(fx).astype(jnp.int32)
    iy = jnp.floor(fy).astype(jnp.int32)
    return ix, iy, fx - ix, fy - iy


def _gather(grid, ix, iy):
    R, C = grid.height.shape
    flat = grid.height.reshape(-1)
    return jnp.take(flat, ix * C + iy, axis=0)


def sample_min3(grid, x, y):
    """Reference height-scan sampling: min of 3 neighbor cells, meters."""
    if grid is None:
        return jnp.zeros_like(x)
    ix, iy, _, _ = _cell_coords(grid, x, y)
    h1 = _gather(grid, ix, iy)
    h2 = _gather(grid, ix + 1, iy)
    h3 = _gather(grid, ix, iy + 1)
    return jnp.minimum(jnp.minimum(h1, h2), h3)


def sample_bilinear(grid, x, y):
    """Returns (h, dh/dx, dh/dy) at world (x, y); flat plane if grid None."""
    if grid is None:
        z = jnp.zeros_like(x)
        return z, z, z
    ix, iy, tx, ty = _cell_coords(grid, x, y)
    h00 = _gather(grid, ix, iy)
    h10 = _gather(grid, ix + 1, iy)
    h01 = _gather(grid, ix, iy + 1)
    h11 = _gather(grid, ix + 1, iy + 1)
    h0 = h00 * (1 - tx) + h10 * tx
    h1 = h01 * (1 - tx) + h11 * tx
    h = h0 * (1 - ty) + h1 * ty
    inv_hs = 1.0 / grid.horizontal_scale
    dhdx = ((h10 - h00) * (1 - ty) + (h11 - h01) * ty) * inv_hs
    dhdy = ((h01 - h00) * (1 - tx) + (h11 - h10) * tx) * inv_hs
    return h, dhdx, dhdy
