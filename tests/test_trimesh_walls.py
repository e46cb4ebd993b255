"""Trimesh vertical-face collision parity.

Reference physics collides against a slope-corrected trimesh: slopes
steeper than cfg.terrain.slope_treshold become vertical faces
(utils/terrain.py:69-73, legged_robot.py:629-643), so stairs are steps,
not ramps. Here the same rule lives in the samplers: cells whose corner
spread exceeds ``TerrainGrid.wall_thresh`` collide as a flat floor at the
min corner with the wall at the gridline.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from legged_gym_tpu import registry
from legged_gym_tpu.terrain.heightfield import (extract_patches,
                                                patch_sample_bilinear,
                                                sample_bilinear)
from legged_gym_tpu.terrain.terrain import TerrainGrid


def _step_grid(wall_thresh):
    """One 0.2 m step at x = 2.0 (row 20), hs = 0.1."""
    h = np.zeros((64, 64), np.float32)
    h[20:, :] = 0.2
    return TerrainGrid(height=jnp.asarray(h),
                       raw=jnp.asarray((h / 0.005).astype(np.int16)),
                       horizontal_scale=0.1, vertical_scale=0.005,
                       border_size=0.0, wall_thresh=wall_thresh)


def test_step_is_vertical_not_ramp():
    x = jnp.asarray([1.95, 1.99, 2.0, 2.05])   # across the riser cell
    y = jnp.full((4,), 3.0)

    ramp = _step_grid(0.0)
    h0, dx0, _ = sample_bilinear(ramp, x, y)
    # uncorrected: mid-cell bilinear ramps (this is the bug being fixed)
    assert 0.05 < float(h0[1]) < 0.2
    assert float(dx0[0]) > 0.5

    wall = _step_grid(0.75 * 0.1)
    h1, dx1, dy1 = sample_bilinear(wall, x, y)
    # corrected: flat lower tread all the way to the gridline...
    np.testing.assert_allclose(np.asarray(h1[:2]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx1[:2]), 0.0, atol=1e-6)
    # ...and the full upper tread from the gridline on
    np.testing.assert_allclose(np.asarray(h1[2:]), 0.2, atol=1e-6)


def test_patch_sampler_matches_global():
    grid = _step_grid(0.75 * 0.1)
    xq = jnp.asarray([[1.93, 2.01, 2.31, 1.52]])
    yq = jnp.asarray([[3.0, 3.1, 2.9, 3.3]])
    patch = extract_patches(grid, xq[0], yq[0])
    hg, dxg, dyg = sample_bilinear(grid, xq, yq)
    hp, dxp, dyp = patch_sample_bilinear(grid, patch, xq, yq)
    np.testing.assert_allclose(np.asarray(hp), np.asarray(hg), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dxp), np.asarray(dxg), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dyp), np.asarray(dyg), atol=1e-4)


def test_gentle_slope_unaffected():
    h = np.zeros((64, 64), np.float32)
    h[:, :] = np.arange(64, dtype=np.float32)[:, None] * 0.005  # 5% grade
    grid = TerrainGrid(height=jnp.asarray(h),
                       raw=jnp.asarray((h / 0.005).astype(np.int16)),
                       horizontal_scale=0.1, vertical_scale=0.005,
                       border_size=0.0, wall_thresh=0.075)
    x = jnp.asarray([1.23, 3.71])
    y = jnp.asarray([2.0, 2.5])
    href, dxr, _ = sample_bilinear(dataclasses.replace(grid,
                                                       wall_thresh=0.0),
                                   x, y)
    hw, dxw, _ = sample_bilinear(grid, x, y)
    np.testing.assert_allclose(np.asarray(hw), np.asarray(href), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dxw), np.asarray(dxr), atol=1e-6)


def test_trimesh_env_wires_wall_thresh():
    cfg, _ = registry.get_cfgs("go1")
    cfg.env.num_envs = 4
    cfg.terrain.mesh_type = "trimesh"
    cfg.terrain.num_rows = 2
    cfg.terrain.num_cols = 2
    cfg.terrain.curriculum = True
    env, cfg = registry.make_env(cfg=cfg)
    assert env.grid.wall_thresh > 0.0
    if env.chain_engine is not None:
        assert env.chain_engine.cc.wall_thresh > 0.0
    state, _ = env.reset(jax.random.PRNGKey(0))

    @jax.jit
    def roll(s):
        def body(c, _):
            c, tr = env.step(c, jnp.zeros((env.num_envs, env.num_actions)))
            return c, tr.reward
        return jax.lax.scan(body, s, None, length=30)

    s2, rew = roll(state)
    assert np.isfinite(np.asarray(s2.physics.q)).all()
    assert np.isfinite(np.asarray(rew)).all()
