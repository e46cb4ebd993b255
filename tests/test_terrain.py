import jax.numpy as jnp
import numpy as np

from legged_gym_tpu.terrain.heightfield import sample_bilinear, sample_min3
from legged_gym_tpu.terrain.terrain import Terrain, TerrainGrid


class TCfg:
    mesh_type = "heightfield"
    horizontal_scale = 0.1
    vertical_scale = 0.005
    border_size = 5
    curriculum = True
    static_friction = 1.0
    dynamic_friction = 1.0
    restitution = 0.0
    measure_heights = True
    selected = False
    terrain_kwargs = None
    max_init_terrain_level = 2
    terrain_length = 8.0
    terrain_width = 8.0
    num_rows = 3
    num_cols = 4
    terrain_proportions = [0.1, 0.1, 0.35, 0.25, 0.2]
    slope_treshold = 0.75


def test_terrain_dimensions_and_origins():
    t = Terrain(TCfg(), num_robots=16, seed=0)
    border = int(5 / 0.1)
    assert t.height_field_raw.shape == (3 * 80 + 2 * border, 4 * 80 + 2 * border)
    assert t.env_origins.shape == (3, 4, 3)
    # origins at cell centers
    np.testing.assert_allclose(t.env_origins[0, 0, :2], [4.0, 4.0])
    np.testing.assert_allclose(t.env_origins[2, 3, :2], [20.0, 28.0])
    # curriculum row 0 is easiest: small heights near origin platform
    assert abs(t.env_origins[0, 0, 2]) < 0.2


def test_terrain_determinism():
    a = Terrain(TCfg(), 16, seed=3).height_field_raw
    b = Terrain(TCfg(), 16, seed=3).height_field_raw
    np.testing.assert_array_equal(a, b)


def test_randomized_mode():
    cfg = TCfg()
    cfg.curriculum = False
    t = Terrain(cfg, 16, seed=1)
    assert t.height_field_raw.std() > 0


def test_trimesh_conversion():
    cfg = TCfg()
    cfg.mesh_type = "trimesh"
    t = Terrain(cfg, 16, seed=0)
    R, C = t.height_field_raw.shape
    assert t.vertices.shape == (R * C, 3)
    assert t.triangles.shape == (2 * (R - 1) * (C - 1), 3)


def test_heightfield_sampling():
    # 2x2 m grid with a step at x >= 1
    n = 20
    h = np.zeros((n, n), np.float32)
    h[10:, :] = 0.5
    grid = TerrainGrid(height=jnp.asarray(h),
                       raw=jnp.asarray((h / 0.005).astype(np.int16)),
                       horizontal_scale=0.1, vertical_scale=0.005,
                       border_size=0.0)
    x = jnp.asarray([0.5, 1.5])
    y = jnp.asarray([0.5, 0.5])
    hh, dx, dy = sample_bilinear(grid, x, y)
    np.testing.assert_allclose(hh, [0.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(dy, [0.0, 0.0], atol=1e-6)
    # min-of-3 rule: at the cell just before the step, min3 picks the low side
    m = sample_min3(grid, jnp.asarray([0.85, 0.95]), y[:1].repeat(2))
    np.testing.assert_allclose(m, [0.0, 0.0], atol=1e-6)
    # right at the step, still min of neighbors
    m2 = sample_min3(grid, jnp.asarray([1.05]), jnp.asarray([0.5]))
    np.testing.assert_allclose(m2, [0.5], atol=1e-6)


def test_selected_mode():
    cfg = TCfg()
    cfg.curriculum = False
    cfg.selected = True
    cfg.terrain_kwargs = {"type": "pyramid_stairs", "step_width": 0.31,
                          "step_height": 0.1, "platform_size": 3.0}
    t = Terrain(cfg, 16, seed=0)
    assert t.height_field_raw.max() > 0


def test_patch_sampling_matches_global():
    """Patch-based one-hot-matmul sampling must equal the global-table
    samplers away from patch edges."""
    import jax
    import jax.numpy as jnp

    from legged_gym_tpu.terrain.heightfield import (
        extract_patches, patch_sample_bilinear, patch_sample_min3,
        sample_bilinear, sample_min3)
    from legged_gym_tpu.terrain.terrain import TerrainGrid

    rng = np.random.default_rng(0)
    R = C = 100
    h = rng.normal(size=(R, C)).astype(np.float32) * 0.2
    grid = TerrainGrid(height=jnp.asarray(h), raw=jnp.zeros((R, C), jnp.int16),
                       horizontal_scale=0.1, vertical_scale=0.005,
                       border_size=2.0)
    n = 6
    bx = rng.uniform(0.0, 5.0, n).astype(np.float32)
    by = rng.uniform(0.0, 5.0, n).astype(np.float32)
    patch = extract_patches(grid, jnp.asarray(bx), jnp.asarray(by))
    # query points within +-1 m of each base
    P = 17
    qx = jnp.asarray(bx[None] + rng.uniform(-1, 1, (P, n)).astype(np.float32))
    qy = jnp.asarray(by[None] + rng.uniform(-1, 1, (P, n)).astype(np.float32))

    h_p, dx_p, dy_p = patch_sample_bilinear(grid, patch, qx, qy)
    h_g, dx_g, dy_g = sample_bilinear(grid, qx, qy)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_g), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_g), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dy_p), np.asarray(dy_g), atol=1e-4)

    m_p = patch_sample_min3(grid, patch, qx, qy)
    m_g = sample_min3(grid, qx, qy)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_g), atol=1e-5)
