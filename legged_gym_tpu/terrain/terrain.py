"""Global terrain map: rows x cols of sub-terrains + border.

Mirrors the reference generator's structure and parameters
(/root/reference/legged_gym/utils/terrain.py:38-164): int16 global
heightfield at horizontal_scale=0.1 m / vertical_scale=0.005 m with a
border, three selection modes (curriculum / randomized / selected),
difficulty-parameterized primitives, and per-cell spawn origins at the max
height of the central 2x2 m patch.

The device-side product is a ``TerrainGrid``: a float32 height map (meters)
plus metadata, consumed by the contact solver and the height scanner.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from legged_gym_tpu.terrain import primitives as P


@dataclasses.dataclass(frozen=True)
class TerrainGrid:
    """Device-side terrain. ``height[r, c]`` in meters; world (x, y) maps to
    (r, c) = ((x + border) / hs, (y + border) / hs)."""
    height: jnp.ndarray          # (R, C) float32, meters
    raw: jnp.ndarray             # (R, C) int16 (reference height_field_raw)
    horizontal_scale: float
    vertical_scale: float
    border_size: float

    @staticmethod
    def flat(size_m=40.0, horizontal_scale=0.1):
        n = int(size_m / horizontal_scale)
        z = np.zeros((n, n), np.int16)
        return TerrainGrid(height=jnp.zeros((n, n), jnp.float32),
                           raw=jnp.asarray(z),
                           horizontal_scale=horizontal_scale,
                           vertical_scale=0.005,
                           border_size=size_m / 2)


class Terrain:
    """Host-side generator (init-time numpy), API-parallel to the
    reference's ``Terrain`` (terrain.py:38)."""

    def __init__(self, cfg, num_robots, seed=0):
        self.cfg = cfg
        self.num_robots = num_robots
        self.type = cfg.mesh_type
        self.rng = np.random.default_rng(seed)
        if self.type in ["none", "plane"]:
            return
        self.env_length = cfg.terrain_length
        self.env_width = cfg.terrain_width
        self.proportions = [np.sum(cfg.terrain_proportions[:i + 1])
                            for i in range(len(cfg.terrain_proportions))]

        self.num_sub_terrains = cfg.num_rows * cfg.num_cols
        self.env_origins = np.zeros((cfg.num_rows, cfg.num_cols, 3))

        self.width_per_env_pixels = int(self.env_width / cfg.horizontal_scale)
        self.length_per_env_pixels = int(self.env_length / cfg.horizontal_scale)

        self.border = int(cfg.border_size / cfg.horizontal_scale)
        self.tot_cols = int(cfg.num_cols * self.width_per_env_pixels) + 2 * self.border
        self.tot_rows = int(cfg.num_rows * self.length_per_env_pixels) + 2 * self.border

        self.height_field_raw = np.zeros((self.tot_rows, self.tot_cols), np.int16)
        if cfg.curriculum:
            self._curriculum()
        elif cfg.selected:
            self._selected()
        else:
            self._randomized()

        self.heightsamples = self.height_field_raw
        if self.type == "trimesh":
            self.vertices, self.triangles = convert_heightfield_to_trimesh(
                self.height_field_raw, cfg.horizontal_scale,
                cfg.vertical_scale, getattr(cfg, "slope_treshold", 0.75))

    # --- selection modes (reference terrain.py:75-107) ---
    def _randomized(self):
        for k in range(self.num_sub_terrains):
            i, j = np.unravel_index(k, (self.cfg.num_rows, self.cfg.num_cols))
            choice = self.rng.uniform(0, 1)
            difficulty = self.rng.choice([0.5, 0.75, 0.9])
            self._add(self._make(choice, difficulty), i, j)

    def _curriculum(self):
        for j in range(self.cfg.num_cols):
            for i in range(self.cfg.num_rows):
                difficulty = i / self.cfg.num_rows
                choice = j / self.cfg.num_cols + 0.001
                self._add(self._make(choice, difficulty), i, j)

    def _selected(self):
        kwargs = dict(self.cfg.terrain_kwargs)
        name = kwargs.pop("type")
        fn = getattr(P, name)
        for k in range(self.num_sub_terrains):
            i, j = np.unravel_index(k, (self.cfg.num_rows, self.cfg.num_cols))
            hf = np.zeros((self.length_per_env_pixels,
                           self.width_per_env_pixels), np.int16)
            fn(hf, self.cfg.horizontal_scale, self.cfg.vertical_scale, **kwargs)
            self._add(hf, i, j)

    def _make(self, choice, difficulty):
        """Difficulty-parameterized primitive dispatch
        (reference terrain.py:109-145)."""
        hs, vs = self.cfg.horizontal_scale, self.cfg.vertical_scale
        hf = np.zeros((self.length_per_env_pixels,
                       self.width_per_env_pixels), np.int16)
        slope = difficulty * 0.4
        step_height = 0.05 + 0.18 * difficulty
        discrete_obstacles_height = 0.05 + difficulty * 0.2
        stepping_stones_size = 1.5 * (1.05 - difficulty)
        stone_distance = 0.05 if difficulty == 0 else 0.1
        gap_size = 1.0 * difficulty
        pit_depth = 1.0 * difficulty
        pr = self.proportions
        if choice < pr[0]:
            if choice < pr[0] / 2:
                slope *= -1
            P.pyramid_sloped(hf, hs, vs, slope=slope, platform_size=3.0)
        elif choice < pr[1]:
            P.pyramid_sloped(hf, hs, vs, slope=slope, platform_size=3.0)
            P.random_uniform(hf, hs, vs, min_height=-0.05, max_height=0.05,
                             step=0.005, downsampled_scale=0.2, rng=self.rng)
        elif choice < pr[3]:
            if choice < pr[2]:
                step_height *= -1
            P.pyramid_stairs(hf, hs, vs, step_width=0.31,
                             step_height=step_height, platform_size=3.0)
        elif choice < pr[4]:
            P.discrete_obstacles(hf, hs, vs, discrete_obstacles_height,
                                 1.0, 2.0, 20, platform_size=3.0, rng=self.rng)
        elif len(pr) > 5 and choice < pr[5]:
            P.stepping_stones(hf, hs, vs, stone_size=stepping_stones_size,
                              stone_distance=stone_distance, max_height=0.0,
                              platform_size=4.0, rng=self.rng)
        elif len(pr) > 6 and choice < pr[6]:
            P.gap(hf, hs, vs, gap_size=gap_size, platform_size=3.0)
        elif len(pr) > 5:
            P.pit(hf, hs, vs, depth=pit_depth, platform_size=4.0)
        else:
            P.discrete_obstacles(hf, hs, vs, discrete_obstacles_height,
                                 1.0, 2.0, 20, platform_size=3.0, rng=self.rng)
        return hf

    def _add(self, hf, row, col):
        """Blit a sub-terrain and record its spawn origin
        (reference terrain.py:147-164)."""
        i, j = row, col
        hs = self.cfg.horizontal_scale
        start_x = self.border + i * self.length_per_env_pixels
        end_x = self.border + (i + 1) * self.length_per_env_pixels
        start_y = self.border + j * self.width_per_env_pixels
        end_y = self.border + (j + 1) * self.width_per_env_pixels
        self.height_field_raw[start_x:end_x, start_y:end_y] = hf

        env_origin_x = (i + 0.5) * self.env_length
        env_origin_y = (j + 0.5) * self.env_width
        x1 = int((self.env_length / 2.0 - 1) / hs)
        x2 = int((self.env_length / 2.0 + 1) / hs)
        y1 = int((self.env_width / 2.0 - 1) / hs)
        y2 = int((self.env_width / 2.0 + 1) / hs)
        env_origin_z = np.max(hf[x1:x2, y1:y2]) * self.cfg.vertical_scale
        self.env_origins[i, j] = [env_origin_x, env_origin_y, env_origin_z]

    def grid(self) -> TerrainGrid:
        h = self.height_field_raw.astype(np.float32) * self.cfg.vertical_scale
        return TerrainGrid(height=jnp.asarray(h),
                           raw=jnp.asarray(self.height_field_raw),
                           horizontal_scale=self.cfg.horizontal_scale,
                           vertical_scale=self.cfg.vertical_scale,
                           border_size=self.cfg.border_size)


def convert_heightfield_to_trimesh(hf, horizontal_scale, vertical_scale,
                                   slope_threshold=0.75):
    """Heightfield -> (vertices, triangles) with steep slopes corrected to
    vertical faces (API parity with isaacgym.terrain_utils; the TPU
    collision path keeps using the heightfield)."""
    rows, cols = hf.shape
    y = np.linspace(0, (cols - 1) * horizontal_scale, cols)
    x = np.linspace(0, (rows - 1) * horizontal_scale, rows)
    yy, xx = np.meshgrid(y, x)
    z = hf.astype(np.float32) * vertical_scale

    if slope_threshold is not None:
        # shift vertices at steep slopes horizontally so faces go vertical
        st = slope_threshold * horizontal_scale / vertical_scale
        move_x = np.zeros((rows, cols))
        move_y = np.zeros((rows, cols))
        move_x[: rows - 1] += hf[1:] - hf[: rows - 1] > st
        move_x[1:] -= hf[: rows - 1] - hf[1:] > st
        move_y[:, : cols - 1] += hf[:, 1:] - hf[:, : cols - 1] > st
        move_y[:, 1:] -= hf[:, : cols - 1] - hf[:, 1:] > st
        xx += move_x * horizontal_scale
        yy += move_y * horizontal_scale

    vertices = np.stack([xx.ravel(), yy.ravel(), z.ravel()], axis=1).astype(np.float32)
    tris = []
    idx = np.arange(rows * cols).reshape(rows, cols)
    a = idx[:-1, :-1].ravel()
    b = idx[:-1, 1:].ravel()
    c = idx[1:, :-1].ravel()
    d = idx[1:, 1:].ravel()
    tris = np.concatenate([
        np.stack([a, c, d], axis=1),
        np.stack([a, d, b], axis=1),
    ]).astype(np.uint32)
    return vertices, tris
