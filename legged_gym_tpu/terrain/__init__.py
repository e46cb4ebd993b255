from legged_gym_tpu.terrain.terrain import Terrain, TerrainGrid  # noqa: F401
