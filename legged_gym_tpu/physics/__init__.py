from legged_gym_tpu.physics.state import PhysicsState  # noqa: F401
