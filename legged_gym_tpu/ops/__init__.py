from legged_gym_tpu.ops import lin, quat  # noqa: F401
