from legged_gym_tpu.mpc.sampling import GradientMPC, SamplingMPC

__all__ = ["SamplingMPC", "GradientMPC"]
