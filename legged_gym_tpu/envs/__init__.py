from legged_gym_tpu.envs.legged_env import EnvState, LeggedEnv, Transition

__all__ = ["EnvState", "LeggedEnv", "Transition"]
