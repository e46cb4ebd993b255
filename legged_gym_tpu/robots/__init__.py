"""Per-robot config factories (the reference's envs/*/\\*_config.py).

Each factory returns ``(LeggedRobotCfg, TrainCfg)`` freshly built, so a
caller may mutate the result freely (the analog of the reference's
config-class inheritance, e.g. go1_config.py:34-101).
"""
from legged_gym_tpu.robots.a1 import a1, a1_src
from legged_gym_tpu.robots.aliengo import aliengo
from legged_gym_tpu.robots.anymal import anymal_b, anymal_c_flat, anymal_c_rough
from legged_gym_tpu.robots.cassie import cassie
from legged_gym_tpu.robots.go1 import go1

__all__ = ["a1", "a1_src", "aliengo", "anymal_b", "anymal_c_flat",
           "anymal_c_rough", "cassie", "go1"]
