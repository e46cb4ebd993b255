from legged_gym_tpu.actuators.extract import load_torchscript_params
from legged_gym_tpu.actuators.sea_lstm import SEANet
from legged_gym_tpu.actuators.uninet import UniNet

__all__ = ["load_torchscript_params", "SEANet", "UniNet"]
