from legged_gym_tpu.model.robot import RobotModel, compile_model  # noqa: F401
