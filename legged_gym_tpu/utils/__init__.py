from legged_gym_tpu.utils.helpers import get_args, get_load_path, \
    set_seed, update_cfg_from_args  # noqa: F401
