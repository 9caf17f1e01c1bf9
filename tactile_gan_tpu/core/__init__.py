from tactile_gan_tpu.core.config import TrainConfig, build_arg_parser, config_from_args
