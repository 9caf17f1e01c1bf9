from tactile_gan_tpu.train.loop import Trainer
from tactile_gan_tpu.train.schedule import multistep_lr
from tactile_gan_tpu.train.state import TrainState, create_train_state
from tactile_gan_tpu.train.step import build_train_step
