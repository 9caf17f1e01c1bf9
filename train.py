#!/usr/bin/env python
"""Training CLI — flag-for-flag compatible with the reference
(/root/reference/train.py:230-277) plus TPU-native extensions
(--compute_dtype, --use_pallas, --mesh_data, ...). Artifacts land in
{work_root}/models/{folder_save}: final_model.pth, five loss-curve .npy
files and params.txt.
"""

import os

from tactile_gan_tpu.core.config import config_from_args
from tactile_gan_tpu.data.dataset import get_dataset
from tactile_gan_tpu.train.loop import Trainer


def main(argv=None):
    from tactile_gan_tpu.parallel.mesh import maybe_init_distributed
    maybe_init_distributed()

    cfg = config_from_args(argv)
    photo_path_train = os.path.join(cfg.data, "train", "source")
    train_set = get_dataset(photo_path_train, cfg, mode="train")
    trainer = Trainer(cfg, train_set)
    save_path = trainer.run_and_save()
    print(f"saved model + arrays + params to {save_path}")


if __name__ == "__main__":
    main()
