#!/usr/bin/env python
"""Two-step chained inference CLI — parity with
/root/reference/two_step_test.py:46-75: stage 1 maps source → RGB tactile,
stage 2 maps that to the channel-wise representation; outputs land in
Outputs/{s1}+{s2}_{data}/.
"""

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--s1_dir", default="t1_2d_per")
    parser.add_argument("--s2_dir", default="t2_2d_per")
    parser.add_argument("--data", default="data_plot_3")
    parser.add_argument("--work_root", default=os.getcwd())
    parser.add_argument("--eval_batch", type=int, default=1,
                        help="chained forward batch (1 = reference's "
                             "per-image loop; larger batches for throughput)")
    parser.add_argument("--eval_transfer", choices=("u8", "f32"),
                        default="u8",
                        help="device->host transfer mode (see test.py)")
    args = parser.parse_args(argv)

    from tactile_gan_tpu.core.config import TrainConfig
    from tactile_gan_tpu.data.dataset import PairedDataset
    from tactile_gan_tpu.eval.runner import load_model, test_two_step
    from tactile_gan_tpu.eval.visualize import print_evaluation
    from tactile_gan_tpu.utils.io import mkdir

    root = args.work_root
    cfg1 = TrainConfig.from_params_file(
        os.path.join(root, "models", args.s1_dir.split("/")[-1], "params.txt"))
    cfg2 = TrainConfig.from_params_file(
        os.path.join(root, "models", args.s2_dir.split("/")[-1], "params.txt"))

    fwd1, _ = load_model(
        os.path.join(root, "models", cfg1.folder_save, "final_model.pth"), cfg1)
    fwd2, _ = load_model(
        os.path.join(root, "models", cfg2.folder_save, "final_model.pth"), cfg2)

    # Stage-2 flags drive the dataset (reference two_step_test.py:67-68).
    photo_path = os.path.join(root, args.data, "test", "source")
    dataset = PairedDataset(photo_path, size=cfg2.image_size, mode="test",
                            aug=False, target=cfg2.target)

    output_path = os.path.join(root, "Outputs",
                               f"{args.s1_dir}+{args.s2_dir}_{args.data}")
    mkdir(output_path)

    accuracy, dice, jaccard = test_two_step(fwd1, fwd2, dataset, output_path,
                                            evaluation=True,
                                            eval_batch=args.eval_batch,
                                            transfer=args.eval_transfer)
    if len(accuracy) > 0:
        print_evaluation(accuracy, dice, jaccard, output_path)


if __name__ == "__main__":
    main()
