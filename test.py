#!/usr/bin/env python
"""Inference/eval CLI — parity with /root/reference/test.py:232-257: the only
required flag is --folder; every behavior is driven by the training-time
params.txt. Writes Outputs/{folder_save}/{out,sgt,elm}/, loss.png, eval.txt
and the three metric distribution plots.
"""

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--folder", default="pix2obj",
                        help="model folder (under ./models) containing params.txt")
    parser.add_argument("--work_root", default=os.getcwd(),
                        help="directory holding models/ and Outputs/")
    parser.add_argument("--data", default=None,
                        help="optional dataset-dir override")
    parser.add_argument("--eval_batch", type=int, default=1,
                        help="generator forward batch (1 = reference's "
                             "per-image loop; larger batches for throughput)")
    parser.add_argument("--eval_transfer", choices=("u8", "f32"),
                        default="u8",
                        help="what crosses device->host: 'u8' quantizes "
                             "outputs on-device (bit-exact PNGs, 4x less "
                             "transfer) and computes metric sums on-device; "
                             "'f32' is the legacy full-precision path")
    args = parser.parse_args(argv)

    from tactile_gan_tpu.eval.runner import evaluate_folder
    evaluate_folder(args.folder, work_root=args.work_root,
                    data_override=args.data, eval_batch=args.eval_batch,
                    transfer=args.eval_transfer)


if __name__ == "__main__":
    main()
