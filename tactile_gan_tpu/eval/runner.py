"""Test-time runners — parity with /root/reference/test.py:188-230 and
two_step_test.py:6-44.

The generator forward is jitted once at a static batch-1 shape and reused for
every test image; inputs are normalized on-device with the same fused
preprocessing stage as training (augmentation off).

Faithful reference quirks kept:
- The test loader builds the generator with activation defaulting to True
  regardless of the training loss mode (/root/reference/test.py:37 omits the
  flag — SURVEY.md quirk 4). ``load_model(..., activation=None)`` reproduces
  that; pass the config's activation explicitly to get the trained-mode head.
- Checkpoint loading is partial (strict=False analogue, test.py:41).
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tactile_gan_tpu.core.config import TrainConfig
from tactile_gan_tpu.data.dataset import PairedDataset
from tactile_gan_tpu.eval.metrics import eval_pair
from tactile_gan_tpu.eval.visualize import (
    compose_channels, concat_images, print_evaluation, to_pil,
)
from tactile_gan_tpu.models.factory import create_generator
from tactile_gan_tpu.utils.checkpoint import load_checkpoint, restore_partial
from tactile_gan_tpu.utils.io import mkdir


def load_model(model_path: str, cfg: TrainConfig,
               activation: Optional[bool] = None):
    """Build the generator and restore its weights from final_model.pth.

    Returns (jitted_forward, params). ``activation=None`` mirrors the
    reference test loader's always-Tanh default (test.py:37).
    """
    act = True if activation is None else activation
    # Inference always uses the XLA norm path: the Pallas kernel's win is in
    # its rematerializing VJP (training backward); forward-only at batch 1 it
    # is ~3x slower on v5e (16 ms vs 5 ms per image, measured).
    gen = create_generator(cfg.gen, output_dim=cfg.output_dim, nf=cfg.nf,
                           activation=act,
                           compute_dtype=jnp.dtype(cfg.compute_dtype),
                           use_pallas=False,
                           space_to_depth=getattr(cfg, "space_to_depth",
                                                  False),
                           split_concat=getattr(cfg, "split_concat", True))
    example = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.input_dim))
    params = gen.init(jax.random.key(0), example)
    ckpt = load_checkpoint(model_path)
    params = restore_partial(params, {"params": ckpt["gen"].get("params",
                                                                ckpt["gen"])})

    @jax.jit
    def forward(src_f32):
        return gen.apply(params, src_f32)

    return forward, params


def load_arrays(path: str) -> dict:
    return {
        "gen": np.load(os.path.join(path, "genloss.npy")),
        "disc": np.load(os.path.join(path, "discloss.npy")),
        "l1": np.load(os.path.join(path, "l1loss.npy")),
        "gp": np.load(os.path.join(path, "gploss.npy")),
        "per": np.load(os.path.join(path, "perloss.npy")),
    }


def unnormalize(a: np.ndarray) -> np.ndarray:
    return a / 2.0 + 0.5


def _write_case(i: int, src_norm: np.ndarray, tgt: np.ndarray,
                out: np.ndarray, output_path: str, target_mode: str) -> None:
    if target_mode == "rgb":
        b_img, out_img = to_pil(tgt), to_pil(out)
    else:
        b_img, out_img = compose_channels(tgt), compose_channels(out)
    out_img.save(os.path.join(output_path, "out", f"{i + 1}.png"))
    concat_images(to_pil(unnormalize(src_norm)), b_img, out_img).save(
        os.path.join(output_path, "sgt", f"{i + 1}.png"))
    if target_mode != "rgb":
        b_elm = concat_images(*[to_pil(tgt[:, :, c:c + 1]) for c in range(3)])
        o_elm = concat_images(*[to_pil(out[:, :, c:c + 1]) for c in range(3)])
        concat_images(b_elm, o_elm, mode="v").save(
            os.path.join(output_path, "elm", f"{i + 1}.png"))


def _run_cases(forward_chain: Callable[[jax.Array], jax.Array],
               dataset: PairedDataset, output_path: str, target_mode: str,
               evaluation: bool, eval_batch: int = 1, threads: int = 4,
               ) -> Tuple[List[float], List[float], List[float]]:
    """eval_batch=1 reproduces the reference's per-image loop
    (/root/reference/test.py:200-203); larger values batch the generator
    forward (pad-and-mask on the tail) for throughput — metrics and artifacts
    are identical either way.

    Host work is pipelined like the reference's 4-worker test DataLoader
    (/root/reference/test.py:47): a decode pool fans image loading over
    ``threads`` workers, a 1-worker staging pool assembles batch k+1 while
    batch k runs on-device, the device->host pull of each finished batch
    runs on a 1-worker transfer executor (the relay moves f32 outputs at
    only ~20 MB/s ≈ 36 ms/image, measured round 4 — blocking the dispatch
    loop on it was the throughput ceiling), and PNG encoding/writes and
    the metric reductions go to worker pools. The transfer queue is
    bounded (4 batches) so device output buffers can't pile up on an
    arbitrarily large eval set. Metric results are collected from their
    futures in dataset order, so eval.txt and every artifact are
    byte-identical to the serial path.
    """
    import concurrent.futures as cf

    for sub in ("out", "sgt", "elm"):
        mkdir(os.path.join(output_path, sub))

    accuracy, dice, jaccard = [], [], []
    n = len(dataset)
    if n == 0:
        return accuracy, dice, jaccard
    chunks = [list(range(s, min(s + eval_batch, n)))
              for s in range(0, n, eval_batch)]

    with cf.ThreadPoolExecutor(max_workers=max(1, threads)) as decode, \
            cf.ThreadPoolExecutor(max_workers=1) as staging, \
            cf.ThreadPoolExecutor(max_workers=1) as d2h, \
            cf.ThreadPoolExecutor(max_workers=max(1, threads)) as worker:

        def assemble(idxs):
            pairs = list(decode.map(dataset.load_pair, idxs))
            srcs = np.stack([p[0] for p in pairs])
            if len(idxs) < eval_batch:  # pad the tail to the compiled shape
                srcs = np.concatenate(
                    [srcs, np.repeat(srcs[-1:], eval_batch - len(idxs), 0)])
            # The f32 view feeds the sgt PNG writers on the HOST; the device
            # upload is the raw uint8 (4x less relay H2D traffic — the
            # normalize runs on-device inside norm_fwd with the identical
            # f32 arithmetic, bit-exact vs uploading host-normalized f32).
            # The upload happens HERE, on the staging worker, one batch
            # ahead of the dispatch loop (device_put blocks through the
            # relay — same lesson as the Trainer's H2D staging thread).
            src = srcs.astype(np.float32) / 255.0 * 2.0 - 1.0
            return idxs, pairs, jnp.asarray(srcs), src

        writes = []
        metric_futs = []  # futures in dataset order

        def drain(idxs, pairs, src_np, dev_out):
            outs = np.asarray(dev_out)  # device->host of the finished batch
            for k, i in enumerate(idxs):
                out = outs[k]
                tgt = pairs[k][1].astype(np.float32) / 255.0
                if evaluation:
                    metric_futs.append(worker.submit(eval_pair, tgt, out))
                writes.append(worker.submit(
                    _write_case, i, src_np[k], tgt, out, output_path,
                    target_mode))

        @jax.jit
        def norm_fwd(src_u8):
            src = src_u8.astype(jnp.float32) / 255.0 * 2.0 - 1.0
            return forward_chain(src)

        from collections import deque

        pending = staging.submit(assemble, chunks[0])
        drains = deque()
        for ci in range(len(chunks)):
            idxs, pairs, srcs_u8, src_np = pending.result()
            if ci + 1 < len(chunks):
                pending = staging.submit(assemble, chunks[ci + 1])
            dev_out = norm_fwd(srcs_u8)  # async dispatch (src pre-staged)
            drains.append(d2h.submit(drain, idxs, pairs, src_np, dev_out))
            while len(drains) > 4:  # cap live device output buffers
                drains.popleft().result()
        for f in drains:
            f.result()  # all metric/write futures submitted, in order

        for f in metric_futs:
            res = f.result()
            accuracy.append(res["accuracy"])
            dice.append(res["dice"])
            jaccard.append(res["jaccard"])
        for w in writes:
            w.result()  # surface any write error
    return accuracy, dice, jaccard


def test_model(forward, dataset: PairedDataset, output_path: str,
               evaluation: bool = False, target_mode: str = "rgb",
               eval_batch: int = 1, threads: int = 4):
    """Parity with /root/reference/test.py:188-230 (4-worker loader incl.)."""
    return _run_cases(forward, dataset, output_path, target_mode, evaluation,
                      eval_batch=eval_batch, threads=threads)


def test_two_step(forward1, forward2, dataset: PairedDataset,
                  output_path: str, evaluation: bool = True,
                  eval_batch: int = 1, threads: int = 4):
    """Chained gen2(gen1(x)) evaluation with channel-wise visualization
    (/root/reference/two_step_test.py:6-44). The stage-1 output (tanh,
    [-1,1]-convention) feeds stage 2 directly, exactly like the reference."""
    def chain(src):
        return forward2(forward1(src))
    return _run_cases(chain, dataset, output_path, "ch", evaluation,
                      eval_batch=eval_batch, threads=threads)


def evaluate_folder(folder: str, work_root: str = ".",
                    data_override: Optional[str] = None,
                    progress: bool = True,
                    eval_batch: int = 1) -> Optional[dict]:
    """The test.py __main__ flow (/root/reference/test.py:232-257): load
    params.txt, model, data, loss arrays; plot; run; write eval.txt."""
    import json

    from tactile_gan_tpu.eval.visualize import plot_loss

    params_path = os.path.join(work_root, "models", folder.split("/")[-1],
                               "params.txt")
    cfg = TrainConfig.from_params_file(params_path)

    # The reference resolves the model + loss arrays through the params.txt-
    # RECORDED folder_save, not the --folder argument
    # (/root/reference/test.py:240-246) — they differ when a params.txt names
    # another save folder than the directory it sits in.
    model_dir = os.path.join(work_root, "models", cfg.folder_save)

    with open(params_path) as f:
        raw_params = json.load(f)
    if raw_params.get("vgg_random_fallback"):
        # Surface the training-time provenance at eval time too: this model
        # optimized RANDOM VGG features (no pretrained weights were found).
        from tactile_gan_tpu.models.vgg import fallback_banner
        print("NOTE: params.txt records vgg_random_fallback=true — this "
              "model was trained against deterministic random VGG features.")
        print(fallback_banner())

    forward, _ = load_model(os.path.join(model_dir, "final_model.pth"), cfg)

    data_dir = data_override or cfg.data
    photo_path = os.path.join(work_root, data_dir, "test", "source")
    dataset = PairedDataset(photo_path, size=cfg.image_size, mode="test",
                            aug=False, target=cfg.target)

    output_path = os.path.join(work_root, "Outputs", cfg.folder_save)
    mkdir(output_path)

    losses = load_arrays(model_dir)
    plot_loss(losses, cfg.initial_epoch, cfg.total_epochs, output_path)

    accuracy, dice, jaccard = test_model(
        forward, dataset, output_path, evaluation=True,
        target_mode=cfg.target, eval_batch=eval_batch,
        threads=max(1, min(cfg.threads, 8)))
    if len(accuracy) > 0:
        print_evaluation(accuracy, dice, jaccard, output_path)
        return {"accuracy": float(np.mean(accuracy)),
                "dice": float(np.mean(dice)),
                "jaccard": float(np.mean(jaccard))}
    return None
