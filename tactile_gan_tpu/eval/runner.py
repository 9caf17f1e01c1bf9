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
import time
import weakref
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


def _quantize_u8(x: jax.Array) -> jax.Array:
    """On-device ``round_half_even(clip(x, 0, 1) * 255)`` — BIT-EXACT vs the
    host writers' float64 path (`eval/visualize.py _u8`), so PNG artifacts
    are byte-identical whether the image crosses the relay as f32 or u8.

    Plain f32 ``round(x * 255)`` is NOT exact: the f32 product can round
    across a .5 boundary that the f64 product does not (~1e-3 absolute error
    at 255 scale → a few off-by-one pixels per image). Instead the product is
    computed exactly as an unevaluated pair: split x's mantissa in half by
    bitmask (xh top 12 bits, xl = x - xh, both exact), so ph = 255*xh and
    pl = 255*xl are each exact f32 products (20-bit results); then the
    half-even decision is made on the exact sum ph + pl via TwoSum.
    """
    x = jnp.clip(x.astype(jnp.float32), 0.0, 1.0)
    xb = jax.lax.bitcast_convert_type(x, jnp.uint32)
    xh = jax.lax.bitcast_convert_type(xb & jnp.uint32(0xFFFFF000),
                                      jnp.float32)
    xl = x - xh                      # exact: low 12 mantissa bits
    ph = xh * 255.0                  # exact: 12-bit * 8-bit mantissa
    pl = xl * 255.0                  # exact: 12-bit * 8-bit mantissa
    n0 = jnp.round(ph)               # round-half-even, n0 in [0, 255]
    delta = ph - n0                  # exact (|delta| <= 0.5)
    # TwoSum: s + err == delta + pl exactly (round-to-nearest).
    s = delta + pl
    bv = s - delta
    av = s - bv
    err = (delta - av) + (pl - bv)
    up = (s > 0.5) | ((s == 0.5) & (err > 0))
    dn = (s < -0.5) | ((s == -0.5) & (err < 0))
    tie_up = (s == 0.5) & (err == 0)
    tie_dn = (s == -0.5) & (err == 0)
    odd = jnp.mod(n0, 2.0) != 0.0
    n = (n0 + up.astype(jnp.float32) - dn.astype(jnp.float32)
         + (tie_up & odd).astype(jnp.float32)
         - (tie_dn & odd).astype(jnp.float32))
    return n.astype(jnp.uint8)


def _fuzzy_sums(out: jax.Array, tgt_u8: jax.Array) -> jax.Array:
    """Per-image fuzzy-metric reductions, (B, 4) f32: [sum(min(o,r)), sum(r),
    sum(o*r), sum(o^2+r^2)] — the four scalars `eval_pair`'s fuzzy branch
    needs (metrics.py:50-56). Fetching 4 scalars replaces the 786 KB/image
    f32 output transfer the metrics used to require (the relay moves d2h at
    ~20 MB/s ≈ 36 ms/image — the round-4 eval throughput ceiling). Device
    sums accumulate in f32, so the metric ratios drift ~1e-6 relative vs the
    host's float64 reduction (tested); the PNG artifacts stay byte-exact."""
    o = out.astype(jnp.float32)
    r = tgt_u8.astype(jnp.float32) / 255.0
    ax = tuple(range(1, o.ndim))
    return jnp.stack([
        jnp.sum(jnp.minimum(o, r), axis=ax),
        jnp.sum(r, axis=ax),
        jnp.sum(o * r, axis=ax),
        jnp.sum(o * o + r * r, axis=ax),
    ], axis=1)


# Per-forward cache of the jitted device programs. VERDICT r4 item 2: the
# previous code rebuilt `jax.jit(norm_fwd)` inside every `_run_cases` call,
# so every "warm" eval re-compiled the full generator through the relay
# (minutes-scale) — that is what produced the bogus 0.24 img/s in BENCH_r04.
# Keyed weakly on the forward callable: same forward object → same compiled
# programs, zero new compiles (guarded by tests/test_eval.py).
_JIT_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
# test_two_step used to build a fresh `chain` closure per call, defeating any
# downstream cache — memoize the chain on the (forward1, forward2) pair.
_CHAIN_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _jits_for(forward_chain: Callable[[jax.Array], jax.Array]) -> dict:
    jits = _JIT_CACHE.get(forward_chain)
    if jits is None:
        def norm(src_u8):
            # On-device normalize of the raw uint8 upload (4x less relay H2D
            # than host-normalized f32; bit-exact same arithmetic).
            return forward_chain(
                src_u8.astype(jnp.float32) / 255.0 * 2.0 - 1.0)

        @jax.jit
        def f32_fwd(src_u8):
            return norm(src_u8)

        @jax.jit
        def u8_fwd(src_u8):
            return _quantize_u8(norm(src_u8))

        @jax.jit
        def u8_eval_fwd(src_u8, tgt_u8):
            out = norm(src_u8)
            return _quantize_u8(out), _fuzzy_sums(out, tgt_u8)

        jits = {"f32": f32_fwd, "u8": u8_fwd, "u8_eval": u8_eval_fwd}
        _JIT_CACHE[forward_chain] = jits
    return jits


def _chain_for(forward1, forward2):
    inner = _CHAIN_CACHE.get(forward1)
    if inner is None:
        inner = weakref.WeakKeyDictionary()
        _CHAIN_CACHE[forward1] = inner
    chain = inner.get(forward2)
    if chain is None:
        def chain(src):
            return forward2(forward1(src))
        inner[forward2] = chain
    return chain


def _write_case(i: int, src: np.ndarray, tgt: np.ndarray,
                out: np.ndarray, output_path: str, target_mode: str) -> None:
    """src/tgt arrive as the decoded uint8 (passed through `_u8` untouched —
    byte-identical to the f32 unnormalize->quantize round trip, which
    recovers k/255 to within 1.5e-5 of a u8 step); out is either the
    on-device-quantized u8 (default) or f32 (legacy transfer)."""
    if target_mode == "rgb":
        b_img, out_img = to_pil(tgt), to_pil(out)
    else:
        b_img, out_img = compose_channels(tgt), compose_channels(out)
    out_img.save(os.path.join(output_path, "out", f"{i + 1}.png"))
    src_img = to_pil(src) if src.dtype == np.uint8 \
        else to_pil(unnormalize(src))
    concat_images(src_img, b_img, out_img).save(
        os.path.join(output_path, "sgt", f"{i + 1}.png"))
    if target_mode != "rgb":
        b_elm = concat_images(*[to_pil(tgt[:, :, c:c + 1]) for c in range(3)])
        o_elm = concat_images(*[to_pil(out[:, :, c:c + 1]) for c in range(3)])
        concat_images(b_elm, o_elm, mode="v").save(
            os.path.join(output_path, "elm", f"{i + 1}.png"))


def _run_cases(forward_chain: Callable[[jax.Array], jax.Array],
               dataset: PairedDataset, output_path: str, target_mode: str,
               evaluation: bool, eval_batch: int = 1, threads: int = 4,
               transfer: str = "u8",
               ) -> Tuple[List[float], List[float], List[float]]:
    """eval_batch=1 reproduces the reference's per-image loop
    (/root/reference/test.py:200-203); larger values batch the generator
    forward (pad-and-mask on the tail) for throughput — metrics and artifacts
    are identical either way.

    Host work is pipelined like the reference's 4-worker test DataLoader
    (/root/reference/test.py:47): a decode pool fans image loading over
    ``threads`` workers, a 1-worker staging pool assembles batch k+1 while
    batch k runs on-device, the device->host pull of each finished batch
    runs on a 1-worker transfer executor, and PNG encoding/writes go to a
    worker pool. The transfer queue is bounded (4 batches) so device output
    buffers can't pile up on an arbitrarily large eval set. Metric results
    are collected in dataset order, so eval.txt and every artifact are
    byte-identical to the serial path.

    ``transfer`` picks what crosses the relay back to the host (the relay
    moves d2h at only ~20 MB/s ≈ 36 ms per f32 image — the round-4
    throughput ceiling):
    - "u8" (default): the output is quantized to uint8 ON-DEVICE with a
      bit-exact replica of the host writers' f64 rounding (PNG artifacts
      byte-identical, 4x less d2h), and the fuzzy metric reductions run
      on-device too (4 scalars/image instead of the full f32 image; ratios
      drift ~1e-6 relative vs host f64 sums).
    - "f32": the round-3/4 behavior — full f32 outputs to the host, metrics
      and quantization on the host in f64.
    """
    import concurrent.futures as cf

    if transfer not in ("u8", "f32"):
        raise ValueError(f"unknown eval transfer mode: {transfer!r}")
    # TACTILE_EVAL_TIMING=1: accumulate per-stage wall time (threads included)
    # and print a breakdown — the measurement tool behind the eval floor
    # analysis in BASELINE.md round 5.
    timing = None
    if os.environ.get("TACTILE_EVAL_TIMING"):
        import threading
        from collections import defaultdict
        timing = defaultdict(float)
        _tlock = threading.Lock()

    def _timed(label, fn, *a):
        if timing is None:
            return fn(*a)
        t0 = time.perf_counter()
        r = fn(*a)
        with _tlock:
            timing[label] += time.perf_counter() - t0
        return r
    for sub in ("out", "sgt", "elm"):
        mkdir(os.path.join(output_path, sub))

    accuracy, dice, jaccard = [], [], []
    n = len(dataset)
    if n == 0:
        return accuracy, dice, jaccard
    chunks = [list(range(s, min(s + eval_batch, n)))
              for s in range(0, n, eval_batch)]
    jits = _jits_for(forward_chain)
    want_sums = transfer == "u8" and evaluation

    # CPU-bound pools (decode, PNG writes) never exceed the core count:
    # extra threads on a small host only add GIL/context-switch thrash
    # (measured on the 1-core v5e host: 8 write workers were 0.74x the
    # serial rate — BASELINE.md round 5).
    host_par = max(1, min(threads, os.cpu_count() or threads))
    with cf.ThreadPoolExecutor(max_workers=host_par) as decode, \
            cf.ThreadPoolExecutor(max_workers=1) as staging, \
            cf.ThreadPoolExecutor(max_workers=1) as d2h, \
            cf.ThreadPoolExecutor(max_workers=host_par) as worker:

        def _pad(arrs):
            stacked = np.stack(arrs)
            if len(arrs) < eval_batch:  # pad the tail to the compiled shape
                stacked = np.concatenate(
                    [stacked,
                     np.repeat(stacked[-1:], eval_batch - len(arrs), 0)])
            return stacked

        def assemble(idxs):
            pairs = _timed("decode",
                           lambda: list(decode.map(dataset.load_pair, idxs)))
            srcs = _pad([p[0] for p in pairs])
            # The device upload is the raw uint8 (4x less relay H2D traffic
            # — the normalize runs on-device inside the jitted forward with
            # the identical f32 arithmetic, bit-exact vs uploading
            # host-normalized f32). The upload happens HERE, on the staging
            # worker, one batch ahead of the dispatch loop (device_put
            # blocks through the relay — same lesson as the Trainer's H2D
            # staging thread). The sgt writers take the decoded u8 directly
            # (no per-batch f32 conversion — the host is single-core, see
            # BASELINE.md round 5).
            dev_tgt = (_timed("h2d_tgt", jnp.asarray,
                              _pad([p[1] for p in pairs]))
                       if want_sums else None)
            return idxs, pairs, _timed("h2d_src", jnp.asarray, srcs), dev_tgt

        writes = []
        metrics = []  # futures or ready dicts, in dataset order

        def drain(idxs, pairs, dev_out, dev_sums):
            # device->host of the finished batch
            outs = _timed("d2h_out", np.asarray, dev_out)
            sums = (_timed("d2h_sums",
                           lambda: np.asarray(dev_sums, dtype=np.float64))
                    if dev_sums is not None else None)
            for k, i in enumerate(idxs):
                out = outs[k]
                tgt_u8 = pairs[k][1]
                if evaluation:
                    if sums is not None:
                        s_min, s_r, s_or, s_sq = sums[k]
                        metrics.append({"accuracy": s_min / s_r,
                                        "dice": 2.0 * s_or / s_sq,
                                        "jaccard": s_or / (s_sq - s_or)})
                    else:
                        metrics.append(worker.submit(
                            eval_pair,
                            tgt_u8.astype(np.float32) / 255.0, out))
                # src/tgt cross as uint8; the writers' _u8 passes them
                # through (byte-identical to quantizing the f32 forms).
                writes.append(worker.submit(
                    _timed, "write", _write_case, i, pairs[k][0], tgt_u8,
                    out, output_path, target_mode))

        from collections import deque

        t_start = time.perf_counter()
        pending = staging.submit(assemble, chunks[0])
        drains = deque()
        for ci in range(len(chunks)):
            idxs, pairs, srcs_u8, dev_tgt = _timed(
                "wait_staging", pending.result)
            if ci + 1 < len(chunks):
                pending = staging.submit(assemble, chunks[ci + 1])
            # async dispatch (src pre-staged)
            if want_sums:
                dev_out, dev_sums = _timed("dispatch", jits["u8_eval"],
                                           srcs_u8, dev_tgt)
            elif transfer == "u8":
                dev_out, dev_sums = _timed("dispatch", jits["u8"],
                                           srcs_u8), None
            else:
                dev_out, dev_sums = _timed("dispatch", jits["f32"],
                                           srcs_u8), None
            drains.append(d2h.submit(drain, idxs, pairs, dev_out, dev_sums))
            while len(drains) > 4:  # cap live device output buffers
                _timed("wait_drain", drains.popleft().result)
        for f in drains:
            _timed("wait_drain", f.result)

        for f in metrics:
            res = f.result() if isinstance(f, cf.Future) else f
            accuracy.append(float(res["accuracy"]))
            dice.append(float(res["dice"]))
            jaccard.append(float(res["jaccard"]))
        for w in writes:
            w.result()  # surface any write error
        if timing is not None:
            wall = time.perf_counter() - t_start
            parts = " ".join(f"{k}={v * 1e3 / n:.1f}"
                             for k, v in sorted(timing.items()))
            print(f"[eval timing] n={n} wall/img="
                  f"{wall * 1e3 / n:.1f} ms | per-img ms: {parts}",
                  flush=True)
    return accuracy, dice, jaccard


def test_model(forward, dataset: PairedDataset, output_path: str,
               evaluation: bool = False, target_mode: str = "rgb",
               eval_batch: int = 1, threads: int = 4, transfer: str = "u8"):
    """Parity with /root/reference/test.py:188-230 (4-worker loader incl.)."""
    return _run_cases(forward, dataset, output_path, target_mode, evaluation,
                      eval_batch=eval_batch, threads=threads,
                      transfer=transfer)


def test_two_step(forward1, forward2, dataset: PairedDataset,
                  output_path: str, evaluation: bool = True,
                  eval_batch: int = 1, threads: int = 4,
                  transfer: str = "u8"):
    """Chained gen2(gen1(x)) evaluation with channel-wise visualization
    (/root/reference/two_step_test.py:6-44). The stage-1 output (tanh,
    [-1,1]-convention) feeds stage 2 directly, exactly like the reference.
    The chain closure is memoized on the (forward1, forward2) pair so
    repeated calls reuse the compiled program."""
    return _run_cases(_chain_for(forward1, forward2), dataset, output_path,
                      "ch", evaluation, eval_batch=eval_batch,
                      threads=threads, transfer=transfer)


def evaluate_folder(folder: str, work_root: str = ".",
                    data_override: Optional[str] = None,
                    progress: bool = True,
                    eval_batch: int = 1,
                    transfer: str = "u8") -> Optional[dict]:
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
        threads=max(1, min(cfg.threads, 8)), transfer=transfer)
    if len(accuracy) > 0:
        print_evaluation(accuracy, dice, jaccard, output_path)
        return {"accuracy": float(np.mean(accuracy)),
                "dice": float(np.mean(dice)),
                "jaccard": float(np.mean(jaccard))}
    return None
