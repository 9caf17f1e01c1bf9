#!/usr/bin/env python
"""Benchmark harness.

Headline metric (BASELINE.md): 256x256 train images/sec/chip for the full G+D
step — UNet++ nf=64, batch 4, 'ls' loss, gradient penalty on (the reference
default gates GP on every epoch: reg_every=1, lambda_gp=0.01), perceptual off
(no pretrained VGG exists in either stack in this environment, so it is
excluded on both sides for a fair ratio).

``vs_baseline`` is measured against the actual PyTorch reference models
running the same training arithmetic on CPU (imported read-only from
/root/reference; the baseline is measured once and cached in
.bench_baseline.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import contextlib
import json
import os
import re
import sys
import time

BATCH = 4
SIZE = 256
NF = 64
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_baseline.json")
CACHE_KEY = f"torch_cpu_unetpp_nf{NF}_b{BATCH}_{SIZE}_ls_gp"


_ANSI = re.compile(r"\x1b\[[0-9;]*[A-Za-z]")


def _short_err(e: Exception) -> str:
    """One short, control-character-free line. Round 4's BENCH artifact was
    unparseable because a matrix entry embedded a multi-KB libtpu init log
    (ANSI escapes included) as its error string. Relay errors bury the
    status line in INFO noise — prefer the first line carrying a status
    keyword."""
    lines = [ln.strip() for ln in _ANSI.sub("", str(e)).splitlines()
             if ln.strip()]
    msg = next((ln for ln in lines
                if re.search(r"INTERNAL|INVALID_ARGUMENT|RESOURCE_EXHAUSTED"
                             r"|UNAVAILABLE|HTTP \d|SIGKILL|[Ee]rror", ln)),
               lines[-1] if lines else type(e).__name__)
    return f"error: {type(e).__name__}: {msg[:200]}"


def _sanitize(obj):
    """Make the result JSON-safe: strip ANSI/control chars from every string
    and bound its length, recursively."""
    if isinstance(obj, str):
        s = _ANSI.sub("", obj)
        s = "".join(c if c >= " " else " " for c in s)
        return s[:300]
    if isinstance(obj, dict):
        return {_sanitize(k): _sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_sanitize(v) for v in obj]
    if isinstance(obj, float) and (obj != obj or obj in (float("inf"),
                                                         float("-inf"))):
        return None
    return obj


def _build_step(batch, use_pallas, split_concat=True, space_to_depth=False,
                packed_row0=None):
    import jax
    import jax.numpy as jnp

    from tactile_gan_tpu.core.config import TrainConfig
    from tactile_gan_tpu.models.factory import (
        create_discriminator, create_generator,
    )
    from tactile_gan_tpu.train.schedule import multistep_lr
    from tactile_gan_tpu.train.state import create_train_state, make_optimizer
    from tactile_gan_tpu.train.step import build_train_step

    cfg = TrainConfig(gen="UNet++", nf=NF, batch_size=batch, image_size=SIZE,
                      loss="ls", lambda_per=0.0, lambda_gp=0.01,
                      compute_dtype="bfloat16", no_aug=False,
                      use_pallas=use_pallas, split_concat=split_concat,
                      space_to_depth=space_to_depth, packed_row0=packed_row0)
    # The shipped auto gates at data-axis width 1 (single chip): packed
    # row-0 at per-chip batch <= 4, w-packed lane_pack convs on the
    # XLA-norm non-packed path.
    lane_pack = cfg.effective_lane_pack(data_axis_size=1)
    packed_row0 = cfg.effective_packed_row0(data_axis_size=1)
    bf16_resident = cfg.effective_bf16_resident(data_axis_size=1)
    gen = create_generator(cfg.gen, cfg.output_dim, cfg.nf, cfg.activation,
                           compute_dtype=jnp.bfloat16, use_pallas=use_pallas,
                           split_concat=split_concat,
                           space_to_depth=space_to_depth,
                           lane_pack=lane_pack, packed_row0=packed_row0,
                           bf16_resident=bf16_resident)
    disc = create_discriminator("patch", cfg.nf, cfg.activation,
                                compute_dtype=jnp.bfloat16,
                                use_pallas=use_pallas,
                                resident=cfg.effective_disc_bf16(),
                                same_pad=cfg.disc_same_pad)
    sched = multistep_lr(cfg.lr, cfg.epoch_constant, cfg.total_epochs, 100)
    g_tx = make_optimizer(sched, cfg.beta1)
    d_tx = make_optimizer(sched, cfg.beta1)

    ex_s = jnp.zeros((batch, SIZE, SIZE, 3))
    ex_t = jnp.zeros((batch, SIZE, SIZE, 3))
    state = create_train_state(gen, disc, ex_s, ex_t, jax.random.key(0),
                               g_tx, d_tx)
    step = build_train_step(cfg, gen, disc, g_tx, d_tx)
    return cfg, gen, state, step


def _time_step(step, state, batch, steps):
    """images/s of a compiled step. Scalar readback = true completion (the
    axon relay does not reliably honor block_until_ready)."""
    import jax
    import numpy as np

    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    src = jnp.asarray(rng.integers(0, 255, (batch, SIZE, SIZE, 3),
                                   dtype=np.uint8))
    tgt = jnp.asarray(rng.integers(0, 255, (batch, SIZE, SIZE, 3),
                                   dtype=np.uint8))
    key = jax.random.key(1)
    for _ in range(2):
        state, m = step(state, src, tgt, key, apply_gp=True)
    float(m.loss_d)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, src, tgt, key, apply_gp=True)
    float(m.loss_d)
    return batch * steps / (time.perf_counter() - t0), (src, tgt, key, state)


def measure_ours(steps: int = 20):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tactile_gan_tpu.core.config import TrainConfig

    probe_cfg = TrainConfig(batch_size=BATCH)
    pallas_default = probe_cfg.effective_use_pallas()
    cfg, gen, state, step = _build_step(BATCH, pallas_default)
    train_ips, (src, tgt, key, state) = _time_step(step, state, BATCH, steps)

    # ---------------- observability extras ----------------
    extra = {}

    # MFU estimate from XLA's own cost model of the compiled step (flops of
    # one full G+D+GP step / wall time / chip peak). jit cache makes the
    # lower+compile here free.
    try:
        compiled = step.lower(state, src, tgt, key, apply_gp=True).compile()
        flops = float(compiled.cost_analysis()["flops"])
        peak = {"tpu": 197e12}.get(jax.default_backend())  # v5e bf16 peak
        if peak:
            extra["mfu_estimate"] = round(
                flops * (train_ips / BATCH) / peak, 4)
        extra["step_tflops"] = round(flops / 1e12, 3)
    except Exception:
        pass

    # Stage fractions via cheap jitted sub-programs. With --host_aug (the
    # default) the flip/affine is NOT part of the device step — it runs in
    # the decode pool one batch ahead — so the host PIL warp is timed
    # instead and reported under its own key.
    try:
        if cfg.host_aug and not cfg.no_aug:
            from tactile_gan_tpu.data.host_aug import augment_pair_np
            s_np = np.asarray(src)
            t_np = np.asarray(tgt)
            t0 = time.perf_counter()
            for i in range(steps):
                for r_ in range(BATCH):
                    augment_pair_np(s_np[r_], t_np[r_],
                                    np.random.default_rng((i, r_)))
            aug_ms = (time.perf_counter() - t0) / steps * 1e3
            aug_key = "host_aug_per_batch_(overlapped)"
        else:
            from tactile_gan_tpu.data.augment import preprocess_batch

            @jax.jit
            def aug_only(s, t, k):
                a, b = preprocess_batch(s, t, k, augment=True)
                return jnp.sum(a) + jnp.sum(b)

            float(aug_only(src, tgt, key))
            t0 = time.perf_counter()
            for _ in range(steps):
                r = aug_only(src, tgt, key)
            float(r)
            aug_ms = (time.perf_counter() - t0) / steps * 1e3
            aug_key = "augment"

        @jax.jit
        def g_fwd(p, s):
            return jnp.sum(gen.apply(p, s))

        x = jnp.zeros((BATCH, SIZE, SIZE, 3))
        float(g_fwd(state.g_params, x))
        t0 = time.perf_counter()
        for _ in range(steps):
            r = g_fwd(state.g_params, x)
        float(r)
        gfwd_ms = (time.perf_counter() - t0) / steps * 1e3

        step_ms = BATCH / train_ips * 1e3
        extra["stage_ms"] = {
            "full_step": round(step_ms, 2),
            aug_key: round(aug_ms, 2),
            "g_forward": round(gfwd_ms, 2),
        }
        extra["stage_fractions"] = {
            "g_forward": round(gfwd_ms / step_ms, 3),
        }
    except Exception as e:
        extra["stage_error"] = str(e)

    # Throughput matrix: batch {4,8,16} x {pallas, xla} — the gating evidence
    # for effective_use_pallas() (crossover between b4 and b8) and
    # effective_packed_row0() (since round 5: packed wins at EVERY batch on
    # its best norm path — the _nopacked entries keep that evidence in the
    # BENCH artifact, not just BASELINE.md prose).
    matrix = {f"b{BATCH}_" + ("pallas" if pallas_default else "xla"):
              round(train_ips, 3)}
    if jax.default_backend() == "tpu":
        # Every entry runs the SHIPPED auto gates for its shape unless a
        # suffix pins a variant.
        for b, up, s2d, pr0, suffix in (
                (BATCH, not pallas_default, False, None, ""),
                (BATCH, pallas_default, False, False, "_nopacked"),
                (8, True, False, None, ""), (8, False, False, None, ""),
                (16, True, False, None, ""), (16, False, False, None, ""),
                (16, False, False, False, "_nopacked"),
                (BATCH, pallas_default, True, None, "_s2d")):
            kname = (f"b{b}_" + ("pallas" if up else "xla") + suffix)
            if kname in matrix:
                continue
            # One retry per entry: round 4's b4_xla entry died once on a
            # transient relay/libtpu re-init and nothing retried it, so the
            # official artifact lost the number.
            for attempt in (0, 1):
                try:
                    _, _, st2, step2 = _build_step(b, up, space_to_depth=s2d,
                                                   packed_row0=pr0)
                    ips2, _ = _time_step(step2, st2, b, max(8, steps // 2))
                    matrix[kname] = round(ips2, 3)
                    break
                except Exception as e:
                    print(f"matrix {kname} attempt {attempt} failed: "
                          f"{_short_err(e)}", file=sys.stderr, flush=True)
                    matrix[kname] = _short_err(e)
                    time.sleep(10)
    extra["throughput_matrix"] = matrix

    # Secondary: p50 single-image generator latency (the test.py hot path).
    # Inference uses the XLA norm path (see eval/runner.py: the Pallas kernel
    # only wins in the training backward).
    from tactile_gan_tpu.models.factory import create_generator
    gen_eval = create_generator(cfg.gen, cfg.output_dim, cfg.nf,
                                cfg.activation, compute_dtype=jnp.bfloat16,
                                use_pallas=False)

    @jax.jit
    def fwd(x):
        out = gen_eval.apply(state.g_params, x)
        return out, jnp.sum(out)

    one = jnp.zeros((1, SIZE, SIZE, 3))
    _, s = fwd(one)
    float(s)
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        _, s = fwd(one)
        float(s)  # value readback = true completion
        lats.append(time.perf_counter() - t0)
    import numpy as np2
    p50_ms = float(np2.percentile(lats, 50) * 1e3)

    # Device-only latency via a chained on-device loop (amortizes the host
    # round-trip, which dominates p50 through the axon relay).
    @jax.jit
    def fwd_chain(x, n):
        def body(_, h):
            return gen_eval.apply(state.g_params, h) * 0.5 + h * 0.5
        return jnp.sum(jax.lax.fori_loop(0, n, body, x))

    float(fwd_chain(one, 2))
    t0 = time.perf_counter()
    float(fwd_chain(one, 22))
    t_long = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fwd_chain(one, 2))
    t_short = time.perf_counter() - t0
    device_ms = max(0.0, (t_long - t_short) / 20.0 * 1e3)
    return train_ips, p50_ms, device_ms, extra


def measure_e2e():
    """End-to-end numbers for the BENCH artifact (VERDICT r3 item 3): real
    Trainer epochs over a synthetic 96-image chart set at b4/b16 (steady
    state: cache hot, past the compile epoch) and eval img/s at eval_batch 4
    — the numbers the README leads with, re-verified every round instead of
    living only in BASELINE.md prose."""
    import subprocess
    import tempfile

    import jax
    import jax.numpy as jnp

    from tactile_gan_tpu.core.config import TrainConfig
    from tactile_gan_tpu.data.dataset import PairedDataset
    from tactile_gan_tpu.train.loop import Trainer

    here = os.path.dirname(os.path.abspath(__file__))
    root = "/tmp/bench_e2e_data"
    n_train, n_test = 96, 16
    src_dir = os.path.join(root, "data", "train", "source")
    if not os.path.isdir(src_dir):
        subprocess.run(
            [sys.executable, os.path.join(here, "scripts",
                                          "make_synth_dataset.py"),
             "--out", os.path.join(root, "data"),
             "--n_train", str(n_train), "--n_test", str(n_test)],
            check=True, capture_output=True)

    out = {}
    tr = None
    for batch in (4, 16):
        cfg = TrainConfig(data=os.path.join(root, "data"), batch_size=batch,
                          gen="UNet++", nf=NF, image_size=SIZE, loss="ls",
                          lambda_per=0.0, lambda_gp=0.01, total_epochs=5,
                          compute_dtype="bfloat16",
                          folder_save=f"bench_b{batch}",
                          folder_load=f"bench_b{batch}")
        ds = PairedDataset(src_dir, size=SIZE, mode="train", aug=True,
                           target="rgb", cache_decoded=cfg.cache_decoded)
        t = Trainer(cfg, ds)
        t.train(progress=False)
        # Epoch 0 pays the compile; epoch 1 may still warm the decode cache
        # overlap — steady state is the best of the remaining epochs.
        steady = min(t.epoch_seconds[2:])
        out[f"e2e_epochs_b{batch}"] = round(n_train / steady, 2)
        if batch == 4:
            tr = t

    # Eval throughput (the test.py hot path, pipelined runner, default u8
    # transfer) using the just-trained b4 generator. The runner's jit cache
    # keys on the forward object, so the second call per batch size is truly
    # warm (zero new compiles — the round-4 0.24 img/s timed a recompile).
    from tactile_gan_tpu.eval.runner import test_model
    from tactile_gan_tpu.models.factory import create_generator

    gen_eval = create_generator("UNet++", 3, NF, True,
                                compute_dtype=jnp.bfloat16, use_pallas=False)
    params = tr.state.g_params

    @jax.jit
    def forward(x):
        return gen_eval.apply(params, x)

    test_ds = PairedDataset(os.path.join(root, "data", "test", "source"),
                            size=SIZE, mode="test", aug=False, target="rgb")
    eval_matrix = {}
    for eval_batch in (1, 4, 16):
        try:
            with tempfile.TemporaryDirectory(prefix="bench_eval_") as outp:
                test_model(forward, test_ds, outp, evaluation=True,
                           target_mode="rgb", eval_batch=eval_batch,
                           threads=8)  # cold: compiles this batch shape
                t0 = time.perf_counter()
                acc, _, _ = test_model(forward, test_ds, outp,
                                       evaluation=True, target_mode="rgb",
                                       eval_batch=eval_batch, threads=8)
                dt = time.perf_counter() - t0
            eval_matrix[f"b{eval_batch}"] = round(len(acc) / dt, 2)
        except Exception as e:
            eval_matrix[f"b{eval_batch}"] = _short_err(e)
    out["eval_images_per_sec"] = eval_matrix.get("b4")
    out["eval_batch"] = 4
    out["eval_matrix"] = eval_matrix
    return out


def measure_torch_baseline(steps: int = 3):
    """The same G+D training arithmetic with the actual reference models on
    CPU: 1 G fwd, 3 D fwds, GP (second-order), D/G backwards, 2 Adam steps."""
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
        if CACHE_KEY in cache:
            return cache[CACHE_KEY]

    sys.path.insert(0, "/root/reference")
    import types
    if "torchvision" not in sys.modules:
        # The reference util.py imports torchvision at module top; it is only
        # used by VGGPerceptualLoss.__init__, which this benchmark never
        # constructs (no pretrained weights exist in this environment).
        sys.modules["torchvision"] = types.ModuleType("torchvision")
    import torch
    import torch.nn.functional as F
    from generators.UNet_plusplus import UNet_plusplus
    from discriminators.PatchDiscriminator import PatchDiscriminator

    torch.set_num_threads(os.cpu_count() or 8)
    gen = UNet_plusplus(3, 3, NF, activation=True)
    disc = PatchDiscriminator(3, 3, num_filter=NF, return_filters=False,
                              activation=True)
    opt_g = torch.optim.Adam(gen.parameters(), lr=1e-3, betas=(0.9, 0.99))
    opt_d = torch.optim.Adam(disc.parameters(), lr=1e-3, betas=(0.9, 0.99))

    a = torch.randn(BATCH, 3, SIZE, SIZE)
    b = torch.rand(BATCH, 3, SIZE, SIZE)

    from util import gradient_penalty

    def one_step():
        fake = gen(a)
        opt_d.zero_grad()
        pred_fake = disc(a, fake.detach())
        pred_real = disc(a, b)
        loss_d = (F.mse_loss(pred_fake, torch.zeros_like(pred_fake))
                  + F.mse_loss(pred_real, torch.ones_like(pred_real))) / 2
        loss_d = loss_d + gradient_penalty(disc, a, b, fake, "cpu", 1,
                                           lambda_gp=0.01)
        loss_d.backward(retain_graph=True)
        opt_d.step()
        opt_g.zero_grad()
        pred_fake = disc(a, fake)
        loss_g = (F.mse_loss(pred_fake, torch.ones_like(pred_fake))
                  + F.l1_loss(b, fake))
        loss_g.backward()
        opt_g.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    ips = BATCH * steps / (time.perf_counter() - t0)

    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
    cache[CACHE_KEY] = ips
    with open(CACHE, "w") as f:
        json.dump(cache, f)
    return ips


def main():
    # The driver parses ONE JSON line from stdout. Everything the
    # measurement phases print (Trainer epoch lines, eval prints, libtpu
    # noise from C++ land writes to fd 2 anyway) is quarantined to stderr;
    # the JSON is validated by a json.loads round-trip before it is emitted
    # (round 4's artifact was `parsed: null`).
    real_stdout = sys.stdout
    with contextlib.redirect_stdout(sys.stderr):
        train_ips, p50_ms, device_ms, extra = measure_ours()
        if __import__("jax").default_backend() == "tpu":
            try:
                extra.update(measure_e2e())
            except Exception as e:
                extra["e2e_error"] = _short_err(e)
        try:
            baseline_ips = measure_torch_baseline()
        except Exception as e:  # reference missing: report raw throughput
            baseline_ips = None
            print(f"baseline measurement failed: {e}", file=sys.stderr)

    result = {
        "metric": "train_images_per_sec_256px_G+D_step",
        "value": round(train_ips, 3),
        "unit": "images/s",
        "vs_baseline": round(train_ips / baseline_ips, 3) if baseline_ips else None,
        "extra": {
            "p50_gen_latency_ms": round(p50_ms, 3),
            "gen_device_latency_ms": round(device_ms, 3),
            "torch_cpu_baseline_images_per_sec": (
                round(baseline_ips, 3) if baseline_ips else None),
            "backend": __import__("jax").default_backend(),
            **extra,
        },
    }
    line = json.dumps(_sanitize(result))
    json.loads(line)  # guarantee the emitted line is parseable
    sys.stderr.flush()
    print(line, file=real_stdout, flush=True)


if __name__ == "__main__":
    main()
