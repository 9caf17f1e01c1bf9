"""Training configuration.

The flag surface is a compatibility contract with the reference CLI
(/root/reference/train.py:231-257): same names, same defaults, and the JSON
``params.txt`` persisted at the end of training round-trips into test time
exactly like the reference (/root/reference/train.py:222-227 writes
``json.dumps(opt.__dict__)``; /root/reference/test.py:29-34 rehydrates it).

Internally the config is a frozen dataclass so it can be closed over by jitted
functions (it never becomes a traced value; anything shape- or
control-flow-relevant stays Python-static).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import List, Optional


def jnp_is_f32(dtype_name: str) -> bool:
    import jax.numpy as jnp
    return jnp.dtype(dtype_name) == jnp.float32


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """All training hyper-parameters.

    Field names and defaults mirror the reference argparse surface one-to-one
    (/root/reference/train.py:231-257) so ``params.txt`` stays interchangeable.
    """

    data: str = "./data"
    batch_size: int = 4
    input_dim: int = 3
    output_dim: int = 3
    initial_epoch: int = 1
    total_epochs: int = 135
    epoch_constant: int = 25
    lr: float = 0.001
    no_label_smoothing: bool = False
    beta1: float = 0.9
    threads: int = 8
    lambda_a: float = 1.0
    lambda_gp: float = 0.01
    lambda_per: float = 1.0
    w_per: tuple = (0.0, 0.1, 0.3, 0.6)
    gen: str = "UNet++"
    nf: int = 64
    loss: str = "ls"
    no_aug: bool = False
    target: str = "rgb"
    version: int = 1
    folder_save: str = "pix2obj"
    folder_load: str = "pix2obj"
    checkpoint_interval: int = -1
    continue_training: bool = False
    reg_every: int = 1

    # --- TPU-native extensions (absent from the reference; all have inert
    # defaults so a reference-shaped params.txt stays valid). ---
    seed: int = 21  # reference seeds everything to 21 at util import (util.py:8-11)
    compute_dtype: str = "bfloat16"  # MXU-friendly conv compute dtype
    image_size: int = 256
    drop_last: bool = True  # keep one compiled train-step shape
    # Fused Pallas instance-norm kernels: measured +37% train-step throughput
    # on v5e (34.5 vs 25.2 img/s — the kernel's rematerializing VJP beats
    # XLA's fusion in the full program). Effective only on the TPU backend;
    # CPU/GPU always use the XLA path (resolve via effective_use_pallas()).
    use_pallas: bool = True
    # Testing/dryrun escape hatch: engage the Pallas kernels regardless of
    # backend and batch gates (interpret mode emulates them off-TPU). Lets
    # the CPU-mesh tests and the driver's multichip dryrun exercise the
    # production kernel path under a mesh.
    force_pallas: bool = False
    vgg_weights: str = ""  # optional local .npz with pretrained VGG16 features
    mesh_data: int = 0  # data-parallel mesh size; 0 = all local devices
    mesh_model: int = 1  # tensor-parallel mesh size (splits wide conv kernels)
    # Reproduce the reference's label-smoothing quirk: the real-target noise
    # is sampled ONCE and reused for every batch of the run
    # (/root/reference/generators/generators.py:52-63). Off = fresh per-step
    # noise (the TPU-native default). Note the reference breaks on a smaller
    # final batch (expand_as of the full-size cache); our static-shape
    # batching (drop_last / pad_mode) sidesteps that by construction.
    legacy_label_cache: bool = False
    # TPU perf VARIANT (UNet++ only, off by default because it changes the
    # network): run the full-resolution row 2x2-folded (space-to-depth) —
    # half the spatial iterations, double the MXU lane occupancy. Checkpoints
    # are variant-specific. Measurements in BASELINE.md.
    space_to_depth: bool = False
    # Exact w-packed row-0 convs (UNet++): each cout<=64 3x3 conv computes
    # two adjacent output columns per MXU window (a stride-(1,2) conv with
    # the kernel embedded twice in disjoint cout halves), filling all 128
    # output lanes; the custom VJP keeps the PLAIN formulation's
    # dgrad/wgrad (the packed conv's lhs-dilated dgrad loses, probe_wpack).
    # Same parameters, same numerics — checkpoints are interchangeable.
    # Tri-state: None = auto (see effective_lane_pack()); --lane_pack /
    # --no-lane_pack force it. Measured on v5e (full step, round 3):
    # b4 XLA 28.8 -> 36.2 img/s (+26%); b4 pallas 40.2 -> 39.6 (the unpack
    # reshape at the Pallas-norm boundary eats the fwd gain); b16 XLA
    # 73.5 -> 69.5. Auto therefore engages ONLY on the XLA norm path at
    # per-chip batch <= 4.
    lane_pack: Optional[bool] = None
    # bf16-resident deep rows (UNet++ rows 1-4, C>=128): conv outputs and
    # norms keep the bf16 compute dtype between ops — dense bf16 tiles, so
    # the halved HBM traffic wins (b16 XLA step 92.4 -> 99.3 img/s,
    # BASELINE.md round 3; b4 was neutral). Tri-state: None = auto (on for
    # the XLA-norm path under bf16 compute; the fused Pallas norms take
    # f32); explicit flags force.
    bf16_resident: Optional[bool] = None
    # Packed-resident row 0 (UNet++, ops/packed_row.py): the full-resolution
    # row lives in the w-pair packed layout — dense 128-lane tiles for the
    # cout=nf convs (custom Pallas kernel, 2.3x XLA on v5e) and packed-space
    # instance norms XLA fuses for free. EXACT same network and parameters
    # (checkpoints interchangeable), unlike --space_to_depth. Tri-state:
    # None = auto (on for TPU UNet++ nf<=64 without space_to_depth);
    # --packed_row0/--no-packed_row0 force. Measurements in BASELINE.md.
    packed_row0: Optional[bool] = None
    # Concat-free nested-node convs (UNet++): each node's first conv reads its
    # input list directly (conv of a concat == sum of per-piece convs with the
    # same kernel slices — numerically the same network, no wide concat
    # tensors in HBM). On by default; checkpoints are interchangeable with the
    # concatenated form either way.
    split_concat: bool = True
    # Run the flip/affine augmentation on the HOST decode pool (PIL C warp,
    # data/host_aug.py) pipelined one batch ahead, instead of inside the
    # jitted step. Removes the tile-granular gathers from the device step
    # (round-2 xplane put them at ~11 ms of the b4 step); uint8 rounding
    # like the reference's albumentations pipeline, which also augments on
    # host workers. Default ON by measurement (round 3, v5e end-to-end
    # Trainer epochs): b4 39.0 -> 49.4 img/s, b16 62.7 -> 64.7. The numpy
    # warp was measured and REJECTED (31.5 img/s at b4: it holds the GIL
    # and starves step dispatch); see BASELINE.md.
    host_aug: bool = True
    # RAM-cache decoded images across epochs (identical PNG/TIFF decode work
    # every epoch otherwise; ~200 KB/pair at 256²). --no-cache_decoded for
    # datasets larger than host memory.
    cache_decoded: bool = True
    # Fold the gradient-penalty interpolates into the stacked D forward as a
    # third batch of rows; the GP's inner gradient comes from the vjp
    # pullback of that single 3B-row forward instead of a separate B-row
    # forward inside a nested jax.grad. Exact (every D op is per-sample).
    # Tri-state: None = auto (see effective_gp_fused()); flags force.
    gp_fused: Optional[bool] = None
    # bf16-resident discriminator: D activations keep the compute dtype
    # between ops (the logits head always emits f32). The GP second-order
    # numerics were measured (drift + quality, BASELINE.md round 4) rather
    # than assumed. Tri-state: None = auto (see effective_disc_bf16()).
    disc_bf16: Optional[bool] = None
    # SAME-padding discriminator VARIANT (changes the trained function, like
    # --space_to_depth): pow2 patch map 64² instead of 57², dense tiles on
    # every D row. Off by default; checkpoints share parameter shapes but
    # are not interchangeable in behavior.
    disc_same_pad: bool = False
    profile_dir: str = ""  # dump a jax.profiler (xplane) trace of epoch 1 here
    debug_nans: bool = False  # jax_debug_nans + per-epoch non-finite guard
    # Periodic-checkpoint backend. 'native' = reference-compatible msgpack
    # (gather to host 0); 'orbax' = sharded async step-numbered checkpoints
    # (no host gather — each process writes its own shards; resume picks the
    # latest step automatically). final_model.pth is always native (it is
    # the reference artifact contract).
    ckpt_backend: str = "native"

    # ------------------------------------------------------------------
    # Derived properties (mirroring reference train-time logic).
    # ------------------------------------------------------------------

    @property
    def activation(self) -> bool:
        """Whether the generator head applies Tanh.

        Truth table from /root/reference/train.py:33 — True only for 'ls'
        ('ce', 'w' and 'hinge' all train activation-free).
        """
        if self.loss in ("w", "hinge"):
            return False
        return self.loss != "ce"

    @property
    def return_filter(self) -> bool:
        """Version-2 losses need the discriminator's intermediate features
        (/root/reference/train.py:34)."""
        return self.version == 2

    @property
    def label_smoothing(self) -> bool:
        return not self.no_label_smoothing

    def effective_use_pallas(self, data_axis_size: Optional[int] = None) -> bool:
        """Pallas kernels only pay off (and only Mosaic-compile) on TPU, and
        only at small PER-CHIP batches — measured on v5e at 256^2/nf=64
        (round 2, batch-lane fwd+bwd kernels + split_concat + lhs-dilated
        up-conv, img/s pallas vs XLA): b4 39.9 vs 28.8, b8 51.5 vs 69.9,
        b16 47 vs 73.5 — the custom-VJP fusion barrier stops paying once
        the batch amortizes XLA's saved activations; the crossover sits
        between 4 and 8, so the gate is per-chip batch <= 4 (round 1's <= 8
        gate was interpolated from b4/b16 only and was wrong at b8).

        The crossover is a per-chip property: under a data-parallel mesh each
        chip steps batch_size / data_axis_size rows, so a global batch 16 over
        4 chips is in the b4 regime where the kernel wins. ``data_axis_size``
        is the mesh's actual data-axis width (the Trainer passes it);
        defaulting to None derives it from mesh_data / visible devices the
        same way Trainer builds the mesh.
        """
        import jax
        if self.force_pallas:
            return True
        if not (self.use_pallas and jax.default_backend() == "tpu"):
            return False
        per_chip = self.per_chip_batch(data_axis_size)
        return per_chip <= 4

    def per_chip_batch(self, data_axis_size: Optional[int] = None) -> int:
        """Rows each chip steps under the (implied) data-parallel mesh.

        ``data_axis_size=None`` derives the data-axis width from
        mesh_data / visible devices exactly the way Trainer builds the mesh
        (including the single-process shrink-to-divisor), so gates that
        default it agree with the mesh the Trainer will actually use.
        """
        import jax
        if data_axis_size is None:
            n_model = max(1, self.mesh_model)
            avail = max(1, len(jax.devices()) // n_model)
            n = self.mesh_data if self.mesh_data > 0 else avail
            # Mirror Trainer's single-process shrink-to-divisor so the two
            # agree on the per-chip batch (multi-host forbids shrinking).
            if jax.process_count() == 1:
                n = max(1, min(n, self.batch_size, avail))
                while self.batch_size % n:
                    n -= 1
            data_axis_size = n
        return -(-self.batch_size // max(1, data_axis_size))

    def effective_lane_pack(self, data_axis_size: Optional[int] = None) -> bool:
        """The w-packed convs only pay on the TPU MXU (CPU/GPU convs gain
        nothing from output-lane packing and lose the 1.33x extra MACs).

        Tri-state --lane_pack: an explicit flag wins; auto (None) engages
        exactly where it measured a win — the XLA norm path at per-chip
        batch <= 4 (b4 XLA 28.8 -> 36.2 img/s on v5e). Around the Pallas
        norm kernel the packed/unpack reshape at the custom-VJP boundary
        costs more than the fwd gain (40.2 -> 39.6), and at b16 XLA the
        saved-activation fusions win (73.5 -> 69.5) — auto stays off there.
        """
        import jax
        if jax.default_backend() != "tpu":
            return False
        if self.lane_pack is not None:
            return self.lane_pack
        return (not self.effective_use_pallas(data_axis_size)
                and self.per_chip_batch(data_axis_size) <= 4
                and not self.effective_packed_row0(data_axis_size))

    def effective_bf16_resident(self, data_axis_size: Optional[int] = None
                                ) -> bool:
        """bf16-resident deep rows: measured +7.4% on the b16 XLA path
        (BASELINE.md round 3). Round 4 made the fused Pallas norm kernels
        bf16-capable (f32 statistics in VMEM), so the auto gate now also
        engages on the pallas-norm path: b4 73.9 -> 74.2 (74.8 with the
        bf16-resident D) — small but free. Auto = on under bf16 compute."""
        import jax
        if self.bf16_resident is not None:
            return self.bf16_resident
        if jax.default_backend() != "tpu":
            return False
        return not jnp_is_f32(self.compute_dtype)

    def effective_packed_row0(self, data_axis_size: Optional[int] = None
                              ) -> bool:
        """Packed-resident row 0 runs the custom Pallas conv kernel — TPU
        only (off-TPU the exact XLA twin exists but measures slower than
        the plain conv path). Auto engages for the supported geometry
        (UNet++, nf <= 64 so 2*nf lanes fit one 128-lane tile,
        split_concat, no space_to_depth) at EVERY per-chip batch since
        round 5: the in-VMEM wgrad kernel removed the 12 ms/step of
        shifted-view HBM traffic that made the packed backward lose at
        large batches. Measured on v5e (full step, round 5, vs the best
        non-packed config): b4 82.4 vs 77.2, b8 XLA 110.6 vs 100.2,
        b16 XLA 110.1 vs 104.4 img/s. (The round-3 gate was per-chip
        batch <= 4 — that measured the old einsum wgrad.)"""
        import jax
        if jax.default_backend() != "tpu":
            # Testing escape hatch (mirrors force_pallas): an explicit
            # --packed_row0 together with --force_pallas engages the packed
            # model off-TPU — the convs run their exact XLA twin — so the
            # CPU-mesh tests and the driver dryrun exercise the production
            # wiring.
            return bool(self.force_pallas and self.packed_row0)
        ok = (self.gen.lower() == "unet++" and 2 * self.nf <= 128
              and self.split_concat and not self.space_to_depth
              and self.image_size % 2 == 0)
        if self.packed_row0 is not None:
            if self.packed_row0 and not ok:
                raise ValueError(
                    "--packed_row0 needs UNet++, nf<=64, split_concat and "
                    "no space_to_depth")
            return self.packed_row0
        return ok

    def effective_gp_fused(self) -> bool:
        """Auto default for the fused-GP step form: OFF — measured round 4
        on v5e (full G+D step, img/s): b4 73.9 -> 73.2, b16 XLA 94.6 ->
        87.6. The 3B-row inner pullback back-propagates through the fake/
        real rows with zero cotangents, and that wasted 2B-row dgrad work
        costs more than folding the GP forward into the stacked call saves.
        The form stays available (--gp_fused) as the measured-and-rejected
        record; it is exactly the nested-grad step (tests pin equality)."""
        if self.gp_fused is not None:
            return self.gp_fused
        return False

    def effective_disc_bf16(self) -> bool:
        """bf16-resident discriminator: auto engages on TPU under bf16
        compute. Measured round 4 on v5e (full step img/s): b16 XLA 94.6 ->
        95.1, b4 neutral; the GP value through the bf16-resident D drifts
        0.28% after three compounding steps (vs f32-resident, same state)
        and quality at defaults is unchanged — BASELINE.md round 4 retires
        the round-3 CORRECTION's un-measured second-order risk."""
        import jax
        if self.disc_bf16 is not None:
            return self.disc_bf16
        if jax.default_backend() != "tpu" or jnp_is_f32(self.compute_dtype):
            return False
        return True

    @property
    def work_root(self) -> str:
        """Directory that holds models/ checkpoints/ Outputs/ — the reference
        derives it as ``data.rsplit('/', 1)[0]`` (/root/reference/train.py:266-272)."""
        return self.data.rsplit("/", 1)[0] if "/" in self.data else "."

    def models_dir(self) -> str:
        return os.path.join(self.work_root, "models", self.folder_save)

    def checkpoints_dir(self) -> str:
        return os.path.join(self.work_root, "checkpoints", self.folder_save)

    # ------------------------------------------------------------------
    # params.txt round-trip.
    # ------------------------------------------------------------------

    _REFERENCE_KEYS = (
        "data", "batch_size", "input_dim", "output_dim", "initial_epoch",
        "total_epochs", "epoch_constant", "lr", "no_label_smoothing", "beta1",
        "threads", "lambda_a", "lambda_gp", "lambda_per", "w_per", "gen", "nf",
        "loss", "no_aug", "target", "version", "folder_save", "folder_load",
        "checkpoint_interval", "continue_training", "reg_every",
    )

    def to_params_dict(self) -> dict:
        """The exact key set the reference writes (opt.__dict__ of its argparse
        namespace), plus our extension keys. w_per serializes as a list like
        argparse's nargs=4."""
        d = dataclasses.asdict(self)
        d["w_per"] = list(self.w_per)
        return d

    def save_params(self, folderpath: str, extra: Optional[dict] = None) -> None:
        """Write params.txt like /root/reference/train.py:222-227. ``extra``
        adds run-provenance keys (ignored by every reader, ours included)."""
        d = self.to_params_dict()
        if extra:
            d.update(extra)
        with open(os.path.join(folderpath, "params.txt"), "w") as f:
            f.write(json.dumps(d))

    @classmethod
    def from_params_file(cls, path: str) -> "TrainConfig":
        """Rehydrate a config from params.txt (reference or ours).

        Unknown keys are ignored; missing extension keys fall back to
        defaults, so a params.txt written by the PyTorch reference loads
        cleanly (the test.py analogue of /root/reference/test.py:29-34).
        """
        with open(path) as f:
            raw = json.load(f)
        field_names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in field_names}
        if "w_per" in kwargs:
            kwargs["w_per"] = tuple(float(x) for x in kwargs["w_per"])
        return cls(**kwargs)


def build_arg_parser() -> argparse.ArgumentParser:
    """The reference train CLI (/root/reference/train.py:231-257) plus the
    TPU-native extension flags."""
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="./data", help="dataset directory")
    p.add_argument("--batch_size", type=int, default=4, help="training batch size")
    p.add_argument("--input_dim", type=int, default=3, help="input depth size")
    p.add_argument("--output_dim", type=int, default=3, help="output depth size")
    p.add_argument("--initial_epoch", type=int, default=1,
                   help="starting epoch, useful when resuming a half-trained model")
    p.add_argument("--total_epochs", type=int, default=135,
                   help="total epochs to train for")
    p.add_argument("--epoch_constant", type=int, default=25,
                   help="epochs to keep the learning rate constant")
    p.add_argument("--lr", type=float, default=0.001, help="learning rate")
    p.add_argument("--no_label_smoothing", default=False, action="store_true",
                   help="disable one-sided label smoothing")
    p.add_argument("--beta1", type=float, default=0.9, help="Adam beta1")
    p.add_argument("--threads", type=int, default=8,
                   help="host threads for loading the dataset")
    p.add_argument("--lambda_a", type=float, default=1, help="L1 loss coefficient")
    p.add_argument("--lambda_gp", type=float, default=0.01,
                   help="gradient penalty coefficient")
    p.add_argument("--lambda_per", type=float, default=1,
                   help="perceptual loss coefficient")
    p.add_argument("--w_per", nargs=4, type=float, default=[0, 0.1, 0.3, 0.6],
                   help="perceptual weights")
    p.add_argument("--gen", default="UNet++", choices=["UNet++", "UNet", "BCDUNet"],
                   help="generator architecture")
    p.add_argument("--nf", type=int, default=64,
                   help="base filter count of the architectures")
    p.add_argument("--loss", default="ls", choices=["ls", "ce", "w", "hinge"],
                   help="GAN objective")
    p.add_argument("--no_aug", default=False, action="store_true",
                   help="disable dataset augmentation")
    p.add_argument("--target", default="rgb", choices=["ch", "rgb"],
                   help="target image format")
    p.add_argument("-v", "--version", type=int, default=1, choices=[1, 2],
                   help="tactile GAN version (selects the perceptual-loss variant)")
    p.add_argument("--folder_save", default="pix2obj", help="model save folder")
    p.add_argument("--folder_load", default="pix2obj", help="model load folder")
    p.add_argument("--checkpoint_interval", type=int, default=-1,
                   help="epochs between intermediate checkpoints (-1 = none)")
    p.add_argument("--continue_training", default=False, action="store_true",
                   help="load pretrained weights before training")
    p.add_argument("--reg_every", type=int, default=1,
                   help="apply gradient-penalty regularization on epochs divisible by this")
    # TPU-native extensions
    p.add_argument("--seed", type=int, default=21, help="PRNG seed")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"], help="conv compute dtype")
    p.add_argument("--image_size", type=int, default=256, help="square image size")
    p.add_argument("--use_pallas", default=True, action=argparse.BooleanOptionalAction,
                   help="fused Pallas instance-norm kernels (TPU only; "
                        "+37%% measured train throughput). --no-use_pallas "
                        "forces the plain XLA path.")
    p.add_argument("--force_pallas", default=False, action="store_true",
                   help="testing: engage the Pallas kernels regardless of "
                        "backend/batch gates (interpret mode off-TPU)")
    p.add_argument("--vgg_weights", default="",
                   help="local .npz of pretrained VGG16 feature weights for "
                        "perceptual loss v1 (random-feature fallback if empty)")
    p.add_argument("--mesh_data", type=int, default=0,
                   help="data-parallel mesh size (0 = all local devices)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="tensor-parallel mesh size; splits wide conv kernels "
                        "(>=256 output channels) over the 'model' axis")
    p.add_argument("--space_to_depth", default=False, action="store_true",
                   help="UNet++ perf variant: run the full-resolution row "
                        "2x2-folded (changes the network; checkpoints are "
                        "variant-specific)")
    p.add_argument("--split_concat", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="UNet++ concat-free nested-node convs (same network, "
                        "same checkpoint format; skips materializing the "
                        "node concats in HBM)")
    p.add_argument("--lane_pack", default=None,
                   action=argparse.BooleanOptionalAction,
                   help="UNet++ perf: exact w-packed row-0 convs (two output "
                        "columns per MXU window; same network, same "
                        "checkpoints; TPU only). Default auto: on for the "
                        "XLA norm path at per-chip batch <= 4, off "
                        "elsewhere (measured, see BASELINE.md)")
    p.add_argument("--bf16_resident", default=None,
                   action=argparse.BooleanOptionalAction,
                   help="UNet++ perf: keep DEEP-ROW (rows 1-4) activations "
                        "bf16 between ops (dense C>=128 tiles; default "
                        "auto: on under bf16 compute). Row-0 residency is "
                        "tied to --packed_row0, not this flag: the packed "
                        "row is bf16-resident whenever compute is bf16 "
                        "(measured +21%, BASELINE.md round 3)")
    p.add_argument("--packed_row0", default=None,
                   action=argparse.BooleanOptionalAction,
                   help="UNet++ perf: keep the full-resolution row in the "
                        "w-pair packed layout (custom Pallas conv, free "
                        "packed-space norms; same network, same checkpoints; "
                        "TPU only). Default auto: on when supported")
    p.add_argument("--legacy_label_cache", default=False, action="store_true",
                   help="reference-exact label smoothing: sample the real-"
                        "target noise once and reuse it for every batch "
                        "(reference generators.py:52-63) instead of fresh "
                        "per-step noise")
    p.add_argument("--host_aug", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="run flip/affine augmentation on the host decode "
                        "pool (PIL, one batch ahead) instead of on-device "
                        "inside the jitted step (default on: b4 39->49 "
                        "img/s measured; --no-host_aug restores the "
                        "on-device path)")
    p.add_argument("--cache_decoded", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="RAM-cache decoded images across epochs "
                        "(--no-cache_decoded for datasets larger than host "
                        "memory)")
    p.add_argument("--gp_fused", default=None,
                   action=argparse.BooleanOptionalAction,
                   help="fold the gradient-penalty interpolates into the "
                        "stacked D forward (one 3B-row call; exact). "
                        "Default auto: OFF — measured slower on v5e (b16 "
                        "94.6 -> 87.6 img/s; BASELINE.md round 4)")
    p.add_argument("--disc_bf16", default=None,
                   action=argparse.BooleanOptionalAction,
                   help="bf16-resident discriminator activations (logits "
                        "head stays f32). Default auto: on for TPU under "
                        "bf16 compute (GP drift + quality measured, "
                        "BASELINE.md round 4)")
    p.add_argument("--disc_same_pad", default=False,
                   action=argparse.BooleanOptionalAction,
                   help="SAME-padding discriminator VARIANT (64^2 patch "
                        "map, pow2 rows; changes the trained function like "
                        "--space_to_depth). Measured SLOWER on v5e (b4 "
                        "74.0 -> 71.4, b16 95.1 -> 94.0: the 18%% extra "
                        "patch FLOPs beat the dense-tiling gain) — kept as "
                        "the measured record, off by default")
    p.add_argument("--profile_dir", default="",
                   help="dump a jax.profiler trace of the first epoch here")
    p.add_argument("--ckpt_backend", default="native",
                   choices=["native", "orbax"],
                   help="periodic-checkpoint backend: 'native' writes "
                        "reference-compatible msgpack model_<epoch>.pth; "
                        "'orbax' writes sharded async step checkpoints "
                        "(pod-scale: no host gather, auto latest-step "
                        "resume). final_model.pth is always native.")
    p.add_argument("--debug_nans", default=False, action="store_true",
                   help="enable jax_debug_nans and per-epoch NaN guards")
    return p


def config_from_args(argv: Optional[List[str]] = None) -> TrainConfig:
    args = build_arg_parser().parse_args(argv)
    d = vars(args).copy()
    d["w_per"] = tuple(d["w_per"])
    d.setdefault("drop_last", True)
    return TrainConfig(**d)
