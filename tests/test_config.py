"""Config/flag-surface tests: reference CLI compatibility contract."""

import json

import pytest

from tactile_gan_tpu.core.config import (
    TrainConfig, build_arg_parser, config_from_args,
)


def test_defaults_match_reference():
    """Code defaults are ground truth (SURVEY.md quirk 7), from
    /root/reference/train.py:231-257."""
    cfg = TrainConfig()
    assert cfg.data == "./data"
    assert cfg.batch_size == 4
    assert cfg.total_epochs == 135
    assert cfg.epoch_constant == 25
    assert cfg.lr == 0.001
    assert cfg.beta1 == 0.9
    assert cfg.lambda_a == 1.0
    assert cfg.lambda_gp == 0.01
    assert cfg.lambda_per == 1.0
    assert cfg.w_per == (0.0, 0.1, 0.3, 0.6)
    assert cfg.gen == "UNet++"
    assert cfg.nf == 64
    assert cfg.loss == "ls"
    assert cfg.target == "rgb"
    assert cfg.version == 1
    assert cfg.checkpoint_interval == -1
    assert cfg.reg_every == 1
    assert cfg.seed == 21  # reference util.py:8-11


@pytest.mark.parametrize("loss,expected", [
    ("ls", True), ("ce", False), ("w", False), ("hinge", False),
])
def test_activation_truth_table(loss, expected):
    """/root/reference/train.py:33 — code wins over its own comment."""
    assert TrainConfig(loss=loss).activation is expected


def test_return_filter_follows_version():
    assert TrainConfig(version=1).return_filter is False
    assert TrainConfig(version=2).return_filter is True


def test_cli_parses_reference_flags():
    cfg = config_from_args([
        "--data", "./mydata", "--batch_size", "8", "--gen", "BCDUNet",
        "--loss", "hinge", "--target", "ch", "-v", "2",
        "--lambda_gp", "0.1", "--w_per", "1", "2", "3", "4",
        "--no_label_smoothing", "--no_aug", "--reg_every", "16",
        "--folder_save", "exp1",
    ])
    assert cfg.gen == "BCDUNet" and cfg.loss == "hinge"
    assert cfg.version == 2 and cfg.target == "ch"
    assert cfg.w_per == (1.0, 2.0, 3.0, 4.0)
    assert cfg.no_label_smoothing and cfg.no_aug
    assert cfg.label_smoothing is False
    assert cfg.reg_every == 16 and cfg.folder_save == "exp1"


def test_cli_rejects_invalid_choices():
    parser = build_arg_parser()
    with pytest.raises(SystemExit):
        parser.parse_args(["--gen", "ResNet"])
    with pytest.raises(SystemExit):
        parser.parse_args(["--loss", "relativistic"])
    with pytest.raises(SystemExit):
        parser.parse_args(["--version", "3"])


def test_work_root_derivation():
    """checkpoints/models live next to data: data.rsplit('/',1)[0]
    (/root/reference/train.py:266-272)."""
    assert TrainConfig(data="./data").work_root == "."
    assert TrainConfig(data="/scratch/ds/data").work_root == "/scratch/ds"
    assert TrainConfig(data="data").work_root == "."


def test_params_dict_reference_keyset(tmp_path):
    cfg = TrainConfig()
    d = cfg.to_params_dict()
    for k in TrainConfig._REFERENCE_KEYS:
        assert k in d
    assert isinstance(d["w_per"], list)
    # round-trip through file
    cfg.save_params(str(tmp_path))
    with open(tmp_path / "params.txt") as f:
        loaded = json.load(f)
    assert loaded == d
    assert TrainConfig.from_params_file(str(tmp_path / "params.txt")) == cfg


def test_pallas_gate_is_per_chip(monkeypatch):
    """The b4/b8 crossover is a per-chip property: a global batch 16 over a
    4-wide data axis steps b4 shards (the regime where the kernel wins), so
    the gate must divide by the data-axis width (round-2 VERDICT weak #2)."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    # Explicit mesh width from the Trainer: 16/4 = per-chip 4 -> on.
    assert TrainConfig(batch_size=16).effective_use_pallas(
        data_axis_size=4) is True
    # Single chip at b16 stays off; b4 stays on.
    assert TrainConfig(batch_size=16).effective_use_pallas(
        data_axis_size=1) is False
    assert TrainConfig(batch_size=4).effective_use_pallas(
        data_axis_size=1) is True
    # Derived default (no explicit width): mesh_data pins the axis.
    assert TrainConfig(batch_size=16, mesh_data=4).effective_use_pallas() \
        is True
    assert TrainConfig(batch_size=16, mesh_data=1).effective_use_pallas() \
        is False
    # Off-TPU the gate is always off regardless of batch.
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert TrainConfig(batch_size=4).effective_use_pallas(
        data_axis_size=1) is False


def test_lane_pack_auto_gate(monkeypatch):
    """Auto --lane_pack engages exactly where it measured a win (round 3,
    BASELINE.md): TPU, XLA norm path, per-chip batch <= 4. Explicit flags
    override; off-TPU it is always off."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    # Default b4 single chip selects the Pallas norm path -> lane_pack off.
    assert TrainConfig(batch_size=4).effective_lane_pack(
        data_axis_size=1) is False
    # XLA norm path at per-chip 4: packed_row0 auto covers the row-0 convs
    # better, so lane_pack stays off by default...
    assert TrainConfig(batch_size=4, use_pallas=False).effective_lane_pack(
        data_axis_size=1) is False
    # ...and auto-engages when packed_row0 is unavailable (forced off, or
    # unsupported geometry like a non-UNet++ generator).
    assert TrainConfig(batch_size=4, use_pallas=False,
                       packed_row0=False).effective_lane_pack(
        data_axis_size=1) is True
    assert TrainConfig(batch_size=4, use_pallas=False,
                       gen="UNet").effective_lane_pack(data_axis_size=1) \
        is True
    # XLA path at per-chip 16 -> off (b16 XLA measured a regression).
    assert TrainConfig(batch_size=16, use_pallas=False).effective_lane_pack(
        data_axis_size=1) is False
    # Per-chip property: global 16 over 4 chips on the XLA path (packed off).
    assert TrainConfig(batch_size=16, use_pallas=False,
                       packed_row0=False).effective_lane_pack(
        data_axis_size=4) is True
    # Explicit flags override auto in both directions.
    assert TrainConfig(batch_size=4, lane_pack=True).effective_lane_pack(
        data_axis_size=1) is True
    assert TrainConfig(batch_size=4, use_pallas=False,
                       lane_pack=False).effective_lane_pack(
        data_axis_size=1) is False
    # Off-TPU always off, even when forced.
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert TrainConfig(batch_size=4, lane_pack=True).effective_lane_pack(
        data_axis_size=1) is False


def test_packed_row0_auto_gate(monkeypatch):
    """Auto --packed_row0: TPU + UNet++ + nf<=64 + split_concat + no s2d at
    EVERY per-chip batch (round 5: the in-VMEM wgrad kernel made packed win
    at b4/b8/b16 — BASELINE.md); explicit flags override; invalid geometry
    with an explicit True raises; off-TPU always off."""
    import jax

    import pytest as _pytest

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert TrainConfig(batch_size=4).effective_packed_row0(
        data_axis_size=1) is True
    # Round 5: on at b16 too (110.1 vs 104.4 img/s measured).
    assert TrainConfig(batch_size=16).effective_packed_row0(
        data_axis_size=1) is True
    assert TrainConfig(batch_size=16).effective_packed_row0(
        data_axis_size=4) is True
    # Explicit False still wins.
    assert TrainConfig(batch_size=16, packed_row0=False).\
        effective_packed_row0(data_axis_size=1) is False
    # Unsupported geometries stay off.
    assert TrainConfig(batch_size=4, gen="UNet").effective_packed_row0(
        data_axis_size=1) is False
    assert TrainConfig(batch_size=4, nf=128).effective_packed_row0(
        data_axis_size=1) is False
    assert TrainConfig(batch_size=4,
                       space_to_depth=True).effective_packed_row0(
        data_axis_size=1) is False
    # Explicit True on an unsupported geometry is a loud error.
    with _pytest.raises(ValueError):
        TrainConfig(batch_size=4, nf=128,
                    packed_row0=True).effective_packed_row0(data_axis_size=1)
    # Explicit override at b16.
    assert TrainConfig(batch_size=16,
                       packed_row0=True).effective_packed_row0(
        data_axis_size=1) is True
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert TrainConfig(batch_size=4,
                       packed_row0=True).effective_packed_row0(
        data_axis_size=1) is False


def test_bf16_resident_auto_gate(monkeypatch):
    """Auto --bf16_resident: on under bf16 compute on TPU. Round 4 made the
    fused Pallas norms bf16-capable, so the pallas-norm b4 default engages
    it too (b4 73.9 -> 74.8 with the resident D, BASELINE.md round 4)."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert TrainConfig(batch_size=16).effective_bf16_resident(
        data_axis_size=1) is True
    # Round 4: the pallas-norm b4 default now engages it as well.
    assert TrainConfig(batch_size=4).effective_bf16_resident(
        data_axis_size=1) is True
    assert TrainConfig(batch_size=4, use_pallas=False).effective_bf16_resident(
        data_axis_size=1) is True
    # f32 compute never.
    assert TrainConfig(batch_size=16,
                       compute_dtype="float32").effective_bf16_resident(
        data_axis_size=1) is False
    # Explicit flags force either way.
    assert TrainConfig(batch_size=4, bf16_resident=True
                       ).effective_bf16_resident(data_axis_size=1) is True
    assert TrainConfig(batch_size=16, bf16_resident=False
                       ).effective_bf16_resident(data_axis_size=1) is False
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert TrainConfig(batch_size=16).effective_bf16_resident(
        data_axis_size=1) is False
