"""Typed configuration tree.

One config serves train + eval + codec (the reference scatters per-script
constants; see /root/reference/code/modelv2/config.py:4-45 for the field names
and defaults preserved here for parity).
"""

from __future__ import annotations

import dataclasses
import importlib.util
from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass
class DataConfig:
    """Mirrors reference DATA (config.py:4-10)."""

    root: str = ""
    crop_size: int = 256
    num_workers: int = 8
    batch_size: int = 16
    # TPU-specific: training requires static shapes. "pad" pads each image to a
    # multiple of 16 (reference behavior, uniform-size datasets only);
    # "crop" random-crops/pads to exactly (crop_size, crop_size).
    shape_policy: str = "pad"
    pad_multiple: int = 16
    val_fraction: float = 0.1
    seed: int = 42
    prefetch: int = 2
    # "uint8" ships 8-bit images to the device (4x less transfer; jitted
    # steps normalize on device); "float32" matches the reference loader.
    wire_dtype: str = "uint8"


@dataclass
class OptimConfig:
    """Mirrors reference OPTIM (config.py:12-17). The reference trains at a
    constant lr (train.py:182); ``lr_schedule="cosine"`` adds warmup + cosine
    decay to ``lr * min_lr_ratio`` over ``decay_steps`` total steps — needed
    for smooth converged RD points in equal-steps sweeps."""

    lr: float = 1e-4
    weight_decay: float = 0.0
    betas: tuple = (0.9, 0.999)
    grad_clip: float = 1.0
    lr_schedule: str = "constant"  # "constant" | "cosine"
    warmup_steps: int = 0
    decay_steps: int = 0  # required > 0 when lr_schedule == "cosine"
    min_lr_ratio: float = 0.0  # final lr = lr * min_lr_ratio (cosine)


@dataclass
class ModelConfig:
    """Mirrors reference MODEL (config.py:19-28). ``family`` selects the
    architecture: "dsic" (the reference's Student-t hyperprior) or a live
    baseline from models/zoo.py ("bmshj2018", "mbt2018_mean")."""

    family: str = "dsic"
    N: int = 128
    M: int = 192
    spatial_params: bool = False
    min_nu: float = 2.0
    max_nu: float = 100.0
    # channel-slice width for the slice-conditional families (charm2020,
    # elic2022): K = M / slice_size. 32 is the Minnen-Singh 2020 layout;
    # see demo_results charm_slice_ablation for the measured K trade-off.
    slice_size: int = 32


@dataclass
class TrainConfig:
    """Mirrors reference TRAIN (config.py:30-34). ``amp`` maps to bfloat16
    activation compute on TPU (params stay float32)."""

    seed: int = 42
    epochs: int = 30
    amp: bool = True
    # Which params land in the final `alpha{lambda}lambda` checkpoint:
    # "last" = final-step params (reference behavior, train.py:227-235);
    # "best" = the lowest-validation-loss params seen at any val_every point
    # (the reference's commented-out best-val save, train.py:215-225, made
    # first-class — required for monotone RD curves from finite-step sweeps).
    select: str = "last"
    # Train-time quantization relaxation: "noise" = additive U(-0.5, 0.5)
    # (reference behavior, model.py:27-35); "round" = STE rounding — used as
    # a short FINE-TUNE stage after noise training so the rate term is
    # minimized under the hard rounding the codec actually applies (zero-mean
    # priors otherwise pay a model-dependent noise->round rate gap of up to
    # ~0.5 bpp that scrambles low-rate sweep ordering; Minnen-Singh 2020
    # section 4 trains its final models the same way).
    quant_mode: str = "noise"


@dataclass
class LossConfig:
    """Mirrors reference LOSS (config.py:36-39)."""

    lambda_rd: float = 10000.0
    dist: str = "msssim"  # "mse" or "msssim"


@dataclass
class LoggingConfig:
    """Mirrors reference LOGGING (config.py:41-45)."""

    ckpt_dir: str = "checkpoints"
    log_every: int = 100
    val_every: int = 1000


@dataclass
class CodecConfig:
    """Entropy-codec knobs (reference: eval_selfcontained_entropy.py:26 tail)."""

    tail: int = 10
    precision_bits: int = 16  # total frequency = 1 << precision_bits
    interleave: int = 4  # N-way interleaved rANS states in the native coder
    support_bucket: int = 64  # pad CDF support length to a multiple (static shapes)


@dataclass
class ParallelConfig:
    """TPU mesh layout. The reference is single-device (SURVEY.md section 2);
    here data parallelism is first-class and spatial partitioning is available
    for full-scene encode."""

    data: int = -1  # -1: all available devices on the data axis
    spatial: int = 1


@dataclass
class Config:
    DATA: DataConfig = field(default_factory=DataConfig)
    OPTIM: OptimConfig = field(default_factory=OptimConfig)
    MODEL: ModelConfig = field(default_factory=ModelConfig)
    TRAIN: TrainConfig = field(default_factory=TrainConfig)
    LOSS: LossConfig = field(default_factory=LossConfig)
    LOGGING: LoggingConfig = field(default_factory=LoggingConfig)
    CODEC: CodecConfig = field(default_factory=CodecConfig)
    PARALLEL: ParallelConfig = field(default_factory=ParallelConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def load_config(path: str | None = None, overrides: dict[str, Any] | None = None) -> Config:
    """Build a Config. ``path`` may point to a python module defining any of
    DATA/OPTIM/MODEL/TRAIN/LOSS/LOGGING/CODEC/PARALLEL (dataclasses or plain
    classes with attributes), mirroring the reference's importlib config
    loading (train.py:139-143). ``overrides`` is a flat dict of
    "SECTION.field" -> value applied last."""

    cfg = Config()
    if path:
        spec = importlib.util.spec_from_file_location("user_config", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)  # type: ignore[union-attr]
        for section_name in ("DATA", "OPTIM", "MODEL", "TRAIN", "LOSS",
                             "LOGGING", "CODEC", "PARALLEL"):
            user_sec = getattr(mod, section_name, None)
            if user_sec is None:
                continue
            if isinstance(user_sec, type):
                user_sec = user_sec()
            cur = getattr(cfg, section_name)
            kw = {}
            for f in dataclasses.fields(cur):
                if hasattr(user_sec, f.name):
                    kw[f.name] = getattr(user_sec, f.name)
            setattr(cfg, section_name, dataclasses.replace(cur, **kw))
    for key, value in (overrides or {}).items():
        section_name, _, fname = key.partition(".")
        cur = getattr(cfg, section_name)
        setattr(cfg, section_name, dataclasses.replace(cur, **{fname: value}))
    return cfg


# Reference lambda grid (modelseval.py:43) and checkpoint naming convention
# `alpha{lambda}lambda` (train.py:227-235, modelseval.py:133).
LAMBDA_GRID: Sequence[float] = (10, 25, 50, 100, 250, 500, 1000, 10000)


def ckpt_name(lambda_rd: float) -> str:
    lam = int(lambda_rd) if float(lambda_rd).is_integer() else lambda_rd
    return f"alpha{lam}lambda"
