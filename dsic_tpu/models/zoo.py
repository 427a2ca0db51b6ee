"""Model registry: named configurations + factory.

The reference has one architecture with two hyper-parameter modes and a
(N, M) capacity knob scattered across scripts (model.py:13, config.py:19-28,
eval scripts' constants); the registry gives them stable names. Baseline
codecs for comparison (JPEG live, bmshj/mbt/cheng recorded curves) live in
eval/jpeg.py and eval/baselines.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from dsic_tpu.models.compression_model import CompressionModel


@dataclass(frozen=True)
class ModelSpec:
    name: str
    N: int
    M: int
    spatial_params: bool = False
    min_nu: float = 2.0
    max_nu: float = 100.0
    description: str = ""


MODEL_ZOO: dict[str, ModelSpec] = {
    # the reference's published configuration (config.py:19-28)
    "dsic": ModelSpec("dsic", N=128, M=192,
                      description="flagship: global per-channel Student-t "
                                  "params (the reference's evaluated model)"),
    "dsic-spatial": ModelSpec("dsic-spatial", N=128, M=192,
                              spatial_params=True,
                              description="per-pixel Student-t parameter maps "
                                          "(layers.py spatial_params=True)"),
    "dsic-small": ModelSpec("dsic-small", N=64, M=96,
                            description="half-width variant for fast "
                                        "experimentation"),
    "dsic-large": ModelSpec("dsic-large", N=192, M=320,
                            description="higher-capacity variant for "
                                        "high-rate points"),
}


def build(name: str, dtype=None) -> CompressionModel:
    spec = MODEL_ZOO.get(name)
    if spec is None:
        raise KeyError(f"unknown model '{name}'; available: "
                       f"{sorted(MODEL_ZOO)}")
    return CompressionModel(N=spec.N, M=spec.M,
                            spatial_params=spec.spatial_params,
                            min_nu=spec.min_nu, max_nu=spec.max_nu,
                            dtype=dtype)
