from dsic_tpu.models.layers import (
    GDN,
    AnalysisTransform,
    SynthesisTransform,
    HyperAnalysis,
    HyperSynthesis,
)
from dsic_tpu.models.compression_model import (
    CompressionModel,
    rate_distortion_loss,
)
from dsic_tpu.models.zoo import (
    MODEL_ZOO, ModelSpec, build,
    ZOO_FAMILIES, ZOO_QUALITY, CHENG_QUALITY,
    ScaleHyperprior, MeanScaleHyperprior,
    build_zoo_model, zoo_ckpt_name, zoo_quality, zoo_qualities,
)
from dsic_tpu.models.cheng import Cheng2020Checkerboard

__all__ = [
    "GDN", "AnalysisTransform", "SynthesisTransform", "HyperAnalysis",
    "HyperSynthesis", "CompressionModel", "rate_distortion_loss",
    "MODEL_ZOO", "ModelSpec", "build",
    "ZOO_FAMILIES", "ZOO_QUALITY", "CHENG_QUALITY",
    "ScaleHyperprior", "MeanScaleHyperprior", "Cheng2020Checkerboard",
    "build_zoo_model", "zoo_ckpt_name", "zoo_quality", "zoo_qualities",
]
