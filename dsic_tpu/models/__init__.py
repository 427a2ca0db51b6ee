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
    ZOO_FAMILIES, ZOO_QUALITY, ScaleHyperprior, MeanScaleHyperprior,
    build_zoo_model, zoo_ckpt_name,
)

__all__ = [
    "GDN", "AnalysisTransform", "SynthesisTransform", "HyperAnalysis",
    "HyperSynthesis", "CompressionModel", "rate_distortion_loss",
    "MODEL_ZOO", "ModelSpec", "build",
    "ZOO_FAMILIES", "ZOO_QUALITY", "ScaleHyperprior", "MeanScaleHyperprior",
    "build_zoo_model", "zoo_ckpt_name",
]
