from dsic_tpu.eval.rd_eval import evaluate_model_on_images, evaluate_model_lambdas
from dsic_tpu.eval.bd import bd_metrics
from dsic_tpu.eval.jpeg import (
    jpeg_encode_decode, jpeg_rd_point, jpeg_rd_curve,
    find_jpeg_quality_for_target_bpp)
from dsic_tpu.eval.baselines import BASELINE_CURVES
from dsic_tpu.eval.entropy_eval import evaluate_image

__all__ = ["evaluate_model_on_images", "evaluate_model_lambdas", "bd_metrics",
           "jpeg_encode_decode", "jpeg_rd_point", "jpeg_rd_curve",
           "find_jpeg_quality_for_target_bpp", "BASELINE_CURVES",
           "evaluate_image"]
