from dsic_tpu.ops.gdn import gdn, gdn_reference
from dsic_tpu.ops.quantize import quantize, quantize_noise, ste_round
from dsic_tpu.ops.distributions import (
    student_t_neg_log2_prob,
    gaussian_neg_log2_prob,
    student_t_cdf,
    std_gaussian_cdf,
    LOG2E,
)
from dsic_tpu.ops.msssim import ssim, ms_ssim, psnr
from dsic_tpu.ops.pad import pad_to_multiple, crop_to, resize_bilinear
from dsic_tpu.ops.tiling import patchify, stitch

__all__ = [
    "gdn", "gdn_reference", "quantize", "quantize_noise", "ste_round",
    "student_t_neg_log2_prob", "gaussian_neg_log2_prob", "student_t_cdf",
    "std_gaussian_cdf", "LOG2E", "ssim", "ms_ssim", "psnr",
    "pad_to_multiple", "crop_to", "resize_bilinear", "patchify", "stitch",
]
