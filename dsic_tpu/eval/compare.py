"""bpp-matched visual comparison: model reconstruction + diff heatmap vs a
baseline codec at matched bpp, summary CSV.

Reference: resultsanalysis.py:132-137 (diff heatmap = per-pixel mean-abs-diff
normalized to its max, grayscale), :236-261 (bpp_equiv_summary.csv schema),
mirrored for each baseline in resultsanalysis{balle,minnen}.py."""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from dsic_tpu.eval.jpeg import find_jpeg_quality_for_target_bpp, jpeg_encode_decode
from dsic_tpu.eval.rd_eval import evaluate_model_on_images
from dsic_tpu.ops.msssim import psnr
from dsic_tpu.utils.csv_logger import CsvLogger
from dsic_tpu.utils.image_io import save_image


def diff_heatmap(x: np.ndarray, x_hat: np.ndarray) -> np.ndarray:
    """Per-pixel mean-abs-diff over channels, normalized to max, as HW1 gray
    (resultsanalysis.py:132-137)."""
    d = np.abs(np.asarray(x) - np.asarray(x_hat)).mean(axis=-1)
    d = d / max(float(d.max()), 1e-9)
    return d[..., None].repeat(3, axis=-1)


def process_single_image(model, params, img: np.ndarray, lam, out_dir: str,
                         csv_logger: CsvLogger | None = None,
                         image_name: str = "image") -> dict:
    """Model recon + diff heatmap + bpp-matched JPEG + its diff; appends the
    bpp_equiv_summary row. Returns the row dict."""
    os.makedirs(out_dir, exist_ok=True)
    row = evaluate_model_on_images(model, params, [img], [image_name])[0]

    # re-run the forward to get the reconstruction image
    from dsic_tpu.ops.pad import pad_to_multiple, crop_to
    import jax
    x = jnp.asarray(img)[None]
    x_pad, box = pad_to_multiple(x, 16)
    out = model.apply(params, x_pad, quant_mode="round", train=False)
    x_hat = np.asarray(crop_to(jnp.clip(out["x_hat"], 0, 1), box))[0]

    recon_path = os.path.join(out_dir, f"reconstruction_{int(lam)}lambda.png")
    diff_path = os.path.join(out_dir, f"diff_model_{int(lam)}lambda.png")
    save_image(recon_path, x_hat)
    save_image(diff_path, diff_heatmap(img, x_hat))

    jp = find_jpeg_quality_for_target_bpp(img, row["bpp"])
    dec, n_bytes = jpeg_encode_decode(img, jp["quality"])
    jpeg_path = os.path.join(
        out_dir, f"jpeg_equiv_{int(lam)}lambda_q{jp['quality']}.jpg")
    jdiff_path = os.path.join(out_dir, f"diff_jpeg_{int(lam)}lambda.png")
    save_image(jpeg_path, dec)
    save_image(jdiff_path, diff_heatmap(img, dec))

    summary = {
        "lambda": lam, "ckpt": "", "model_bpp": row["bpp"],
        "model_mse": row["mse"], "model_psnr": row["psnr"],
        "model_ms-ssim": row["msssim"], "model_recon": recon_path,
        "model_diff": diff_path, "jpeg_quality": jp["quality"],
        "jpeg_bpp": jp["bpp"], "jpeg_bytes": n_bytes, "jpeg_mse": jp["mse"],
        "jpeg_psnr": jp["psnr"], "jpeg_ms-ssim": jp["msssim"],
        "jpeg_path": jpeg_path, "jpeg_diff": jdiff_path,
    }
    if csv_logger is not None:
        csv_logger.log(**summary)
    return summary


BPP_EQUIV_FIELDS = [
    "lambda", "ckpt", "model_bpp", "model_mse", "model_psnr",
    "model_ms-ssim", "model_recon", "model_diff", "jpeg_quality", "jpeg_bpp",
    "jpeg_bytes", "jpeg_mse", "jpeg_psnr", "jpeg_ms-ssim", "jpeg_path",
    "jpeg_diff"]
