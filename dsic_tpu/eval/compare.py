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


def _zoo_forward(cfg, family: str, quality: int, ckpt_root: str,
                 img: np.ndarray):
    """Run one trained zoo checkpoint on one image; returns
    (bpp, x_hat, psnr, msssim, mse) or None if the checkpoint is missing."""
    import os
    import dataclasses
    import jax
    from dsic_tpu.models.zoo import zoo_quality, zoo_ckpt_name
    from dsic_tpu.train.state import build_model, create_train_state
    from dsic_tpu.utils.checkpoint import restore_checkpoint
    from dsic_tpu.ops.pad import pad_to_multiple, crop_to
    from dsic_tpu.ops.msssim import ms_ssim

    preset = zoo_quality(family, quality)
    qcfg = cfg.replace(MODEL=dataclasses.replace(
        cfg.MODEL, family=family, N=preset["N"], M=preset["M"]))
    model = build_model(qcfg, train_dtype=None)
    _, _, template = create_train_state(qcfg, jax.random.PRNGKey(0),
                                        sample_shape=(1, 64, 64, 3))
    path = os.path.join(ckpt_root, zoo_ckpt_name(family, quality))
    try:
        state, _ = restore_checkpoint(path, template)
    except Exception:  # noqa: BLE001 — missing quality: WARN-and-skip posture
        return None
    x = jnp.asarray(img)[None]
    x_pad, box = pad_to_multiple(x, 64)
    out = model.apply(state.params, x_pad, quant_mode="round", train=False)
    h, w = img.shape[:2]
    bpp = float((jnp.sum(out["nll_y"]) + jnp.sum(out["nll_z"])) / (h * w))
    x_hat = crop_to(jnp.clip(out["x_hat"], 0, 1), box)
    mse = float(jnp.mean(jnp.square(x_hat - x)))
    return {"bpp": bpp, "x_hat": np.asarray(x_hat)[0],
            "psnr": float(psnr(x_hat, x)[0]),
            "msssim": float(ms_ssim(x_hat, x)[0]), "mse": mse}


def process_vs_zoo(cfg, model, params, img: np.ndarray, lam, family: str,
                   ckpt_root: str, out_dir: str,
                   csv_logger: CsvLogger | None = None,
                   qualities=None) -> dict | None:
    """bpp-matched visual comparison vs a LIVE learned baseline: run every
    trained `{family}_q{q}` checkpoint on the image, pick the quality whose
    bpp is closest to the model's, save its reconstruction
    (`{family}_q{q}_equiv_{lam}lambda.png`) + diff heatmap
    (`diff_{family}_q{q}_{lam}lambda.png`) next to the model's, and append
    the summary row (resultsanalysisballe.py:139-268 semantics; the reference
    does this with pretrained compressai models, here the baselines are
    trained on the same data)."""
    from dsic_tpu.models.zoo import zoo_qualities
    os.makedirs(out_dir, exist_ok=True)
    if qualities is None:
        qualities = zoo_qualities(family)
    row = evaluate_model_on_images(model, params, [img], ["image"])[0]

    from dsic_tpu.ops.pad import pad_to_multiple, crop_to
    x = jnp.asarray(img)[None]
    x_pad, box = pad_to_multiple(x, 16)
    out = model.apply(params, x_pad, quant_mode="round", train=False)
    x_hat = np.asarray(crop_to(jnp.clip(out["x_hat"], 0, 1), box))[0]
    recon_path = os.path.join(out_dir, f"reconstruction_{int(lam)}lambda.png")
    diff_path = os.path.join(out_dir, f"diff_model_{int(lam)}lambda.png")
    save_image(recon_path, x_hat)
    save_image(diff_path, diff_heatmap(img, x_hat))

    best_q, best = None, None
    for q in qualities:
        res = _zoo_forward(cfg, family, q, ckpt_root, img)
        if res is None:
            continue
        if best is None or abs(res["bpp"] - row["bpp"]) < abs(best["bpp"]
                                                              - row["bpp"]):
            best_q, best = q, res
    if best is None:
        print(f"WARN: no trained {family} checkpoints in {ckpt_root}")
        return None

    b_recon = os.path.join(out_dir,
                           f"{family}_q{best_q}_equiv_{int(lam)}lambda.png")
    b_diff = os.path.join(out_dir,
                          f"diff_{family}_q{best_q}_{int(lam)}lambda.png")
    save_image(b_recon, best["x_hat"])
    save_image(b_diff, diff_heatmap(img, best["x_hat"]))

    summary = {
        "lambda": lam, "ckpt": "", "model_bpp": row["bpp"],
        "model_mse": row["mse"], "model_psnr": row["psnr"],
        "model_ms-ssim": row["msssim"], "model_recon": recon_path,
        "model_diff": diff_path, f"{family}_quality": best_q,
        f"{family}_bpp": best["bpp"], f"{family}_mse": best["mse"],
        f"{family}_psnr": best["psnr"], f"{family}_ms-ssim": best["msssim"],
        f"{family}_recon": b_recon, f"{family}_diff": b_diff,
    }
    if csv_logger is not None:
        csv_logger.log(**summary)
    return summary


def zoo_equiv_fields(family: str) -> list[str]:
    return ["lambda", "ckpt", "model_bpp", "model_mse", "model_psnr",
            "model_ms-ssim", "model_recon", "model_diff",
            f"{family}_quality", f"{family}_bpp", f"{family}_mse",
            f"{family}_psnr", f"{family}_ms-ssim", f"{family}_recon",
            f"{family}_diff"]
