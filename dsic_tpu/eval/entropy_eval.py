"""Single-image real-bitstream evaluation: the eval_selfcontained_entropy.py
equivalent — forward for estimated bpp, true compress -> decompress round
trip, real bpp from byte counts, MS-SSIM of the decoded reconstruction, saved
recon PNG (eval_selfcontained_entropy.py:126-159)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dsic_tpu.config import Config
from dsic_tpu.codec.api import make_codec
from dsic_tpu.models import rate_distortion_loss
from dsic_tpu.ops.msssim import ms_ssim, psnr
from dsic_tpu.ops.pad import pad_to_multiple, crop_to
from dsic_tpu.train.state import build_model, create_train_state
from dsic_tpu.utils.checkpoint import restore_checkpoint
from dsic_tpu.utils.image_io import load_image, save_image


def load_params(cfg: Config, ckpt_path: str):
    model = build_model(cfg, train_dtype=None)
    _, _, template = create_train_state(cfg, jax.random.PRNGKey(0),
                                        sample_shape=(1, 64, 64, 3))
    state, _ = restore_checkpoint(ckpt_path, template)
    return model, state.params


def evaluate_image(cfg: Config, ckpt_path: str, image_path: str,
                   output_path: str = "recon.png", tail: int | None = None,
                   bitstream_path: str | None = None, log_fn=print) -> dict:
    model, params = load_params(cfg, ckpt_path)
    img = load_image(image_path)
    return evaluate_array(cfg, model, params, img, output_path, tail, log_fn,
                          bitstream_path=bitstream_path)


def evaluate_array(cfg: Config, model, params, img: np.ndarray,
                   output_path: str | None = None, tail: int | None = None,
                   log_fn=print, bitstream_path: str | None = None) -> dict:
    x = jnp.asarray(img)[None]
    x_pad, box = pad_to_multiple(x, getattr(model, "pad_multiple", 16))
    h, w = img.shape[:2]

    # forward estimate (eval_selfcontained_entropy.py:141-144). Both bpp
    # figures are expressed over the ORIGINAL pixel count so estimated vs
    # real compare apples-to-apples (the real-bpp convention, :148-149).
    out = model.apply(params, x_pad, quant_mode="round", train=False)
    _, _, d = rate_distortion_loss(out, x_pad, lambda_rd=1.0, dist="msssim")
    r_est = (jnp.sum(out["nll_y"]) + jnp.sum(out["nll_z"])) / (h * w)
    log_fn(f"[forward] estimated bpp R = {float(r_est):.4f}, "
           f"D = {float(d):.5f}")

    codec_cfg = cfg.CODEC if tail is None else \
        type(cfg.CODEC)(tail=tail, precision_bits=cfg.CODEC.precision_bits,
                        interleave=cfg.CODEC.interleave,
                        support_bucket=cfg.CODEC.support_bucket)
    codec = make_codec(model, params, codec_cfg)
    res = codec.compress(np.asarray(x_pad))
    # real bpp counts payload bytes over the ORIGINAL pixel count
    # (eval_selfcontained_entropy.py:148-149)
    bpp_real = sum(res.per_image_bits) / (h * w)
    log_fn(f"[entropy coding] compressed (real) bpp = {bpp_real:.4f}")
    if bitstream_path:
        from dsic_tpu.codec.bitstream import save_bitstream
        log_fn(f"wrote bitstream to {save_bitstream(bitstream_path, res.data)}")

    x_hat_pad = codec.decompress(res.data)
    x_hat = crop_to(jnp.asarray(x_hat_pad), box)
    mss = float(ms_ssim(x_hat, x)[0])
    ps = float(psnr(x_hat, x)[0])
    log_fn(f"[entropy coding] MS-SSIM = {mss:.6f}")

    if output_path:
        save_image(output_path, np.asarray(x_hat))
        log_fn(f"Saved decompressed reconstruction to {output_path}")
    return {"bpp_est": float(r_est), "bpp_real": bpp_real, "msssim": mss,
            "psnr": ps, "num_bytes": len(res.data)}
