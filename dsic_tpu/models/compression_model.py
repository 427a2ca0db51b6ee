"""CompressionModel: composed autoencoder + Student-t hyperprior, and the
rate-distortion loss.

Semantics match /root/reference/code/modelv2/model.py:12-107:

* forward: g_a -> h_a -> quantize both (noise while training, round at eval)
  -> h_s -> (sigma, nu); global per-channel mode averages exp(log_sigma) over
  the spatial dims before broadcasting (model.py:53-55); nll_y under Student-t,
  nll_z under the factorized Gaussian with learnable per-channel log_sigma;
  decoder sees round(y) at eval and y_tilde while training (model.py:62).
* rate_distortion_loss (model.py:75-107): R = (sum nll_y + sum nll_z)/(B*H*W)
  clamped >= 0; D = MSE or 1 - MS-SSIM(clip(x_hat), x) with 3-scale weights
  (0.3, 0.5, 0.2) and a bilinear-resize guard on shape mismatch;
  loss = lambda * D + R.

Tensors are NHWC.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsic_tpu.models.layers import (
    AnalysisTransform, SynthesisTransform, HyperAnalysis, HyperSynthesis)
from dsic_tpu.ops.quantize import quantize
from dsic_tpu.ops.distributions import (
    student_t_neg_log2_prob, gaussian_neg_log2_prob,
    student_t_bin_neg_log2_prob, gaussian_bin_neg_log2_prob_z)
from dsic_tpu.ops.msssim import ms_ssim
from dsic_tpu.ops.pad import resize_bilinear


class CompressionModel(nn.Module):
    N: int = 128
    M: int = 192
    spatial_params: bool = False
    min_nu: float = 2.0
    max_nu: float = 100.0
    out_channels: int = 3
    dtype: jnp.dtype | None = None  # activation dtype; bfloat16 for AMP
    use_pallas: bool | None = None

    def setup(self):
        self.g_a = AnalysisTransform(self.N, self.M, dtype=self.dtype,
                                     use_pallas=self.use_pallas)
        self.g_s = SynthesisTransform(self.N, self.M, self.out_channels,
                                      dtype=self.dtype,
                                      use_pallas=self.use_pallas)
        self.h_a = HyperAnalysis(self.N, dtype=self.dtype)
        self.h_s = HyperSynthesis(self.N, self.M, self.spatial_params,
                                  dtype=self.dtype)
        # FactorizedGaussian z-prior's learnable per-channel log_sigma
        # (distributions.py:33-46).
        self.z_log_sigma = self.param("z_log_sigma",
                                      nn.initializers.zeros, (self.N,))

    def noise_rngs(self):
        """The (key_y, key_z) pair __call__ uses for noise quantization —
        exposed as an apply-method so the shard_map spatial train step
        (parallel/spatial.py) can generate bitwise-identical noise outside
        the model."""
        return jax.random.split(self.make_rng("noise"))

    def latent_params(self, z_tilde: jax.Array, latent_hw=None):
        """h_s(z_tilde) -> (sigma, nu) broadcast to latent spatial size.
        ``latent_hw`` overrides the spatial size of the returned maps (used by
        the decoder, which knows y's shape from the bitstream header)."""
        log_sigma, log_nu = self.h_s(z_tilde)
        if self.spatial_params:
            sigma = jnp.exp(log_sigma)
            nu = jnp.clip(jnp.exp(log_nu), self.min_nu, self.max_nu)
            return sigma.astype(jnp.float32), nu.astype(jnp.float32)
        # global per-channel: mean over spatial dims, then broadcast
        sigma_c = jnp.mean(jnp.exp(log_sigma), axis=(1, 2), keepdims=True)
        nu_c = jnp.clip(jnp.mean(jnp.exp(log_nu), axis=(1, 2), keepdims=True),
                        self.min_nu, self.max_nu)
        if latent_hw is None:
            latent_hw = (log_sigma.shape[1], log_sigma.shape[2])
        shape = (log_sigma.shape[0], latent_hw[0], latent_hw[1], self.M)
        return (jnp.broadcast_to(sigma_c, shape).astype(jnp.float32),
                jnp.broadcast_to(nu_c, shape).astype(jnp.float32))

    def __call__(self, x: jax.Array, quant_mode: str = "noise",
                 train: bool = True) -> dict[str, Any]:
        y = self.g_a(x)
        z = self.h_a(y)

        if quant_mode in ("noise", "mix"):
            # "mix" (Minnen-Singh 2020 §4 recipe): the RATE leg keeps the
            # additive-noise relaxation — smooth likelihoods, no dead-zone
            # barrier, so low-λ models cannot collapse to R=0 the way pure
            # STE-round training does — while the DISTORTION leg below feeds
            # the decoder STE-rounded latents (the eval-time input).
            key_y, key_z = self.noise_rngs()
            y_tilde = quantize(y, "noise", key_y)
            z_tilde = quantize(z, "noise", key_z)
        else:
            y_tilde = quantize(y, quant_mode)
            z_tilde = quantize(z, quant_mode)

        # Broadcast global per-channel params to y's spatial size (the
        # reference's expand_as(y_tilde), model.py:54-55 — h_s's output size
        # can differ from y's when H/16 is not a multiple of 4).
        sigma, nu = self.latent_params(z_tilde, latent_hw=(y.shape[1], y.shape[2]))

        # Likelihoods in bits/element, computed in float32 for stability.
        # The nll-side nu clamp stays FIXED at [2, 100] regardless of
        # MODEL.min_nu/max_nu — the reference clamps inside
        # StudentT.neg_log2_prob (distributions.py:24) independently of the
        # model's min_nu (constructor default 1.1), so a config with
        # min_nu < 2 must not change loss semantics.
        #
        # noise/mix keep the reference's continuous-density estimate
        # (model.py:57-59) — the additive-noise relaxation's training
        # semantics. Discretely-quantized latents (round/STE: eval, and the
        # STE fine-tune stage) instead charge the UNIT-BIN probability the
        # rANS coder actually pays: the density estimate can go negative at
        # collapsed sigma (impossible bits; it let pure-STE training park in
        # a degenerate sigma->0 regime and reported negative bpp in eval),
        # while the bin integral is >= 0 by construction and matches the
        # codec tables built from the same CDFs.
        if quant_mode in ("noise", "mix"):
            nll_y = student_t_neg_log2_prob(y_tilde.astype(jnp.float32),
                                            sigma, nu)
            nll_z = gaussian_neg_log2_prob(z_tilde.astype(jnp.float32),
                                           self.z_log_sigma)
        else:
            nll_y = student_t_bin_neg_log2_prob(
                y_tilde.astype(jnp.float32), sigma, nu)
            nll_z = gaussian_bin_neg_log2_prob_z(
                z_tilde.astype(jnp.float32), self.z_log_sigma)

        # Decoder input: rounded latents at eval, the relaxed latents while
        # training (model.py:62) — except "mix", whose decoder trains on the
        # STE-rounded latents it will see at eval.
        if not train or quant_mode == "mix":
            y_hat = quantize(y, "round")
        else:
            y_hat = y_tilde
        x_hat = self.g_s(y_hat)

        return {
            "x_hat": x_hat,
            "nll_y": nll_y, "nll_z": nll_z,
            "y": y, "y_tilde": y_tilde,
            "z": z, "z_tilde": z_tilde,
            "sigma": sigma, "nu": nu,
        }

    # --- codec-facing sub-apply entry points (used via model.apply(...,
    # method=...) so the entropy codec can run encoder/decoder halves). ---

    def analyze(self, x: jax.Array):
        """x -> (y_q, z_q, sigma, nu): everything the encoder needs."""
        y = self.g_a(x)
        z = self.h_a(y)
        y_q = jnp.round(y)
        z_q = jnp.round(z)
        sigma, nu = self.latent_params(z_q, latent_hw=(y.shape[1], y.shape[2]))
        return y_q, z_q, sigma, nu

    def raw_latents(self, x: jax.Array) -> jax.Array:
        """Pre-quantization continuous y = g_a(x) — for latent-distribution
        analysis (the Student-t MLE fit must see the continuous density the
        prior models, not integer-rounded symbols)."""
        return self.g_a(x)

    def encode_latents(self, x: jax.Array):
        """x -> (y_q, z_q) rounded latents only. The codec derives (sigma, nu)
        via :meth:`hyper_decode` on z_q so encoder and decoder share one jitted
        code path (bitwise-identical CDF tables on both sides)."""
        y = self.g_a(x)
        z = self.h_a(y)
        return jnp.round(y), jnp.round(z)

    def encode_latents_i16(self, x: jax.Array):
        """Like :meth:`encode_latents` but wire-friendly: accepts uint8 input
        (normalized to [0,1] on device — 4x less host->device transfer than
        float32 images) and returns int16 latents (4x less device->host; the
        clip only guards degenerate/diverged checkpoints from silent int16
        wraparound)."""
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) * (1.0 / 255.0)
        y_q, z_q = self.encode_latents(x)
        lim = 30000.0
        return (jnp.clip(y_q, -lim, lim).astype(jnp.int16),
                jnp.clip(z_q, -lim, lim).astype(jnp.int16))

    def hyper_channel_params(self, z_hat: jax.Array):
        """Global-parameter mode: z -> per-channel (sigma, nu) of shape (B, M)
        — what the codec's CDF tables actually consume; avoids shipping
        spatially-broadcast maps to the host."""
        sigma, nu = self.latent_params(z_hat, latent_hw=(1, 1))
        return sigma[:, 0, 0, :], nu[:, 0, 0, :]

    def synthesize_u8(self, y_hat: jax.Array) -> jax.Array:
        """g_s + clip + 8-bit quantization on device (the codec's production
        output path; 4x less host transfer than float32)."""
        x_hat = jnp.clip(self.g_s(y_hat.astype(jnp.float32)), 0.0, 1.0)
        return (x_hat * 255.0 + 0.5).astype(jnp.uint8)

    def hyper_decode(self, z_hat: jax.Array, latent_hw):
        """z_hat -> (sigma, nu) at the given latent spatial size (decoder side;
        eval_selfcontained_entropy.py:100-106)."""
        return self.latent_params(z_hat, latent_hw=latent_hw)

    def synthesize(self, y_hat: jax.Array) -> jax.Array:
        return self.g_s(y_hat)


def rate_distortion_loss(out: dict[str, Any], x: jax.Array,
                         lambda_rd: float = 10000.0, dist: str = "msssim"):
    """Returns (loss, R, D). R in bits/pixel. Matches model.py:75-107."""
    b, h, w, _ = x.shape
    num_pixels = b * h * w
    r = (jnp.sum(out["nll_y"]) + jnp.sum(out["nll_z"])) / num_pixels
    r = jnp.maximum(r, 0.0)

    x_hat = out["x_hat"].astype(jnp.float32)
    x = x.astype(jnp.float32)
    if dist == "mse":
        d = jnp.mean(jnp.square(x_hat - x))
    elif dist == "msssim":
        if x_hat.shape[1:3] != x.shape[1:3]:
            x_hat = resize_bilinear(x_hat, x.shape[1:3])
        d = 1.0 - jnp.mean(ms_ssim(jnp.clip(x_hat, 0.0, 1.0), x, data_range=1.0))
    else:
        raise ValueError("dist must be 'mse' or 'msssim'")

    loss = lambda_rd * d + r
    return loss, jax.lax.stop_gradient(r), jax.lax.stop_gradient(d)
