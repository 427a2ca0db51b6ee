"""TPU-only Pallas kernel tests (skipped on the CPU test harness — the
hardware PRNG and compiled pallas_call need a real TPU; the CPU suite covers
the same kernels in interpret mode where supported)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

tpu_only = pytest.mark.skipif(jax.default_backend() != "tpu",
                              reason="needs TPU")


@tpu_only
def test_noise_pallas_distribution():
    from dsic_tpu.ops.quantize import quantize_noise_pallas
    x = jnp.zeros((8, 32, 32, 128))
    q = quantize_noise_pallas(x, 123)
    v = np.asarray(q).ravel()
    assert v.min() >= -0.5 and v.max() < 0.5
    assert abs(v.mean()) < 2e-3
    assert abs(v.std() - np.sqrt(1 / 12)) < 2e-3
    # different seeds give different noise; same seed reproduces
    q2 = quantize_noise_pallas(x, 124)
    assert not np.allclose(np.asarray(q), np.asarray(q2))
    q3 = quantize_noise_pallas(x, 123)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q3))


@tpu_only
def test_ms_ssim_tpu_matches_cpu_reference():
    """Regression: TPU convs default to bf16; without forced f32 precision in
    the Gaussian blur, SSIM variance terms cancel catastrophically (values
    like 51.97 instead of 0.74). Compare against known CPU-validated values."""
    from dsic_tpu.ops.msssim import ms_ssim, ssim
    from dsic_tpu.data.synthetic import synthetic_patches
    rng = np.random.default_rng(0)
    x = synthetic_patches(1, (120, 120), seed=11)
    y = np.clip(x + 0.05 * rng.standard_normal(x.shape).astype(np.float32),
                0, 1)
    v = float(ms_ssim(jnp.asarray(x), jnp.asarray(y))[0])
    assert 0.0 < v <= 1.0
    # identical images -> exactly 1 within float tolerance
    v1 = float(ms_ssim(jnp.asarray(x), jnp.asarray(x))[0])
    np.testing.assert_allclose(v1, 1.0, atol=1e-4)
    s = float(ssim(jnp.asarray(x), jnp.asarray(y))[0])
    assert 0.0 < s <= 1.0
    # near-identical pair: f32 cancellation noise must not push above 1
    y2 = np.clip(x + 0.002 * rng.standard_normal(x.shape).astype(np.float32),
                 0, 1)
    v2 = float(ms_ssim(jnp.asarray(x), jnp.asarray(y2))[0])
    assert 0.97 < v2 <= 1.0


@tpu_only
def test_gdn_pallas_compiled_matches_xla():
    from dsic_tpu.ops.gdn import gdn
    rng = np.random.default_rng(0)
    c = 192
    x = jnp.asarray(rng.normal(size=(2, 16, 16, c)).astype(np.float32))
    bp = jnp.ones(c); gp = jnp.full((c,), 0.3)
    a = gdn(x, bp, gp, use_pallas=True)
    b = gdn(x, bp, gp, use_pallas=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
