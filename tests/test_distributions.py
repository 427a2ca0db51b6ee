"""Prior numerics vs scipy oracles (SURVEY.md section 4 test plan)."""

import numpy as np
import scipy.stats
import scipy.special
import jax.numpy as jnp

from dsic_tpu.ops.distributions import (
    student_t_neg_log2_prob, gaussian_neg_log2_prob, student_t_cdf,
    std_gaussian_cdf)


def test_student_t_nll_vs_scipy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64,)).astype(np.float32) * 3
    sigma = rng.uniform(0.2, 5.0, size=64).astype(np.float32)
    nu = rng.uniform(2.0, 50.0, size=64).astype(np.float32)
    got = np.asarray(student_t_neg_log2_prob(jnp.asarray(x), jnp.asarray(sigma),
                                             jnp.asarray(nu)))
    want = -scipy.stats.t.logpdf(x, df=nu, scale=sigma) / np.log(2.0)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_student_t_nll_clamps():
    # sigma below 1e-3 and nu above 100 must clamp (distributions.py:23-24)
    got = np.asarray(student_t_neg_log2_prob(
        jnp.asarray([0.5]), jnp.asarray([1e-9]), jnp.asarray([1e6])))
    want = -scipy.stats.t.logpdf(0.5, df=100.0, scale=1e-3) / np.log(2.0)
    np.testing.assert_allclose(got, [want], rtol=1e-4)


def test_gaussian_nll_vs_scipy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 2, 2, 8)).astype(np.float32)
    log_sigma = rng.normal(size=8).astype(np.float32) * 0.5
    got = np.asarray(gaussian_neg_log2_prob(jnp.asarray(x), jnp.asarray(log_sigma)))
    want = -scipy.stats.norm.logpdf(x, scale=np.exp(log_sigma)) / np.log(2.0)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_student_t_cdf_vs_scipy():
    rng = np.random.default_rng(2)
    t = rng.normal(size=256).astype(np.float32) * 8
    sigma = rng.uniform(0.3, 4.0, size=256).astype(np.float32)
    nu = rng.uniform(2.0, 90.0, size=256).astype(np.float32)
    got = np.asarray(student_t_cdf(jnp.asarray(t), jnp.asarray(sigma),
                                   jnp.asarray(nu)))
    want = scipy.special.stdtr(nu, t / sigma)
    # f32 betainc is good to ~6e-6 abs; uint16 CDF quantization is 1.5e-5.
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_std_gaussian_cdf_vs_scipy():
    t = np.linspace(-6, 6, 101).astype(np.float32)
    got = np.asarray(std_gaussian_cdf(jnp.asarray(t)))
    np.testing.assert_allclose(got, scipy.stats.norm.cdf(t), atol=1e-6)
