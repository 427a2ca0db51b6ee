"""GDN numerics: jnp reference vs an independent torch oracle built from the
reference spec (layers.py:6-27), and the Pallas kernel (interpret mode) vs the
jnp reference for both forward and gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsic_tpu.ops.gdn import gdn, gdn_reference, REPARAM_OFFSET


def _torch_gdn(x_nchw, beta_param, gamma_param, inverse):
    import torch
    x = torch.from_numpy(x_nchw)
    bp = torch.from_numpy(beta_param)
    gp = torch.from_numpy(gamma_param)
    beta = bp ** 2 - REPARAM_OFFSET
    gamma = (gp ** 2 - REPARAM_OFFSET).view(-1, 1, 1, 1)
    denom = torch.sqrt(beta.view(1, -1, 1, 1)
                       + torch.nn.functional.conv2d(x ** 2, gamma, groups=x.size(1)))
    out = x * denom if inverse else x / denom
    return out.numpy()


@pytest.mark.parametrize("inverse", [False, True])
def test_gdn_matches_torch_oracle(inverse):
    rng = np.random.default_rng(0)
    c = 16
    x = rng.normal(size=(2, c, 8, 8)).astype(np.float32)
    beta_param = np.sqrt(1.0 + REPARAM_OFFSET) * np.ones(c, np.float32)
    gamma_param = (np.sqrt(0.1 + REPARAM_OFFSET)
                   * rng.uniform(0.8, 1.2, size=c)).astype(np.float32)

    want = _torch_gdn(x, beta_param, gamma_param, inverse)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    got = gdn_reference(x_nhwc, jnp.asarray(beta_param), jnp.asarray(gamma_param),
                        inverse)
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("inverse", [False, True])
def test_gdn_pallas_matches_reference(inverse):
    rng = np.random.default_rng(1)
    c = 128
    x = jnp.asarray(rng.normal(size=(2, 9, 9, c)).astype(np.float32))
    bp = jnp.asarray(np.sqrt(1.0 + REPARAM_OFFSET) * np.ones(c, np.float32))
    gp = jnp.asarray((np.sqrt(0.1) * rng.uniform(0.9, 1.1, c)).astype(np.float32))

    want = gdn_reference(x, bp, gp, inverse)
    got = gdn(x, bp, gp, inverse, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("inverse", [False, True])
def test_gdn_pallas_grads_match_autodiff(inverse):
    rng = np.random.default_rng(2)
    c = 128
    x = jnp.asarray(rng.normal(size=(1, 6, 6, c)).astype(np.float32))
    bp = jnp.asarray(np.sqrt(1.0 + REPARAM_OFFSET) * np.ones(c, np.float32))
    gp = jnp.asarray((np.sqrt(0.1) * rng.uniform(0.9, 1.1, c)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(1, 6, 6, c)).astype(np.float32))

    def loss_ref(x, bp, gp):
        return jnp.sum(gdn_reference(x, bp, gp, inverse) * cot)

    def loss_pallas(x, bp, gp):
        return jnp.sum(gdn(x, bp, gp, inverse, use_pallas=True, interpret=True)
                       * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, bp, gp)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, bp, gp)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
