"""Architecture parity vs a torch oracle.

Builds the reference architecture in torch (CPU) from its documented spec
(SURVEY.md section 2 #2-5: kernel sizes, strides, channels, GDN placement,
reparameterization), maps our flax parameters onto it, and asserts the
transforms produce the same outputs within float tolerance. This pins down
conv padding math, ConvTranspose2d(5, s2, p2, output_padding=1) equivalence,
GDN numerics, and the full model's (sigma, nu) pipeline — the strongest
architecture-equivalence evidence short of loading reference checkpoints.
"""

import numpy as np
import jax
import jax.numpy as jnp

import torch

import torch.nn.functional as F

from dsic_tpu.models import CompressionModel
from dsic_tpu.ops.gdn import REPARAM_OFFSET

N, M = 16, 24  # small channels keep the test fast; structure is identical


def _flax_params(seed=0, hw=(64, 64)):
    model = CompressionModel(N=N, M=M)
    x = jnp.zeros((1, *hw, 3))
    params = model.init({"params": jax.random.PRNGKey(seed),
                         "noise": jax.random.PRNGKey(seed + 1)}, x)
    return model, params


def _t(x):  # NHWC -> NCHW torch tensor
    return torch.from_numpy(np.asarray(x, np.float32).transpose(0, 3, 1, 2))


def _np(x):  # NCHW torch -> NHWC numpy
    return x.detach().numpy().transpose(0, 2, 3, 1)


def _conv_w(p):  # flax (H, W, I, O) -> torch (O, I, H, W)
    return torch.from_numpy(np.asarray(p["kernel"]).transpose(3, 2, 0, 1))


def _convT_w(p):  # flax ConvTranspose (H, W, I, O) -> torch (I, O, H, W), flipped
    k = np.asarray(p["kernel"])[::-1, ::-1]  # spatial flip
    return torch.from_numpy(np.ascontiguousarray(k.transpose(2, 3, 0, 1)))


def _bias(p):
    return torch.from_numpy(np.asarray(p["bias"]))


def _torch_gdn(x, gdn_params, inverse):
    beta = torch.from_numpy(np.asarray(gdn_params["beta"])) ** 2 - REPARAM_OFFSET
    gamma = (torch.from_numpy(np.asarray(gdn_params["gamma"])) ** 2
             - REPARAM_OFFSET).view(-1, 1, 1, 1)
    denom = torch.sqrt(beta.view(1, -1, 1, 1)
                       + F.conv2d(x ** 2, gamma, groups=x.size(1)))
    return x * denom if inverse else x / denom


def test_analysis_transform_matches_torch():
    model, params = _flax_params()
    ga = params["params"]["g_a"]
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32)

    want = model.apply(params, jnp.asarray(x),
                       method=lambda self, xx: self.g_a(xx))

    # torch oracle: conv3 s1, [conv5 s2, conv3 s1] x3, conv5 s2 with GDN
    # between all but the last (layers.py:46-76)
    specs = [(3, 1), (5, 2), (3, 1), (5, 2), (3, 1), (5, 2), (3, 1), (5, 2)]
    t = _t(x)
    with torch.no_grad():
        for i, (k, s) in enumerate(specs):
            w = _conv_w(ga[f"conv_{i}"])
            t = F.conv2d(t, w, _bias(ga[f"conv_{i}"]), stride=s,
                         padding=(k - 1) // 2)
            if i < len(specs) - 1:
                t = _torch_gdn(t, ga[f"gdn_{i}"], inverse=False)
    np.testing.assert_allclose(np.asarray(want), _np(t), rtol=2e-4, atol=2e-4)
    assert t.shape[2:] == (4, 4)  # total stride 16


def test_synthesis_transform_matches_torch():
    model, params = _flax_params()
    gs = params["params"]["g_s"]
    rng = np.random.default_rng(1)
    y = rng.normal(size=(2, 4, 4, M)).astype(np.float32)

    want = model.apply(params, jnp.asarray(y), method=model.synthesize)

    t = _t(y)
    with torch.no_grad():
        for i in range(3):
            t = F.conv_transpose2d(t, _convT_w(gs[f"deconv_{i}"]),
                                   _bias(gs[f"deconv_{i}"]), stride=2,
                                   padding=2, output_padding=1)
            t = _torch_gdn(t, gs[f"igdn_{2 * i}"], inverse=True)
            t = F.conv2d(t, _conv_w(gs[f"conv_{i}"]), _bias(gs[f"conv_{i}"]),
                         stride=1, padding=1)
            t = _torch_gdn(t, gs[f"igdn_{2 * i + 1}"], inverse=True)
        t = F.conv_transpose2d(t, _convT_w(gs["deconv_3"]),
                               _bias(gs["deconv_3"]), stride=2, padding=2,
                               output_padding=1)
    assert t.shape[2:] == (64, 64)  # x16 upsampling
    np.testing.assert_allclose(np.asarray(want), _np(t), rtol=2e-4, atol=2e-4)


def test_hyper_transforms_match_torch():
    model, params = _flax_params()
    ha = params["params"]["h_a"]
    hs = params["params"]["h_s"]
    rng = np.random.default_rng(2)
    y = rng.normal(size=(1, 8, 8, M)).astype(np.float32)

    want_z = model.apply(params, jnp.asarray(y),
                         method=lambda self, yy: self.h_a(yy))
    t = _t(y)
    with torch.no_grad():
        # conv3 s1 ReLU x2, conv5 s2 ReLU, conv5 s2 (layers.py:104-116)
        for i, (k, s, relu) in enumerate([(3, 1, True), (3, 1, True),
                                          (5, 2, True), (5, 2, False)]):
            t = F.conv2d(t, _conv_w(ha[f"conv_{i}"]), _bias(ha[f"conv_{i}"]),
                         stride=s, padding=(k - 1) // 2)
            if relu:
                t = F.relu(t)
    np.testing.assert_allclose(np.asarray(want_z), _np(t), rtol=2e-4,
                               atol=2e-4)

    # hyper-synthesis global mode: 2x convT5 s2 ReLU, pool, two 1x1 MLPs
    z = np.asarray(want_z)
    want_ls, want_ln = model.apply(
        params, jnp.asarray(z), method=lambda self, zz: self.h_s(zz))
    t = _t(z)
    with torch.no_grad():
        for i in range(2):
            t = F.relu(F.conv_transpose2d(
                t, _convT_w(hs[f"deconv_{i}"]), _bias(hs[f"deconv_{i}"]),
                stride=2, padding=2, output_padding=1))
        p = t.mean(dim=(2, 3), keepdim=True)  # AdaptiveAvgPool2d(1)
        hsig = F.relu(F.conv2d(p, _conv_w(hs["mlp_sigma_0"]),
                               _bias(hs["mlp_sigma_0"])))
        log_sigma = F.conv2d(hsig, _conv_w(hs["mlp_sigma_1"]),
                             _bias(hs["mlp_sigma_1"]))
        hnu = F.relu(F.conv2d(p, _conv_w(hs["mlp_nu_0"]),
                              _bias(hs["mlp_nu_0"])))
        log_nu = F.conv2d(hnu, _conv_w(hs["mlp_nu_1"]), _bias(hs["mlp_nu_1"]))
    # flax broadcasts the pooled params spatially; compare per-channel values
    np.testing.assert_allclose(np.asarray(want_ls)[:, 0, 0, :],
                               _np(log_sigma)[:, 0, 0, :], rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(want_ln)[:, 0, 0, :],
                               _np(log_nu)[:, 0, 0, :], rtol=2e-4, atol=2e-4)
