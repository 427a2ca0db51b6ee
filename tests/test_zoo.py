"""Live baseline zoo (models/zoo.py): factorized entropy model sanity,
forward/train protocol of both families, and the end-to-end
train -> checkpoint -> live-RD-curve -> BD pipeline on tiny models."""

import dataclasses
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dsic_tpu.config import Config
from dsic_tpu.data.synthetic import synthetic_patches
from dsic_tpu.models import rate_distortion_loss
from dsic_tpu.models.zoo import (
    ZOO_QUALITY, ScaleHyperprior, MeanScaleHyperprior, build_zoo_model,
    zoo_ckpt_name)
from dsic_tpu.ops.entropy_bottleneck import (
    FactorizedDensity, gaussian_bin_neg_log2_prob)


def _x(b=2, hw=64, seed=0):
    return jnp.asarray(synthetic_patches(b, (hw, hw), seed=seed))


def test_factorized_density_is_valid_distribution():
    """CDF monotone in x, and unit-bin probabilities over a wide support sum
    to ~1 per channel (it's a normalized density)."""
    c = 6
    mod = FactorizedDensity(c)
    grid = jnp.linspace(-300.0, 300.0, 601)  # step 1
    x = jnp.broadcast_to(grid[:, None], (601, c))
    params = mod.init(jax.random.PRNGKey(0), x)
    cdf = mod.apply(params, x, method="cdf")
    assert np.all(np.diff(np.asarray(cdf), axis=0) >= -1e-6), "CDF not monotone"
    assert np.asarray(cdf)[0].max() < 0.05 and np.asarray(cdf)[-1].min() > 0.95

    ints = jnp.arange(-300, 301, dtype=jnp.float32)
    xi = jnp.broadcast_to(ints[:, None], (601, c))
    nll = mod.apply(params, xi)  # -log2 p of unit bins
    total = np.asarray(jnp.sum(2.0 ** (-nll), axis=0))
    np.testing.assert_allclose(total, 1.0, atol=0.02)


def test_gaussian_bin_probabilities_sum_to_one():
    sigma = jnp.asarray([0.2, 1.0, 7.0])
    ints = jnp.arange(-60, 61, dtype=jnp.float32)
    x = jnp.broadcast_to(ints[:, None], (121, 3))
    nll = gaussian_bin_neg_log2_prob(x, sigma)
    total = np.asarray(jnp.sum(2.0 ** (-nll), axis=0))
    np.testing.assert_allclose(total, 1.0, atol=1e-4)
    # mean shift: same mass, recentered
    nll_mu = gaussian_bin_neg_log2_prob(x + 3.0, sigma, mean=3.0)
    np.testing.assert_allclose(np.asarray(nll_mu), np.asarray(nll), atol=1e-5)


@pytest.mark.parametrize("cls", [ScaleHyperprior, MeanScaleHyperprior])
def test_zoo_forward_contract(cls):
    x = _x()
    model = cls(N=16, M=24)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, x)
    out = model.apply(params, x, quant_mode="noise", train=True,
                      rngs={"noise": jax.random.PRNGKey(2)})
    assert out["x_hat"].shape == x.shape
    assert out["y"].shape == (2, 4, 4, 24)
    assert out["z"].shape == (2, 1, 1, 16)
    loss, r, d = rate_distortion_loss(out, x, lambda_rd=100.0, dist="mse")
    assert np.isfinite(float(loss)) and float(r) > 0
    # eval mode: round quantization, finite rate
    oe = model.apply(params, x, quant_mode="round", train=False)
    assert np.isfinite(float(jnp.sum(oe["nll_y"])))


def test_zoo_quality_presets():
    model, lam = build_zoo_model("bmshj2018", 5)
    assert (model.N, model.M) == (128, 192)
    model8, lam8 = build_zoo_model("bmshj2018", 8)
    assert (model8.N, model8.M) == (192, 320)
    assert lam8 > lam > 0
    with pytest.raises(ValueError):
        build_zoo_model("nope", 1)
    with pytest.raises(ValueError):
        build_zoo_model("bmshj2018", 9)


def test_zoo_train_step_learns():
    """A few optimizer steps must reduce the RD loss (both rate and
    distortion gradients flow, incl. through the factorized density)."""
    import optax
    x = _x(b=4)
    model = ScaleHyperprior(N=16, M=24)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, x)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        def loss_fn(p):
            out = model.apply(p, x, quant_mode="noise", train=True,
                              rngs={"noise": key})
            loss, _, _ = rate_distortion_loss(out, x, lambda_rd=100.0,
                                              dist="mse")
            return loss
        loss, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, loss

    key = jax.random.PRNGKey(3)
    losses = []
    for _ in range(20):
        key, k = jax.random.split(key)
        params, opt, loss = step(params, opt, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_zoo_end_to_end_bd_pipeline(tmp_path, monkeypatch):
    """Trainer with MODEL.family -> zoo-named checkpoint ->
    evaluate_zoo_qualities live curve -> bd_metrics: the full live-baseline
    BD pipeline on tiny shapes."""
    from dsic_tpu.train.trainer import Trainer
    from dsic_tpu.eval.rd_eval import evaluate_zoo_qualities
    from dsic_tpu.eval.bd import bd_metrics
    from dsic_tpu.utils.image_io import save_image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        save_image(str(img_dir / f"im{i}.png"),
                   rng.random((64, 64, 3)).astype(np.float32))

    cfg = Config()
    # shrink the q1 preset so the CPU test stays fast (the eval side rebuilds
    # the model from ZOO_QUALITY, so the patch must cover both sides)
    q = 1
    monkeypatch.setitem(ZOO_QUALITY, 1,
                        dict(N=16, M=24, lam=ZOO_QUALITY[1]["lam"]))
    cfg = cfg.replace(
        MODEL=dataclasses.replace(cfg.MODEL, family="bmshj2018",
                                  N=ZOO_QUALITY[q]["N"], M=ZOO_QUALITY[q]["M"]),
        TRAIN=dataclasses.replace(cfg.TRAIN, amp=False, epochs=1),
        LOSS=dataclasses.replace(cfg.LOSS, lambda_rd=ZOO_QUALITY[q]["lam"],
                                 dist="mse"),
        LOGGING=dataclasses.replace(cfg.LOGGING,
                                    ckpt_dir=str(tmp_path / "ckpts")))
    trainer = Trainer(cfg, run_name="zootest", sample_shape=(1, 64, 64, 3),
                      final_ckpt=zoo_ckpt_name("bmshj2018", q))
    batch = synthetic_patches(2, (64, 64), seed=1)
    path = trainer.fit([batch], max_steps=1)
    assert path.endswith(zoo_ckpt_name("bmshj2018", q))

    curve = evaluate_zoo_qualities(
        cfg, os.path.dirname(path), str(img_dir), str(tmp_path / "out"),
        family="bmshj2018", qualities=[q], max_images=3)
    assert list(curve["quality"]) == [q]
    assert (tmp_path / "out" / "agg_bmshj2018_rd.csv").exists()

    # a 1-point baseline curve cannot be BD-interpolated; check against a
    # 2-point synthetic model curve that the call signature works end-to-end
    model_curve = {"bpp": np.array([0.5, 1.0]), "psnr": np.array([30.0, 33.0]),
                   "msssim": np.array([0.9, 0.95])}
    m = bd_metrics(model_curve, model_curve)
    assert np.isfinite(m["bd_rate_psnr_pct"])


@pytest.mark.parametrize("family", ["bmshj2018", "mbt2018_mean"])
def test_zoo_codec_roundtrip_lossless(family):
    """Real entropy coding for the baseline families: symbol-lossless round
    trip, decoder reconstruction identical to direct synthesis, and real bpp
    close to the estimated rate (the codec invariant the DSIC model has)."""
    from dsic_tpu.codec import make_codec, ZooCodec
    from dsic_tpu.models.zoo import ZOO_FAMILIES

    model = ZOO_FAMILIES[family](N=16, M=24)
    x = _x(b=2)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, x)
    codec = make_codec(model, params)
    assert isinstance(codec, ZooCodec)

    xin = np.asarray(x)
    res = codec.compress(xin)
    assert res.bpp > 0
    y_q, z_q = codec.latents(xin)
    y_hat, z_hat = codec.decoded_latents(res.data)
    np.testing.assert_array_equal(y_hat, y_q)
    np.testing.assert_array_equal(z_hat, z_q)

    # reconstruction equals the model's own round-mode decode path
    x_rec = codec.decompress(res.data, quantize_output=False)
    out = model.apply(params, x, quant_mode="round", train=False)
    np.testing.assert_allclose(x_rec, np.asarray(jnp.clip(out["x_hat"], 0, 1)),
                               atol=1e-5)

    # real bpp tracks the estimated rate (untrained models waste some rate on
    # table quantization + tails; just require the right ballpark)
    est_bpp = float((jnp.sum(out["nll_y"]) + jnp.sum(out["nll_z"]))
                    / (x.shape[0] * x.shape[1] * x.shape[2]))
    assert res.bpp < est_bpp * 1.35 + 0.1


# --- cheng2020_checkerboard (models/cheng.py) -------------------------------

def test_checkerboard_mask_structure():
    from dsic_tpu.models.cheng import checkerboard_mask
    for h, w in [(4, 4), (5, 7), (8, 6)]:
        m = np.asarray(checkerboard_mask(h, w))[0, :, :, 0]
        ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        np.testing.assert_array_equal(m, ((ii + jj) % 2 == 0).astype(m.dtype))


def test_cheng_forward_contract():
    from dsic_tpu.models.cheng import Cheng2020Checkerboard
    x = _x()
    model = Cheng2020Checkerboard(N=16, M=16)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, x)
    out = model.apply(params, x, quant_mode="noise", train=True,
                      rngs={"noise": jax.random.PRNGKey(2)})
    assert out["x_hat"].shape == x.shape
    assert out["y"].shape == (2, 4, 4, 16)  # y channels == N (cheng2020)
    assert out["z"].shape == (2, 1, 1, 16)
    loss, r, d = rate_distortion_loss(out, x, lambda_rd=100.0, dist="mse")
    assert np.isfinite(float(loss)) and float(r) > 0
    oe = model.apply(params, x, quant_mode="round", train=False)
    assert np.isfinite(float(jnp.sum(oe["nll_y"])))


def test_cheng_context_is_anchor_causal():
    """The non-anchor entropy params must depend ONLY on z and the anchor
    half: perturbing non-anchor entries of the context input must not change
    them (the decodability condition of the checkerboard model)."""
    from dsic_tpu.models.cheng import Cheng2020Checkerboard, checkerboard_mask
    model = Cheng2020Checkerboard(N=16, M=16)
    x = _x()
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, x)
    y_sym, z_sym = model.apply(params, x, method=model.encode_latents_i16)
    mask = np.asarray(checkerboard_mask(y_sym.shape[1], y_sym.shape[2]))
    anchors = jnp.asarray(np.asarray(y_sym) * mask.astype(np.int16))
    y_anchor_hat = model.apply(params, anchors, z_sym,
                               method=model.decode_anchor)
    # decode_anchor zeroes non-anchors regardless of their symbol values
    garbage = jnp.asarray(np.asarray(y_sym) + 17 * (1 - mask).astype(np.int16))
    y_anchor_hat2 = model.apply(params, garbage, z_sym,
                                method=model.decode_anchor)
    np.testing.assert_array_equal(np.asarray(y_anchor_hat),
                                  np.asarray(y_anchor_hat2))
    s1, m1 = model.apply(params, z_sym, y_anchor_hat,
                         method=model.nonanchor_params)
    s2, m2 = model.apply(params, z_sym, y_anchor_hat2,
                         method=model.nonanchor_params)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_cheng_quality_presets():
    from dsic_tpu.models.zoo import zoo_qualities
    model, lam = build_zoo_model("cheng2020_checkerboard", 1)
    assert model.N == model.M == 128
    model6, lam6 = build_zoo_model("cheng2020_checkerboard", 6)
    assert model6.N == 192 and lam6 > lam
    # q7/q8: the round-3 overlap extension above compressai's 6-point grid
    assert zoo_qualities("cheng2020_checkerboard") == list(range(1, 9))
    model8, lam8 = build_zoo_model("cheng2020_checkerboard", 8)
    assert model8.N == 192 and lam8 > lam6
    assert zoo_qualities("bmshj2018") == list(range(1, 9))
    with pytest.raises(ValueError):
        build_zoo_model("cheng2020_checkerboard", 9)


def test_cheng_codec_two_pass_roundtrip():
    """CheckerboardCodec: symbol-lossless two-pass round trip, two_pass
    bitstream container, reconstruction == the model's round-mode decode."""
    from dsic_tpu.codec import make_codec, CheckerboardCodec
    from dsic_tpu.codec.bitstream import unpack_bitstream
    from dsic_tpu.models.cheng import Cheng2020Checkerboard

    model = Cheng2020Checkerboard(N=16, M=16)
    x = _x(b=3, hw=64, seed=4)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, x)
    codec = make_codec(model, params)
    assert isinstance(codec, CheckerboardCodec)

    xin = np.asarray(x)
    res = codec.compress(xin)
    bs = unpack_bitstream(res.data)
    assert bs.two_pass and len(bs.y2_payloads) == 3

    y_q, z_q = codec.latents(xin)
    y_hat, z_hat = codec.decoded_latents(res.data)
    np.testing.assert_array_equal(z_hat, z_q)
    np.testing.assert_array_equal(y_hat, y_q)

    x_rec = codec.decompress(res.data, quantize_output=False)
    out = model.apply(params, x, quant_mode="round", train=False)
    np.testing.assert_allclose(x_rec, np.asarray(jnp.clip(out["x_hat"], 0, 1)),
                               atol=1e-5)
    est_bpp = float((jnp.sum(out["nll_y"]) + jnp.sum(out["nll_z"]))
                    / (x.shape[0] * x.shape[1] * x.shape[2]))
    assert res.bpp < est_bpp * 1.35 + 0.1


def test_cheng_gradients_flow_to_context():
    """Rate gradients must reach the context conv and entropy-parameter
    aggregator (through the STE-rounded anchors), or training silently
    ignores the context model."""
    from dsic_tpu.models.cheng import Cheng2020Checkerboard
    model = Cheng2020Checkerboard(N=16, M=16)
    x = _x()
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, x)

    def loss_fn(p):
        out = model.apply(p, x, quant_mode="noise", train=True,
                          rngs={"noise": jax.random.PRNGKey(2)})
        loss, _, _ = rate_distortion_loss(out, x, lambda_rd=100.0, dist="mse")
        return loss

    g = jax.grad(loss_fn)(params)
    for name in ("ctx", "ep_0", "ep_1"):
        leaves = jax.tree.leaves(g["params"][name])
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves), \
            f"zero gradient into {name}"


# --- charm2020 channel-conditional family (models/charm.py) -----------------

def test_charm_forward_contract():
    from dsic_tpu.models.charm import ChannelARHyperprior
    x = _x()
    model = ChannelARHyperprior(N=16, M=32, slice_size=16)  # 2 slices
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, x)
    out = model.apply(params, x, quant_mode="noise", train=True,
                      rngs={"noise": jax.random.PRNGKey(2)})
    assert out["x_hat"].shape == x.shape
    assert out["nll_y"].shape == (2, 4, 4, 32)
    loss, r, d = rate_distortion_loss(out, x, lambda_rd=100.0, dist="mse")
    assert np.isfinite(float(loss)) and float(r) > 0
    oe = model.apply(params, x, quant_mode="round", train=False)
    assert np.isfinite(float(jnp.sum(oe["nll_y"])))
    with pytest.raises(ValueError):
        ChannelARHyperprior(N=16, M=30, slice_size=16).init(
            {"params": jax.random.PRNGKey(0)}, x)  # M not divisible


def test_charm_gradients_flow_to_slice_nets():
    from dsic_tpu.models.charm import ChannelARHyperprior
    model = ChannelARHyperprior(N=16, M=32, slice_size=16)
    x = _x()
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, x)

    def loss_fn(p):
        out = model.apply(p, x, quant_mode="noise", train=True,
                          rngs={"noise": jax.random.PRNGKey(2)})
        loss, _, _ = rate_distortion_loss(out, x, lambda_rd=100.0, dist="mse")
        return loss

    g = jax.grad(loss_fn)(params)
    for name in ("cc_mean_0", "cc_mean_1", "cc_scale_0", "cc_scale_1",
                 "lrp_0", "lrp_1", "h_mean", "h_scale"):
        leaves = jax.tree.leaves(g["params"][name])
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves), \
            f"zero gradient into {name}"


def test_charm_codec_k_stream_roundtrip():
    """ChannelCodec: K rANS streams, symbol-lossless round trip, and the
    decompressed image equals the model's own eval forward (the STE+LRP
    decode path is exactly what the codec reproduces)."""
    from dsic_tpu.codec import make_codec
    from dsic_tpu.codec.api import ChannelCodec
    from dsic_tpu.codec.bitstream import unpack_bitstream
    from dsic_tpu.models.charm import ChannelARHyperprior

    model = ChannelARHyperprior(N=16, M=32, slice_size=16)
    x = _x(b=3, hw=64, seed=5)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, x)
    codec = make_codec(model, params)
    assert isinstance(codec, ChannelCodec)

    xin = np.asarray(x)
    res = codec.compress(xin)
    bs = unpack_bitstream(res.data)
    assert bs.n_y_streams == 2 and len(bs.y_streams[1]) == 3

    y_q, z_q = codec.latents(xin)
    y_hat, z_hat = codec.decoded_latents(res.data)
    np.testing.assert_array_equal(z_hat, z_q)
    np.testing.assert_array_equal(y_hat, y_q)

    # recon == eval forward holds on the CPU test mesh (identical math in
    # both jits); across platforms/compilations ulp-level mu differences can
    # flip individual round()s — decodability never depends on this (the
    # codec's table/prefix path uses one set of jitted fns on both sides)
    x_rec = codec.decompress(res.data, quantize_output=False)
    out = model.apply(params, x, quant_mode="round", train=False)
    np.testing.assert_allclose(x_rec, np.asarray(jnp.clip(out["x_hat"], 0, 1)),
                               atol=1e-5)


def test_lower_bound_gradient_escapes_floor():
    """compressai LowerBound semantics: a scale clamped at the floor still
    receives gradient when the step would raise it, and none when the step
    would push it further below."""
    from dsic_tpu.ops.entropy_bottleneck import lower_bound

    def f(s):
        return jnp.sum(lower_bound(s, 0.11) * jnp.asarray([1.0, -1.0, 1.0]))

    g = jax.grad(f)(jnp.asarray([0.05, 0.05, 0.5]))
    # x< bound, g>0 (would lower x further): blocked
    assert float(g[0]) == 0.0
    # x< bound, g<0 (descent raises x toward the bound): passes
    assert float(g[1]) == -1.0
    # x>= bound: identity
    assert float(g[2]) == 1.0


def test_zoo_pad_multiple_respected():
    """Zoo hyper-decoders upsample z by exactly 4, so inputs must pad to 64
    (compressai's own constraint): eval pads accordingly and the codec
    rejects under-padded input with a clear error."""
    from dsic_tpu.codec import make_codec
    from dsic_tpu.eval.rd_eval import evaluate_model_on_images

    model = MeanScaleHyperprior(N=16, M=24)
    assert model.pad_multiple == 64
    x96 = np.asarray(_x(b=1, hw=96, seed=7))  # 96 is 16- but not 64-divisible
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)},
                        jnp.asarray(_x(b=1, hw=64)))
    rows = evaluate_model_on_images(model, params, [x96[0]])
    assert np.isfinite(rows[0]["bpp"]) and rows[0]["bpp"] > 0
    codec = make_codec(model, params)
    with pytest.raises(ValueError, match="multiple of 64"):
        codec.compress(x96)


# --- cheng2020 GMM head (mixtures=3) ----------------------------------------

def test_gmm_bin_probabilities_sum_to_one():
    from dsic_tpu.ops.entropy_bottleneck import gmm_bin_neg_log2_prob
    # 2 channels, K=3 components each
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 2))
    mu = jnp.asarray([[-4.0, 2.0], [0.0, 5.0], [3.0, -1.0]])
    sigma = jnp.asarray([[0.4, 1.0], [2.0, 0.7], [1.0, 3.0]])
    ints = jnp.arange(-80, 81, dtype=jnp.float32)
    x = jnp.broadcast_to(ints[:, None], (161, 2))
    nll = gmm_bin_neg_log2_prob(x, w, mu, sigma)
    total = np.asarray(jnp.sum(2.0 ** (-nll), axis=0))
    np.testing.assert_allclose(total, 1.0, atol=1e-3)

    # the traceable codec table builder integrates the same mixture
    from dsic_tpu.codec.cdf import gmm_bin_probs
    pmf = gmm_bin_probs(w[None], mu[None], jnp.maximum(sigma, 0.11)[None],
                        jnp.asarray([-80]), 161)
    np.testing.assert_allclose(np.asarray(pmf.sum(axis=-1))[0], 1.0,
                               atol=1e-3)


def test_cheng_gmm_codec_roundtrip_and_gradients():
    """GMM mode: symbols are round(y) under two-pass mixture tables —
    lossless round trip, recon == eval forward (CPU), gradients reach the
    mixture head."""
    from dsic_tpu.codec import make_codec, CheckerboardCodec
    from dsic_tpu.models.cheng import Cheng2020Checkerboard

    model = Cheng2020Checkerboard(N=16, M=16, mixtures=3)
    x = _x(b=2, hw=64, seed=9)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, x)
    codec = make_codec(model, params)
    assert isinstance(codec, CheckerboardCodec)

    xin = np.asarray(x)
    res = codec.compress(xin)
    y_q, z_q = codec.latents(xin)
    y_hat, z_hat = codec.decoded_latents(res.data)
    np.testing.assert_array_equal(y_hat, y_q)
    np.testing.assert_array_equal(z_hat, z_q)
    x_rec = codec.decompress(res.data, quantize_output=False)
    out = model.apply(params, x, quant_mode="round", train=False)
    np.testing.assert_allclose(x_rec, np.asarray(jnp.clip(out["x_hat"], 0, 1)),
                               atol=1e-5)

    def loss_fn(p):
        o = model.apply(p, x, quant_mode="noise", train=True,
                        rngs={"noise": jax.random.PRNGKey(2)})
        loss, _, _ = rate_distortion_loss(o, x, lambda_rd=100.0, dist="mse")
        return loss

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g["params"]["ep_1"])
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_cheng_gmm_zoo_registry():
    model, lam = build_zoo_model("cheng2020_gmm", 1)
    assert model.mixtures == 3 and model.N == model.M == 128
    from dsic_tpu.models.zoo import zoo_qualities
    assert zoo_qualities("cheng2020_gmm") == list(range(1, 9))


# --- elic2022 joint space-channel family (models/elic.py) -------------------

def test_elic_forward_contract():
    from dsic_tpu.models.elic import ElicHyperprior
    x = _x(b=2, hw=64)
    model = ElicHyperprior(N=16, M=32, slice_size=16)
    assert model.num_slices == 2
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, x)
    out = model.apply(params, x, quant_mode="noise", train=True,
                      rngs={"noise": jax.random.PRNGKey(2)})
    assert out["x_hat"].shape == x.shape
    assert out["nll_y"].shape == out["y"].shape
    loss, r, d = rate_distortion_loss(out, x, lambda_rd=100.0, dist="mse")
    assert np.isfinite(float(loss)) and float(r) > 0
    oe = model.apply(params, x, quant_mode="round", train=False)
    assert np.isfinite(float(jnp.sum(oe["nll_y"])))


def test_elic_gradients_flow_everywhere():
    """Loss gradients reach every parameter group: transforms, hyper
    branches, per-slice cc/ctx/ep/lrp nets, z prior."""
    from dsic_tpu.models.elic import ElicHyperprior
    x = _x(b=2, hw=64)
    model = ElicHyperprior(N=8, M=16, slice_size=8)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, x)

    def loss_fn(p):
        out = model.apply(p, x, quant_mode="noise", train=True,
                          rngs={"noise": jax.random.PRNGKey(2)})
        loss, _, _ = rate_distortion_loss(out, x, lambda_rd=100.0, dist="mse")
        return loss

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    zero_groups = []
    for path, g in flat:
        if float(jnp.abs(g).max()) == 0.0:
            zero_groups.append(jax.tree_util.keystr(path))
    assert not zero_groups, f"no gradient reached: {zero_groups}"


def test_elic_codec_2k_stream_roundtrip():
    """ElicCodec: 2K rANS streams (anchor + non-anchor per slice),
    symbol-lossless round trip, recon == the model's own eval forward."""
    from dsic_tpu.codec import make_codec
    from dsic_tpu.codec.api import ElicCodec
    from dsic_tpu.codec.bitstream import unpack_bitstream
    from dsic_tpu.models.elic import ElicHyperprior

    model = ElicHyperprior(N=16, M=32, slice_size=16)
    x = _x(b=3, hw=64, seed=5)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, x)
    codec = make_codec(model, params)
    assert isinstance(codec, ElicCodec)

    xin = np.asarray(x)
    res = codec.compress(xin)
    assert res.bpp > 0
    bs = unpack_bitstream(res.data)
    assert bs.n_y_streams == 4 and len(bs.y_streams[3]) == 3

    y_q, z_q = codec.latents(xin)
    y_hat, z_hat = codec.decoded_latents(res.data)
    np.testing.assert_array_equal(z_hat, z_q)
    np.testing.assert_array_equal(y_hat, y_q)

    x_rec = codec.decompress(res.data, quantize_output=False)
    out = model.apply(params, x, quant_mode="round", train=False)
    np.testing.assert_allclose(x_rec, np.asarray(jnp.clip(out["x_hat"], 0, 1)),
                               atol=1e-5)


def test_elic_zoo_registry():
    from dsic_tpu.models.zoo import zoo_qualities
    model, lam = build_zoo_model("elic2022", 3)
    assert model.N == 128 and model.M == 192 and model.num_slices == 6
    assert zoo_qualities("elic2022") == list(range(1, 9))
    model8, lam8 = build_zoo_model("elic2022", 8)
    assert model8.M == 320 and model8.num_slices == 10 and lam8 > lam
