"""Eval suite: BD metrics vs known values, JPEG baseline, RD eval CSV
schemas, bpp-matched comparison."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from dsic_tpu.eval.bd import bd_rate, bd_quality, bd_metrics
from dsic_tpu.eval.jpeg import (
    jpeg_rd_point, jpeg_rd_curve, find_jpeg_quality_for_target_bpp)
from dsic_tpu.eval.baselines import BASELINE_CURVES, REFERENCE_MODEL_CURVE
from dsic_tpu.eval.rd_eval import evaluate_model_on_images
from dsic_tpu.data.synthetic import synthetic_patches
from dsic_tpu.models import CompressionModel


def test_bd_rate_identical_curves_zero():
    c = BASELINE_CURVES["jpeg"]
    assert abs(bd_rate(c["bpp"], c["psnr"], c["bpp"], c["psnr"])) < 1e-9
    assert abs(bd_quality(c["bpp"], c["psnr"], c["bpp"], c["psnr"])) < 1e-9


def test_bd_rate_halved_rate_is_minus_50():
    c = BASELINE_CURVES["jpeg"]
    got = bd_rate(c["bpp"] * 0.5, c["psnr"], c["bpp"], c["psnr"])
    np.testing.assert_allclose(got, -50.0, atol=1e-6)
    got_q = bd_quality(c["bpp"], c["psnr"] + 1.0, c["bpp"], c["psnr"])
    np.testing.assert_allclose(got_q, 1.0, atol=1e-6)


def test_bd_reproduces_reference_recorded_numbers():
    """Feeding the reference's own recorded RD curves through our BD engine
    must land on its published BD numbers (BASELINE.md) — the parity check of
    the BD construction itself."""
    m = bd_metrics(REFERENCE_MODEL_CURVE, BASELINE_CURVES["mbt2018"])
    # batch_bd_results_mbt/bd_metrics_summary.csv:2
    np.testing.assert_allclose(m["bd_rate_psnr_pct"], -62.37, atol=0.05)
    np.testing.assert_allclose(m["bd_psnr_db"], 0.9889, atol=0.005)
    np.testing.assert_allclose(m["bd_rate_mss_pct"], -29.21, atol=0.05)
    np.testing.assert_allclose(m["bd_mss_diff"], 0.0384, atol=0.001)

    j = bd_metrics(REFERENCE_MODEL_CURVE, BASELINE_CURVES["jpeg"])
    # batch_bd_results_jpeg/bd_metrics_summary_jpeg.csv:2
    np.testing.assert_allclose(j["bd_rate_psnr_pct"], 0.0446, atol=0.01)
    np.testing.assert_allclose(j["bd_rate_mss_pct"], -53.22, atol=0.05)

    b = bd_metrics(REFERENCE_MODEL_CURVE, BASELINE_CURVES["bmshj2018"])
    # PSNR BD recorded empty (curve-overlap failure) -> NaN here too
    assert np.isnan(b["bd_rate_psnr_pct"])
    np.testing.assert_allclose(b["bd_rate_mss_pct"], -42.95, atol=0.05)


def test_jpeg_rd_point_and_monotonicity():
    img = synthetic_patches(1, (120, 120), seed=0)[0]
    p30 = jpeg_rd_point(img, 30)
    p90 = jpeg_rd_point(img, 90)
    assert p90["bpp"] > p30["bpp"]
    assert p90["psnr"] > p30["psnr"]
    assert 0 < p30["msssim"] <= 1


def test_jpeg_bpp_match_bisection():
    img = synthetic_patches(1, (120, 120), seed=1)[0]
    target = jpeg_rd_point(img, 50)["bpp"]
    best = find_jpeg_quality_for_target_bpp(img, target)
    assert abs(best["bpp"] - target) / target < 0.1


def test_jpeg_curve_schema():
    imgs = list(synthetic_patches(2, (64, 64), seed=2))
    curve = jpeg_rd_curve(imgs, qualities=(20, 60))
    assert curve["count"] == 2
    assert curve["bpp"].shape == (2,)
    assert curve["bpp"][1] > curve["bpp"][0]


def test_evaluate_model_on_images_mixed_sizes():
    model = CompressionModel(N=16, M=24)
    x0 = synthetic_patches(1, (64, 64), seed=3)[0]
    x1 = synthetic_patches(1, (120, 120), seed=4)[0]
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)},
                        jnp.zeros((1, 64, 64, 3)))
    rows = evaluate_model_on_images(model, params, [x0, x1, x0],
                                    ["a", "b", "c"])
    assert [r["image"] for r in rows] == ["a", "b", "c"]
    assert all(np.isfinite(r["bpp"]) and r["bpp"] > 0 for r in rows)
    assert rows[0]["bpp"] == rows[2]["bpp"]  # identical inputs batch together


def test_compare_process_single_image(tmp_path):
    from dsic_tpu.eval.compare import process_single_image, BPP_EQUIV_FIELDS
    from dsic_tpu.utils.csv_logger import CsvLogger
    model = CompressionModel(N=16, M=24)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)},
                        jnp.zeros((1, 64, 64, 3)))
    img = synthetic_patches(1, (64, 64), seed=5)[0]
    with CsvLogger(str(tmp_path / "bpp_equiv_summary.csv"),
                   BPP_EQUIV_FIELDS) as csv:
        row = process_single_image(model, params, img, 10, str(tmp_path), csv)
    assert os.path.exists(row["model_recon"])
    assert os.path.exists(row["jpeg_diff"])
    assert row["jpeg_quality"] >= 1
    text = (tmp_path / "bpp_equiv_summary.csv").read_text()
    assert "model_ms-ssim" in text and "jpeg_bpp" in text


def test_bd_metrics_degenerate_curves_yield_nan():
    """<2-point curves (partially-trained sweeps) must give NaN metrics,
    not a PCHIP crash — the reference's own posture for its single-point
    cheng comparison."""
    import numpy as np
    from dsic_tpu.eval.bd import bd_metrics
    two = {"bpp": np.array([0.5, 1.0]), "psnr": np.array([30.0, 33.0]),
           "msssim": np.array([0.9, 0.95])}
    one = {"bpp": np.array([0.7]), "psnr": np.array([31.0]),
           "msssim": np.array([0.92])}
    for m in (bd_metrics(two, one), bd_metrics(one, two)):
        assert all(np.isnan(v) for v in m.values())


def test_bd_nonpositive_rate_points_are_dropped_not_fatal():
    """A negative ESTIMATED bpp point (continuous Student-t differential
    entropy of a collapsed low-lambda checkpoint — observed live: noise-stage
    lambda=1 at -0.15 bpp) must be excluded from the interpolation, not
    poison log(rate) into a PCHIP 'y must contain only finite values' crash
    (the round-4 driver failure mode)."""
    base = {"bpp": np.array([0.5, 1.0, 2.0, 3.0]),
            "psnr": np.array([30.0, 33.0, 36.0, 38.0]),
            "msssim": np.array([0.90, 0.93, 0.96, 0.97])}
    bad = {"bpp": np.array([-0.15, 0.25, 1.0, 2.0]),
           "psnr": np.array([19.5, 29.0, 34.0, 37.0]),
           "msssim": np.array([0.66, 0.88, 0.94, 0.965])}
    clean = {k: v[1:] for k, v in bad.items()}
    m_bad = bd_metrics(bad, base)
    m_clean = bd_metrics(clean, base)
    for k in m_bad:
        assert np.isfinite(m_bad[k]), k
        np.testing.assert_allclose(m_bad[k], m_clean[k], rtol=1e-12)
    # NaN points are dropped the same way
    nan_pt = {k: np.where(np.arange(4) == 0, np.nan, v)
              for k, v in bad.items()}
    m_nan = bd_metrics(nan_pt, base)
    for k in m_nan:
        np.testing.assert_allclose(m_nan[k], m_clean[k], rtol=1e-12)
    # and a curve left with < 2 usable points degrades to NaN, not a crash
    mostly_bad = {"bpp": np.array([-0.2, -0.1, 0.0, 0.5]),
                  "psnr": bad["psnr"], "msssim": bad["msssim"]}
    assert all(np.isnan(v) for v in bd_metrics(mostly_bad, base).values())


def test_stage_selection_drops_degenerate_bpp_option(tmp_path):
    """select_flagship_stage must never install a stage whose selection-val
    curve point has bpp <= 0, even when its raw val loss wins (the negative
    rate term makes lam*(1-msssim)+bpp spuriously small)."""
    import csv as _csv
    import subprocess
    import sys as _sys
    rows = {
        "noise_stage": [(1.0, -0.15, 19.5, 0.6568), (3.0, 0.13, 25.9, 0.771)],
        "ste_stage": [(1.0, 0.11, 31.2, 0.78), (3.0, 0.20, 32.0, 0.80)],
    }
    stage_args = []
    for st, rws in rows.items():
        p = tmp_path / f"agg_{st}.csv"
        with open(p, "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["lambda", "count", "bpp", "mse", "psnr", "msssim"])
            for lam, bpp, psnr, mss in rws:
                w.writerow([lam, 2, bpp, 0.001, psnr, mss])
        stage_args.append(f"{st}=agg_{st}.csv")
    out = subprocess.run(
        [_sys.executable, "scripts/select_flagship_stage.py",
         str(tmp_path), str(tmp_path / "ckpt"),
         "--stages", ",".join(stage_args), "--installed", "noise_stage",
         "--dry_run"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr
    assert "dropped" in out.stdout
    sel = {float(r["lambda"]): r["stage"]
           for r in _csv.DictReader(open(tmp_path / "stage_selection.csv"))}
    assert sel[1.0] == "ste_stage"  # degenerate noise point never wins


def test_bd_selected_rows_pin_reference_cheng_csv():
    """Per-selected-lambda BD vs the recorded cheng curve must reproduce the
    reference's bd_summary_selected_vs_cheng.csv exactly: lambda in
    {1000, 10000}, all four metrics NaN (single-point model sub-curves;
    writeupbdcurveschengALL.py:336-377 prints '[INFO] Not enough points' and
    writes empty cells)."""
    from dsic_tpu.eval.bd import bd_selected_rows
    rows = bd_selected_rows(REFERENCE_MODEL_CURVE,
                            BASELINE_CURVES["cheng2020_attn"],
                            [1000, 10000])
    assert [r["lambda"] for r in rows] == [1000.0, 10000.0]
    for r in rows:
        for k in ("bd_rate_psnr_pct", "bd_psnr_db",
                  "bd_rate_mss_pct", "bd_mss_diff"):
            assert np.isnan(r[k])


def test_bd_selected_rows_multipoint_subcurve_real_values():
    """A selected lambda absent from the curve still emits a NaN row; a
    2+-point sub-curve (if a caller ever selects a range) yields finite BD."""
    from dsic_tpu.eval.bd import bd_selected_rows
    rows = bd_selected_rows(REFERENCE_MODEL_CURVE,
                            BASELINE_CURVES["mbt2018"], [7777])
    assert np.isnan(rows[0]["bd_rate_psnr_pct"])


def test_compress_decompress_cli_roundtrip(tmp_path, monkeypatch):
    """The user-facing batch codec surface: folder -> per-image .dsic ->
    reconstruction PNGs cropped back to the original (odd) sizes."""
    import dataclasses
    import jax
    from dsic_tpu.config import Config
    from dsic_tpu.data.synthetic import write_synthetic_dataset, \
        synthetic_patches
    from dsic_tpu.train.trainer import Trainer
    import dsic_tpu.eval.cli as cli_mod
    from dsic_tpu.utils.image_io import load_image_u8

    write_synthetic_dataset(str(tmp_path / "imgs"), n=3, hw=(50, 70), seed=3)
    base = Config()
    cfg = base.replace(
        MODEL=dataclasses.replace(base.MODEL, N=16, M=24),
        TRAIN=dataclasses.replace(base.TRAIN, amp=False, epochs=1),
        LOSS=dataclasses.replace(base.LOSS, lambda_rd=100.0),
        LOGGING=dataclasses.replace(base.LOGGING,
                                    ckpt_dir=str(tmp_path / "ck")))
    t = Trainer(cfg, run_name="m", sample_shape=(1, 64, 64, 3))
    path = t.fit([synthetic_patches(2, (64, 64), seed=1)], max_steps=1)

    orig_cfg = cli_mod._cfg
    monkeypatch.setattr(cli_mod, "_cfg", lambda a: orig_cfg(a).replace(
        MODEL=dataclasses.replace(orig_cfg(a).MODEL, N=16, M=24)))
    cli_mod.main(["compress", "--ckpt", path,
                  "--images", str(tmp_path / "imgs"),
                  "--out", str(tmp_path / "bits")])
    bits = sorted((tmp_path / "bits").glob("*.dsic"))
    assert len(bits) == 3
    cli_mod.main(["decompress", "--ckpt", path,
                  "--images", str(tmp_path / "bits"),
                  "--out", str(tmp_path / "recon")])
    r = load_image_u8(str(tmp_path / "recon" / "patch_0000.png"))
    assert r.shape == (50, 70, 3)


def test_evaluate_jpeg_baseline_live_curve(tmp_path):
    """Same-dataset live JPEG leg (reference headline comparison,
    writeupbdcurvesjpegALL.py:174): batched-metrics aggregate must match the
    per-image jpeg_rd_curve on the identical image set, and the CSVs must
    carry the live-curve schema."""
    from dsic_tpu.data.synthetic import write_synthetic_dataset
    from dsic_tpu.eval.rd_eval import evaluate_jpeg_baseline
    from dsic_tpu.utils.image_io import list_images, load_image

    img_dir = tmp_path / "imgs"
    write_synthetic_dataset(str(img_dir), n=3, hw=(64, 64), seed=11)
    out = tmp_path / "bd"
    curve = evaluate_jpeg_baseline(str(img_dir), str(out),
                                   qualities=(20, 60), batch_size=2)
    assert curve["quality"].tolist() == [20, 60]
    assert (curve["count"] == 3).all()
    assert curve["bpp"][1] > curve["bpp"][0]
    assert curve["psnr"][1] > curve["psnr"][0]

    ref = jpeg_rd_curve([load_image(p) for p in list_images(str(img_dir))],
                        qualities=(20, 60))
    np.testing.assert_allclose(curve["bpp"], ref["bpp"], rtol=1e-6)
    np.testing.assert_allclose(curve["psnr"], ref["psnr"], rtol=1e-4)
    np.testing.assert_allclose(curve["msssim"], ref["msssim"], atol=1e-4)

    agg = (out / "agg_jpeg_rd.csv").read_text().splitlines()
    assert agg[0] == "quality,count,bpp,psnr,msssim"
    assert len(agg) == 3
    per = (out / "per_image_jpeg_results.csv").read_text().splitlines()
    assert per[0] == "quality,image,bpp,mse,psnr,msssim"
    assert len(per) == 1 + 2 * 3
