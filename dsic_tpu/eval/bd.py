"""Bjontegaard-delta metrics: BD-rate (%) and BD-quality.

Two constructions:

* :func:`bd_rate` / :func:`bd_quality` — the REFERENCE's construction
  (writeupbdcurvesminnenALL.py:123-178, duplicated in the other writeup
  scripts), which its published numbers use (BASELINE.md): sort by quality,
  jitter to strictly increasing, PCHIP-interpolate natural-log rate vs
  quality, then

      BD-rate % = mean_p[R1(p) - R2(p)] / mean_p[R2(p)] * 100

  i.e. a LINEAR-rate relative difference averaged over the overlapping
  quality range (not the classic log-domain Bjontegaard average), and
  BD-quality inverts the interpolation (quality as a function of log-rate)
  and averages the quality difference over the overlapping log-rate range.

* :func:`bd_rate_log` — the classic log-domain Bjontegaard mean
  (10**mean(dlog10 R) - 1) kept for cross-checking against other toolchains.

Negative BD-rate: curve1 (the model) spends fewer bits at equal quality.
"""

from __future__ import annotations

import numpy as np
from scipy.interpolate import PchipInterpolator
from scipy.integrate import quad


def _strictly_increasing(arr: np.ndarray, tiny: float) -> np.ndarray:
    a = np.asarray(arr, dtype=np.float64).copy()
    for i in range(1, len(a)):
        if a[i] <= a[i - 1]:
            a[i] = a[i - 1] + tiny
    return a


def _finite_points(rate, quality):
    """Drop points a log-rate interpolation cannot represent: non-finite
    quality, non-finite or NON-POSITIVE rate. Non-positive estimated rates
    do occur: the rate estimate is the continuous Student-t differential
    entropy (reference model.py:75-107 parity), which goes negative when a
    low-lambda checkpoint collapses its latents to a near-delta density
    (observed: a noise-stage lambda=1 checkpoint at -0.15 bpp). Such points
    carry no usable rate information, so BD integrates over the remaining
    points (NaN if fewer than 2 survive on either side)."""
    rate = np.asarray(rate, dtype=np.float64)
    quality = np.asarray(quality, dtype=np.float64)
    keep = np.isfinite(rate) & np.isfinite(quality) & (rate > 0)
    return rate[keep], quality[keep]


def _prep(rate, quality):
    """Sort by quality; jitter quality and log-rate strictly increasing
    (the reference's make_strictly_increasing, :114-120)."""
    rate = np.asarray(rate, dtype=np.float64)
    quality = np.asarray(quality, dtype=np.float64)
    order = np.argsort(quality)
    q = _strictly_increasing(quality[order], 1e-9)
    log_r = _strictly_increasing(np.log(rate[order]), 1e-12)
    return q, log_r


def bd_rate(rate1, qual1, rate2, qual2) -> float:
    """Reference-construction BD-rate % of curve1 vs curve2."""
    rate1, qual1 = _finite_points(rate1, qual1)
    rate2, qual2 = _finite_points(rate2, qual2)
    if len(rate1) < 2 or len(rate2) < 2:
        return float("nan")
    q1, lr1 = _prep(rate1, qual1)
    q2, lr2 = _prep(rate2, qual2)
    p_min = max(q1.min(), q2.min())
    p_max = min(q1.max(), q2.max())
    if p_max <= p_min:
        return float("nan")
    f1 = PchipInterpolator(q1, lr1)
    f2 = PchipInterpolator(q2, lr2)
    span = p_max - p_min
    integral_diff = quad(lambda p: np.exp(f1(p)) - np.exp(f2(p)),
                         p_min, p_max, limit=200)[0] / span
    avg_ref = quad(lambda p: np.exp(f2(p)), p_min, p_max,
                   limit=200)[0] / span
    return float(integral_diff / avg_ref * 100.0)


def bd_quality(rate1, qual1, rate2, qual2) -> float:
    """Reference-construction BD-quality gain of curve1 over curve2 at equal
    rate (dB for PSNR curves, raw difference for MS-SSIM curves)."""
    rate1, qual1 = _finite_points(rate1, qual1)
    rate2, qual2 = _finite_points(rate2, qual2)
    if len(rate1) < 2 or len(rate2) < 2:
        return float("nan")
    q1, lr1 = _prep(rate1, qual1)
    q2, lr2 = _prep(rate2, qual2)
    g1 = PchipInterpolator(lr1, q1)
    g2 = PchipInterpolator(lr2, q2)
    r_min = max(lr1.min(), lr2.min())
    r_max = min(lr1.max(), lr2.max())
    if r_max <= r_min:
        return float("nan")
    return float(quad(lambda r: g1(r) - g2(r), r_min, r_max,
                      limit=200)[0] / (r_max - r_min))


def bd_rate_log(rate1, qual1, rate2, qual2) -> float:
    """Classic log-domain Bjontegaard BD-rate % (for cross-checks)."""
    rate1, qual1 = _finite_points(rate1, qual1)
    rate2, qual2 = _finite_points(rate2, qual2)
    if len(rate1) < 2 or len(rate2) < 2:
        return float("nan")
    q1, lr1 = _prep(rate1, qual1)
    q2, lr2 = _prep(rate2, qual2)
    p_min = max(q1.min(), q2.min())
    p_max = min(q1.max(), q2.max())
    if p_max <= p_min:
        return float("nan")
    f1 = PchipInterpolator(q1, lr1)
    f2 = PchipInterpolator(q2, lr2)
    avg = quad(lambda p: f1(p) - f2(p), p_min, p_max,
               limit=200)[0] / (p_max - p_min)
    return float((np.exp(avg) - 1.0) * 100.0)


def bd_selected_rows(model_curve: dict, baseline_curve: dict,
                     selected_lambdas) -> list[dict]:
    """Per-selected-lambda BD rows vs a full baseline curve — the
    reference's bd_summary_selected_vs_cheng.csv schema
    (writeupbdcurveschengALL.py:336-377): each selected lambda is treated
    as a SINGLE-POINT model curve, and since BD needs >= 2 points per side,
    every metric is NaN by construction (matching the reference's recorded
    batch_bd_results_cheng_attn/bd_summary_selected_vs_cheng.csv, whose
    lambda=1000/10000 rows are empty). The schema is kept for eval-suite
    parity; rows gain real values only if a multi-point model sub-curve is
    ever selected.
    """
    lams = np.asarray(model_curve["lambda"], dtype=np.float64)
    rows = []
    for lam in selected_lambdas:
        idx = np.nonzero(np.isclose(lams, float(lam)))[0]
        row = {"lambda": float(lam), "bd_rate_psnr_pct": float("nan"),
               "bd_psnr_db": float("nan"), "bd_rate_mss_pct": float("nan"),
               "bd_mss_diff": float("nan")}
        if idx.size:
            sub = {k: np.atleast_1d(np.asarray(model_curve[k]))[idx]
                   for k in ("bpp", "psnr", "msssim")}
            row.update(bd_metrics(sub, baseline_curve))
        rows.append(row)
    return rows


def bd_metrics(model_curve: dict, baseline_curve: dict) -> dict:
    """Curves are dicts with 'bpp', 'psnr', 'msssim' arrays. Returns the
    reference's bd_metrics_summary schema
    (batch_bd_results_jpeg/bd_metrics_summary_jpeg.csv header):
    bd_rate_psnr_pct, bd_psnr_db, bd_rate_mss_pct, bd_mss_diff.

    Degenerate curves (< 2 points on either side — e.g. a partially-trained
    quality sweep) yield NaN metrics instead of a PCHIP crash, matching the
    reference's posture for its single-point cheng comparison
    (bd_summary_selected_vs_cheng.csv: NaN)."""
    import numpy as np
    if (len(np.atleast_1d(model_curve["bpp"])) < 2
            or len(np.atleast_1d(baseline_curve["bpp"])) < 2):
        return {"bd_rate_psnr_pct": float("nan"), "bd_psnr_db": float("nan"),
                "bd_rate_mss_pct": float("nan"), "bd_mss_diff": float("nan")}
    out = {}
    out["bd_rate_psnr_pct"] = bd_rate(model_curve["bpp"], model_curve["psnr"],
                                      baseline_curve["bpp"],
                                      baseline_curve["psnr"])
    out["bd_psnr_db"] = bd_quality(model_curve["bpp"], model_curve["psnr"],
                                   baseline_curve["bpp"],
                                   baseline_curve["psnr"])
    out["bd_rate_mss_pct"] = bd_rate(model_curve["bpp"], model_curve["msssim"],
                                     baseline_curve["bpp"],
                                     baseline_curve["msssim"])
    out["bd_mss_diff"] = bd_quality(model_curve["bpp"], model_curve["msssim"],
                                    baseline_curve["bpp"],
                                    baseline_curve["msssim"])
    return out
