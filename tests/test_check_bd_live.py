"""Acceptance checker (scripts/check_bd_live.py): monotonicity semantics.

MS-SSIM gets a small measurement tolerance by default (the reference's own
published table dips 0.0035 at its top lambda, BASELINE.md); --strict sets it
to zero. bpp must be strictly increasing and PSNR non-decreasing regardless.
"""
import csv
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "check_bd_live.py")


def _bd_dir(tmp_path, mss):
    bd = tmp_path / "bd"
    bd.mkdir()
    with open(bd / "agg_model_rd_summary.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["lambda", "count", "bpp", "mse",
                                          "psnr", "msssim"])
        w.writeheader()
        for i, (lam, m) in enumerate(zip([10, 100, 1000], mss)):
            w.writerow({"lambda": lam, "count": 4, "bpp": 0.5 + i,
                        "mse": 1e-4, "psnr": 30.0 + i, "msssim": m})
    with open(bd / "bd_metrics_summary_fam_live.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["bd_rate_psnr_pct", "bd_psnr_db"])
        w.writeheader()
        w.writerow({"bd_rate_psnr_pct": -10.0, "bd_psnr_db": 1.0})
    return bd


def _run(bd, *flags):
    return subprocess.run([sys.executable, SCRIPT, str(bd), *flags],
                          capture_output=True, text=True, timeout=60)


def test_small_msssim_dip_within_tolerance(tmp_path):
    bd = _bd_dir(tmp_path, [0.900, 0.950, 0.947])  # 0.003 dip, spanning curve
    assert _run(bd).returncode == 0
    assert _run(bd, "--strict").returncode == 1


def test_large_msssim_dip_fails(tmp_path):
    bd = _bd_dir(tmp_path, [0.900, 0.950, 0.940])  # 0.010 dip, spanning curve
    assert _run(bd).returncode == 1


def test_bpp_inversion_always_fails(tmp_path):
    bd = _bd_dir(tmp_path, [0.90, 0.95, 0.96])
    # overwrite with a bpp inversion
    path = bd / "agg_model_rd_summary.csv"
    rows = list(csv.DictReader(open(path)))
    rows[2]["bpp"] = "0.1"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader(); w.writerows(rows)
    assert _run(bd).returncode == 1


def test_saturated_msssim_curve_not_gated(tmp_path):
    # total span < 0.02: the MS-SSIM leg is reported but does not gate
    bd = _bd_dir(tmp_path, [0.945, 0.950, 0.940])
    out = _run(bd, "--strict")
    assert out.returncode == 0, out.stdout
    assert "saturated" in out.stdout


def test_dominance_nan_allowed_degenerate_nan_not(tmp_path):
    bd = _bd_dir(tmp_path, [0.900, 0.945, 0.950])
    # family curve whose best msssim is BELOW the flagship's worst ->
    # a NaN BD-rate-msssim cell is non-overlap by dominance (allowed)
    with open(bd / "agg_fam_rd.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["quality", "bpp", "psnr", "msssim"])
        w.writeheader()
        for q in range(1, 4):
            w.writerow({"quality": q, "bpp": 0.2 * q, "psnr": 25.0 + q,
                        "msssim": 0.80 + 0.02 * q})
    with open(bd / "bd_metrics_summary_fam_live.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["bd_rate_psnr_pct", "bd_psnr_db",
                                          "bd_rate_mss_pct", "bd_mss_diff"])
        w.writeheader()
        w.writerow({"bd_rate_psnr_pct": -10.0, "bd_psnr_db": 1.0,
                    "bd_rate_mss_pct": float("nan"), "bd_mss_diff": 0.05})
    out = _run(bd)
    assert out.returncode == 0, out.stdout
    assert "dominance" in out.stdout

    # NaN on a metric whose quality ranges DO overlap is degenerate -> fail
    # (family psnr 28-31.5 overlaps flagship 30-32)
    with open(bd / "agg_fam_rd.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["quality", "bpp", "psnr", "msssim"])
        w.writeheader()
        for q in range(1, 4):
            w.writerow({"quality": q, "bpp": 0.2 * q, "psnr": 26.5 + 1.7 * q,
                        "msssim": 0.80 + 0.02 * q})
    with open(bd / "bd_metrics_summary_fam_live.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["bd_rate_psnr_pct", "bd_psnr_db",
                                          "bd_rate_mss_pct", "bd_mss_diff"])
        w.writeheader()
        w.writerow({"bd_rate_psnr_pct": -10.0, "bd_psnr_db": float("nan"),
                    "bd_rate_mss_pct": -5.0, "bd_mss_diff": 0.05})
    assert _run(bd).returncode == 1


def test_row_count_gate(tmp_path):
    """ADVICE r4 medium: a short curve (silently-skipped leg) must FAIL when
    the pipeline passes its expected row counts."""
    bd = _bd_dir(tmp_path, [0.90, 0.95, 0.96])  # 3 lambdas
    assert _run(bd, "--expect-lambdas", "3").returncode == 0
    assert _run(bd, "--expect-lambdas", "10").returncode == 1
    # family leg present with no agg CSV -> 0 rows != expected
    assert _run(bd, "--expect-qualities", "8").returncode == 1
