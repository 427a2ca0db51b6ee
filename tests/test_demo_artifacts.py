"""Committed live-BD artifacts stay self-consistent.

Guards demo_results/live (the round's headline artifact set) against rot.
The round-4+ layout is REQUIRED (``val_curves/stage_selection.csv``
present): the committed ``bd_live`` table was measured END-TO-END on the
report-test set and the selection record was derived on a disjoint
selection-val set. The tests re-run the acceptance checker (with the
MS-SSIM span gate and the row-count gates), verify the selection record's
per-stage val losses EXACTLY against the committed val stage curves (rel
tolerance = CSV rounding only, not eval noise), and re-derive every BD
summary — including the per-selected-lambda rows — from the committed
curves.

The legacy round-3 composed-table checks were deleted in round 5 (VERDICT
r4 weak #7: strictness must not be contingent on skips); until a round-5
PASS table is installed the round-4-layout tests skip rather than
silently validating the old layout.
"""
import csv
import math
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIVE = os.path.join(REPO, "demo_results", "live")
BD = os.path.join(LIVE, "bd_live")
VAL = os.path.join(LIVE, "val_curves")
ROUND4 = os.path.isfile(os.path.join(VAL, "stage_selection.csv"))


def _bd_is_gated_install():
    """True iff the committed bd_live table went through the round-5
    acceptance gate (live_retrain_r5.sh appends ``CHECK_RC=`` to the
    table's own CHECK.txt; r6_driver.sh installs only on CHECK_RC=0).
    The pre-gate round-3 table has no CHECK_RC line, and val_curves may
    be installed independently of bd_live (they are verdict-independent
    measurements), so the strict-checker test must key on the BD table
    itself, not on ROUND4."""
    path = os.path.join(BD, "CHECK.txt")
    if not os.path.isfile(path):
        return False
    with open(path) as f:
        return "CHECK_RC=0" in f.read()

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BD), reason="no committed live bd artifacts")

FAMILIES = ("bmshj2018", "mbt2018_mean", "charm2020",
            "cheng2020_checkerboard", "cheng2020_gmm", "elic2022")


def _rows(name, base=None):
    with open(os.path.join(base or BD, name), newline="") as f:
        return list(csv.DictReader(f))


def test_checker_passes_on_committed_artifacts():
    """The committed table must PASS the acceptance checker INCLUDING the
    round-4 'done' bars: MS-SSIM span >= 0.05 and full row counts (a
    committed table is only ever installed from a PASS — r6_driver.sh)."""
    if not _bd_is_gated_install():
        pytest.skip("committed bd_live is not a round-5 gated install "
                    "(pre-gate table; install only happens on a checker "
                    "PASS, so the strict bars would mis-fire here)")
    cmd = [sys.executable, os.path.join(REPO, "scripts", "check_bd_live.py"),
           BD, "--min-mss-span", "0.05",
           "--expect-lambdas", "10", "--expect-qualities", "8"]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stdout + out.stderr


@pytest.mark.skipif(not ROUND4, reason="legacy round-3 layout")
def test_selection_record_matches_val_curves_exactly():
    """The selection record's per-stage losses must be exactly the training
    objective lambda*(1-msssim)+bpp recomputed from the committed
    selection-val stage curves (tolerance = the record's 4-decimal CSV
    rounding, NOT eval noise), and the chosen stage must be one of them.
    This is the round-4 re-tightening of the round-3 rel=2e-2 check."""
    sel_rows = _rows("stage_selection.csv", base=VAL)
    stages = [c[len("loss_"):] for c in sel_rows[0] if c.startswith("loss_")]
    assert set(stages) == {"noise_stage", "ste_stage", "mix_stage"}
    curves = {
        st: {float(r["lambda"]): r
             for r in _rows(f"agg_model_rd_summary_{st}.csv", base=VAL)}
        for st in stages
    }
    for row in sel_rows:
        lam = float(row["lambda"])
        assert row["stage"] in stages, row
        for st in stages:
            vrow = curves[st][lam]
            want = lam * (1.0 - float(vrow["msssim"])) + float(vrow["bpp"])
            got = float(row[f"loss_{st}"])
            assert got == pytest.approx(want, abs=5e-4 * max(1.0, want)), (
                lam, st)


def test_live_bd_summaries_rederivable_from_curves():
    import numpy as np
    from dsic_tpu.eval.bd import bd_metrics
    agg = _rows("agg_model_rd_summary.csv")
    curve = {k: np.asarray([float(r[k]) for r in agg])
             for k in ("bpp", "psnr", "msssim")}
    # round-4 adds a same-dataset JPEG leg (the reference's headline
    # comparison); include it once committed
    fams = FAMILIES + (("jpeg",) if os.path.isfile(
        os.path.join(BD, "bd_metrics_summary_jpeg_live.csv")) else ())
    for fam in fams:
        base_rows = _rows(f"agg_{fam}_rd.csv")
        base = {k: np.asarray([float(r[k]) for r in base_rows])
                for k in ("bpp", "psnr", "msssim")}
        got = bd_metrics(curve, base)
        want = _rows(f"bd_metrics_summary_{fam}_live.csv")[0]
        for k, v in got.items():
            w = float(want[k])
            if math.isnan(v):
                assert math.isnan(w), (fam, k)
            else:
                assert v == pytest.approx(w, rel=1e-6, abs=1e-6), (fam, k)


def test_selected_lambda_bd_rows_rederivable():
    if not _bd_is_gated_install():
        pytest.skip("committed bd_live is not a round-5 gated install "
                    "(the selected-lambda BD rows are written by the "
                    "round-4+ eval, absent from the pre-gate table)")
    import numpy as np
    from dsic_tpu.eval.bd import bd_selected_rows
    agg = _rows("agg_model_rd_summary.csv")
    curve = {k: np.asarray([float(r[k]) for r in agg])
             for k in ("lambda", "bpp", "psnr", "msssim")}
    checked = 0
    for fam in FAMILIES:
        path = os.path.join(BD, f"bd_summary_selected_vs_{fam}_live.csv")
        if not os.path.isfile(path):
            continue
        want_rows = _rows(f"bd_summary_selected_vs_{fam}_live.csv")
        base_rows = _rows(f"agg_{fam}_rd.csv")
        base = {k: np.asarray([float(r[k]) for r in base_rows])
                for k in ("bpp", "psnr", "msssim")}
        lams = [float(r["lambda"]) for r in want_rows]
        got_rows = bd_selected_rows(curve, base, lams)
        for got, want in zip(got_rows, want_rows):
            for k, v in got.items():
                w = float(want[k])
                if isinstance(v, float) and math.isnan(v):
                    assert math.isnan(w), (fam, k)
                elif k == "lambda":
                    assert float(v) == w
                else:
                    assert v == pytest.approx(w, rel=1e-6, abs=1e-6), (fam, k)
        checked += 1
    assert checked, "no bd_summary_selected_vs_*_live.csv committed"
