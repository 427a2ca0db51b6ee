"""Committed live-BD artifacts stay self-consistent.

Guards demo_results/live/bd_live (the round's headline artifact set) against
rot: the acceptance checker must pass on the committed copy, the flagship agg
curve must match the stage-selection record row-for-row against the per-stage
measured curves, and the BD summaries must be re-derivable from the committed
agg CSVs through eval/bd.py (same construction the pipeline used).
"""
import csv
import math
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BD = os.path.join(REPO, "demo_results", "live", "bd_live")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BD), reason="no committed live bd artifacts")


def _rows(name):
    with open(os.path.join(BD, name), newline="") as f:
        return list(csv.DictReader(f))


def test_checker_passes_on_committed_artifacts():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_bd_live.py"),
         BD], capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stdout + out.stderr


def test_flagship_agg_matches_selection_record():
    sel = {float(r["lambda"]): r["stage"]
           for r in _rows("stage_selection.csv")}
    agg = {float(r["lambda"]): r for r in _rows("agg_model_rd_summary.csv")}
    assert set(agg) == set(sel)
    for lam, stage in sel.items():
        stage_rows = {float(r["lambda"]): r
                      for r in _rows(f"agg_model_rd_summary_{stage}.csv")}
        for k in ("bpp", "psnr", "msssim"):
            # rel=2%: a composed agg matches its stage rows exactly; an
            # end-to-end re-measure of the installed composite differs from
            # the stage measurement only by eval noise
            assert float(agg[lam][k]) == pytest.approx(
                float(stage_rows[lam][k]), rel=2e-2), (lam, stage, k)


def test_live_bd_summaries_rederivable_from_curves():
    import numpy as np
    from dsic_tpu.eval.bd import bd_metrics
    agg = _rows("agg_model_rd_summary.csv")
    curve = {k: np.asarray([float(r[k]) for r in agg])
             for k in ("bpp", "psnr", "msssim")}
    for fam in ("bmshj2018", "mbt2018_mean", "charm2020",
                "cheng2020_checkerboard", "cheng2020_gmm", "elic2022"):
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
