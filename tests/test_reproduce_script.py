"""Smoke test for scripts/reproduce_baseline.sh --dry-run (round-2 VERDICT
missing #1: the one-command real-data reproduction path was never exercised
by the suite, so its bit-rot risk was unmanaged).

Runs the REAL script as a subprocess on reduced grids (2 lambdas, 2 zoo
qualities, 1 step each) with DSIC_PLATFORM=cpu so it cannot contend with a
TPU job. ~4-6 minutes; run explicitly or as part of the full suite.
"""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_reproduce_baseline_dry_run(tmp_path):
    env = dict(os.environ)
    env.update({
        "DSIC_PLATFORM": "cpu",
        "MAX_STEPS": "1",
        "MAX_IMAGES": "4",
        "LAMBDAS": "10,1000",
        "QUALITIES": "1,2",
        "COMPARE_LAMBDAS": "10,1000",
    })
    work = tmp_path / "dry"
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "reproduce_baseline.sh"),
         "--dry-run", str(work)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
    assert proc.returncode == 0, (
        f"dry-run failed\nstdout tail:\n{proc.stdout[-3000:]}\n"
        f"stderr tail:\n{proc.stderr[-3000:]}")
    out = work / "results"
    # every stage left its artifact
    assert (out / "rd" / "agg_model_rd_summary.csv").exists()
    assert (out / "bd" / "bd_metrics_summary_jpeg_crossdataset.csv").exists()
    assert (out / "bd" / "agg_bmshj2018_rd.csv").exists()  # live leg ran
    # same-dataset JPEG leg (reference headline comparison) ran too
    assert (out / "bd" / "agg_jpeg_rd.csv").exists()
    assert (out / "bd" / "bd_metrics_summary_jpeg_live.csv").exists()
    assert any((out / "compare_jpeg").iterdir())
    assert any((out / "latents").iterdir())
    # the flagship sweep wrote the reduced lambda grid
    rd = (out / "rd" / "agg_model_rd_summary.csv").read_text().splitlines()
    assert len(rd) == 3  # header + 2 lambdas
