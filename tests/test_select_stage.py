"""Cross-stage best-val flagship selection (scripts/select_flagship_stage.py).

The selection rule is the training objective's validation loss
lambda*(1-MS-SSIM)+bpp (reference model.py:75-107), applied per lambda across
stage curves; winners from a non-installed stage are copied into the live
checkpoint root and the displaced install is preserved.
"""
import csv
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "select_flagship_stage.py")


def _write_curve(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["lambda", "count", "bpp", "mse",
                                          "psnr", "msssim"])
        w.writeheader()
        for r in rows:
            w.writerow({"count": 4, "mse": 1e-4, **r})


def test_select_installs_per_lambda_winner(tmp_path):
    bd = tmp_path / "bd"
    ckpt = tmp_path / "ckpt"
    bd.mkdir()
    # mix wins at lambda=100 (higher msssim at similar bpp); ste wins at
    # lambda=1 (far lower bpp dominates the tiny distortion weight)
    _write_curve(bd / "mix.csv", [
        {"lambda": 1, "bpp": 0.9, "psnr": 26.0, "msssim": 0.85},
        {"lambda": 100, "bpp": 1.7, "psnr": 36.6, "msssim": 0.960},
    ])
    _write_curve(bd / "ste.csv", [
        {"lambda": 1, "bpp": 0.11, "psnr": 31.0, "msssim": 0.94},
        {"lambda": 100, "bpp": 1.68, "psnr": 36.0, "msssim": 0.958},
    ])
    for stage, lam in [("", "alpha1lambda"), ("", "alpha100lambda"),
                       ("ste_stage", "alpha1lambda"),
                       ("ste_stage", "alpha100lambda")]:
        d = ckpt / stage / lam
        d.mkdir(parents=True, exist_ok=True)
        (d / "marker.txt").write_text(f"{stage or 'mix'}:{lam}")

    out = subprocess.run(
        [sys.executable, SCRIPT, str(bd), str(ckpt),
         "--stages", "mix=mix.csv,ste_stage=ste.csv", "--installed", "mix"],
        capture_output=True, text=True, timeout=60)
    assert out.returncode == 0, out.stderr

    # lambda=1: ste wins -> swapped in; lambda=100: mix stays
    assert (ckpt / "alpha1lambda" / "marker.txt").read_text() \
        == "ste_stage:alpha1lambda"
    assert (ckpt / "alpha100lambda" / "marker.txt").read_text() \
        == "mix:alpha100lambda"
    # displaced mix checkpoint preserved
    assert (ckpt / "mix_stage_kept" / "alpha1lambda" / "marker.txt").exists()
    # selection record written
    with open(bd / "stage_selection.csv") as f:
        rows = {float(r["lambda"]): r["stage"] for r in csv.DictReader(f)}
    assert rows == {1.0: "ste_stage", 100.0: "mix"}
