"""Learned-codec baseline RD curves for BD comparison.

The reference compares against compressai zoo models (bmshj2018_hyperprior,
mbt2018, cheng2020_attn) evaluated on its 1000-patch Sentinel-2 set
(SURVEY.md section 2 #18-20). compressai's pretrained weights are not
available in this environment (and are never on the model's own compute
path — SURVEY.md section 2 native-deps table), so the comparison runs against
the reference's own recorded baseline curves, reproduced from its checked-in
CSVs:

* bmshj2018 q1-8:  batch_bd_results_bmshj/balle_agg_bmshj_rd.csv:2-9
* mbt2018 q1-8:    batch_bd_results_mbt/agg_mbt_rd.csv:2-9
* cheng2020 q1-6:  batch_bd_results_cheng_attn/agg_cheng2020_attn_rd.csv:2-7
* jpeg q10-100:    batch_bd_results_jpeg/agg_jpeg_rd.csv:2-11 (also
  recomputable live via eval.jpeg)

These are measurement data (RD points), not code.
"""

from __future__ import annotations

import numpy as np

BASELINE_CURVES: dict[str, dict] = {
    "bmshj2018": {
        "quality": np.arange(1, 9),
        "bpp": np.array([0.1308, 0.2003, 0.3003, 0.4514,
                         0.6766, 1.0453, 1.5509, 2.2016]),
        "psnr": np.array([27.139, 27.518, 28.341, 29.023,
                          28.960, 28.786, 29.453, 28.047]),
        "msssim": np.array([0.69502, 0.74025, 0.78390, 0.82355,
                            0.85656, 0.88170, 0.90514, 0.91404]),
    },
    "mbt2018": {
        "quality": np.arange(1, 9),
        "bpp": np.array([0.1176, 0.1903, 0.2903, 0.4596,
                         0.8138, 1.3263, 1.7764, 2.4141]),
        "psnr": np.array([28.179, 29.170, 30.360, 31.258,
                          31.554, 32.399, 32.178, 31.101]),
        "msssim": np.array([0.70744, 0.74485, 0.79194, 0.83104,
                            0.86409, 0.89126, 0.91259, 0.92186]),
    },
    "cheng2020_attn": {
        "quality": np.arange(1, 7),
        "bpp": np.array([0.1170, 0.1672, 0.2591, 0.4714, 0.6674, 0.9854]),
        "psnr": np.array([27.613, 28.453, 29.545, 29.535, 29.918, 31.362]),
        "msssim": np.array([0.70494, 0.74257, 0.78723, 0.82647,
                            0.85722, 0.88701]),
    },
    "jpeg": {
        "quality": np.arange(10, 101, 10),
        "bpp": np.array([0.4057, 0.6123, 0.7914, 0.9425, 1.0852,
                         1.2369, 1.4656, 1.8380, 2.7091, 7.4024]),
        "psnr": np.array([27.221, 29.360, 30.400, 31.085, 31.630,
                          32.094, 32.684, 33.457, 34.693, 39.014]),
        "msssim": np.array([0.67551, 0.76314, 0.80102, 0.82184, 0.83650,
                            0.84863, 0.86295, 0.87923, 0.90132, 0.95498]),
    },
}

# The reference model's own recorded RD curve (BASELINE.md; the parity target).
REFERENCE_MODEL_CURVE = {
    "lambda": np.array([10, 25, 50, 100, 250, 500, 1000, 10000]),
    "bpp": np.array([0.19004, 0.55408, 0.64902, 1.44433, 2.30055,
                     2.96915, 3.65930, 4.79916]),
    "psnr": np.array([29.9055, 31.0664, 31.2521, 32.7646, 33.2439,
                      33.4509, 33.6030, 33.3808]),
    "msssim": np.array([0.85163, 0.87918, 0.88631, 0.91367, 0.92308,
                        0.92342, 0.92573, 0.92219]),
}
