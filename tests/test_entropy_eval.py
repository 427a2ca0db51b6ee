"""Single-image entropy eval path (eval_selfcontained_entropy equivalent)."""

import numpy as np
import jax
import jax.numpy as jnp

from dsic_tpu.config import Config
from dsic_tpu.data.synthetic import synthetic_patches
from dsic_tpu.eval.entropy_eval import evaluate_array
from dsic_tpu.models import CompressionModel


def test_evaluate_array_roundtrip(tmp_path):
    import dataclasses
    cfg = Config()
    cfg = cfg.replace(MODEL=dataclasses.replace(cfg.MODEL, N=16, M=24))
    model = CompressionModel(N=16, M=24)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)},
                        jnp.zeros((1, 64, 64, 3)))
    img = synthetic_patches(1, (120, 121), seed=0)[0]  # odd size: pad path
    logs = []
    out_png = str(tmp_path / "recon.png")
    res = evaluate_array(cfg, model, params, img, out_png, log_fn=logs.append)
    assert res["bpp_real"] > 0 and res["bpp_est"] > 0
    # estimated and real bpp in the same units (original pixels)
    assert abs(res["bpp_real"] - res["bpp_est"]) < 0.15 * res["bpp_est"] + 0.1
    assert 0 <= res["msssim"] <= 1
    import os
    assert os.path.exists(out_png)
    assert any("estimated bpp" in line for line in logs)
    assert any("real" in line for line in logs)
