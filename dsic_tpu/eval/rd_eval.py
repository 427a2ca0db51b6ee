"""Batch RD evaluation: per-lambda checkpoint -> per-image and aggregate RD
CSVs + RD plots, with the reference's file schemas
(batch_eval_model/agg_model_rd_summary.csv: lambda,count,bpp,mse,psnr,msssim;
per_image_per_lambda_results.csv: lambda,image,bpp,mse,psnr,msssim;
4 plots rd_{psnr,msssim}_avg_{linearx,logx}.png — modelseval.py:112-321).

TPU-first differences from the reference loop: images of one padded shape are
evaluated in jitted batches instead of one-by-one, and checkpoints load once
per lambda (the reference reloads per image in its BD scripts,
writeupbdcurvesballeALL.py:438-473 — noted there as an inefficiency).
"""

from __future__ import annotations

import functools
import os
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from dsic_tpu.config import Config, LAMBDA_GRID, ckpt_name
from dsic_tpu.ops.msssim import ms_ssim, ssim, psnr as psnr_op
from dsic_tpu.ops.pad import pad_to_multiple, crop_to
from dsic_tpu.train.state import build_model, create_train_state
from dsic_tpu.utils.checkpoint import restore_checkpoint
from dsic_tpu.utils.csv_logger import CsvLogger

# restore templates per zoo (family, N, M) group — device param init is
# ~60s over the tunnel, shared within each architecture group
_tmpl_cache: dict = {}

# RSS ceiling above which the per-leg release escalates to a full
# jax.clear_caches() (recompile ~30s/leg over the tunnel — cheap insurance
# vs the 130 GB OOM that killed the round-5 58-leg BD eval mid-run)
_RSS_CLEAR_BYTES = 48 << 30


def _host_rss_bytes() -> int:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) << 10
    except OSError:
        pass
    return 0


def _release_leg_memory():
    """Between eval legs: drop python garbage now (param trees are ~100 MB
    pytrees of numpy+device arrays; lazy collection lets several legs pile
    up), and if host RSS is still climbing toward the OOM line, drop the
    jit/executable caches too — on the tunneled backend those pin transfer
    staging buffers (observed: 130 GB RSS after 34 legs when params were
    host-resident and re-uploaded per batch)."""
    import gc
    gc.collect()
    rss = _host_rss_bytes()
    if rss > _RSS_CLEAR_BYTES:
        print(f"[rd_eval] host RSS {rss >> 30} GiB > "
              f"{_RSS_CLEAR_BYTES >> 30} GiB; clearing jax caches")
        jax.clear_caches()
        gc.collect()


@functools.lru_cache(maxsize=24)
def _eval_batch_fn(model):
    """Jitted eval forward, MEMOIZED on the model's structural identity.

    flax Modules hash/compare by field values, so two legs of a sweep that
    rebuild `CompressionModel(N=128, M=192)` get the SAME jitted callable —
    the compiled executable is reused across every lambda/quality leg with
    the same architecture instead of recompiling per leg. NOTE the memo
    alone did NOT bound host RSS (round-5 measured: the 58-leg BD eval
    still OOMed at 130 GB because HOST-resident params were re-uploaded
    every batch); the per-leg jax.device_put of params plus
    _release_leg_memory() are the actual fix."""
    @jax.jit
    def run(params, x_pad):
        if x_pad.dtype == jnp.uint8:  # wire format: normalize on device
            x_pad = x_pad.astype(jnp.float32) * (1.0 / 255.0)
        out = model.apply(params, x_pad, quant_mode="round", train=False)
        bits = (jnp.sum(out["nll_y"], axis=(1, 2, 3))
                + jnp.sum(out["nll_z"], axis=(1, 2, 3)))
        return jnp.clip(out["x_hat"], 0.0, 1.0), bits
    return run


@functools.lru_cache(maxsize=4)
def _metrics_fn(use_msssim: bool):
    """One jitted call for all per-image metrics (a single host sync per
    batch instead of one per metric). Memoized: only two variants exist."""
    @jax.jit
    def run(x_hat, x):
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) * (1.0 / 255.0)
        quality = ms_ssim(x_hat, x) if use_msssim else ssim(x_hat, x)
        mse = jnp.mean(jnp.square(x_hat - x), axis=(1, 2, 3))
        return quality, psnr_op(x_hat, x), mse
    return run


def evaluate_model_on_images(model, params, images: list[np.ndarray],
                             names: list[str] | None = None,
                             batch_size: int = 8) -> list[dict]:
    """Per-image RD metrics at round quantization. Images are HWC, uint8
    (preferred wire format; file-loaded 8-bit images lose nothing) or float
    [0,1], of arbitrary sizes; same-padded-shape images batch together."""
    names = names or [f"img_{i}" for i in range(len(images))]
    run = _eval_batch_fn(model)

    groups: dict[tuple, list[int]] = defaultdict(list)
    for i, img in enumerate(images):
        groups[img.shape].append(i)

    results: list[dict | None] = [None] * len(images)
    for shape, idxs in groups.items():
        h, w = shape[:2]
        # ssim fallback for small images (modelseval.py:79-88)
        metrics = _metrics_fn(use_msssim=min(h, w) > 40)
        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start:start + batch_size]
            x = np.stack([images[i] for i in chunk])
            x_pad, box = pad_to_multiple(jnp.asarray(x),
                                         getattr(model, "pad_multiple", 16))
            x_hat_pad, bits = run(params, x_pad)
            x_hat = crop_to(x_hat_pad, box)
            mss_d, ps_d, mse_d = metrics(x_hat, jnp.asarray(x))
            mss, ps, mse = (np.asarray(mss_d), np.asarray(ps_d),
                            np.asarray(mse_d))
            bpp = np.asarray(bits) / (h * w)
            for j, i in enumerate(chunk):
                results[i] = {"image": names[i], "bpp": float(bpp[j]),
                              "mse": float(mse[j]), "psnr": float(ps[j]),
                              "msssim": float(mss[j])}
    return results  # type: ignore[return-value]


def evaluate_model_lambdas(cfg: Config, ckpt_root: str, image_dir: str,
                           out_dir: str, lambdas=LAMBDA_GRID,
                           max_images: int = 1000, batch_size: int = 8,
                           make_plots: bool = True) -> dict:
    """The reference's evaluate_model_lambdas (modelseval.py:112-321):
    for each lambda, load `alpha{lambda}lambda`, evaluate <= max_images
    images, write per-image + aggregate CSVs and RD plots. Checkpoints that
    fail to load are skipped with a warning (the reference's WARN-and-continue
    posture). Returns the aggregate curve dict."""
    from dsic_tpu.utils.image_io import list_images as _list, load_image_u8
    os.makedirs(out_dir, exist_ok=True)
    paths = _list(image_dir)[:max_images]
    images = [load_image_u8(p) for p in paths]
    names = [os.path.basename(p) for p in paths]

    model = build_model(cfg, train_dtype=None)
    _, _, template = create_train_state(
        cfg, jax.random.PRNGKey(0),
        sample_shape=(1, 64, 64, 3))

    agg = {"lambda": [], "count": [], "bpp": [], "mse": [], "psnr": [],
           "msssim": []}
    with CsvLogger(os.path.join(out_dir, "per_image_per_lambda_results.csv"),
                   ["lambda", "image", "bpp", "mse", "psnr", "msssim"]) as per:
        for lam in lambdas:
            path = os.path.join(ckpt_root, ckpt_name(lam))
            try:
                state, _ = restore_checkpoint(path, template)
                # orbax restores to HOST numpy; pin on device once per leg
                # or every jitted batch re-uploads the full param tree
                # (~25-120 MB over the ~70 MB/s tunnel, ~63x per leg) —
                # measured as BOTH the dominant leg cost and the source of
                # the 130 GB host-RSS OOM (leaked transfer staging buffers,
                # round-5 58-leg BD eval, 2026-08-20).
                params = jax.device_put(state.params)
            except Exception as exc:  # noqa: BLE001
                print(f"[rd_eval] WARN: cannot load {path}: {exc}; skipping")
                continue
            rows = evaluate_model_on_images(model, params, images, names,
                                            batch_size)
            for row in rows:
                per.log(**{"lambda": lam, **row})
            agg["lambda"].append(lam)
            agg["count"].append(len(rows))
            for key in ("bpp", "mse", "psnr", "msssim"):
                agg[key].append(float(np.mean([r[key] for r in rows])))
            del state, params
            _release_leg_memory()

    with CsvLogger(os.path.join(out_dir, "agg_model_rd_summary.csv"),
                   ["lambda", "count", "bpp", "mse", "psnr", "msssim"]) as ag:
        for i in range(len(agg["lambda"])):
            ag.log(**{k: agg[k][i] for k in agg})

    if make_plots and agg["lambda"]:
        plot_rd_curves(agg, out_dir)
    return {k: np.asarray(v) for k, v in agg.items()}


def evaluate_zoo_qualities(cfg: Config, ckpt_root: str, image_dir: str,
                           out_dir: str, family: str = "bmshj2018",
                           qualities=None, max_images: int = 1000,
                           batch_size: int = 8) -> dict:
    """LIVE learned-baseline RD curve: load the in-framework `{family}_q{q}`
    checkpoints (models/zoo.py, trained with --family/--quality_sweep) and
    evaluate them on the SAME image set as the model, writing the reference's
    `agg_bmshj_rd.csv` schema quality,count,bpp,psnr,msssim
    (batch_bd_results_bmshj/balle_agg_bmshj_rd.csv:1). This replaces the
    reference's per-image compressai forwards
    (writeupbdcurvesballeALL.py:385-435) with batched jitted ones; missing
    checkpoints are skipped with a warning."""
    import dataclasses
    from dsic_tpu.models.zoo import zoo_quality, zoo_qualities, zoo_ckpt_name
    from dsic_tpu.utils.image_io import list_images as _list, load_image_u8
    os.makedirs(out_dir, exist_ok=True)
    if qualities is None:
        qualities = zoo_qualities(family)
    paths = _list(image_dir)[:max_images]
    images = [load_image_u8(p) for p in paths]
    names = [os.path.basename(p) for p in paths]

    agg = {"quality": [], "count": [], "bpp": [], "mse": [], "psnr": [],
           "msssim": []}
    per_path = os.path.join(out_dir, f"per_image_{family}_results.csv")
    with CsvLogger(per_path, ["quality", "image", "bpp", "mse", "psnr",
                              "msssim"]) as per:
        for q in qualities:
            preset = zoo_quality(family, q)
            qcfg = cfg.replace(MODEL=dataclasses.replace(
                cfg.MODEL, family=family, N=preset["N"], M=preset["M"]))
            model = build_model(qcfg, train_dtype=None)
            # one restore template per (family, N, M) group, not per
            # quality: create_train_state inits params on device (~60s
            # over the tunnel), and zoo presets share an architecture
            # within each group — 8 qualities need <= 2 inits, not 8.
            tkey = (family, preset["N"], preset["M"])
            if tkey not in _tmpl_cache:
                _, _, _tmpl_cache[tkey] = create_train_state(
                    qcfg, jax.random.PRNGKey(0), sample_shape=(1, 64, 64, 3))
            template = _tmpl_cache[tkey]
            path = os.path.join(ckpt_root, zoo_ckpt_name(family, q))
            try:
                state, _ = restore_checkpoint(path, template)
                # device-pin once per leg (see evaluate_model_lambdas)
                params = jax.device_put(state.params)
            except Exception as exc:  # noqa: BLE001
                print(f"[rd_eval] WARN: cannot load {path}: {exc}; skipping")
                continue
            rows = evaluate_model_on_images(model, params, images, names,
                                            batch_size)
            for row in rows:
                per.log(**{"quality": q, **row})
            agg["quality"].append(q)
            agg["count"].append(len(rows))
            for key in ("bpp", "mse", "psnr", "msssim"):
                agg[key].append(float(np.mean([r[key] for r in rows])))
            del state, params
            _release_leg_memory()

    with CsvLogger(os.path.join(out_dir, f"agg_{family}_rd.csv"),
                   ["quality", "count", "bpp", "psnr", "msssim"]) as ag:
        for i in range(len(agg["quality"])):
            ag.log(**{k: agg[k][i] for k in agg if k != "mse"})
    return {k: np.asarray(v) for k, v in agg.items()}


def evaluate_jpeg_baseline(image_dir: str, out_dir: str,
                           max_images: int = 1000, qualities=None,
                           batch_size: int = 64) -> dict:
    """LIVE same-dataset JPEG baseline curve: per-image PIL JPEG encode over
    the reference's quality grid 10..100 step 10
    (writeupbdcurvesjpegALL.py:31,63-66,110,208), metrics in jitted batches.
    Writes per_image_jpeg_results.csv + agg_jpeg_rd.csv with the same schema
    as the live zoo curves so BD-vs-JPEG — the reference's HEADLINE
    comparison (writeupbdcurvesjpegALL.py:174, bd_metrics_summary_jpeg.csv)
    — is measured on the SAME eval set as the flagship curve."""
    from dsic_tpu.eval.jpeg import jpeg_encode_decode, JPEG_QUALITIES
    from dsic_tpu.utils.image_io import list_images as _list, load_image
    os.makedirs(out_dir, exist_ok=True)
    qualities = tuple(qualities if qualities is not None else JPEG_QUALITIES)
    paths = _list(image_dir)[:max_images]
    images = [load_image(p) for p in paths]
    names = [os.path.basename(p) for p in paths]

    groups: dict[tuple, list[int]] = defaultdict(list)
    for i, img in enumerate(images):
        groups[img.shape].append(i)

    agg = {"quality": [], "count": [], "bpp": [], "psnr": [], "msssim": []}
    per_path = os.path.join(out_dir, "per_image_jpeg_results.csv")
    with CsvLogger(per_path, ["quality", "image", "bpp", "mse", "psnr",
                              "msssim"]) as per:
        for q in qualities:
            rows = []
            for shape, idxs in groups.items():
                h, w = shape[:2]
                metrics = _metrics_fn(use_msssim=min(h, w) > 40)
                for start in range(0, len(idxs), batch_size):
                    chunk = idxs[start:start + batch_size]
                    dec, nbytes = zip(*(jpeg_encode_decode(images[i], q)
                                        for i in chunk))
                    x = jnp.asarray(np.stack([images[i] for i in chunk]))
                    mss_d, ps_d, mse_d = metrics(jnp.asarray(np.stack(dec)),
                                                 x)
                    mss, ps, mse = (np.asarray(mss_d), np.asarray(ps_d),
                                    np.asarray(mse_d))
                    for j, i in enumerate(chunk):
                        row = {"quality": q, "image": names[i],
                               "bpp": 8.0 * nbytes[j] / (h * w),
                               "mse": float(mse[j]), "psnr": float(ps[j]),
                               "msssim": float(mss[j])}
                        per.log(**row)
                        rows.append(row)
            agg["quality"].append(q)
            agg["count"].append(len(rows))
            for key in ("bpp", "psnr", "msssim"):
                agg[key].append(float(np.mean([r[key] for r in rows])))

    with CsvLogger(os.path.join(out_dir, "agg_jpeg_rd.csv"),
                   ["quality", "count", "bpp", "psnr", "msssim"]) as ag:
        for i in range(len(agg["quality"])):
            ag.log(**{k: agg[k][i] for k in agg})
    return {k: np.asarray(v) for k, v in agg.items()}


def plot_rd_curves(curve: dict, out_dir: str, label: str = "model",
                   baselines: dict | None = None):
    """The 4 reference plots: PSNR/MS-SSIM vs bpp, linear and log x
    (modelseval.py:247-321)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for metric, ylabel in (("psnr", "PSNR (dB)"), ("msssim", "MS-SSIM")):
        for logx in (False, True):
            fig, ax = plt.subplots(figsize=(7, 5))
            ax.plot(curve["bpp"], curve[metric], "o-", label=label)
            for name, base in (baselines or {}).items():
                ax.plot(base["bpp"], base[metric], "s--", label=name)
            if logx:
                ax.set_xscale("log")
            ax.set_xlabel("bpp")
            ax.set_ylabel(ylabel)
            ax.grid(True, alpha=0.3)
            ax.legend()
            suffix = "logx" if logx else "linearx"
            fig.savefig(os.path.join(out_dir,
                                     f"rd_{metric}_avg_{suffix}.png"),
                        dpi=120, bbox_inches="tight")
            plt.close(fig)
