"""Training entry point: ``python -m dsic_tpu.train.cli --config cfg.py
--run_name run --lambda_rd 100`` plus a lambda-sweep driver
(``--lambda_sweep``) that trains one checkpoint per lambda on the reference
grid — replacing the reference's one-SLURM-job-per-lambda workflow
(submit.sbatch; SURVEY.md section 2 #12)."""

from __future__ import annotations

import argparse
import dataclasses

from dsic_tpu.config import load_config, ckpt_name, LAMBDA_GRID
from dsic_tpu.data.datasets import make_loaders
from dsic_tpu.train.trainer import Trainer


def main(argv=None):
    p = argparse.ArgumentParser(description="dsic_tpu trainer")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--run_name", type=str, default="default_run")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--ckpt_dir", type=str, default=None,
                   help="LOGGING.ckpt_dir override (checkpoints land in "
                        "{ckpt_dir}/{run_name})")
    p.add_argument("--lambda_rd", type=float, default=None)
    p.add_argument("--lambda_sweep", action="store_true",
                   help="train one checkpoint per lambda on the reference grid")
    p.add_argument("--lambda_vmap", action="store_true",
                   help="train ALL grid lambdas simultaneously in one "
                        "vmapped step on one chip (train/sweep.py) instead "
                        "of sequentially")
    p.add_argument("--family", type=str, default="dsic",
                   help="model family: dsic (default) or a live baseline "
                        "(bmshj2018, mbt2018_mean)")
    p.add_argument("--quality", type=int, default=None,
                   help="zoo quality preset 1-8 (sets N/M and lambda)")
    p.add_argument("--quality_sweep", type=str, default=None,
                   help="comma-separated zoo qualities to train, e.g. "
                        "'1,2,3,4,5,6,7,8' (one checkpoint per quality)")
    p.add_argument("--quality_vmap", action="store_true",
                   help="train the --quality_sweep qualities VMAPPED, "
                        "grouped by (N, M): every quality of a group "
                        "advances in one jitted step (the zoo analogue of "
                        "--lambda_vmap; ~3-4x faster than sequential)")
    p.add_argument("--lambdas", type=str, default=None,
                   help="comma-separated custom lambda grid for "
                        "--lambda_sweep/--lambda_vmap (default: the "
                        "reference 8-point grid); extra low/high points "
                        "widen the RD curve's rate range for BD overlap")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--mesh", action="store_true",
                   help="data-parallel training over all devices")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--select", type=str, default=None,
                   choices=["last", "best"],
                   help="final-checkpoint params: last step (reference) or "
                        "lowest-val-loss (TRAIN.select)")
    p.add_argument("--lr_schedule", type=str, default=None,
                   choices=["constant", "cosine"])
    p.add_argument("--warmup_steps", type=int, default=None)
    p.add_argument("--decay_steps", type=int, default=None,
                   help="total steps for the cosine schedule (defaults to "
                        "--max_steps when --lr_schedule cosine is given)")
    p.add_argument("--quant_mode", type=str, default=None,
                   choices=["noise", "round", "mix"],
                   help="train-time quantization: noise (reference default), "
                        "round (pure-STE fine-tune stage), or mix "
                        "(noise rate leg + STE-round decoder leg — the "
                        "Minnen-Singh 2020 recipe; low-λ-safe fine-tune) "
                        "(TRAIN.quant_mode)")
    p.add_argument("--init_from", type=str, default=None,
                   help="checkpoint run dir whose per-lambda checkpoints "
                        "seed a --lambda_vmap sweep's params (fresh "
                        "optimizer; used with --quant_mode round for the "
                        "fine-tune stage)")
    p.add_argument("--lr", type=float, default=None,
                   help="OPTIM.lr override (fine-tune stages want a small "
                        "peak LR)")
    args = p.parse_args(argv)

    overrides = {}
    if args.data_root:
        overrides["DATA.root"] = args.data_root
    if args.ckpt_dir:
        overrides["LOGGING.ckpt_dir"] = args.ckpt_dir
    if args.lambda_rd is not None:
        overrides["LOSS.lambda_rd"] = args.lambda_rd
    if args.epochs is not None:
        overrides["TRAIN.epochs"] = args.epochs
    if args.batch_size is not None:
        overrides["DATA.batch_size"] = args.batch_size
    if args.select is not None:
        overrides["TRAIN.select"] = args.select
    if args.lr_schedule is not None:
        overrides["OPTIM.lr_schedule"] = args.lr_schedule
    if args.warmup_steps is not None:
        overrides["OPTIM.warmup_steps"] = args.warmup_steps
    if args.decay_steps is not None:
        overrides["OPTIM.decay_steps"] = args.decay_steps
    elif args.lr_schedule == "cosine" and args.max_steps:
        overrides["OPTIM.decay_steps"] = args.max_steps
    if args.quant_mode is not None:
        overrides["TRAIN.quant_mode"] = args.quant_mode
    if args.lr is not None:
        overrides["OPTIM.lr"] = args.lr
    cfg = load_config(args.config, overrides)

    if args.family != "dsic" or args.quality or args.quality_sweep:
        _train_zoo(cfg, args)
        return

    grid = ([float(s) for s in args.lambdas.split(",")] if args.lambdas
            else LAMBDA_GRID)

    if args.lambda_vmap:
        from dsic_tpu.train.sweep import train_sweep_vmapped
        train_loader, val_loader = make_loaders(cfg)
        paths = train_sweep_vmapped(cfg, grid, train_loader,
                                    val_loader, run_name=args.run_name,
                                    max_steps=args.max_steps,
                                    sweep_ckpt=("sweep_state_ft"
                                                if args.init_from else None),
                                    init_from=args.init_from)
        for p_ in paths:
            print(f"saved {p_}")
        return

    lambdas = grid if args.lambda_sweep else [cfg.LOSS.lambda_rd]
    for lam in lambdas:
        run_cfg = cfg.replace(LOSS=dataclasses.replace(cfg.LOSS, lambda_rd=lam))
        train_loader, val_loader = make_loaders(run_cfg)
        # static sample shape probed WITHOUT consuming the loader (which
        # would advance the shuffle stream before epoch 1)
        trainer = Trainer(run_cfg, run_name=args.run_name, use_mesh=args.mesh,
                          sample_shape=(1, *train_loader.ds.sample_shape()))
        if args.resume:
            trainer.restore(args.resume)
        print(f"=== training lambda={lam} -> "
              f"{trainer.ckpt_dir}/{ckpt_name(lam)} ===")
        path = trainer.fit(train_loader, val_loader, max_steps=args.max_steps)
        print(f"saved {path}")


def _train_zoo(cfg, args):
    """Quality-sweep trainer for the live baseline families (the zoo analogue
    of the reference's per-lambda SLURM sweep): one checkpoint per compressai
    quality preset, MSE loss, framework lambda from ZOO_QUALITY."""
    from dsic_tpu.models.zoo import zoo_quality, zoo_ckpt_name
    if args.family == "dsic":
        raise SystemExit("--quality/--quality_sweep need --family "
                         "bmshj2018|mbt2018_mean|cheng2020_checkerboard")
    if args.quality_sweep:
        qualities = [int(q) for q in args.quality_sweep.split(",")]
    else:
        qualities = [args.quality or 1]

    from dsic_tpu.models.zoo import ZOO_FAMILIES
    fam_cls = ZOO_FAMILIES[args.family]
    fam_cls = getattr(fam_cls, "func", fam_cls)  # unwrap functools.partial
    # zoo hyper branches upsample z by exactly 4: training batches must pad
    # to the model's pad_multiple (64), not the flagship's 16
    pad_mult = max(cfg.DATA.pad_multiple,
                   getattr(fam_cls, "pad_multiple", cfg.DATA.pad_multiple))

    if args.quality_vmap:
        _train_zoo_vmapped(cfg, args, qualities, pad_mult)
        return
    for q in qualities:
        preset = zoo_quality(args.family, q)
        run_cfg = cfg.replace(
            DATA=dataclasses.replace(cfg.DATA, pad_multiple=pad_mult),
            MODEL=dataclasses.replace(cfg.MODEL, family=args.family,
                                      N=preset["N"], M=preset["M"]),
            LOSS=dataclasses.replace(cfg.LOSS, lambda_rd=preset["lam"],
                                     dist="mse"))
        train_loader, val_loader = make_loaders(run_cfg)
        name = zoo_ckpt_name(args.family, q)
        trainer = Trainer(run_cfg, run_name=args.run_name, use_mesh=args.mesh,
                          sample_shape=(1, *train_loader.ds.sample_shape()),
                          final_ckpt=name, log_name=f"train_log_{name}.csv")
        if args.resume:
            trainer.restore(args.resume)
        print(f"=== training {args.family} q={q} (N={preset['N']} "
              f"M={preset['M']} lambda={preset['lam']:.2f}) -> "
              f"{trainer.ckpt_dir}/{name} ===")
        path = trainer.fit(train_loader, val_loader, max_steps=args.max_steps)
        print(f"saved {path}")


def _train_zoo_vmapped(cfg, args, qualities, pad_mult):
    """Vmapped zoo quality sweep: qualities sharing (N, M) stack into one
    SweepTrainer (their presets differ only in lambda), so a whole
    architecture group advances per jitted step — the zoo analogue of the
    flagship's lambda-vmapped sweep, with the same kill-safe resume."""
    import itertools
    from dsic_tpu.models.zoo import zoo_quality, zoo_ckpt_name
    from dsic_tpu.train.sweep import train_sweep_vmapped

    keyfn = lambda q: (zoo_quality(args.family, q)["N"],  # noqa: E731
                       zoo_quality(args.family, q)["M"])
    for (n, m), group in itertools.groupby(sorted(qualities, key=keyfn),
                                           key=keyfn):
        group = list(group)
        lams = [zoo_quality(args.family, q)["lam"] for q in group]
        names = [zoo_ckpt_name(args.family, q) for q in group]
        run_cfg = cfg.replace(
            DATA=dataclasses.replace(cfg.DATA, pad_multiple=pad_mult),
            MODEL=dataclasses.replace(cfg.MODEL, family=args.family,
                                      N=n, M=m),
            LOSS=dataclasses.replace(cfg.LOSS, dist="mse"))
        train_loader, val_loader = make_loaders(run_cfg)
        print(f"=== vmapped {args.family} q={group} (N={n} M={m}, "
              f"{len(group)} models/step) ===")
        paths = train_sweep_vmapped(
            run_cfg, lams, train_loader, val_loader,
            run_name=args.run_name, max_steps=args.max_steps,
            ckpt_names=names,
            sweep_ckpt=f"sweep_state_{args.family}_{n}x{m}")
        for p_ in paths:
            print(f"saved {p_}")


if __name__ == "__main__":
    main()
