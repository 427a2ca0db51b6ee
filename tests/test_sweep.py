"""λ-vmapped sweep (train/sweep.py): per-model math must equal the
sequential make_train_step path, and the saved checkpoints must feed the
standard eval suite."""

import dataclasses
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dsic_tpu.config import Config, ckpt_name
from dsic_tpu.data.synthetic import synthetic_patches
from dsic_tpu.train.state import create_train_state, make_optimizer
from dsic_tpu.train.steps import make_train_step
from dsic_tpu.train.sweep import (
    init_sweep_state, make_sweep_train_step, train_sweep_vmapped,
    unstack_state)


def _tiny_cfg(**over):
    cfg = Config()
    cfg = cfg.replace(MODEL=dataclasses.replace(cfg.MODEL, N=16, M=24),
                      TRAIN=dataclasses.replace(cfg.TRAIN, amp=False,
                                                epochs=1))
    for k, v in over.items():
        sec, field = k.split(".")
        cfg = cfg.replace(**{sec: dataclasses.replace(getattr(cfg, sec),
                                                      **{field: v})})
    return cfg


def test_vmapped_sweep_matches_sequential_per_model():
    """3 steps of the vmapped 2-λ sweep == 3 steps of make_train_step run
    separately per λ with the same keys, params, and batches."""
    cfg = _tiny_cfg()
    lambdas = [10.0, 1000.0]
    xs = [jnp.asarray(synthetic_patches(2, (64, 64), seed=s))
          for s in range(3)]

    model, tx, stacked = init_sweep_state(cfg, lambdas,
                                          jax.random.PRNGKey(0),
                                          (1, 64, 64, 3))
    sweep_step = make_sweep_train_step(model, tx, lambdas, dist="msssim",
                                       donate=False)

    # sequential runs from the SAME initial params and the SAME noise keys
    seq_states = [unstack_state(jax.device_get(stacked), i)
                  for i in range(2)]
    seq_steps = [make_train_step(model, tx, lam, dist="msssim", donate=False)
                 for lam in lambdas]

    key = jax.random.PRNGKey(7)
    seq_metrics = None
    for x in xs:
        key, k = jax.random.split(key)
        stacked, metrics = sweep_step(stacked, x, k)
        keys = jax.random.split(k, 2)  # the split the sweep step performs
        seq_metrics = []
        for i in range(2):
            seq_states[i], m = seq_steps[i](seq_states[i], x, keys[i])
            seq_metrics.append(m)

    for i in range(2):
        np.testing.assert_allclose(float(metrics["loss"][i]),
                                   float(seq_metrics[i]["loss"]), rtol=1e-5)
        got = unstack_state(jax.device_get(stacked), i)
        for a, b in zip(jax.tree.leaves(got.params),
                        jax.tree.leaves(seq_states[i].params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


def test_vmapped_sweep_end_to_end_checkpoints(tmp_path):
    """train_sweep_vmapped saves alpha{λ}lambda checkpoints loadable by the
    standard eval restore path."""
    from dsic_tpu.eval.rd_eval import evaluate_model_lambdas
    from dsic_tpu.utils.image_io import save_image

    cfg = _tiny_cfg(**{"LOGGING.ckpt_dir": str(tmp_path / "ckpts"),
                       "LOGGING.log_every": 2, "LOGGING.val_every": 100})
    lambdas = [10.0, 1000.0]
    batches = [synthetic_patches(2, (64, 64), seed=s) for s in range(2)]
    paths = train_sweep_vmapped(cfg, lambdas, batches, run_name="vsweep",
                                max_steps=2, log_fn=lambda *_: None)
    assert len(paths) == 2
    assert paths[0].endswith(ckpt_name(10.0))
    assert paths[1].endswith(ckpt_name(1000.0))

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        save_image(str(img_dir / f"im{i}.png"),
                   rng.random((64, 64, 3)).astype(np.float32))
    curve = evaluate_model_lambdas(cfg, os.path.dirname(paths[0]),
                                   str(img_dir), str(tmp_path / "out"),
                                   lambdas=lambdas, max_images=2,
                                   make_plots=False)
    assert len(curve["bpp"]) == 2
    assert np.all(np.isfinite(curve["bpp"]))


def test_sweep_kill_and_resume_matches_uninterrupted(tmp_path):
    """Preempt the vmapped sweep mid-epoch; auto-resume from sweep_state must
    land on the same step count AND bit-comparable final params as an
    uninterrupted run (round-2 VERDICT weak #4: the sweep was the designated
    long-job trainer but could not resume)."""
    lambdas = [10.0, 1000.0]
    batches = [synthetic_patches(2, (48, 48), seed=s) for s in range(4)]
    val = [synthetic_patches(2, (48, 48), seed=99)]

    def run(name, ckdir, stop=None, resume=False):
        cfg = _tiny_cfg(**{"LOGGING.ckpt_dir": ckdir,
                           "LOGGING.log_every": 2, "LOGGING.val_every": 2,
                           "TRAIN.epochs": 2})
        return train_sweep_vmapped(cfg, lambdas, list(batches), list(val),
                                   run_name=name, max_steps=stop,
                                   log_fn=lambda *_: None, resume=resume)

    full = run("full", str(tmp_path / "a"))          # 2 epochs x 4 = 8 steps
    run("res", str(tmp_path / "b"), stop=5)          # preempt mid-epoch 2
    resumed = run("res", str(tmp_path / "b"), resume=True)

    from dsic_tpu.utils.checkpoint import restore_checkpoint
    for pf, pr in zip(full, resumed):
        sf, ef = restore_checkpoint(pf)
        sr, er = restore_checkpoint(pr)
        assert int(ef["step"]) == int(er["step"]) == 8
        for a, b in zip(jax.tree.leaves(sf["params"]),
                        jax.tree.leaves(sr["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_sweep_best_val_selection_and_logs(tmp_path):
    """TRAIN.select='best': each alpha ckpt carries the per-lambda
    lowest-val-loss params (tracked via the device-side masked update), and
    per-lambda CSV training logs are written."""
    lambdas = [10.0, 1000.0]
    cfg = _tiny_cfg(**{"LOGGING.ckpt_dir": str(tmp_path / "c"),
                       "LOGGING.log_every": 2, "LOGGING.val_every": 2,
                       "TRAIN.epochs": 1, "TRAIN.select": "best"})
    batches = [synthetic_patches(2, (48, 48), seed=s) for s in range(4)]
    val = [synthetic_patches(2, (48, 48), seed=99)]
    paths = train_sweep_vmapped(cfg, lambdas, batches, val,
                                run_name="bsel", log_fn=lambda *_: None)
    from dsic_tpu.utils.checkpoint import restore_checkpoint
    for p in paths:
        _, extra = restore_checkpoint(p)
        assert int(extra["selected_best"]) == 1
        assert np.isfinite(float(extra["best_val_loss"]))
    for lam in (10, 1000):
        log = tmp_path / "c" / "bsel" / f"train_log_lambda{lam}.csv"
        assert log.exists()
        assert len(log.read_text().strip().splitlines()) >= 2


def test_zoo_quality_vmap_groups_and_checkpoints(tmp_path, monkeypatch):
    """--quality_vmap: qualities sharing (N, M) train in ONE vmapped sweep,
    saving {family}_q{q}-named checkpoints the zoo eval path loads."""
    from dsic_tpu.models.zoo import ZOO_QUALITY
    from dsic_tpu.train import cli
    from dsic_tpu.utils.checkpoint import restore_checkpoint
    from dsic_tpu.utils.image_io import save_image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(12):
        save_image(str(img_dir / f"im{i}.png"),
                   rng.random((64, 64, 3)).astype(np.float32))
    # two tiny same-(N,M) presets -> one vmapped group; q3 differs -> its own
    monkeypatch.setitem(ZOO_QUALITY, 1, dict(N=8, M=16, lam=10.0))
    monkeypatch.setitem(ZOO_QUALITY, 2, dict(N=8, M=16, lam=100.0))
    monkeypatch.setitem(ZOO_QUALITY, 3, dict(N=12, M=16, lam=200.0))

    cfg_py = tmp_path / "cfg.py"
    cfg_py.write_text(
        "class LOGGING:\n"
        f"    ckpt_dir = {str(tmp_path / 'ck')!r}\n"
        "    log_every = 2\n"
        "    val_every = 100\n"
        "class TRAIN:\n"
        "    amp = False\n")
    cli.main(["--config", str(cfg_py), "--data_root", str(img_dir),
              "--run_name", "qv", "--family", "bmshj2018",
              "--quality_sweep", "1,2,3", "--quality_vmap",
              "--max_steps", "2", "--epochs", "10", "--batch_size", "4"])
    ckdir = tmp_path / "ck" / "qv"
    for q in (1, 2, 3):
        assert (ckdir / f"bmshj2018_q{q}").is_dir()
        assert (ckdir / f"train_log_bmshj2018_q{q}.csv").exists()
    # two groups -> two distinct kill-safe sweep states
    assert (ckdir / "sweep_state_bmshj2018_8x16").is_dir()
    assert (ckdir / "sweep_state_bmshj2018_12x16").is_dir()
    _, extra = restore_checkpoint(str(ckdir / "bmshj2018_q2"))
    assert float(extra["lambda_rd"]) == 100.0


def test_sweep_ste_round_finetune_from_checkpoints(tmp_path):
    """The STE-round fine-tune stage: a --quant_mode round sweep seeded
    via init_from picks up the noise-trained per-λ checkpoints exactly,
    trains through the rounding path, and re-saves loadable checkpoints."""
    from dsic_tpu.train.sweep import SweepTrainer
    from dsic_tpu.utils.checkpoint import restore_checkpoint

    cfg = _tiny_cfg(**{"LOGGING.ckpt_dir": str(tmp_path / "ckpts"),
                       "LOGGING.log_every": 2, "LOGGING.val_every": 100})
    lambdas = [10.0, 1000.0]
    batches = [synthetic_patches(2, (64, 64), seed=s) for s in range(2)]
    stage1 = train_sweep_vmapped(cfg, lambdas, batches, run_name="ft",
                                 max_steps=2, log_fn=lambda *_: None)
    stage1_params = [restore_checkpoint(p)[0]["params"] for p in stage1]

    ft_cfg = cfg.replace(TRAIN=dataclasses.replace(cfg.TRAIN,
                                                   quant_mode="round"))
    trainer = SweepTrainer(ft_cfg, lambdas, run_name="ft",
                           sample_shape=(1, 64, 64, 3),
                           sweep_ckpt="sweep_state_ft")
    trainer.init_params_from(os.path.join(str(tmp_path / "ckpts"), "ft"))
    # seeded params == the stage-1 checkpoints, row for row
    for i in range(2):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            jax.tree.map(lambda a: a[i], jax.device_get(
                trainer.state.params)),
            stage1_params[i])
    paths = trainer.fit(batches, max_steps=2, log_fn=lambda *_: None)
    assert len(paths) == 2
    for p, before in zip(paths, stage1_params):
        after = restore_checkpoint(p)[0]["params"]
        # fine-tune actually moved the params
        diffs = jax.tree.leaves(jax.tree.map(
            lambda a, b: float(np.max(np.abs(np.asarray(a)
                                             - np.asarray(b)))),
            after, before))
        assert max(diffs) > 0.0


def test_sweep_mix_finetune_keeps_rate_alive(tmp_path):
    """The mixed-quantization fine-tune stage (--quant_mode mix): trains
    through the noise-rate/STE-decoder path without error and the per-λ
    rate metric stays a live (finite) value — the mode the flagship
    low-λ fine-tune uses instead of pure STE-round."""
    from dsic_tpu.train.sweep import SweepTrainer

    cfg = _tiny_cfg(**{"LOGGING.ckpt_dir": str(tmp_path / "ckpts"),
                       "LOGGING.log_every": 1, "LOGGING.val_every": 100,
                       "TRAIN.quant_mode": "mix"})
    lambdas = [10.0, 1000.0]
    batches = [synthetic_patches(2, (64, 64), seed=s) for s in range(2)]
    trainer = SweepTrainer(cfg, lambdas, run_name="mix",
                           sample_shape=(1, 64, 64, 3),
                           sweep_ckpt="sweep_state_mix")
    paths = trainer.fit(batches, max_steps=2, log_fn=lambda *_: None)
    assert len(paths) == 2

    # the step the trainer jitted really runs the mix path: metrics carry a
    # finite per-λ rate from the NOISY likelihood leg
    model, tx, stacked = init_sweep_state(cfg, lambdas,
                                          jax.random.PRNGKey(3),
                                          (1, 64, 64, 3))
    step = make_sweep_train_step(model, tx, lambdas, dist="msssim",
                                 donate=False, quant_mode="mix")
    _, m = step(stacked, jnp.asarray(batches[0]), jax.random.PRNGKey(9))
    rates = np.asarray(m["R"], np.float64)
    assert rates.shape == (2,) and np.isfinite(rates).all()
    assert (rates > 0).all()  # fresh-init noisy latents carry nonzero rate
