"""Train state: params + Adam optimizer with global-norm clipping.

Mirrors the reference optimizer config (train.py:182-184, config.py:12-17):
Adam(lr=1e-4, betas=(0.9, 0.999), weight_decay=0) with grad-norm clip 1.0.
TPU mixed precision is handled by the model's activation dtype (bfloat16 when
TRAIN.amp, the AMP equivalent — no loss-scaler is needed for bf16).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
import flax.struct

from dsic_tpu.config import Config
from dsic_tpu.models import CompressionModel


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32

    def apply_gradients(self, tx: optax.GradientTransformation, grads):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        return TrainState(params=optax.apply_updates(self.params, updates),
                          opt_state=new_opt, step=self.step + 1)


def make_lr(cfg: Config):
    """Learning-rate schedule from OPTIM: constant (reference, train.py:182)
    or warmup+cosine decay over OPTIM.decay_steps."""
    o = cfg.OPTIM
    sched = getattr(o, "lr_schedule", "constant")
    if sched == "constant":
        return o.lr
    if sched == "cosine":
        if o.decay_steps <= 0:
            raise ValueError("OPTIM.lr_schedule='cosine' needs "
                             "OPTIM.decay_steps > 0 (total planned steps)")
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if o.warmup_steps else o.lr,
            peak_value=o.lr, warmup_steps=o.warmup_steps,
            decay_steps=o.decay_steps, end_value=o.lr * o.min_lr_ratio)
    raise ValueError(f"unknown OPTIM.lr_schedule {sched!r}")


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    lr = make_lr(cfg)
    chain = []
    if cfg.OPTIM.grad_clip and cfg.OPTIM.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.OPTIM.grad_clip))
    if cfg.OPTIM.weight_decay and cfg.OPTIM.weight_decay > 0:
        chain.append(optax.adamw(lr, b1=cfg.OPTIM.betas[0],
                                 b2=cfg.OPTIM.betas[1],
                                 weight_decay=cfg.OPTIM.weight_decay))
    else:
        chain.append(optax.adam(lr, b1=cfg.OPTIM.betas[0],
                                b2=cfg.OPTIM.betas[1]))
    return optax.chain(*chain)


def build_model(cfg: Config, train_dtype=None):
    dtype = train_dtype
    if dtype is None and cfg.TRAIN.amp:
        dtype = jnp.bfloat16
    family = getattr(cfg.MODEL, "family", "dsic")
    if family != "dsic":
        from dsic_tpu.models.zoo import ZOO_FAMILIES
        if family not in ZOO_FAMILIES:
            raise ValueError(f"unknown MODEL.family {family!r}; have "
                             f"['dsic'] + {sorted(ZOO_FAMILIES)}")
        cls = ZOO_FAMILIES[family]
        kw = {}
        fields = getattr(getattr(cls, "func", cls), "__dataclass_fields__", {})
        if "slice_size" in fields:  # charm2020 / elic2022: K = M / slice_size
            kw["slice_size"] = getattr(cfg.MODEL, "slice_size", 32)
        return cls(N=cfg.MODEL.N, M=cfg.MODEL.M, dtype=dtype, **kw)
    return CompressionModel(
        N=cfg.MODEL.N, M=cfg.MODEL.M,
        spatial_params=cfg.MODEL.spatial_params,
        min_nu=cfg.MODEL.min_nu, max_nu=cfg.MODEL.max_nu,
        dtype=dtype)


def create_train_state(cfg: Config, rng: jax.Array,
                       sample_shape=(1, 256, 256, 3)):
    """Returns (model, tx, state). ``sample_shape`` only shapes the init pass —
    the conv model's params are shape-independent."""
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    p_rng, n_rng = jax.random.split(rng)
    params = model.init({"params": p_rng, "noise": n_rng},
                        jnp.zeros(sample_shape, jnp.float32))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    return model, tx, state
