"""Optimizers and LR schedules matching the reference training recipe.

Reference: AdamW with amsgrad, lr 1e-3, weight decay 0..1e-3
(``ln_train.py:163-168``); CosineAnnealingWarmRestarts(T_0=3) stepped per
iteration for SemanticKITTI (``ln_train.py:167-180``); ReduceLROnPlateau for
the other datasets (``:195-197``).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cosine_warm_restarts(base_lr: float, t0_steps: int, t_mult: int = 1, eta_min: float = 0.0):
    """torch CosineAnnealingWarmRestarts as an optax schedule.

    With t_mult == 1 the restart period is constant (the reference uses the
    default T_mult=1); for t_mult > 1 each cycle is t_mult x longer.
    """

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        if t_mult == 1:
            t_cur = jnp.mod(count, t0_steps)
            t_i = float(t0_steps)
        else:
            # cycle index n satisfies count >= t0 * (t_mult^n - 1)/(t_mult - 1)
            ratio = count * (t_mult - 1) / t0_steps + 1.0
            n = jnp.floor(jnp.log(ratio) / jnp.log(float(t_mult)))
            start = t0_steps * (jnp.power(float(t_mult), n) - 1.0) / (t_mult - 1)
            t_cur = count - start
            t_i = t0_steps * jnp.power(float(t_mult), n)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t_cur / t_i))
        return eta_min + (base_lr - eta_min) * cos

    return schedule


def adamw_amsgrad(learning_rate, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """AdamW(amsgrad=True): amsgrad moment tracking + decoupled weight decay."""
    return optax.chain(
        optax.scale_by_amsgrad(),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


def make_optimizer(
    lr: float = 1e-3,
    weight_decay: float = 0.0,
    schedule: str = "none",
    t0_steps: int = 3000,
    max_grad_norm: float | None = None,
    plateau_patience: int = 10,
    plateau_factor: float = 0.1,
    plateau_accumulation: int = 1,
) -> optax.GradientTransformation:
    """Build the training optimizer from config-level knobs.

    ``schedule='reduce_on_plateau'`` mirrors the reference's non-KITTI path
    (``ln_train.py:195-197``: torch ReduceLROnPlateau(patience=10,
    factor=0.1) stepped on the accumulated test loss).  Here it runs fully
    on-device via ``optax.contrib.reduce_on_plateau`` fed the per-step
    training loss, averaged over ``plateau_accumulation`` steps (set it to
    steps-per-epoch for epoch-granularity patience like the reference).
    The returned transformation then requires ``value=<loss>`` at update time
    — ``make_train_step`` threads it automatically.
    """
    if schedule == "cosine_warm_restarts":
        lr_schedule = cosine_warm_restarts(lr, t0_steps)
    elif schedule in ("none", "reduce_on_plateau"):
        lr_schedule = lr
    else:
        raise ValueError(f"unknown schedule {schedule}")
    tx = adamw_amsgrad(lr_schedule, weight_decay)
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    if schedule == "reduce_on_plateau":
        import optax.contrib

        tx = optax.chain(
            tx,
            optax.contrib.reduce_on_plateau(
                patience=plateau_patience,
                factor=plateau_factor,
                accumulation_size=max(1, plateau_accumulation),
            ),
        )
    return tx
