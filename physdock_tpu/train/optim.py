"""Optimizer + schedules matching the reference training recipe.

(reference: tasks/unicore_train/train.sh:69-110)
  adam betas (0.9, 0.95) eps 1e-8; lr 1.8e-3, linear warmup 1000 steps then
  stair exponential decay x0.998 every 1000 steps; per-replica grad clip 0.1
  before the allreduce + global clip 10 after; fp32 grad reduction; EMA of
  params with decay 0.999.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def stair_exp_warmup_schedule(
    peak_lr: float = 1.8e-3,
    warmup_steps: int = 1000,
    decay_rate: float = 0.998,
    decay_every: int = 1000,
) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # (step+1)/warmup so the very first update is non-zero
        warm = jnp.minimum((step + 1.0) / warmup_steps, 1.0)
        stairs = jnp.floor(jnp.maximum(step - warmup_steps, 0.0) / decay_every)
        return peak_lr * warm * decay_rate**stairs

    return schedule


def make_optimizer(
    peak_lr: float = 1.8e-3,
    warmup_steps: int = 1000,
    global_clip: float = 10.0,
    b1: float = 0.9,
    b2: float = 0.95,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Global transform applied AFTER the cross-replica mean; the per-replica
    0.1 clip happens inside the train step before the psum."""
    return optax.chain(
        optax.clip_by_global_norm(global_clip),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(
            stair_exp_warmup_schedule(peak_lr, warmup_steps)
        ),
    )


def clip_by_norm(tree, max_norm: float):
    """Per-replica gradient clip (train.sh --per-sample-clip-norm 0.1)."""
    norm = optax.global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-9))
    return jax.tree_util.tree_map(lambda g: g * scale, tree)


def ema_update(ema, params, decay: float = 0.999):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema, params
    )
