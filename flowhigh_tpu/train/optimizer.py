"""Optimizer + LR schedule (optax).

Matches the reference recipe: Adam(0.9, 0.99) with optional decoupled weight
decay applied only to >=2-D params (reference: src/flowhigh/train/optimizer.py:3-35),
linear warmup from ``initial_lr`` then cosine annealing to 0 over the
remaining steps with grad-norm clip 0.5 (reference: trainer.py:139,247-267,298).
"""

from __future__ import annotations

import optax

from ..config import TrainConfig


def lr_schedule(cfg: TrainConfig):
    """Warmup: lr = initial + (peak-initial) * step/warmup (trainer.py:247-251);
    then CosineAnnealingLR with T_max = num_train_steps (trainer.py:139)."""
    warmup = cfg.num_warmup_steps
    if warmup > 0:
        warmup_fn = optax.linear_schedule(cfg.initial_lr, cfg.lr, warmup)
    else:
        warmup_fn = None
    cosine_fn = optax.cosine_decay_schedule(cfg.lr, max(cfg.num_train_steps, 1), 0.0)
    if warmup_fn is None:
        return cosine_fn
    return optax.join_schedules([warmup_fn, cosine_fn], [warmup])


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    def decay_mask(params):
        import jax
        return jax.tree.map(lambda p: p.ndim >= 2, params)

    schedule = lr_schedule(cfg)
    if cfg.weight_decay > 0:
        opt = optax.adamw(
            schedule, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay, mask=decay_mask)
    else:
        opt = optax.adam(schedule, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps)
    steps = [optax.clip_by_global_norm(cfg.max_grad_norm), opt]
    if cfg.grad_accum_every > 1:
        return optax.MultiSteps(optax.chain(*steps), cfg.grad_accum_every)
    return optax.chain(*steps)
