"""Optimizer registry (reference lib/optimizers/optimizers.py: Adam only).

Built as an optax chain: grad clip (training.py:28-29) -> Adam -> linear
warmup lr scaling (training.py:31-33). The warmup is folded into the optax
schedule so the whole step stays one compiled graph.
"""

from __future__ import annotations

import optax

from ctdd_tpu import registry


@registry.optimizers.register(name="Adam")
def adam(cfg) -> optax.GradientTransformation:
    lr = cfg.optimizer.lr
    warmup = cfg.training.get("warmup", 0)
    if warmup and warmup > 0:
        schedule = optax.linear_schedule(0.0, lr, warmup)
    else:
        schedule = lr
    chain = []
    if cfg.training.get("clip_grad", False):
        chain.append(optax.clip_by_global_norm(cfg.training.grad_norm))
    chain.append(optax.adam(schedule))
    return optax.chain(*chain)


@registry.optimizers.register(name="AdamW")
def adamw(cfg) -> optax.GradientTransformation:
    lr = cfg.optimizer.lr
    warmup = cfg.training.get("warmup", 0)
    schedule = optax.linear_schedule(0.0, lr, warmup) if warmup else lr
    chain = []
    if cfg.training.get("clip_grad", False):
        chain.append(optax.clip_by_global_norm(cfg.training.grad_norm))
    chain.append(optax.adamw(schedule, weight_decay=cfg.optimizer.get("weight_decay", 1e-4)))
    return optax.chain(*chain)


def get_optimizer(cfg) -> optax.GradientTransformation:
    return registry.optimizers.get(cfg.optimizer.name)(cfg)
