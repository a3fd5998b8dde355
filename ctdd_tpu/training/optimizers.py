"""Optimizer registry (reference lib/optimizers/optimizers.py: Adam only).

Built as an optax chain: grad clip (training.py:28-29) -> Adam -> linear
warmup lr scaling (training.py:31-33). The warmup is folded into the optax
schedule so the whole step stays one compiled graph.
"""

from __future__ import annotations

import optax

from ctdd_tpu import registry


def _schedule(cfg):
    """lr schedule from config: warmup (linear, ref training.py:31-33)
    composed with an optional decay.

    `optimizer.schedule`: "constant" (default, reference parity),
    "cosine" (decay to `optimizer.end_lr_factor`·lr over training.n_iters),
    or "linear" (same endpoints). Motivated by the round-5 pianoroll
    finding: the reference's constant 2e-4 Adam drives the sequence
    transformer out of the input-reading loss basin after ~16k iters
    (docs/DESIGN_NOTES.md "Round 5") — a decay schedule is the standard
    production guard against exactly that class of late-training
    instability."""
    lr = cfg.optimizer.lr
    warmup = int(cfg.training.get("warmup", 0) or 0)
    kind = cfg.optimizer.get("schedule", "constant")
    n_iters = int(cfg.training.get("n_iters", 0) or 0)
    end = lr * float(cfg.optimizer.get("end_lr_factor", 0.1))
    decay_steps = max(n_iters - warmup, 1)
    if kind == "constant":
        body = lr
    elif kind == "cosine":
        body = optax.cosine_decay_schedule(lr, decay_steps, alpha=end / lr)
    elif kind == "linear":
        body = optax.linear_schedule(lr, end, decay_steps)
    else:
        raise ValueError(f"unknown optimizer.schedule {kind!r}")
    if warmup > 0:
        ramp = optax.linear_schedule(0.0, lr, warmup)
        if kind == "constant":
            return ramp
        return optax.join_schedules([ramp, body], [warmup])
    return body


@registry.optimizers.register(name="Adam")
def adam(cfg) -> optax.GradientTransformation:
    chain = []
    if cfg.training.get("clip_grad", False):
        chain.append(optax.clip_by_global_norm(cfg.training.grad_norm))
    chain.append(optax.adam(_schedule(cfg)))
    return optax.chain(*chain)


@registry.optimizers.register(name="AdamW")
def adamw(cfg) -> optax.GradientTransformation:
    chain = []
    if cfg.training.get("clip_grad", False):
        chain.append(optax.clip_by_global_norm(cfg.training.grad_norm))
    chain.append(optax.adamw(
        _schedule(cfg), weight_decay=cfg.optimizer.get("weight_decay", 1e-4)
    ))
    return optax.chain(*chain)


def get_optimizer(cfg) -> optax.GradientTransformation:
    return registry.optimizers.get(cfg.optimizer.name)(cfg)
