"""Aux key-head probe: is the prefix->suffix path alive, as a function of t?

For the aux-head-trained pianoroll_cond checkpoint (loss = CondNLL +
aux_key_weight * suffix-position key-CE), measure on forward-corrupted real
data at a grid of t:

- key-head accuracy at SUFFIX positions (vs infer_key of the clean prefix).
  At low t the suffix tokens themselves reveal the key (same-scale notes), so
  high accuracy there is uninformative; at t near 1 the corrupted suffix is
  ~uniform noise, so any accuracy above 1/12 can ONLY come through attention
  from the clean prefix — the direct liveness test of the conditioning path
  the decode collapse kills.
- the same accuracy with a BATCH-SWAPPED prefix (suffix kept): if suffix-
  position key logits track the swapped prefix's key at high t, the path is
  not just alive but causally driven by the prefix.

Usage:
  python scripts/cond_aux_probe.py --ckpt runs/pianoroll_cond_aux/.../checkpoints \
      [--step 5000] [--n 256] [--set loss.aux_key_weight=1.0 model.aux_key_classes=12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from train import apply_overrides, parse_overrides

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.data.pianoroll import generate_standin, infer_key
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.training.optimizers import get_optimizer
    from ctdd_tpu.training.state import create_train_state
    from ctdd_tpu.utils.bookkeeping import CheckpointManager

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="pianoroll_cond")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--use-ema", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--set", nargs="*", default=None)
    ap.add_argument("--out", default="docs/assets/round4/cond_aux_probe.jsonl")
    args = ap.parse_args()

    cfg = get_preset(args.preset)
    if args.set:
        apply_overrides(cfg, parse_overrides(args.set))
    if not int(cfg.model.get("aux_key_classes", 0)):
        cfg.model.aux_key_classes = 12  # the head must exist to be probed

    model = create_model(cfg)
    D = cfg.data.shape[0]
    cdim = int(cfg.loss.condition_dim)
    params0 = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32),
        jnp.full((2,), 0.5),
    )
    state = create_train_state(params0, get_optimizer(cfg))
    state = CheckpointManager(args.ckpt).restore(state, step=args.step)
    params = state.ema_params if args.use_ema else state.params
    print(f"restored step={int(state.step)} ema={args.use_ema}")

    n = args.n
    data = generate_standin(2 * n, length=D, seed=777)[:n]
    x0 = jnp.asarray(data)
    cond, suffix = x0[:, :cdim], x0[:, cdim:]
    key_true = infer_key(np.asarray(cond))
    # batch-swapped prefix: roll by 1 so each row sees another row's prefix
    cond_swap = jnp.roll(cond, 1, axis=0)
    key_swap = infer_key(np.asarray(cond_swap))
    informative = key_true != key_swap  # rows where the swap changes the key

    @jax.jit
    def suffix_key_logits(params, prefix, t_scalar, kd):
        t_ones = t_scalar * jnp.ones((n,), jnp.float32)
        qt0 = model.transition(t_ones)  # (n, S, S)
        # rows q_{t|0}(· | x0) per suffix position: (n, L_suf, S)
        probs = jnp.take_along_axis(qt0, suffix[:, :, None], axis=1)
        xt = jax.random.categorical(kd, jnp.log(probs + 1e-35), axis=-1)
        model_in = jnp.concatenate([prefix, xt], axis=1)
        _, kl = model.apply(params, model_in, t_ones, return_aux=True)
        return kl[:, cdim:, :]  # (n, D-cdim, 12)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    out = open(args.out, "a")
    for t in (0.05, 0.2, 0.5, 0.8, 0.95, 0.999):
        kd = jax.random.PRNGKey(int(t * 1e4))
        kl_true = np.asarray(suffix_key_logits(params, cond, jnp.float32(t), kd))
        kl_swap = np.asarray(
            suffix_key_logits(params, cond_swap, jnp.float32(t), kd)
        )
        pred_true = kl_true.argmax(-1)  # (n, L_suf)
        pred_swap = kl_swap.argmax(-1)
        acc_true = float((pred_true == key_true[:, None]).mean())
        # causal test on rows where swapping actually changes the key
        acc_swap_follows = float(
            (pred_swap[informative] == key_swap[informative, None]).mean()
        ) if informative.any() else float("nan")
        acc_swap_sticky = float(
            (pred_swap[informative] == key_true[informative, None]).mean()
        ) if informative.any() else float("nan")
        rec = dict(
            step=int(state.step), t=t, suffix_key_acc=acc_true,
            swapped_prefix_follows=acc_swap_follows,
            swapped_prefix_sticky=acc_swap_sticky,
            chance=1.0 / 12,
        )
        print(json.dumps(rec))
        out.write(json.dumps(rec) + "\n")
    out.close()


if __name__ == "__main__":
    main()
