"""Per-layer locality probe for the conditional decode collapse.

The decode probe (scripts/cond_decode_probe.py) showed the trained
pianoroll_cond suffix logits are *bitwise* invariant to the conditioning
prefix. Prefix information can only reach suffix positions through
self-attention, so this probe localizes where the path dies: it runs the
same forward twice (true prefix vs batch-swapped prefix), captures every
EncoderLayer output with flax `capture_intermediates`, and reports the
max |Δ| at suffix positions per layer.

Interpretation: nonzero Δ at layer k means layer-k attention still mixes
prefix into suffix; Δ == 0.0 from layer 1 on means exact-zero mixing in
float32. Measured outcome (round 3i, both the qk_norm=False and qk_norm=True
checkpoints): the prefix signal is *attenuated* ~4-9 orders of magnitude
distributed across the stack — per-layer damping, not a single saturated
layer — with exact zeros appearing only in the old qk_norm=False net. The
collapse persists under qk_norm, so a nonzero trickle here does NOT imply a
working decode; see README "round 3i".

Usage:
  python scripts/cond_attention_probe.py --ckpt runs/pianoroll_cond/... \
      [--step 50000] [--set model.qk_norm=False]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from train import apply_overrides, parse_overrides

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.data.pianoroll import generate_standin
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.training.optimizers import get_optimizer
    from ctdd_tpu.training.state import create_train_state
    from ctdd_tpu.utils.bookkeeping import CheckpointManager
    from ctdd_tpu.utils.compile_cache import enable_compile_cache
    from ctdd_tpu.utils.device_guard import guard_device_init

    enable_compile_cache()
    guard_device_init()  # fail fast (exit 3) if the TPU claim wedges
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="pianoroll_cond")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--use-ema", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--set", nargs="*", default=None)
    args = ap.parse_args()

    cfg = apply_overrides(get_preset(args.preset), parse_overrides(args.set))
    model = create_model(cfg)
    D = cfg.model.concat_dim
    cond_dim = int(cfg.sampler.condition_dim)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32), jnp.full((2,), 0.5)
    )
    state = create_train_state(params, get_optimizer(cfg))
    state = CheckpointManager(args.ckpt).restore(state, step=args.step)
    params = state.ema_params if args.use_ema else state.params
    print(f"restored step={int(state.step)} "
          f"params={'ema' if args.use_ema else 'raw'} "
          f"qk_norm={cfg.model.get('qk_norm', False)}")

    rows = generate_standin(2, D, seed=7)
    x1 = jnp.asarray(rows)
    x2 = x1.at[:, :cond_dim].set(x1[::-1, :cond_dim])  # swap the 2 prefixes
    t = jnp.full((2,), 0.5)

    # the DiffusionModel wrapper doesn't forward capture_intermediates;
    # call the inner flax module directly (wrapper apply = module.apply
    # with {"params": params}, models/base.py)
    filt = lambda mdl, name: name == "__call__" and type(mdl).__name__ in (
        "EncoderLayer", "FFResidual")

    @jax.jit
    def fwd(x):
        logits, inter = model.module.apply(
            {"params": params["params"]} if "params" in params else
            {"params": params},
            x, t, train=False,
            capture_intermediates=filt, mutable=["intermediates"],
        )
        return logits, inter

    l1, i1 = fwd(x1)
    l2, i2 = fwd(x2)

    flat1 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(i1)}
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(i2)}
    print(f"{'layer':<60} {'max|dH| suffix':>15} {'max|dH| prefix':>15}")
    for name in sorted(flat1):
        a, b = np.asarray(flat1[name]), np.asarray(flat2[name])
        if a.ndim != 3:
            continue
        ds = float(np.abs(a - b)[:, cond_dim:].max())
        dp = float(np.abs(a - b)[:, :cond_dim].max())
        print(f"{name:<60} {ds:>15.6e} {dp:>15.6e}")
    ds = float(np.abs(np.asarray(l1 - l2))[:, cond_dim:].max())
    print(f"{'LOGITS':<60} {ds:>15.6e}")
    print("verdict:",
          "conditioning path SEVERED (suffix stream bitwise prefix-invariant)"
          if ds == 0.0 else "suffix stream still prefix-sensitive")


if __name__ == "__main__":
    main()
