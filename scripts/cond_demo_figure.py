"""Render the round-5 conditional demo as a figure: prefix-conditioned
pianoroll suffixes vs ground truth, from the cured (lr 5e-5) checkpoint.

Rows: a handful of held-out sequences. Each panel draws the 32-token clean
prefix (shaded region), the model's 224-token generated suffix
(ConditionalTauLeaping/1000, EMA params), and the GT suffix, as
piano-roll scatter traces (position vs MIDI pitch; rests omitted). The
pitch lattice of the key inferred from the prefix is drawn as faint
horizontal lines — suffix notes landing on the lattice = key-following.

Usage: python scripts/cond_demo_figure.py --ckpt runs/pianoroll_mitA_snaps \
    --step 8000 --out docs/assets/round5/cond_demo.png
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--step", type=int, default=8000)
    ap.add_argument("--rows", type=int, default=4)
    ap.add_argument("--out", default="docs/assets/round5/cond_demo.png")
    args = ap.parse_args()

    from ctdd_tpu.utils.compile_cache import enable_compile_cache
    from ctdd_tpu.utils.device_guard import guard_device_init

    enable_compile_cache()
    guard_device_init()

    import jax
    import jax.numpy as jnp

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.data.loaders import get_dataset
    from ctdd_tpu.data.pianoroll import REST, _scale_pitches, infer_key
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.sampling.samplers import get_sampler
    from ctdd_tpu.training.optimizers import get_optimizer
    from ctdd_tpu.training.state import create_train_state
    from ctdd_tpu.utils.bookkeeping import CheckpointManager

    cfg = get_preset("pianoroll_cond")
    model = create_model(cfg)
    D = cfg.model.concat_dim
    cond_dim = int(cfg.sampler.condition_dim)
    sampler = get_sampler(cfg)

    params0 = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32), jnp.full((2,), 0.5)
    )
    state = CheckpointManager(args.ckpt).restore(
        create_train_state(params0, get_optimizer(cfg)), step=args.step
    )
    params = state.ema_params

    dataset = get_dataset(cfg)
    rng = np.random.RandomState(123)
    idx = rng.choice(len(dataset.data), size=args.rows, replace=False)
    gt = np.asarray(dataset.data[idx])
    gen = sampler.sample(
        model, params, jax.random.PRNGKey(7), N=args.rows,
        conditioner=jnp.asarray(gt[:, :cond_dim]),
    )
    gen = np.asarray(gen)
    keys = infer_key(gt[:, :cond_dim])

    names = ["C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B"]
    fig, axes = plt.subplots(
        args.rows, 1, figsize=(12, 2.3 * args.rows), sharex=True
    )
    for r, ax in enumerate(np.atleast_1d(axes)):
        lat = _scale_pitches(int(keys[r]), 36, 96)
        for p in lat:
            ax.axhline(p, color="0.92", lw=0.5, zorder=0)
        ax.axvspan(0, cond_dim, color="0.85", alpha=0.6, zorder=0)
        for seq, c, lbl, mk in ((gt[r], "tab:gray", "ground truth", "."),
                                (gen[r], "tab:blue", "generated", "x")):
            pos = np.arange(D)
            m = seq < REST
            if lbl == "generated":  # prefix is clamped GT; draw suffix only
                m = m & (pos >= cond_dim)
            ax.scatter(pos[m], seq[m], s=8, c=c, label=lbl, marker=mk,
                       zorder=2, alpha=0.85)
        sc_notes = gen[r, cond_dim:][gen[r, cond_dim:] < REST]
        in_key = np.isin(sc_notes % 12, (lat % 12)).mean() if len(sc_notes) else 0
        ax.set_ylabel("MIDI pitch")
        ax.set_title(
            f"row {r}: prefix key = {names[int(keys[r])]} major — "
            f"{100 * in_key:.0f}% of generated suffix notes in key",
            fontsize=9, loc="left",
        )
        if r == 0:
            ax.legend(loc="upper right", fontsize=8)
    np.atleast_1d(axes)[-1].set_xlabel(
        f"position (shaded = {cond_dim}-token clamped prefix; "
        "ConditionalTauLeaping/1000, EMA)"
    )
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
