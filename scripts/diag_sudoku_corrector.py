"""Root-cause the sudoku corrector collapse (round-3 VERDICT #5).

Round-3 measurement: the tauLDR corrector (rev + transpose-forward rates,
10 steps per predictor step below t=0.1; ref sampling.py:165-221) *adds*
~4 points of maze exact-solvability but *collapses* sudoku fully-valid
15.2% -> 3.9% (TauL/1000) and 23.4% -> 9.4% (LBJF/1000) — measured only on
the weak CTElbo checkpoint (15-23% valid). Both update rules collapse, so
the ordinal-Poisson multi-jump path alone can't explain it.

Probes, each isolating one candidate mechanism:

A. analytic forward-churn: β(t)·mean off-diag row mass·h at corrector-window
   t for the sudoku (UniformVariantRate, sqrt_cos) vs maze
   (config-matched) processes — is the forward term injecting more noise on
   sudoku? (No checkpoint needed.)

B. ground-truth-board damage: forward-diffuse solved boards to x_t, apply k
   corrector iterations at fixed t, argmax-denoise, score sudoku_acc.
   Variants decompose the corrector: full (fwd+rev) / rev-only / fwd-only,
   each under the Poisson-ordinal, Poisson-non-ordinal, and categorical-
   Euler (LBJF) update rules. Control: denoise x_t with k=0. If rev-only
   damages boards the model itself is the noise source (corrector amplifies
   model bias); if fwd-only does, it's churn; if only ordinal does, it's
   multi-jump summation.

C. end-to-end decode on the NEW 99.2%-valid NLLOriginal checkpoint:
   {TauL, LBJF} x corrector {off, on(entry 0.1)} — was the round-3 collapse
   conditional on model quality, or does the corrector destroy even a
   near-perfect model?

Usage:
  python scripts/diag_sudoku_corrector.py --ckpt runs/sudoku_nll/.../checkpoints \
      [--step 200000] [--n 256] [--out docs/assets/round4/sudoku_corrector_diag.jsonl]
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


def probe_a_forward_churn(out):
    """Analytic: expected forward jumps per cell per corrector step."""
    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.models.base import create_model

    for preset, steps in (("sudoku", 1000), ("tauUnet_maze", 1000)):
        cfg = get_preset(preset)
        # the preset's process is implied by its registered model name
        # (zoo pairing, ref models.py:832-1083) — go through create_model
        proc = create_model(cfg).process
        h = (1.0 - cfg.sampler.min_t) / steps
        for t in (0.02, 0.05, 0.1):
            rate = np.asarray(proc.rate(jnp.asarray([t], jnp.float32))[0])
            off = rate - np.diag(np.diag(rate))
            row_mass = off.sum(axis=1).mean()
            rec = dict(
                probe="A", preset=preset, t=t, h=h,
                mean_offdiag_row_mass=float(row_mass),
                fwd_jumps_per_cell_per_corrstep=float(row_mass * h),
            )
            print(json.dumps(rec))
            out.write(json.dumps(rec) + "\n")


def probe_b_gt_damage(model, params, cfg, n, key, out):
    """Apply k corrector iterations to forward-diffused GT boards."""
    from ctdd_tpu.data.sudoku import SudokuPoolDataset, sudoku_acc
    from ctdd_tpu.ops import indexing
    from ctdd_tpu.sampling.samplers import (
        _categorical_euler_update, _denoise_argmax, _poisson_jump_update,
        _shared_mats, reverse_rates_shared,
    )

    S = cfg.data.S
    boards = jnp.asarray(SudokuPoolDataset(n, seed=123).data)  # (n, 81)
    h = (1.0 - cfg.sampler.min_t) / cfg.sampler.num_steps
    rate_param = "p0t"  # NLLOriginal/CTElbo both sample on the p0t path

    def corr_rates(x, t_scalar, t_ones, terms):
        qt0, rate = _shared_mats(model.process, t_scalar)
        logits = model.apply(params, x, t_ones)
        rev = reverse_rates_shared(
            model.process, logits, x, t_scalar, rate_param=rate_param,
            logit_type="direct", eps=cfg.sampler.eps_ratio,
        )
        rev = indexing.zero_at(rev, x)
        fwd = jnp.take(rate, x, axis=0)  # R(x, ·) rows
        if terms == "full":
            c = fwd + rev
        elif terms == "rev":
            c = rev
        else:  # fwd
            c = fwd
        return indexing.zero_at(c, x)

    def run(key, t, k_steps, terms, update):
        t_scalar = jnp.float32(t)
        t_ones = t_scalar * jnp.ones((n,), jnp.float32)
        kd, kc = jax.random.split(key)
        qt0, _ = _shared_mats(model.process, t_scalar)
        # x_t ~ q_{t|0}(· | board)
        probs = jnp.take(qt0, boards, axis=0)  # (n, 81, S)
        x = jax.random.categorical(kd, jnp.log(probs + 1e-35), axis=-1)

        def body(i, carry):
            xc, kcur = carry
            kcur, ku = jax.random.split(kcur)
            c = corr_rates(xc, t_scalar, t_ones, terms)
            if update == "poisson_ordinal":
                xc = _poisson_jump_update(ku, xc, c, h, S, True)
            elif update == "poisson_nonordinal":
                xc = _poisson_jump_update(ku, xc, c, h, S, False)
            else:  # euler
                xc = _categorical_euler_update(ku, xc, c, h, S)
            return (xc, kcur)

        x, _ = jax.lax.fori_loop(0, k_steps, body, (x, kc))
        x0 = _denoise_argmax(model, params, x, cfg.sampler.min_t, n)
        return x, x0

    run_j = jax.jit(run, static_argnums=(2, 3, 4))

    for t in (0.02, 0.05, 0.1):
        for terms in ("full", "rev", "fwd"):
            for update in ("poisson_ordinal", "poisson_nonordinal", "euler"):
                for k_steps in (0, 10):
                    if k_steps == 0 and (terms != "full" or
                                         update != "poisson_ordinal"):
                        continue  # one control per t
                    key, kr = jax.random.split(key)
                    x, x0 = run_j(kr, t, k_steps, terms, update)
                    changed = float(jnp.mean((x != boards).astype(jnp.float32)))
                    acc = sudoku_acc(np.asarray(x0))
                    rec = dict(
                        probe="B", t=t, k=k_steps, terms=terms, update=update,
                        cells_off_gt=changed, denoised_acc=acc,
                    )
                    print(json.dumps(rec))
                    out.write(json.dumps(rec) + "\n")
                    out.flush()


def probe_c_decode(model, params, cfg, n, key, out):
    from ctdd_tpu.data.sudoku import sudoku_acc
    from ctdd_tpu.sampling.samplers import get_sampler

    for sampler_name in ("TauL", "LBJF"):
        for corr in (False, True):
            cfg.sampler.name = sampler_name
            cfg.sampler.num_corrector_steps = 10 if corr else 0
            cfg.sampler.corrector_entry_time = 0.1 if corr else 0.0
            sampler = get_sampler(cfg)
            key, kr = jax.random.split(key)
            samples, _ = sampler.sample(model, params, kr, N=n)
            acc = sudoku_acc(np.asarray(samples))
            rec = dict(
                probe="C", sampler=sampler_name, corrector=corr,
                num_steps=cfg.sampler.num_steps, n=n, sudoku_acc=acc,
            )
            print(json.dumps(rec))
            out.write(json.dumps(rec) + "\n")
            out.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument(
        "--out", default="docs/assets/round4/sudoku_corrector_diag.jsonl"
    )
    args = ap.parse_args()

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.training.optimizers import get_optimizer
    from ctdd_tpu.training.state import create_train_state
    from ctdd_tpu.utils.bookkeeping import CheckpointManager

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    out = open(args.out, "a")

    probe_a_forward_churn(out)

    cfg = get_preset("sudoku")
    model = create_model(cfg)
    D = cfg.model.concat_dim
    params0 = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32),
        jnp.full((2,), 0.5),
    )
    state = create_train_state(params0, get_optimizer(cfg))
    state = CheckpointManager(args.ckpt).restore(state, step=args.step)
    params = state.ema_params
    print(f"restored step={int(state.step)} (EMA params)")

    key = jax.random.PRNGKey(0)
    k_b, k_c = jax.random.split(key)
    probe_b_gt_damage(model, params, cfg, args.n, k_b, out)
    probe_c_decode(model, params, cfg, args.n, k_c, out)
    out.close()


if __name__ == "__main__":
    main()
