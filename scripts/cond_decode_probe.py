"""Conditional decode-collapse probe: which failure mode remains after the
CondNLL + embedding-scale fix?

Context (README "the conditional all-rest collapse", docs/DESIGN_NOTES.md):
the retrained pianoroll_cond denoiser is input-sensitive on held-out data
(suffix CE below the 3.73 marginal-entropy bar) yet ConditionalTauLeaping
decode still returns all-REST suffixes. Two candidate mechanisms:

  (a) **denoiser-side**: the net is only input-sensitive near t=0 on
      forward-corrupted (on-manifold) states and reverts to the marginal
      predictor at the noise levels that dominate decoding;
  (b) **dynamics-side**: the reverse chain never resolves — jump mass is
      too small / misdirected, the terminal state at t=min_t is still
      (near-)noise, and the final argmax p_{0|min_t} maps noise to the
      marginal mode (REST).

Part A measures (a): CE / argmax-REST-fraction / prefix-sensitivity of the
denoiser on FORWARD-corrupted real suffixes across a t grid (the chain-free
control — exactly the states q_{t|0} produces).

Part B measures (b): an instrumented ConditionalTauLeaping chain
(ref sampling.py:699-744 semantics, same `_cond_rates`) logging per-step
jump fraction, reverse-rate mass, and the denoiser's view of the chain's
own states; terminal-state diagnostics are compared against matched
forward-corrupted states at the same t=min_t, plus marginal-histogram
distances of the terminal state vs the data suffix marginal and the
uniform prior.

Usage:
  python scripts/cond_decode_probe.py --ckpt runs/pianoroll_cond/.../checkpoints \
      [--step 50000] [--n 256] [--out docs/assets/round3/cond_probe]
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


def ce_and_stats(logits, target, rest):
    """Mean CE vs target, argmax REST fraction, argmax==target fraction,
    mean max softmax prob."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, target[..., None], axis=-1).mean()
    am = jnp.argmax(logits, axis=-1)
    return (
        float(ce),
        float((am >= rest).mean()),
        float((am == target).mean()),
        float(jnp.exp(jnp.max(logp, axis=-1)).mean()),
    )


def main():
    from train import apply_overrides, parse_overrides

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.data.loaders import get_dataset
    from ctdd_tpu.data.pianoroll import REST
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.sampling.samplers import (
        _poisson_jump_update, _time_grid, get_initial_samples, get_sampler,
    )
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
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--use-ema", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="docs/assets/round3/cond_probe")
    ap.add_argument("--set", nargs="*", default=None)
    args = ap.parse_args()

    cfg = apply_overrides(get_preset(args.preset), parse_overrides(args.set))
    model = create_model(cfg)
    D = cfg.model.concat_dim
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32), jnp.full((2,), 0.5)
    )
    state = create_train_state(params, get_optimizer(cfg))
    state = CheckpointManager(args.ckpt).restore(state, step=args.step)
    params = state.ema_params if args.use_ema else state.params
    print(f"restored step={int(state.step)} "
          f"params={'ema' if args.use_ema else 'raw'}")

    sampler = get_sampler(cfg)
    cond_dim = int(cfg.sampler.condition_dim)
    S = int(cfg.data.S)
    n = args.n
    dataset = get_dataset(cfg)
    rng = np.random.RandomState(args.seed)
    rows = np.asarray(dataset.data[rng.choice(len(dataset.data), n, False)])
    prefix = jnp.asarray(rows[:, :cond_dim])
    suffix = jnp.asarray(rows[:, cond_dim:])
    D_suf = D - cond_dim

    # data-suffix marginal: entropy bar + REST fraction
    marg = np.bincount(rows[:, cond_dim:].ravel(), minlength=S) / rows[
        :, cond_dim:].size
    h_marg = float(-(marg[marg > 0] * np.log(marg[marg > 0])).sum())
    print(f"data suffix: marginal entropy {h_marg:.3f} nats, "
          f"REST frac {marg[REST:].sum():.3f}, argmax state {marg.argmax()}")

    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "probe.jsonl")
    out_f = open(out_path, "w")

    def emit(rec):
        out_f.write(json.dumps(rec) + "\n")
        out_f.flush()

    # ---------------- Part A: denoiser on forward-corrupted states --------
    @jax.jit
    def corrupt_and_score(key, t):
        qt0 = model.process.transition(jnp.reshape(t, (1,)))[0]  # (S, S)
        x_t = jax.random.categorical(
            key, jnp.log(qt0[suffix] + 1e-35), axis=-1
        )
        t_ones = t * jnp.ones((n,), jnp.float32)
        lg_true = sampler._cond_p0t(model, params, prefix, x_t, t_ones)
        lg_shuf = sampler._cond_p0t(
            model, params, jnp.roll(prefix, 1, axis=0), x_t, t_ones
        )
        return x_t, lg_true, lg_shuf

    print("\n== Part A: denoiser vs forward-corrupted q_{t|0} states ==")
    print(f"{'t':>6} {'CE':>7} {'CE_shufpfx':>10} {'rest%':>7} "
          f"{'acc%':>6} {'maxp':>6}")
    key = jax.random.PRNGKey(args.seed)
    for t in [0.02, 0.05, 0.1, 0.2, 0.35, 0.5, 0.7, 0.9, 0.999]:
        key, k = jax.random.split(key)
        x_t, lg_true, lg_shuf = corrupt_and_score(k, jnp.float32(t))
        ce, restf, acc, maxp = ce_and_stats(lg_true, suffix, REST)
        ce_s, _, _, _ = ce_and_stats(lg_shuf, suffix, REST)
        print(f"{t:6.3f} {ce:7.3f} {ce_s:10.3f} {100 * restf:6.1f}% "
              f"{100 * acc:5.1f}% {maxp:6.3f}")
        emit(dict(part="A", t=t, ce=ce, ce_shuffled_prefix=ce_s,
                  argmax_rest_frac=restf, argmax_acc=acc, mean_maxp=maxp,
                  h_marginal=h_marg))

    # ---------------- Part B: instrumented conditional tau-leap chain -----
    num_steps = int(cfg.sampler.num_steps)
    min_t = float(sampler.min_t)

    @jax.jit
    def run_chain(key):
        k_init, k_scan = jax.random.split(key)
        x0 = get_initial_samples(
            k_init, n, D_suf, S, sampler.initial_dist, sampler.initial_dist_std
        )
        ts, hs = _time_grid(1.0, min_t, num_steps)
        keys = jax.random.split(k_scan, num_steps)

        def step(x, inp):
            t, h, k = inp
            t_ones = t * jnp.ones((n,), jnp.float32)
            _, rev = sampler._cond_rates(model, params, prefix, x, t_ones)
            x_new = _poisson_jump_update(
                k, x, rev, h, S,
                is_ordinal=not sampler.reject_multiple_jumps,
                exact_poisson=sampler.exact_poisson,
            )
            lg = sampler._cond_p0t(model, params, prefix, x, t_ones)
            am = jnp.argmax(lg, axis=-1)
            stats = jnp.stack([
                (x_new != x).mean().astype(jnp.float32),     # jump fraction
                (rev.sum(-1) * h).mean(),                    # rate mass · h
                (am >= REST).mean().astype(jnp.float32),     # p0t REST frac
                jnp.exp(jax.nn.log_softmax(lg, -1).max(-1)).mean(),  # conf
            ])
            return x_new, stats

        x_term, stats = jax.lax.scan(step, x0, (ts, hs, keys))
        return x0, x_term, stats

    print("\n== Part B: instrumented ConditionalTauLeaping chain ==")
    key, k = jax.random.split(key)
    x0, x_term, stats = run_chain(k)
    stats = np.asarray(stats)  # (num_steps, 4)
    ts_np = np.asarray(_time_grid(1.0, min_t, num_steps)[0])
    print(f"{'t':>6} {'jump%':>7} {'mass·h':>8} {'p0t rest%':>9} {'conf':>6}")
    for i in np.linspace(0, num_steps - 1, 12).astype(int):
        print(f"{ts_np[i]:6.3f} {100 * stats[i, 0]:6.2f}% {stats[i, 1]:8.4f} "
              f"{100 * stats[i, 2]:8.1f}% {stats[i, 3]:6.3f}")
        emit(dict(part="B_chain", t=float(ts_np[i]),
                  jump_frac=float(stats[i, 0]), rate_mass_h=float(stats[i, 1]),
                  p0t_rest_frac=float(stats[i, 2]), conf=float(stats[i, 3])))
    total_jumps = float(stats[:, 0].sum() * D_suf)
    print(f"total expected state changes per dim over the chain: "
          f"{total_jumps / D_suf:.2f}")

    # terminal-state diagnostics vs forward-corrupted control at t=min_t
    key, k = jax.random.split(key)
    x_fc, lg_fc, _ = corrupt_and_score(k, jnp.float32(min_t))
    t_ones = min_t * jnp.ones((n,), jnp.float32)
    lg_term = sampler._cond_p0t(model, params, prefix, x_term, t_ones)
    ce_t, rest_t, acc_t, maxp_t = ce_and_stats(lg_term, suffix, REST)
    ce_f, rest_f, acc_f, maxp_f = ce_and_stats(lg_fc, suffix, REST)

    def hist(x):
        return np.bincount(np.asarray(x).ravel(), minlength=S) / x.size

    h_term, h_init = hist(x_term), hist(x0)
    tv_data = 0.5 * np.abs(h_term - marg).sum()
    tv_prior = 0.5 * np.abs(h_term - h_init).sum()
    term_rest = float(h_term[REST:].sum())
    print("\nterminal state (t=min_t):")
    print(f"  chain x_term:   argmax-p0t rest {100 * rest_t:.1f}%  "
          f"CE-vs-gt {ce_t:.3f}  conf {maxp_t:.3f}  "
          f"state REST-frac {term_rest:.3f}")
    print(f"  fwd-corrupted:  argmax-p0t rest {100 * rest_f:.1f}%  "
          f"CE-vs-gt {ce_f:.3f}  conf {maxp_f:.3f}")
    print(f"  x_term marginal TV: vs data suffix {tv_data:.3f}, "
          f"vs prior {tv_prior:.3f}")
    emit(dict(part="B_terminal", ce_chain=ce_t, rest_chain=rest_t,
              conf_chain=maxp_t, term_state_rest_frac=term_rest,
              ce_fwd=ce_f, rest_fwd=rest_f, conf_fwd=maxp_f,
              tv_term_vs_data=float(tv_data), tv_term_vs_prior=float(tv_prior),
              chain_jumps_per_dim=total_jumps / D_suf))

    # ------------------------------- verdict ------------------------------
    # (a) denoiser-side: on-manifold REST collapse already at moderate t
    a_conf = any(
        r["part"] == "A" and r["t"] >= 0.35 and r["argmax_rest_frac"] > 0.9
        for r in map(json.loads, open(out_path))
    )
    # (b) dynamics-side: terminal state closer to prior than to data
    b_conf = tv_prior < tv_data or term_rest < 0.5 and rest_t > 0.9
    print("\nverdict:")
    print(f"  (a) denoiser reverts to marginal at decode-relevant t: "
          f"{'CONFIRMED' if a_conf else 'not supported'}")
    print(f"  (b) reverse dynamics never resolve (terminal ~ noise): "
          f"{'CONFIRMED' if b_conf else 'not supported'}")
    emit(dict(part="verdict", denoiser_side=bool(a_conf),
              dynamics_side=bool(b_conf)))
    out_f.close()
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
