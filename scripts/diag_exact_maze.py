"""Diagnose ExactSampling collapse on the trained maze checkpoint (CPU).

Three probes against the same 240k EMA params:
  1. Exact vs TauL per-step change-fraction trajectories (does Exact ever
     settle, or does it keep churning at low t?).
  2. Denoise-consistency: forward-diffuse real mazes to t0 in
     {0.05, 0.15, 0.3, 0.6, 1.0}, run each sampler from t0 down, report
     maze_acc of the result. If Exact recovers mazes from small t0 but not
     large, the per-step posterior is fine and the failure accumulates;
     if it fails even from t=0.05, a single step is wrong.
  3. One-step posterior sanity at a mid t: KL-ish comparison between the
     Exact categorical posterior and the TauL jump distribution for the
     same state (both should favor the same targets when h is small).
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--step", type=int, default=240000)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--num-steps", type=int, default=200)
    args = ap.parse_args()

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.data.maze import maze_acc
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.sampling.samplers import get_sampler
    from ctdd_tpu.training.optimizers import get_optimizer
    from ctdd_tpu.training.state import create_train_state
    from ctdd_tpu.utils.bookkeeping import CheckpointManager

    cfg = get_preset("tauUnet_maze")
    model = create_model(cfg)
    D = cfg.model.concat_dim
    params0 = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32), jnp.full((2,), 0.5)
    )
    state = create_train_state(params0, get_optimizer(cfg))
    state = CheckpointManager(args.ckpt).restore(state, step=args.step)
    params = state.ema_params
    print(f"restored step={int(state.step)}")

    N, S = args.n, cfg.data.S
    cfg.sampler.num_steps = args.num_steps

    # ---- probe 1: change trajectories --------------------------------------
    for name in ("ExactSampling", "TauL"):
        cfg.sampler.name = name
        sampler = get_sampler(cfg)
        out = sampler.sample(model, params, jax.random.PRNGKey(0), N=N)
        x, diag = out if isinstance(out, tuple) else (out, None)
        x = np.asarray(x)
        acc = maze_acc(x.reshape(N, 15, 15))
        print(f"[probe1] {name}: maze_acc={acc:.3f} "
              f"state_hist={np.bincount(x.ravel(), minlength=S)}")
        if diag is not None:
            d = np.asarray(diag).ravel()
            if d.size >= 10:
                qs = np.linspace(0, d.size - 1, 10).astype(int)
                print(f"          change_frac@[{qs}] = "
                      f"{np.round(d[qs], 4)}")

    # ---- probe 2: denoise-consistency from partial noise -------------------
    from ctdd_tpu.data.loaders import get_dataset

    ds = get_dataset(cfg)
    real = np.asarray(ds.data[: N]).reshape(N, -1).astype(np.int32)
    print(f"[probe2] real maze_acc={maze_acc(real.reshape(N, 15, 15)):.3f}")

    for t0 in (0.05, 0.15, 0.3, 0.6, 1.0):
        key = jax.random.PRNGKey(1)
        qt0 = model.process.transition(jnp.full((1,), t0))[0]  # (S, S)
        probs = qt0[real]  # (N, D, S)
        xt = jax.random.categorical(key, jnp.log(probs + 1e-30), axis=-1)
        frac_flipped = float(np.mean(np.asarray(xt) != real))
        row = [f"t0={t0:.2f} flipped={frac_flipped:.3f}"]
        for name in ("ExactSampling", "TauL"):
            cfg.sampler.name = name
            cfg.sampler.num_steps = max(8, int(args.num_steps * t0))
            sampler = get_sampler(cfg)
            sampler.max_t = t0
            xr = _run_from(sampler, model, params, xt, t0, N)
            acc = maze_acc(np.asarray(xr).reshape(N, 15, 15))
            row.append(f"{name}: acc={acc:.3f}")
        print("[probe2] " + "  ".join(row))


def _run_from(sampler, model, params, xt, t0, N):
    """Run a sampler's scan loop from a given state at t0 (not from prior)."""
    import jax

    loop = getattr(sampler, "_sample_loop_from", None)
    if loop is not None:
        return loop(model, params, jax.random.PRNGKey(2), xt, t0)
    # generic: monkey-route get_initial_samples by running the loop body
    # directly — simplest correct route: temporarily patch initial samples
    from ctdd_tpu.sampling import samplers as S

    orig = S.get_initial_samples
    S.get_initial_samples = lambda *a, **k: xt
    try:
        out = sampler._sample_loop(model, params, jax.random.PRNGKey(2), N)
    finally:
        S.get_initial_samples = orig
    x = out[0] if isinstance(out, tuple) else out
    return x


if __name__ == "__main__":
    main()
