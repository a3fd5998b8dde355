"""Trace the pianoroll unconditional model's collapse to the input-free
marginal predictor across training snapshots (round-5 conditional thread).

Round-5 finding that motivates this: at 20k-50k the NLLOriginal-trained
SequenceTransformer's suffix p0t is BITWISE invariant to its entire input
(prefix-swap TV = 0.0), its p0t sits on the empirical marginal, and the
train loss plateau (~3.55) matches the marginal cross-entropy — while at
5k a committed probe (docs/assets/round4/uncond_5k_condmmd.log) still
showed input-dependent structure and the loss dipped to ~3.27 at 13-15k.
So somewhere between 5k and 20k training ABANDONS the input-reading
solution for the h(t) marginal attractor. This script measures, per
snapshot x {raw, ema} x t in {0.05, 0.3, 0.95}:

  - fixed-batch denoising CE of p0t against x0 on suffix positions (the
    loss the model is nominally optimizing, at pinned t), vs the
    marginal-predictor CE baseline (input-free floor) emitted once;
  - prefix-swap TV, suffix-resample TV (input sensitivity split by cause),
    TV of p0t from the empirical marginal;
  - a cheap CondLBJF/100 clamped decode (n=64): suffix note fraction +
    scale consistency — does ANY conditional signal survive to decoding.

Usage:
  python scripts/cond_collapse_trajectory.py --snapshots runs/pianoroll_dense_snaps \
      [--overrides loss.name=NLLOriginal ...] --out docs/assets/round5/collapse_traj.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshots", required=True)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--decode-n", type=int, default=64)
    ap.add_argument("--decode-steps", type=int, default=100)
    ap.add_argument("--out", required=True)
    ap.add_argument("--overrides", nargs="*", default=["loss.name=NLLOriginal"])
    args = ap.parse_args()

    from ctdd_tpu.utils.compile_cache import enable_compile_cache
    from ctdd_tpu.utils.device_guard import guard_device_init

    enable_compile_cache()
    guard_device_init()

    from train import apply_overrides, parse_overrides

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.data.loaders import get_dataset
    from ctdd_tpu.data.pianoroll import REST, scale_consistency
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.sampling.samplers import get_sampler
    from ctdd_tpu.training.optimizers import get_optimizer
    from ctdd_tpu.training.state import create_train_state
    from ctdd_tpu.utils.bookkeeping import CheckpointManager

    cfg = apply_overrides(get_preset("pianoroll_cond"), parse_overrides(args.overrides))
    model = create_model(cfg)
    D = cfg.model.concat_dim
    cond_dim = int(cfg.sampler.condition_dim)
    S = int(cfg.data.S)
    n = args.n

    dec_cfg = apply_overrides(get_preset("pianoroll_cond"), parse_overrides(args.overrides))
    with dec_cfg.unlocked():
        dec_cfg.sampler.name = "ConditionalLBJF"
        dec_cfg.sampler.num_steps = args.decode_steps
    decoder = get_sampler(dec_cfg)

    params0 = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32), jnp.full((2,), 0.5)
    )
    state0 = create_train_state(params0, get_optimizer(cfg))
    mgr = CheckpointManager(args.snapshots)
    steps = sorted(int(d) for d in os.listdir(args.snapshots) if d.isdigit())
    if not steps:
        sys.exit(f"no <step>/ dirs under {args.snapshots}")
    print(f"snapshots: {steps}")

    dataset = get_dataset(cfg)
    rng = np.random.RandomState(0)
    idx = rng.choice(len(dataset.data), size=2 * n, replace=False)
    gt = np.asarray(dataset.data[idx[:n]])
    gt2 = np.asarray(dataset.data[idx[n:]])
    perm = rng.permutation(n)
    marg = np.bincount(gt2.ravel(), minlength=S).astype(np.float64)
    marg = marg / marg.sum()

    out = open(args.out, "a")

    def emit(rec):
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()

    # input-free floor: CE of the marginal predictor (what total collapse
    # scores at ANY t), and the dataset's marginal entropy
    ce_marg = float(-(np.log(marg + 1e-12)[gt[:, cond_dim:]]).mean())
    emit(dict(kind="baselines", ce_marginal_predictor=ce_marg,
              marginal_entropy=float(-(marg * np.log(marg + 1e-12)).sum())))

    @jax.jit
    def probe(params, x, t_scalar):
        t_ones = t_scalar * jnp.ones((x.shape[0],), jnp.float32)
        logits = model.apply(params, x, t_ones)
        return jax.nn.softmax(logits, axis=-1)[:, cond_dim:, :]

    @jax.jit
    def diffuse(key, x0, t_scalar):
        qt0 = model.process.transition(t_scalar * jnp.ones((1,), jnp.float32))[0]
        logits = jnp.log(jnp.take(qt0, x0, axis=0) + 1e-35)
        return jax.random.categorical(key, logits, axis=-1)

    for step in steps:
        try:
            state = mgr.restore(state0, step=step)
        except Exception as e:
            emit(dict(kind="restore_failed", step=step, error=repr(e)[:300]))
            continue
        for variant, params in (("raw", state.params), ("ema", state.ema_params)):
            for t in (0.05, 0.3, 0.95):
                key = jax.random.PRNGKey(int(t * 1000))
                k1, k2 = jax.random.split(key)
                xt = np.asarray(jax.device_get(diffuse(k1, jnp.asarray(gt), jnp.float32(t))))
                own = xt.copy(); own[:, :cond_dim] = gt[:, :cond_dim]
                other = xt.copy(); other[:, :cond_dim] = gt[perm, :cond_dim]
                xt_b = np.asarray(jax.device_get(diffuse(k2, jnp.asarray(gt2), jnp.float32(t))))
                resuf = xt_b.copy(); resuf[:, :cond_dim] = gt[:, :cond_dim]
                p_own = np.asarray(jax.device_get(probe(params, jnp.asarray(own), jnp.float32(t))))
                p_other = np.asarray(jax.device_get(probe(params, jnp.asarray(other), jnp.float32(t))))
                p_resuf = np.asarray(jax.device_get(probe(params, jnp.asarray(resuf), jnp.float32(t))))
                x0_suf = gt[:, cond_dim:]
                ce = float(-np.log(
                    np.take_along_axis(p_own, x0_suf[..., None], axis=-1) + 1e-12
                ).mean())
                # attention-locality probe: re-randomize ONE 4-token suffix
                # block; exactly-local (saturated) attention -> the change is
                # invisible (bitwise) at every OTHER position while the
                # perturbed positions still move. This discriminates
                # "per-position MLP collapse" from mere prefix damping.
                blk = slice(cond_dim + 60, cond_dim + 64)
                k3 = jax.random.split(k2)[0]
                pert = own.copy()
                pert[:, blk] = np.asarray(jax.device_get(jax.random.randint(
                    k3, (n, 4), 0, S)))
                p_pert = np.asarray(jax.device_get(probe(params, jnp.asarray(pert), jnp.float32(t))))
                d = 0.5 * np.abs(p_own - p_pert).sum(-1)  # (n, suffix_D)
                suf_blk = slice(60, 64)
                mask = np.ones(d.shape[1], bool); mask[suf_blk] = False
                # also exclude the blast radius a local conv-ish receptive
                # field would touch? no conv here: pure attention; any
                # nonzero off-block TV means cross-position information flow
                emit(dict(
                    kind="traj", step=step, params=variant, t=t,
                    ce_denoise=ce,
                    tv_prefix=float(0.5 * np.abs(p_own - p_other).sum(-1).mean()),
                    tv_suffix=float(0.5 * np.abs(p_own - p_resuf).sum(-1).mean()),
                    tv_vs_marginal=float(0.5 * np.abs(p_own - marg[None, None, :]).sum(-1).mean()),
                    tv_block_at_block=float(d[:, suf_blk].mean()),
                    tv_block_elsewhere=float(d[:, mask].mean()),
                    argmax_note_frac=float((p_own.argmax(-1) < REST).mean()),
                ))
            try:
                gen = decoder.sample(
                    model, params, jax.random.PRNGKey(3), N=args.decode_n,
                    conditioner=jnp.asarray(gt[: args.decode_n, :cond_dim]),
                )
                gen = np.asarray(gen)
                emit(dict(
                    kind="traj_decode", step=step, params=variant,
                    decode="CondLBJF/%d" % args.decode_steps,
                    note_frac=float((gen[:, cond_dim:] < REST).mean()),
                    sc_model=float(scale_consistency(gen, cond_dim)),
                ))
            except Exception as e:
                emit(dict(kind="error", stage="traj_decode", step=step,
                          params=variant, error=repr(e)[:300]))
    out.close()


if __name__ == "__main__":
    main()
