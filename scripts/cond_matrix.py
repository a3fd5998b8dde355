"""Round-5 conditional-thread closing matrix (VERDICT r4 directive #1).

One process, shared compiles, one jsonl. For the unconditionally-trained
pianoroll model (pianoroll_cond preset + loss.name=NLLOriginal — the tauLDR
piano protocol: ref config-less conditional stack, sampling.py:649-758),
across checkpoint horizons x {raw, EMA} params:

  A. free-run sanity: UNconditional TauL/1000 samples on the full 256-dim
     sequence. If free-running samples are already ~all-REST the model never
     learned the joint and every conditional decode question is moot
     (blame: training/data-SNR, not the decode rule).
  B. prefix-sensitivity probe: at several t, diffuse GT sequences to x_t,
     splice in (i) own clean prefix vs (ii) another row's clean prefix, and
     measure the total-variation gap of the suffix p0t plus the key-match
     rate of its argmax. Assigns blame to the network (does p0t respond to
     the prefix AT ALL, and below which t) with single applies — no decode
     dynamics in the loop.
  C. clamped decode matrix: {ConditionalTauLeaping, ConditionalLBJF} x
     {clean-clamp, noise_prefix} -> cond_mmd protocol (eval.py cond_mmd:
     median-bandwidth exp-Hamming MMD + floor/shuffled anchors),
     scale_consistency, rest_frac.

Usage: python scripts/cond_matrix.py --ckpt <checkpoints dir> \
    --steps 20000,30000,40000,50000 [--n 256] [--out docs/assets/round5/...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def emit(out, rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in rec.items()}
    print(json.dumps(rec), flush=True)
    out.write(json.dumps(rec) + "\n")
    out.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--steps", default="20000,30000,40000,50000")
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="docs/assets/round5/cond_matrix.jsonl")
    ap.add_argument("--skip-free-run", action="store_true")
    ap.add_argument("--skip-probe", action="store_true")
    ap.add_argument("--num-steps", type=int, default=1000,
                    help="decode-chain steps (small for a validation pass)")
    args = ap.parse_args()

    from ctdd_tpu.utils.compile_cache import enable_compile_cache
    from ctdd_tpu.utils.device_guard import guard_device_init

    enable_compile_cache()
    guard_device_init()

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.data.loaders import get_dataset
    from ctdd_tpu.data.pianoroll import REST, infer_key, scale_consistency
    from ctdd_tpu.metrics.mmd import categorical_exp_hamming_mmd
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.sampling.samplers import get_sampler
    from ctdd_tpu.training.optimizers import get_optimizer
    from ctdd_tpu.training.state import create_train_state
    from ctdd_tpu.utils.bookkeeping import CheckpointManager

    cfg = get_preset("pianoroll_cond")
    with cfg.unlocked():
        cfg.loss.name = "NLLOriginal"  # matches the uncond training run
    model = create_model(cfg)
    D = cfg.model.concat_dim
    cond_dim = int(cfg.sampler.condition_dim)
    n = args.n

    params0 = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32), jnp.full((2,), 0.5)
    )
    state0 = create_train_state(params0, get_optimizer(cfg))
    mgr = CheckpointManager(args.ckpt)

    # ---- fixed GT splits (same protocol/seed as eval.py cond_mmd) ----
    dataset = get_dataset(cfg)
    rng = np.random.RandomState(args.seed)
    idx = rng.choice(len(dataset.data), size=3 * n, replace=False)
    gt_a = np.asarray(dataset.data[idx[:n]])
    gt_b = np.asarray(dataset.data[idx[n : 2 * n]])
    gt_c = np.asarray(dataset.data[idx[2 * n :]])
    shuffled = gt_a.copy()
    shuffled[:, cond_dim:] = gt_a[rng.permutation(n), cond_dim:]
    d_med = np.median((gt_b[:, None, :] != gt_c[None, :, :]).sum(axis=-1))
    bd = float(np.log(2.0) / max(d_med, 1.0))

    def mmd(x, y):
        return float(categorical_exp_hamming_mmd(jnp.asarray(x), jnp.asarray(y), bd))

    out = open(args.out, "a")
    emit(out, dict(kind="anchors", bandwidth=bd,
                   mmd_floor=mmd(gt_c, gt_b), mmd_shuffled=mmd(shuffled, gt_b),
                   sc_gt=scale_consistency(gt_b, cond_dim),
                   sc_shuffled=scale_consistency(shuffled, cond_dim),
                   gt_rest_frac=float((gt_b[:, cond_dim:] >= REST).mean())))

    # ---- samplers (instances persist so each scan compiles once) ----
    def sampler_for(name, noise_prefix=False):
        c = get_preset("pianoroll_cond")
        with c.unlocked():
            c.loss.name = "NLLOriginal"
            c.sampler.name = name
            c.sampler.num_steps = args.num_steps
            c.sampler.noise_prefix = noise_prefix
        return get_sampler(c)

    free_sampler = sampler_for("TauL")
    cond_samplers = [
        ("CondTauL", sampler_for("ConditionalTauLeaping"), False),
        ("CondLBJF", sampler_for("ConditionalLBJF"), False),
        ("CondTauL+noised", sampler_for("ConditionalTauLeaping", True), True),
        ("CondLBJF+noised", sampler_for("ConditionalLBJF", True), True),
    ]

    # ---- probe B network fn (one compile) ----
    @jax.jit
    def suffix_p0t(params, x, t_scalar):
        t_ones = t_scalar * jnp.ones((x.shape[0],), jnp.float32)
        logits = model.apply(params, x, t_ones)
        return jax.nn.softmax(logits, axis=-1)[:, cond_dim:, :]

    @jax.jit
    def diffuse(key, x0, t_scalar):
        qt0 = model.process.transition(t_scalar * jnp.ones((1,), jnp.float32))[0]
        logits = jnp.log(jnp.take(qt0, x0, axis=0) + 1e-35)
        return jax.random.categorical(key, logits, axis=-1)

    gt_keys = infer_key(gt_a[:, :cond_dim])

    def key_match_frac(suffix_tokens):
        """fraction of non-rest argmax suffix tokens in the prefix's key."""
        from ctdd_tpu.data.pianoroll import scale_membership

        memb = scale_membership()
        toks = np.asarray(suffix_tokens)
        is_note = toks < REST
        pc = toks % 12
        ok = memb[gt_keys[:, None], pc] & is_note
        denom = max(int(is_note.sum()), 1)
        return float(ok.sum() / denom), float(is_note.mean())

    for step in [int(s) for s in args.steps.split(",")]:
        try:
            state = mgr.restore(state0, step=step)
        except Exception as e:  # checkpoint may not exist (train cut short)
            emit(out, dict(kind="restore_failed", step=step, error=repr(e)))
            continue
        for variant, params in (("raw", state.params), ("ema", state.ema_params)):
            tag = dict(step=step, params=variant)

            try:
                if args.skip_free_run:
                    raise StopIteration
                t0 = time.time()
                k = jax.random.PRNGKey(1000 + step + (variant == "ema"))
                free, _ = free_sampler.sample(model, params, k, N=n)
                free = np.asarray(free)
                sc_self = scale_consistency(free, cond_dim)
                emit(out, dict(kind="free_run", **tag,
                               rest_frac=float((free >= REST).mean()),
                               mmd_vs_gt=mmd(free, gt_b),
                               sc_own_prefix=sc_self,
                               n_unique_tokens=int(len(np.unique(free))),
                               # GT repeats each token ~beat=4 times; a
                               # structureless sampler gives run length ~1
                               mean_run_len=float(free.shape[1] / np.mean(
                                   [1 + int((r[1:] != r[:-1]).sum()) for r in free])),
                               secs=time.time() - t0))
            except StopIteration:
                pass
            except Exception as e:
                emit(out, dict(kind="error", stage="free_run", **tag,
                               error=repr(e)[:500]))

            try:
                if args.skip_probe:
                    raise StopIteration
                k = jax.random.PRNGKey(7)
                perm = rng.permutation(n)
                for t in (0.05, 0.1, 0.2, 0.4, 0.7, 0.95):
                    k, kk = jax.random.split(k)
                    xt = np.asarray(jax.device_get(
                        diffuse(kk, jnp.asarray(gt_a), jnp.float32(t))))
                    own = xt.copy()
                    own[:, :cond_dim] = gt_a[:, :cond_dim]
                    other = xt.copy()
                    other[:, :cond_dim] = gt_a[perm, :cond_dim]
                    p_own = np.asarray(jax.device_get(
                        suffix_p0t(params, jnp.asarray(own), jnp.float32(t))))
                    p_other = np.asarray(jax.device_get(
                        suffix_p0t(params, jnp.asarray(other), jnp.float32(t))))
                    tv = 0.5 * np.abs(p_own - p_other).sum(-1).mean()
                    # total-collapse discriminator: perturb the SUFFIX input
                    # instead (independent x_t draw, same prefix). tv==0 here
                    # too -> the net is input-invariant h(t) outright, not
                    # merely prefix-blind.
                    k, k2 = jax.random.split(k)
                    xt2 = np.asarray(jax.device_get(
                        diffuse(k2, jnp.asarray(gt_c), jnp.float32(t))))
                    own2 = xt2.copy()
                    own2[:, :cond_dim] = gt_a[:, :cond_dim]
                    p_own2 = np.asarray(jax.device_get(
                        suffix_p0t(params, jnp.asarray(own2), jnp.float32(t))))
                    tv_suffix = 0.5 * np.abs(p_own - p_own2).sum(-1).mean()
                    # distance of the (possibly input-free) p0t from the
                    # empirical marginal: collapse -> ~0 at every t
                    marg = np.bincount(gt_b.ravel(), minlength=p_own.shape[-1])
                    marg = marg / marg.sum()
                    tv_marg = 0.5 * np.abs(p_own - marg[None, None, :]).sum(-1).mean()
                    km, note_frac = key_match_frac(p_own.argmax(-1))
                    emit(out, dict(kind="sensitivity", **tag, t=t,
                                   tv_own_vs_other_prefix=float(tv),
                                   tv_own_vs_other_suffix=float(tv_suffix),
                                   tv_p0t_vs_marginal=float(tv_marg),
                                   argmax_key_match=km,
                                   argmax_note_frac=note_frac))
            except StopIteration:
                pass
            except Exception as e:
                emit(out, dict(kind="error", stage="sensitivity", **tag,
                               error=repr(e)[:500]))

            for sname, sampler, noised in cond_samplers:
                try:
                    t0 = time.time()
                    k = jax.random.PRNGKey(42)
                    gen = sampler.sample(
                        model, params, k, N=n,
                        conditioner=jnp.asarray(gt_a[:, :cond_dim]),
                    )
                    gen = np.asarray(gen)
                    emit(out, dict(
                        kind="cond_decode", **tag, sampler=sname,
                        noise_prefix=noised,
                        cond_mmd=mmd(gen, gt_b),
                        sc_model=scale_consistency(gen, cond_dim),
                        rest_frac=float((gen[:, cond_dim:] >= REST).mean()),
                        secs=time.time() - t0))
                except Exception as e:
                    emit(out, dict(kind="error", stage="cond_decode",
                                   sampler=sname, **tag, error=repr(e)[:500]))
    out.close()


if __name__ == "__main__":
    main()
