"""Seed-replicated FID statistics + sampler ordering at one checkpoint.

Round-2 review: the flagship "2.65 at 600k vs 2.38 floor" claim rested on
1,024 samples per point while adjacent checkpoints swung 2.76->5.29->2.65 —
within noise. This script produces the statistically defensible version:

  * >=4096 generated samples per measurement,
  * N independent sampling seeds per sampler (mean +/- std),
  * the real-vs-real split floor re-estimated over N random splits
    (so the floor has error bars too),
  * a uniform-noise anchor for scale calibration,
  * a MidPointTauL-vs-TauL comparison at the same checkpoint — the thesis'
    headline claim is that midpoint tau-leaping beats standard tau-leaping
    (ref README.md:163-164); the ordering is sampler-relative so it
    transfers to stand-in features.

All cells share ONE feature net (trained-classifier features by default,
fixed seed) so every number lives in the same feature space.

    python scripts/fid_stats.py --preset tauUnet_mnist_ll \
        --snapshots runs/mnist_ll_snapshots --samples 4096 --seeds 3 \
        --samplers MidPointTauL,TauL --out runs/mnist_ll_fid_stats
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctdd_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tauUnet_mnist_ll")
    ap.add_argument("--snapshots", required=True,
                    help="snapshot dir (scripts/snapshot_collector.sh) or a "
                         "run's rolling checkpoints dir")
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: newest)")
    ap.add_argument("--samples", type=int, default=4096)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--samplers", default="MidPointTauL,TauL")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--features", default="trained",
                    choices=["trained", "lenet", "inception"])
    ap.add_argument("--inception-weights", default=None)
    ap.add_argument("--out", default="runs/fid_stats")
    ap.add_argument("--skip-done", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="skip cells already present in the out jsonl "
                         "(same step+features), so a timed-out run can be "
                         "re-invoked and only compute what's missing")
    ap.add_argument("--set", nargs="*", default=None)
    args = ap.parse_args()

    from train import apply_overrides, parse_overrides

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.data.loaders import get_dataset
    from ctdd_tpu.metrics.fid import (activation_statistics,
                                      calculate_frechet_distance,
                                      get_activations, get_feature_fn,
                                      trained_classifier_features)
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.sampling.samplers import get_sampler
    from ctdd_tpu.training.optimizers import get_optimizer
    from ctdd_tpu.training.state import create_train_state
    from ctdd_tpu.utils.bookkeeping import CheckpointManager

    cfg = apply_overrides(get_preset(args.preset), parse_overrides(args.set))
    model = create_model(cfg)
    D = cfg.model.concat_dim
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32), jnp.full((2,), 0.5)
    )
    template = create_train_state(params, get_optimizer(cfg))
    mgr = CheckpointManager(args.snapshots)
    step = args.step
    if step is None:
        step = max(int(d) for d in os.listdir(args.snapshots) if d.isdigit())
    state = mgr.restore(template, step=step)
    p = state.ema_params

    dataset = get_dataset(cfg)
    shape = tuple(cfg.data.shape)
    real = dataset.data.reshape((-1,) + shape)
    n_real = len(real)

    weights = args.inception_weights or os.environ.get("CTDD_INCEPTION_NPZ", "")
    if args.features == "trained":
        if dataset.labels is None:
            sys.exit("--features trained requires a labeled dataset")
        feat_fn = trained_classifier_features(real, dataset.labels, seed=0)
    else:
        feat_fn = get_feature_fn(
            args.features, weights if args.features == "inception" else None
        )

    os.makedirs(args.out, exist_ok=True)
    log_path = os.path.join(args.out, "fid_stats.jsonl")

    # Rerun support: records are appended+flushed one cell at a time, so a
    # timed-out run leaves a valid prefix; with --skip-done a re-invocation
    # only computes the missing cells (keyed by step+features+kind[+cell]).
    done, prior_fids = set(), {}
    if args.skip_done and os.path.exists(log_path):
        for line in open(log_path):
            try:
                r = json.loads(line)
            except ValueError:
                continue
            done.add((r.get("step"), r.get("features"), r.get("kind"),
                      r.get("sampler"), r.get("seed")))
            if r.get("kind") == "model":
                prior_fids[(r.get("step"), r.get("features"),
                            r.get("sampler"), r.get("seed"))] = r.get("fid")

    log = open(log_path, "a")

    def emit(rec):
        line = json.dumps(rec)
        log.write(line + "\n")
        log.flush()
        print(line, flush=True)

    def fid_between(feats_a, feats_b):
        mu1, s1 = activation_statistics(feats_a)
        mu2, s2 = activation_statistics(feats_b)
        return float(calculate_frechet_distance(mu1, s1, mu2, s2))

    real_feats = get_activations(real, feat_fn)

    # Real-vs-real split floor, re-estimated over N random half-splits.
    if (step, args.features, "floor_split", None, None) not in done:
        floors = []
        for s in range(args.seeds):
            perm = np.random.RandomState(1000 + s).permutation(n_real)
            half = n_real // 2
            floors.append(
                fid_between(real_feats[perm[:half]], real_feats[perm[half:]])
            )
        emit({
            "step": step, "kind": "floor_split", "features": args.features,
            "fid_mean": round(float(np.mean(floors)), 6),
            "fid_std": round(float(np.std(floors)), 6),
            "n_per_side": n_real // 2, "n_splits": args.seeds,
        })

    # Uniform-noise anchor (scale calibration).
    if (step, args.features, "noise_anchor", None, None) not in done:
        S = int(cfg.data.S)
        noise = np.random.RandomState(7).randint(
            0, S, size=(min(args.samples, 4096),) + shape
        ).astype(np.float32)
        noise_feats = get_activations(noise, feat_fn)
        emit({
            "step": step, "kind": "noise_anchor", "features": args.features,
            "fid": round(fid_between(noise_feats, real_feats), 6),
        })

    for sampler_name in args.samplers.split(","):
        scfg = apply_overrides(
            get_preset(args.preset), parse_overrides(args.set)
        )
        scfg.sampler.name = sampler_name
        if sampler_name == "MidPointTauL":
            scfg.sampler.num_corrector_steps = 0
        sampler = get_sampler(scfg)
        fids, fresh = [], False
        for seed in range(args.seeds):
            if (step, args.features, "model", sampler_name, seed) in done:
                fids.append(
                    prior_fids[(step, args.features, sampler_name, seed)]
                )
                continue
            fresh = True
            outs, key = [], jax.random.PRNGKey(100 + seed)
            for i in range(0, args.samples, args.batch):
                key, k = jax.random.split(key)
                out = sampler.sample(
                    model, p, k, N=min(args.batch, args.samples - i)
                )
                outs.append(out[0] if isinstance(out, tuple) else out)
            samples = np.concatenate(outs, axis=0).reshape((-1,) + shape)
            fid = fid_between(
                get_activations(samples.astype(np.float32), feat_fn),
                real_feats,
            )
            fids.append(fid)
            emit({
                "step": step, "kind": "model", "sampler": sampler_name,
                "seed": seed, "features": args.features,
                "fid": round(fid, 6), "n_samples": int(len(samples)),
                "n_real": int(n_real),
                "num_steps": int(scfg.sampler.num_steps),
            })
        if fresh or (step, args.features, "model_agg",
                     sampler_name, None) not in done:
            emit({
                "step": step, "kind": "model_agg", "sampler": sampler_name,
                "features": args.features,
                "fid_mean": round(float(np.mean(fids)), 6),
                "fid_std": round(float(np.std(fids)), 6),
                "n_seeds": args.seeds, "n_samples": args.samples,
            })


if __name__ == "__main__":
    main()
