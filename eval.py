"""Evaluation CLI: sample from a checkpoint and compute metrics.

Covers the reference's eval_synthetic.py (MMD, 25 rounds x 4096 samples,
eval_synthetic.py:159-164) and the notebook-driven image eval
(sample_notebook.ipynb -> evaluate_fid_score, lib/datasets/mnist_fid.py:156-193)
plus maze/sudoku accuracy — all as one command.

Usage:
  python eval.py --preset mlp_synthetic --ckpt runs/.../checkpoints --metric mmd
  python eval.py --preset tauUnet_mnist --ckpt ... --metric fid \
      --samples 4096 --set sampler.name=MidPointTauL
  python eval.py --preset dit_mnist --ckpt ... --metric save_samples \
      --label 0,1,2,3 --cfg-scale 2.0

FID feature extractor: InceptionV3-pool3 when weights are available
(--inception-weights or $CTDD_INCEPTION_NPZ pointing at a converted npz —
scripts/convert_inception_weights.py), else a fixed-seed random-conv "lenet"
feature net with a loud warning (relative signal only; see PARITY.md).
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from ctdd_tpu.utils.compile_cache import enable_compile_cache
    from ctdd_tpu.utils.device_guard import guard_device_init

    enable_compile_cache()
    guard_device_init()  # fail fast (exit 3) if the TPU claim wedges
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--metric", default="mmd",
                    choices=["mmd", "fid", "maze_acc", "sudoku_acc",
                             "cond_mmd", "save_samples"])
    # reference MMD protocol: 25 rounds x 4096 samples (eval_synthetic.py:159)
    ap.add_argument("--rounds", type=int, default=25)
    ap.add_argument("--samples", type=int, default=4096)
    ap.add_argument("--use-ema", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="evaluate EMA params (default) or raw params")
    ap.add_argument("--batch", type=int, default=0,
                    help="sampling batch size (0 = all at once)")
    ap.add_argument("--label", default=None,
                    help="comma-separated class labels to condition on "
                         "(cycled over the sample batch); requires a "
                         "label-conditional model (e.g. DiT)")
    ap.add_argument("--cfg-scale", type=float, default=0.0,
                    help="classifier-free guidance scale (0 = plain "
                         "conditional forward)")
    ap.add_argument("--inception-weights", default=None,
                    help="path to converted InceptionV3 weights npz for FID")
    ap.add_argument("--features", default="auto",
                    choices=["auto", "lenet", "inception", "trained"],
                    help="FID feature net: auto = inception if weights "
                         "present else lenet; trained = classifier trained "
                         "on the eval dataset (discriminative on stand-in "
                         "data)")
    ap.add_argument("--n-real", type=int, default=0,
                    help="real images in the FID real set (0 = the full "
                         "dataset, the reference protocol: evaluate_fid_score "
                         "feeds the entire training split, mnist_fid.py:"
                         "156-193)")
    ap.add_argument("--out", default="samples.npy")
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step to restore (default: latest)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--set", nargs="*", default=None,
                    help="key=value config overrides (e.g. "
                         "sampler.name=MidPointTauL sampler.num_steps=1000)")
    args = ap.parse_args()

    from train import apply_overrides, parse_overrides

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.data.loaders import get_dataset
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.sampling.samplers import get_sampler
    from ctdd_tpu.training.optimizers import get_optimizer
    from ctdd_tpu.training.state import create_train_state
    from ctdd_tpu.utils.bookkeeping import CheckpointManager

    cfg = apply_overrides(get_preset(args.preset), parse_overrides(args.set))
    model = create_model(cfg)
    D = cfg.model.concat_dim
    # label-capable models (DiT) carry LabelEmbedder params: init must trace
    # the label path for the checkpoint's pytree structure to match
    init_label = (
        jnp.zeros((2,), jnp.int32) if getattr(model, "has_label", False) else None
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32),
        jnp.full((2,), 0.5), label=init_label,
    )
    state = create_train_state(params, get_optimizer(cfg))
    state = CheckpointManager(args.ckpt).restore(state, step=args.step)
    params = state.ema_params if args.use_ema else state.params
    print(f"restored step={int(state.step)} "
          f"params={'ema' if args.use_ema else 'raw'}")

    label = None
    if args.label is not None:
        classes = np.asarray([int(c) for c in args.label.split(",")], np.int32)
        label = lambda n: jnp.asarray(np.resize(classes, n))  # noqa: E731

    if cfg.loss.name == "d3pm":
        # D3PM models carry no CTMC process; sample ancestrally
        # (ref eval_synthetic.py:162 -> d3pm.p_sample_loop)
        from ctdd_tpu.d3pm.diffusion import make_diffusion

        diffusion = make_diffusion(cfg.model)

        def sample_fn(key, n):
            def model_fn(x, t):
                return model.apply(params, x, t)

            return np.asarray(
                diffusion.p_sample_loop(key, model_fn, (n, D))
            )
    else:
        sampler = get_sampler(cfg)

        def sample_fn(key, n):
            kwargs = {}
            if label is not None:
                kwargs = {"label": label(n), "cfg_scale": args.cfg_scale}
            out = sampler.sample(model, params, key, N=n, **kwargs)
            return out[0] if isinstance(out, tuple) else out

    if args.batch:
        inner, bs = sample_fn, args.batch

        def sample_fn(key, n):  # noqa: F811
            outs = []
            for i in range(0, n, bs):
                key, k = jax.random.split(key)
                outs.append(inner(k, min(bs, n - i)))
            return np.concatenate(outs, axis=0)

    key = jax.random.PRNGKey(args.seed)
    if args.metric == "mmd":
        from ctdd_tpu.metrics.mmd import eval_mmd

        dataset = get_dataset(cfg)
        mmd = eval_mmd(
            cfg, sample_fn, dataset, n_rounds=args.rounds, n_samples=args.samples
        )
        print(f"MMD: {mmd:.6f}")
    elif args.metric == "fid":
        # reference image-eval protocol: sampled images vs training images,
        # InceptionV3-pool3 features over [0,1]-normalized 3-channel inputs
        # (sample_notebook.ipynb -> mnist_fid.evaluate_fid_score :156-193)
        from ctdd_tpu.metrics.fid import evaluate_fid_score

        weights = args.inception_weights or os.environ.get(
            "CTDD_INCEPTION_NPZ", ""
        )
        kind = args.features
        if kind == "auto":
            kind = (
                "inception" if weights and os.path.isfile(weights)
                else "lenet"
            )
        if kind == "inception":
            from ctdd_tpu.metrics.inception import inception_npz_family

            family = inception_npz_family(weights)
            print(f"Inception weights: family={family} ({weights})")
            if family != "pytorch-fid":
                print(
                    f"WARNING: inception npz family is '{family}', not "
                    "'pytorch-fid' (pt_inception-2015-12-05, ref "
                    "mnist_is.py:15). FIDs from these weights are NOT "
                    "comparable to the reference's published numbers — "
                    "re-run scripts/convert_inception_weights.py with the "
                    "default --family pytorch-fid.",
                    file=sys.stderr,
                )
        if kind == "lenet":
            print(
                "WARNING: no InceptionV3 weights found — falling back to the "
                "fixed-seed random-conv feature net. The number below is a "
                "RELATIVE quality signal, NOT comparable to published "
                "Inception FIDs. Drop in converted weights (see "
                "scripts/convert_inception_weights.py) and pass "
                "--inception-weights to reproduce the reference protocol; "
                "or use --features trained for a discriminative relative "
                "metric.",
                file=sys.stderr,
            )
        dataset = get_dataset(cfg)
        shape = tuple(cfg.data.shape)  # (C, H, W)
        samples = sample_fn(key, args.samples).reshape((-1,) + shape)
        # reference protocol: the real set is the FULL training split
        # (mnist_fid.py:156-193); --n-real subsamples for speed
        n_real = min(len(dataset.data), args.n_real or len(dataset.data))
        if n_real < len(dataset.data):
            idx = np.random.RandomState(args.seed).choice(
                len(dataset.data), size=n_real, replace=False
            )
            real = dataset.data[idx].reshape((-1,) + shape)
        else:
            real = dataset.data.reshape((-1,) + shape)
        kind_name = kind
        if kind == "trained":
            if dataset.labels is None:
                sys.exit(
                    f"--features trained requires a labeled dataset; "
                    f"{cfg.data.name} has no labels"
                )
            from ctdd_tpu.metrics.fid import trained_classifier_features

            kind = trained_classifier_features(
                dataset.data.reshape((-1,) + shape), dataset.labels,
                seed=args.seed,
            )
        fid = evaluate_fid_score(
            samples, real, feature_kind=kind,
            weights_path=weights if kind == "inception" else None,
        )
        print(f"FID ({kind_name}): {fid:.6f}  [n_samples={len(samples)} "
              f"n_real={n_real} sampler={cfg.sampler.name}]")
    elif args.metric == "maze_acc":
        from ctdd_tpu.data.maze import maze_acc

        s = sample_fn(key, args.samples)
        print(f"maze_acc: {maze_acc(s):.4f}")
    elif args.metric == "sudoku_acc":
        from ctdd_tpu.data.sudoku import sudoku_acc

        s = sample_fn(key, args.samples)
        print(f"sudoku_acc: {sudoku_acc(s):.4f}")
    elif args.metric == "cond_mmd":
        # Conditional-generation quality (CondCTElbo + Conditional*TauLeaping,
        # ref losses.py:547-781 / sampling.py:649-905): condition on GT
        # prefixes and compare (prefix ⊕ generated suffix) against full GT
        # sequences with a categorical exp-Hamming MMD. Anchors: GT-vs-GT
        # (floor) and GT with suffixes shuffled across rows. Note the shuffle
        # anchor is a weak detector of conditioner-ignoring (it preserves
        # both marginals; a Hamming kernel sees the broken coupling only
        # faintly at moderate n) — MMD here measures distributional quality;
        # the sharp conditional signal on the stand-in is scale_consistency
        # below.
        from ctdd_tpu.metrics.mmd import categorical_exp_hamming_mmd

        dataset = get_dataset(cfg)
        cond_dim = int(cfg.sampler.condition_dim)
        n = args.samples
        if len(dataset.data) < 3 * n:
            sys.exit(f"cond_mmd needs >= 3*samples rows ({3 * n}); dataset "
                     f"has {len(dataset.data)}")
        rng = np.random.RandomState(args.seed)
        idx = rng.choice(len(dataset.data), size=3 * n, replace=False)
        gt_a = np.asarray(dataset.data[idx[:n]])
        gt_b = np.asarray(dataset.data[idx[n:2 * n]])
        gt_c = np.asarray(dataset.data[idx[2 * n:]])
        gen, bs, k = [], args.batch or n, key
        for i in range(0, n, bs):
            k, kk = jax.random.split(k)
            m = min(bs, n - i)
            gen.append(sampler.sample(
                model, params, kk, N=m,
                conditioner=jnp.asarray(gt_a[i:i + m, :cond_dim]),
            ))
        gen = np.concatenate(gen, axis=0)
        shuffled = gt_a.copy()
        shuffled[:, cond_dim:] = gt_a[rng.permutation(n), cond_dim:]
        # median-heuristic bandwidth: the reference's fixed bd=0.1 is tuned
        # for 32-dim binary data (d ~ 16); at D=256 categorical the kernel
        # exp(-0.1 d) saturates to 0 for every pair and MMD loses all
        # discrimination (measured: shuffled-suffix anchor lands at the
        # gt-vs-gt floor). bd = ln2 / median_gt_distance puts the kernel at
        # 0.5 for a typical pair at any D.
        d_med = np.median(
            (gt_b[:, None, :] != gt_c[None, :, :]).sum(axis=-1)
        )
        bd = float(np.log(2.0) / max(d_med, 1.0))
        mmd_model = float(
            categorical_exp_hamming_mmd(jnp.asarray(gen), jnp.asarray(gt_b), bd)
        )
        mmd_floor = float(
            categorical_exp_hamming_mmd(jnp.asarray(gt_c), jnp.asarray(gt_b), bd)
        )
        mmd_shuf = float(
            categorical_exp_hamming_mmd(jnp.asarray(shuffled), jnp.asarray(gt_b), bd)
        )
        print(f"cond_mmd: model={mmd_model:.6f} floor(gt-vs-gt)={mmd_floor:.6f} "
              f"shuffled-suffix={mmd_shuf:.6f} "
              f"[n={n} cond_dim={cond_dim} bandwidth={bd:.5f}]")
        if cfg.data.name == "LakhPianoroll":
            # stand-in structural metric: does the generated suffix stay in
            # the musical key inferred from the prefix alone?
            from ctdd_tpu.data.pianoroll import REST, scale_consistency

            # rest_frac diagnoses the nan case: an undertrained model
            # collapses to the marginal mode (all-REST suffixes), which
            # leaves scale_consistency with zero valid notes (seen at 12k:
            # model=nan rest_frac=1.0)
            rest_frac = float((np.asarray(gen)[:, cond_dim:] >= REST).mean())
            print(f"scale_consistency: model={scale_consistency(gen, cond_dim):.4f} "
                  f"gt={scale_consistency(gt_b, cond_dim):.4f} "
                  f"shuffled={scale_consistency(shuffled, cond_dim):.4f} "
                  f"model_rest_frac={rest_frac:.4f} "
                  f"gt_rest_frac={float((gt_b[:, cond_dim:] >= REST).mean()):.4f}")
    else:
        s = sample_fn(key, args.samples)
        np.save(args.out, s)
        print(f"saved {s.shape} -> {args.out}")


if __name__ == "__main__":
    main()
