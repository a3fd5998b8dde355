"""FID trajectory + sample grids over a directory of checkpoint snapshots.

Reproduces the reference's image-eval protocol (sample_notebook.ipynb ->
mnist_fid.evaluate_fid_score, lib/datasets/mnist_fid.py:156-193) at every
snapshot step of a long run, with ONE sampler compile reused across steps:

    python scripts/fid_trajectory.py --preset tauUnet_mnist_ll \
        --snapshots runs/mnist_ll_snapshots --samples 1024 --batch 256 \
        --out runs/mnist_ll_fid

Writes <out>/fid.jsonl (one line per step) and <out>/grid_<step>.png, and
prints each line as it lands. Uses InceptionV3 features when weights are
available (CTDD_INCEPTION_NPZ / --inception-weights), else the fixed-seed
lenet feature net with the usual not-comparable-to-published-FIDs warning.
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
    ap.add_argument("--snapshots", required=True)
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", default=None,
                    help="comma-separated snapshot steps (default: all)")
    ap.add_argument("--inception-weights", default=None)
    ap.add_argument("--features", default="auto",
                    choices=["auto", "lenet", "inception", "trained"],
                    help="auto = inception if weights present else lenet; "
                         "trained = classifier trained on the eval dataset "
                         "(discriminative on stand-in data)")
    ap.add_argument("--out", default="runs/fid_trajectory")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--set", nargs="*", default=None)
    args = ap.parse_args()

    from train import apply_overrides, parse_overrides

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.data.loaders import get_dataset
    from ctdd_tpu.loggers.loggers import sample_grid_figure
    from ctdd_tpu.metrics.fid import evaluate_fid_score
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
    steps = (
        [int(s) for s in args.steps.split(",")] if args.steps
        else sorted(
            int(d) for d in os.listdir(args.snapshots) if d.isdigit()
        )
    )

    weights = args.inception_weights or os.environ.get("CTDD_INCEPTION_NPZ", "")
    kind = args.features
    if kind == "auto":
        kind = "inception" if weights and os.path.isfile(weights) else "lenet"
    if kind != "inception":
        print(
            f"WARNING: {kind} features — a RELATIVE quality signal, not "
            "comparable to published Inception FIDs.",
            file=sys.stderr,
        )
    else:
        from ctdd_tpu.metrics.inception import inception_npz_family

        family = inception_npz_family(weights)
        print(f"Inception weights: family={family} ({weights})")
        if family != "pytorch-fid":
            print(
                f"WARNING: npz family '{family}' != 'pytorch-fid' "
                "(pt_inception-2015-12-05, ref mnist_is.py:15) — FIDs not "
                "comparable to the reference's published numbers.",
                file=sys.stderr,
            )

    dataset = get_dataset(cfg)
    shape = tuple(cfg.data.shape)
    n_real = min(len(dataset.data), max(args.samples, 4096))
    idx = np.random.RandomState(args.seed).choice(
        len(dataset.data), size=n_real, replace=False
    )
    real = dataset.data[idx].reshape((-1,) + shape)

    kind_name = kind
    if kind == "trained":
        if dataset.labels is None:
            sys.exit(
                "--features trained requires a labeled dataset; "
                f"{cfg.data.name} has no labels"
            )
        from ctdd_tpu.metrics.fid import trained_classifier_features

        kind = trained_classifier_features(
            dataset.data.reshape((-1,) + shape), dataset.labels,
            seed=args.seed,
        )

    if cfg.loss.name == "d3pm":
        # D3PM models carry no CTMC process; sample ancestrally like
        # eval.py (ref eval_synthetic.py:162 -> d3pm.p_sample_loop)
        from ctdd_tpu.d3pm.diffusion import make_diffusion

        diffusion = make_diffusion(cfg.model)

        def draw(p, k, n):
            model_fn = lambda x, t: model.apply(p, x, t)  # noqa: E731
            return np.asarray(diffusion.p_sample_loop(k, model_fn, (n, D)))
    else:
        sampler = get_sampler(cfg)

        def draw(p, k, n):
            out = sampler.sample(model, p, k, N=n)
            return out[0] if isinstance(out, tuple) else out

    os.makedirs(args.out, exist_ok=True)
    log_path = os.path.join(args.out, "fid.jsonl")

    for step in steps:
        state = mgr.restore(template, step=step)
        p = state.ema_params
        outs, key = [], jax.random.PRNGKey(args.seed)
        for i in range(0, args.samples, args.batch):
            key, k = jax.random.split(key)
            outs.append(draw(p, k, min(args.batch, args.samples - i)))
        samples = np.concatenate(outs, axis=0).reshape((-1,) + shape)
        fid = evaluate_fid_score(
            samples, real, feature_kind=kind,
            weights_path=weights if kind == "inception" else None,
        )
        fig = sample_grid_figure(samples[:64], shape, nrow=8)
        fig.savefig(
            os.path.join(args.out, f"grid_{step}.png"),
            dpi=120, bbox_inches="tight",
        )
        import matplotlib.pyplot as plt

        plt.close(fig)
        rec = {
            "step": step, "fid": round(float(fid), 6), "features": kind_name,
            "n_samples": int(len(samples)), "n_real": int(n_real),
            "sampler": (
                "d3pm_ancestral" if cfg.loss.name == "d3pm"
                else cfg.sampler.name
            ),
            "num_steps": int(
                cfg.model.num_timesteps if cfg.loss.name == "d3pm"
                else cfg.sampler.num_steps
            ),
        }
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
