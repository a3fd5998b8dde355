"""Sampler/EMA decode sweep over a trained checkpoint (maze or sudoku).

Round-2 found maze exact-solvability at 240k (37.1%, stream_fresh) below the
12k snapshot (45%) without explanation. This sweep evaluates ONE checkpoint
under the factors the training preset never varies — raw vs EMA params,
sampler family, step count, and the tauLDR corrector the reference preset
ships dead (corrector_entry_time=0.0 with num_corrector_steps=10; its
quality trick only fires with entry_time > min_t, ref sampling.py:165-221) —
writing one JSON line per cell to --out.

    python scripts/maze_sweep.py --ckpt runs/maze_unet/<date>/<run>/checkpoints \
        --step 240000 --samples 512 --out docs/assets/round3/maze_sweep.jsonl

Round 3 extended it to sudoku (--preset sudoku --metric sudoku_acc): the maze
sweep showed decode settings are worth many accuracy points, so the same
factor grid is applied to the 400k stream_fresh sudoku checkpoint.
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
    ap.add_argument("--preset", default="tauUnet_maze")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="docs/assets/round3/maze_sweep.jsonl")
    ap.add_argument("--samplers", default="TauL,LBJF,MidPointTauL,ExactSampling")
    ap.add_argument("--num-steps", default="200,1000")
    ap.add_argument("--correctors", default="off,on")
    ap.add_argument("--params", default="ema,raw")
    ap.add_argument("--metric", default=None,
                    choices=[None, "maze_acc", "sudoku_acc"],
                    help="quality metric; default: sudoku_acc when the "
                         "preset name contains 'sudoku', else maze_acc")
    ap.add_argument("--tag", default="",
                    help="free-form provenance tag recorded on every row "
                         "(e.g. a code-fix marker distinguishing re-runs)")
    args = ap.parse_args()

    from train import apply_overrides, parse_overrides  # noqa: F401

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.sampling.samplers import get_sampler
    from ctdd_tpu.training.optimizers import get_optimizer
    from ctdd_tpu.training.state import create_train_state
    from ctdd_tpu.utils.bookkeeping import CheckpointManager

    metric_name = args.metric or (
        "sudoku_acc" if "sudoku" in args.preset else "maze_acc"
    )
    if metric_name == "sudoku_acc":
        from ctdd_tpu.data.sudoku import sudoku_acc as metric_fn
    else:
        from ctdd_tpu.data.maze import maze_acc as metric_fn

    cfg = get_preset(args.preset)
    model = create_model(cfg)
    D = cfg.model.concat_dim
    params0 = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32), jnp.full((2,), 0.5)
    )
    state = create_train_state(params0, get_optimizer(cfg))
    state = CheckpointManager(args.ckpt).restore(state, step=args.step)
    step = int(state.step)
    print(f"restored step={step}", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    for sampler_name in args.samplers.split(","):
        for num_steps in (int(s) for s in args.num_steps.split(",")):
            for corrector in args.correctors.split(","):
                if corrector == "on" and sampler_name == "ExactSampling":
                    continue  # exact reverse step has no corrector phase
                cfg.sampler.name = sampler_name
                cfg.sampler.num_steps = num_steps
                if corrector == "on":
                    cfg.sampler.num_corrector_steps = 10
                    cfg.sampler.corrector_entry_time = 0.1
                else:
                    cfg.sampler.num_corrector_steps = 0
                    cfg.sampler.corrector_entry_time = 0.0
                sampler = get_sampler(cfg)
                for which in args.params.split(","):
                    p = state.ema_params if which == "ema" else state.params
                    outs = []
                    key = jax.random.PRNGKey(args.seed)
                    try:
                        for i in range(0, args.samples, args.batch):
                            key, k = jax.random.split(key)
                            out = sampler.sample(
                                model, p, k,
                                N=min(args.batch, args.samples - i),
                            )
                            outs.append(
                                out[0] if isinstance(out, tuple) else out
                            )
                    except Exception as e:  # one bad cell must not kill the grid
                        print(f"cell failed: {sampler_name}/{num_steps}/"
                              f"{corrector}/{which}: {e!r}", flush=True)
                        continue
                    samples = np.concatenate(outs, axis=0)
                    acc = metric_fn(samples)
                    rec = {
                        "step": step, "sampler": sampler_name,
                        "num_steps": num_steps, "corrector": corrector,
                        "params": which, "n": int(len(samples)),
                        metric_name: round(float(acc), 4),
                    }
                    if args.tag:
                        rec["tag"] = args.tag
                    with open(args.out, "a") as f:
                        f.write(json.dumps(rec) + "\n")
                    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
