"""Unified training CLI.

Covers the reference's per-dataset entry scripts (train_image.py,
train_synthetic.py, train_maze.py, train_sudoku.py, train_*_d3pm.py): pick a
preset, optionally override config fields, run the data-parallel training
loop with checkpointing/preemption, and periodically sample.

Usage:
  python train.py --preset mlp_synthetic --iters 1000
  python train.py --preset tauUnet_mnist --set data.batch_size=128
  python train.py --preset hollow_synthetic --resume runs/.../checkpoints
"""

from __future__ import annotations

import argparse
import ast


def parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        k, v = p.split("=", 1)
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def apply_overrides(cfg, overrides):
    for dotted, v in overrides.items():
        node = cfg
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


def main():
    from ctdd_tpu.utils.compile_cache import enable_compile_cache
    from ctdd_tpu.utils.device_guard import guard_device_init

    enable_compile_cache()
    guard_device_init()  # fail fast (exit 3) if the TPU claim wedges
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", required=True)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", default=None, help="checkpoint dir to resume")
    ap.add_argument(
        "--auto-resume", action="store_true",
        help="scan today's runs for one with an identical config and resume "
             "it (the reference's preemption-recovery flow, "
             "bookkeeping.py:285-340)",
    )
    ap.add_argument("--writer", default="tensorboard")
    ap.add_argument("--set", nargs="*", default=None, help="key=value overrides")
    args = ap.parse_args()

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.training.loop import train

    cfg = apply_overrides(get_preset(args.preset), parse_overrides(args.set))
    if args.auto_resume and args.resume is None:
        import os

        from ctdd_tpu.utils.bookkeeping import check_for_preempted_run

        found = check_for_preempted_run(
            cfg.save_location, cfg.experiment_name, cfg
        )
        if found:
            args.resume = os.path.join(found, "checkpoints")
            print(f"auto-resume: {args.resume}")
    state, info = train(
        cfg,
        n_iters=args.iters,
        seed=args.seed,
        resume_from=args.resume,
        writer_kind=args.writer,
    )
    print(
        f"done: step={int(state.step)} steps/sec={info['steps_per_sec']:.3f} "
        f"run={info['paths']['root']}"
    )


if __name__ == "__main__":
    main()
