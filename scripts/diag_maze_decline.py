"""Diagnose the maze long-horizon decline (best-decode 44.5% @240k -> ~40% @500k).

Round-3 established the decline is real (replicated across two 500k
fresh-stream runs, README "round 3f") but never separated the competing
explanations. For every checkpoint snapshot this script measures, under ONE
fixed held-out eval batch and ONE fixed PRNG draw (so numbers are comparable
across snapshots):

  1. CTElbo eval loss, raw AND EMA params. If loss worsens late -> genuine
     optimization drift (constant 2e-4 Adam on fresh data, ref parity
     config/maze_config/config_tauUnet_maze.py keeps LR constant too).
  2. Preset decode (LBJF/200) maze_acc, raw AND EMA. Raw-vs-EMA splits an
     EMA-horizon effect (decay 0.9999 ~ 10k-step window tracking a noisier
     late region) from a params-quality effect.
  3. Generated-sample statistics: state histogram, mean per-position marginal
     entropy over the sample set, and path-length quantiles of the decoded
     mazes. If eval loss keeps improving while acc declines, these show *how*
     the samples degrade (e.g. marginal sharpening that breaks joint
     wall-connectivity - an objective/decode mismatch, not drift).

Output: one JSON line per (snapshot, params-variant) to --out, plus a stdout
table. Run on the TPU (a 500k run's snapshots x 2 variants x N=256 decodes
is minutes on-chip, hours on the 1-vCPU host).

Reference context: the maze recipe is config_tauUnet_maze.py; the reference
publishes no maze numbers, so this is self-measured depth (SURVEY §2.7).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshots", required=True,
                    help="dir of <step>/ checkpoint snapshots")
    ap.add_argument("--n", type=int, default=256, help="decode sample count")
    ap.add_argument("--loss-batches", type=int, default=8,
                    help="fixed eval-loss batches of --batch each")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--eval-seed", type=int, default=999983,
                    help="held-out maze_gen seed (training pools use "
                         "mix_pool_seed(data.seed=0, epoch))")
    ap.add_argument("--out", default="docs/assets/round4/maze_decline.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.data.maze import maze_acc, maze_gen, path_length
    from ctdd_tpu.losses.losses import get_loss
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.sampling.samplers import get_sampler
    from ctdd_tpu.training.optimizers import get_optimizer
    from ctdd_tpu.training.state import create_train_state
    from ctdd_tpu.utils.bookkeeping import CheckpointManager

    cfg = get_preset("tauUnet_maze")
    model = create_model(cfg)
    loss = get_loss(cfg)
    sampler = get_sampler(cfg)  # preset decode: LBJF/200
    D = cfg.model.concat_dim

    steps = sorted(int(d) for d in os.listdir(args.snapshots) if d.isdigit())
    if not steps:
        sys.exit(f"no <step>/ dirs under {args.snapshots}")
    print(f"snapshots: {steps}")

    # one fixed held-out batch pool + one fixed key set, reused verbatim for
    # every snapshot so rows differ only in params
    eval_pool = maze_gen(
        limit=args.loss_batches * args.batch, random_transform=True,
        seed=args.eval_seed,
    ).reshape(args.loss_batches, args.batch, -1).astype(np.int32)
    loss_keys = jax.random.split(jax.random.PRNGKey(7), args.loss_batches)

    @jax.jit
    def eval_loss(params, batch, key):
        return loss.calc_loss(model, params, key, batch, train=False)

    mgr = CheckpointManager(args.snapshots)
    template = create_train_state(
        model.init(jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32),
                   jnp.full((2,), 0.5)),
        get_optimizer(cfg),
    )

    rows = []
    for step in steps:
        state = mgr.restore(template, step=step)
        for variant, params in (("ema", state.ema_params),
                                ("raw", state.params)):
            lvals = [float(eval_loss(params, jnp.asarray(b), k))
                     for b, k in zip(eval_pool, loss_keys)]
            x = sampler.sample(model, params, jax.random.PRNGKey(11),
                               N=args.n)
            x = np.asarray(x[0] if isinstance(x, tuple) else x)
            mazes = x.reshape(args.n, 15, 15)
            acc = maze_acc(mazes)
            hist = np.bincount(x.ravel(), minlength=cfg.data.S)
            marg = np.stack([(x == s).mean(0) for s in range(cfg.data.S)])
            ent = float(-(marg * np.log(marg + 1e-12)).sum(0).mean())
            plens = [path_length(m)[0] for m in mazes]  # PATH-cell count
            plens = [p for p in plens if p > 0]
            row = dict(
                step=step, variant=variant,
                eval_loss=float(np.mean(lvals)),
                eval_loss_sem=float(np.std(lvals) / np.sqrt(len(lvals))),
                maze_acc=float(acc),
                state_hist=[int(h) for h in hist],
                mean_marginal_entropy=ent,
                path_len_q=([float(q) for q in
                             np.percentile(plens, [10, 50, 90])]
                            if plens else None),
                n=args.n,
            )
            rows.append(row)
            print(f"step={step:>7} {variant}: loss={row['eval_loss']:.4f}"
                  f"±{row['eval_loss_sem']:.4f} acc={acc:.3f} "
                  f"H(marg)={ent:.4f} hist={row['state_hist']}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"wrote {len(rows)} rows -> {args.out}")

    # verdict hint: compare first-vs-last EMA rows
    ema = [r for r in rows if r["variant"] == "ema"]
    if len(ema) >= 2:
        d_loss = ema[-1]["eval_loss"] - ema[0]["eval_loss"]
        d_acc = ema[-1]["maze_acc"] - ema[0]["maze_acc"]
        print(f"EMA first->last: d_loss={d_loss:+.4f} d_acc={d_acc:+.3f} "
              "(loss up + acc down -> drift; loss down/flat + acc down -> "
              "objective/decode mismatch; check raw rows for EMA-horizon)")


if __name__ == "__main__":
    main()
