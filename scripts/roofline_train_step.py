"""Prove (or refute) the train-step HBM roofline (round-3 VERDICT #3).

Round 3 measured MNIST CTElbo train MFU 19.1% f32 / 20.5% bf16 at B=64,
flat ~23% from B=128 to 256, and *asserted* HBM-bandwidth-bound from the
flatness alone. This script commits the missing number: achieved HBM GB/s
per step from XLA's post-fusion cost analysis ("bytes accessed") divided by
measured step time, against the chip's spec bandwidth.

For each (batch, dtype): steps/s (20-step timed loop after warmup),
cost-analysis flops + bytes, achieved GB/s, MFU, and BW utilization.
"bytes accessed" is XLA's HLO-level estimate of HBM traffic for the
compiled executable (post-fusion buffers); it is the same accounting the
profiler's roofline view uses, not a hardware counter.

Usage: python scripts/roofline_train_step.py [--batches 64,128,256]
       [--out docs/assets/round4/train_roofline.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# HBM bandwidth per chip, public spec sheets (bytes/s).
HBM_PEAK = {
    "TPU v5 lite": 819e9,   # v5e: 16 GB HBM2 @ 819 GB/s
    "TPU v5": 2765e9,       # v5p
    "TPU v4": 1228e9,
    "TPU v6 lite": 1640e9,  # v6e
}
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def _lookup(table):
    kind = getattr(jax.devices()[0], "device_kind", "")
    for k, v in table.items():
        if kind.startswith(k):
            return v
    return None


def measure(batch: int, dtype: str, out):
    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.losses.losses import get_loss
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.training.optimizers import get_optimizer
    from ctdd_tpu.training.state import create_train_state
    from ctdd_tpu.training.train_step import make_train_step

    cfg = get_preset("tauUnet_mnist")
    cfg.data.batch_size = batch
    if dtype == "bf16":
        cfg.model.compute_dtype = "bfloat16"
    model = create_model(cfg)
    D = cfg.model.concat_dim
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32),
        jnp.full((2,), 0.5, jnp.float32),
    )
    tx = get_optimizer(cfg)
    state = create_train_state(params, tx)
    step = make_train_step(
        model, get_loss(cfg), tx, ema_decay=float(cfg.model.ema_decay),
        donate=False,
    )
    data = jax.random.randint(
        jax.random.PRNGKey(9), (batch, D), 0, cfg.data.S
    )

    cost = {}
    try:
        c = step.lower(state, data, jax.random.PRNGKey(1)).compile()
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        cost = dict(ca)
    except Exception as e:  # pragma: no cover - depends on backend
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    state, l0 = step(state, data, jax.random.PRNGKey(1))
    jax.block_until_ready(l0)
    n = 20
    t0 = time.time()
    for i in range(n):
        state, l = step(state, data, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(l)
    dt = (time.time() - t0) / n

    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    peak_f = _lookup(PEAK_FLOPS)
    peak_b = _lookup(HBM_PEAK)
    param_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params)
    )
    rec = {
        "batch": batch,
        "dtype": dtype,
        "ms_per_step": round(dt * 1e3, 3),
        "steps_per_sec": round(1.0 / dt, 3),
        "flops_per_step": flops,
        "bytes_accessed_per_step": byts,
        "achieved_gbps": round(byts / dt / 1e9, 1) if byts else None,
        "mfu": round(flops / dt / peak_f, 4) if peak_f and flops else None,
        "bw_utilization": (
            round(byts / dt / peak_b, 4) if peak_b and byts else None
        ),
        "param_bytes": param_bytes,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(rec))
    out.write(json.dumps(rec) + "\n")
    out.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,128,256")
    ap.add_argument("--dtypes", default="f32,bf16")
    ap.add_argument("--out", default="docs/assets/round4/train_roofline.jsonl")
    args = ap.parse_args()

    from ctdd_tpu.utils.compile_cache import enable_compile_cache
    from ctdd_tpu.utils.device_guard import guard_device_init

    enable_compile_cache()
    guard_device_init()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "a") as out:
        for b in [int(x) for x in args.batches.split(",")]:
            for dt in args.dtypes.split(","):
                measure(b, dt, out)


if __name__ == "__main__":
    main()
