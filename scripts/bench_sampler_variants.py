"""Flagship sampler throughput across perf variants (one TPU client!).

    python scripts/bench_sampler_variants.py [--n 256] [--runs 2] [--steps 1000]

Variants:
  f32          round-1 headline protocol (comparability anchor; note f32
               convs already run the MXU in bf16 under JAX default precision)
  fused        + cfg.sampler.use_fused_update=True (ops/fused_update.py:
               whole tau-leap update in one Pallas kernel) — the perf path
  bf16         cfg.model.compute_dtype=bfloat16 activations (NOT default:
               the 1000-step bf16 scan compile crashes this box's TPU
               worker; compiles fine at <=128 batch / <=50 steps)
  bf16_fused   bf16 + fused (same compile caveat)

Prints one JSON line per variant plus a summary line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from ctdd_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def measure(cfg, N, runs, label):
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.sampling.samplers import get_sampler
    import jax.numpy as jnp

    model = create_model(cfg)
    D = cfg.model.concat_dim
    x = jnp.zeros((2, D), jnp.int32)
    t = jnp.full((2,), 0.5, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t)
    sampler = get_sampler(cfg)
    t0 = time.time()
    sampler.sample(model, params, jax.random.PRNGKey(0), N=N)  # compile
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(runs):
        out = sampler.sample(model, params, jax.random.PRNGKey(i + 1), N=N)
    dt = (time.time() - t0) / runs
    res = {
        "variant": label,
        "samples_per_sec": round(N / dt, 3),
        "sec_per_run": round(dt, 3),
        "compile_s": round(compile_s, 1),
        "mean_state": float(out[0].mean()),
    }
    print(json.dumps(res), flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--sampler", default="TauL")
    ap.add_argument("--variants", default="f32,fused")
    args = ap.parse_args()

    from ctdd_tpu.config.presets import get_preset

    results = {}
    for label in args.variants.split(","):
        cfg = get_preset("tauUnet_mnist")
        cfg.sampler.name = args.sampler
        cfg.sampler.num_steps = args.steps
        if label.startswith("bf16"):
            cfg.model.compute_dtype = "bfloat16"
        if label.endswith("fused"):
            cfg.sampler.use_fused_update = True
        results[label] = measure(cfg, args.n, args.runs, label)

    base = results.get("f32")
    if base:
        summary = {
            k: round(v["samples_per_sec"] / base["samples_per_sec"], 3)
            for k, v in results.items()
        }
        print(json.dumps({"speedup_vs_f32": summary,
                          "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
