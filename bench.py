"""Benchmark harness: MNIST flagship throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: MNIST tau-leaping sampler throughput (samples/sec/chip,
1000-step protocol, the reference's headline sampling setup:
GaussianTargetRateImageX0PredEMAPaul, S=256, D=784, TauL — BASELINE.md).
vs_baseline compares against the reference code measured on torch-CPU on
this machine (scripts/measure_torch_baseline.py); the reference publishes
no speed numbers of its own (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# Reference-code-on-torch-CPU numbers measured on this box via
# scripts/measure_torch_baseline.py (see BASELINE.md "measured" section).
TORCH_CPU_SAMPLES_PER_SEC = None  # filled from BASELINE.md constants below
try:
    from scripts.baseline_constants import (
        TORCH_CPU_SAMPLES_PER_SEC,
        TORCH_CPU_TRAIN_STEPS_PER_SEC,
    )
except Exception:
    TORCH_CPU_SAMPLES_PER_SEC = None
    TORCH_CPU_TRAIN_STEPS_PER_SEC = None


# bf16 MXU peak per chip, from the public TPU spec sheets; cost_analysis
# reports logical flops, so MFU is flops_per_step * steps_per_sec / peak.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5": 459e12,       # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
}


def _peak_flops():
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "")
    for k, v in PEAK_FLOPS.items():
        if kind.startswith(k):
            return v
    return None


def _compiled_flops(jitted, *args):
    """Logical flops of one call via XLA cost analysis (0 if unavailable)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def _bench_error_line(seconds: float) -> None:
    print(json.dumps({
        "metric": "mnist_taul_samples_per_sec", "value": 0.0,
        "unit": "samples/sec", "vs_baseline": 0.0,
        "error": f"device init exceeded {seconds:.0f}s "
                 "(TPU tunnel wedged/pool unavailable)",
    }), flush=True)


def main():
    from ctdd_tpu.utils.compile_cache import enable_compile_cache
    from ctdd_tpu.utils.device_guard import guard_device_init
    from ctdd_tpu.utils.reap import reap_orchestrated_jobs

    enable_compile_cache()
    # The end-of-round driver runs bench on the same single tunneled chip our
    # unattended queue may still be training on; stop our own pid-file-tracked
    # jobs first so the measurement is uncontended (CTDD_BENCH_NO_REAP=1 skips).
    reap_orchestrated_jobs()
    guard_device_init(
        timeout=float(os.environ["BENCH_DEVICE_TIMEOUT"])
        if os.environ.get("BENCH_DEVICE_TIMEOUT") else None,
        on_timeout=_bench_error_line,
    )
    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.losses.losses import get_loss
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.sampling.samplers import get_sampler
    from ctdd_tpu.training.optimizers import get_optimizer
    from ctdd_tpu.training.state import create_train_state
    from ctdd_tpu.training.train_step import make_train_step

    cfg = get_preset("tauUnet_mnist")
    # BENCH_BATCH overrides the train batch (MFU-vs-batch sweeps; the
    # flagship preset ships the reference's B=64)
    if os.environ.get("BENCH_BATCH"):
        cfg.data.batch_size = int(os.environ["BENCH_BATCH"])
    # batch 256 aligns the sample dim with MXU lanes: ~2x samples/s vs N=16
    # (measured 12.9 vs 6.3 on v5e)
    N_SAMPLE = 256
    model = create_model(cfg)
    D = cfg.model.concat_dim
    x = jnp.zeros((2, D), jnp.int32)
    t = jnp.full((2,), 0.5, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t)

    # --- train step throughput (CTElbo, B=64) -------------------------------
    # measured BEFORE the sampler: the resident 1000-step sampler executable
    # otherwise degrades the step program ~20x on this chip (measured)
    loss = get_loss(cfg)
    tx = get_optimizer(cfg)
    state = create_train_state(params, tx)
    step = make_train_step(
        model, loss, tx, ema_decay=float(cfg.model.ema_decay), donate=False
    )
    batch = jax.random.randint(
        jax.random.PRNGKey(9), (cfg.data.batch_size, D), 0, cfg.data.S
    )
    train_flops = _compiled_flops(step, state, batch, jax.random.PRNGKey(10))
    state, l0 = step(state, batch, jax.random.PRNGKey(10))  # compile
    jax.block_until_ready(l0)
    n_train = 10
    t0 = time.time()
    for i in range(n_train):
        state, l = step(state, batch, jax.random.PRNGKey(11 + i))
    jax.block_until_ready(l)
    train_steps_per_sec = n_train / (time.time() - t0)
    peak = _peak_flops()
    train_mfu = (
        round(train_flops * train_steps_per_sec / peak, 4)
        if peak and train_flops else None
    )

    # --- bf16 train step (the perf path: cfg.model.compute_dtype) -----------
    cfg_bf16 = get_preset("tauUnet_mnist")
    cfg_bf16.model.compute_dtype = "bfloat16"
    model_b = create_model(cfg_bf16)
    params_b = model_b.init(jax.random.PRNGKey(0), x, t)
    state_b = create_train_state(params_b, tx)
    step_b = make_train_step(
        model_b, get_loss(cfg_bf16), tx,
        ema_decay=float(cfg_bf16.model.ema_decay), donate=False,
    )
    state_b, lb = step_b(state_b, batch, jax.random.PRNGKey(10))
    jax.block_until_ready(lb)
    t0 = time.time()
    for i in range(n_train):
        state_b, lb = step_b(state_b, batch, jax.random.PRNGKey(11 + i))
    jax.block_until_ready(lb)
    bf16_steps_per_sec = n_train / (time.time() - t0)
    bf16_mfu = (
        round(train_flops * bf16_steps_per_sec / peak, 4)
        if peak and train_flops else None
    )
    del state_b, params_b

    if os.environ.get("BENCH_TRAIN_ONLY"):
        print(json.dumps({
            "metric": "ctelbo_train_steps_per_sec",
            "value": round(train_steps_per_sec, 4),
            "unit": "steps/sec",
            "vs_baseline": (
                round(train_steps_per_sec / TORCH_CPU_TRAIN_STEPS_PER_SEC, 2)
                if TORCH_CPU_TRAIN_STEPS_PER_SEC else None
            ),
            "extras": {
                "train_flops_per_step": train_flops,
                "train_mfu": train_mfu,
                "bf16_train_steps_per_sec": round(bf16_steps_per_sec, 4),
                "bf16_train_mfu": bf16_mfu,
            },
        }))
        return

    # --- sampler throughput (1000 steps, TauL) ------------------------------
    sampler = get_sampler(cfg)
    key = jax.random.PRNGKey(0)
    sampler.sample(model, params, key, N=N_SAMPLE)  # compile + warmup
    sample_flops = _compiled_flops(
        sampler._jitted(model.module, N_SAMPLE, False, 0.0),
        model.process, params, key, jnp.zeros((N_SAMPLE,), jnp.int32),
    )
    t0 = time.time()
    n_runs = 3
    for i in range(n_runs):
        sampler.sample(model, params, jax.random.PRNGKey(i + 1), N=N_SAMPLE)
    dt = (time.time() - t0) / n_runs
    samples_per_sec = N_SAMPLE / dt
    # cost_analysis counts a lax.scan body ONCE (verified: body flops ~2.5e12
    # vs the B=64 train fwd+bwd at 1.0e12), so scale by the trip count
    n_steps = int(cfg.sampler.num_steps)
    sample_mfu = (
        round(sample_flops * n_steps / dt / peak, 4)
        if peak and sample_flops else None
    )

    # --- perf-path sampler: fused Pallas tau-leap update --------------------
    # (f32 net — whose convs already run the MXU in bf16 under JAX's default
    # precision; explicit bf16 activation threading crashes this worker's
    # compile at the 1000-step scan size, see docs/DESIGN_NOTES.md. Disable
    # with BENCH_NO_FUSED=1 e.g. on backends without Mosaic.)
    fused_samples_per_sec = None
    if not os.environ.get("BENCH_NO_FUSED"):
        cfg_f = get_preset("tauUnet_mnist")
        cfg_f.sampler.use_fused_update = True
        model_f = create_model(cfg_f)
        params_f = model_f.init(jax.random.PRNGKey(0), x, t)
        sampler_f = get_sampler(cfg_f)
        sampler_f.sample(model_f, params_f, key, N=N_SAMPLE)  # compile
        t0 = time.time()
        for i in range(n_runs):
            sampler_f.sample(
                model_f, params_f, jax.random.PRNGKey(i + 1), N=N_SAMPLE
            )
        fused_samples_per_sec = N_SAMPLE / ((time.time() - t0) / n_runs)

    # headline = production sampler config (fused update; quality-validated
    # at the lenet-FID noise floor vs the plain protocol on the 600k-iter
    # flagship checkpoint — docs/DESIGN_NOTES.md); plain f32 stays in extras
    # as the round-1 comparability anchor
    headline = fused_samples_per_sec or samples_per_sec
    vs_baseline = (
        headline / TORCH_CPU_SAMPLES_PER_SEC
        if TORCH_CPU_SAMPLES_PER_SEC
        else None
    )
    out = {
        "metric": "mnist_taul_samples_per_sec",
        "value": round(headline, 4),
        "unit": "samples/sec/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "extras": {
            "sampler_steps": int(cfg.sampler.num_steps),
            "sample_batch": N_SAMPLE,
            "plain_samples_per_sec": round(samples_per_sec, 4),
            "ctelbo_train_steps_per_sec": round(train_steps_per_sec, 4),
            "train_batch": int(cfg.data.batch_size),
            "train_vs_baseline": (
                round(train_steps_per_sec / TORCH_CPU_TRAIN_STEPS_PER_SEC, 2)
                if TORCH_CPU_TRAIN_STEPS_PER_SEC
                else None
            ),
            "device": str(jax.devices()[0]),
            # flops accounting (XLA cost analysis; MFU vs bf16 MXU peak)
            "train_flops_per_step": train_flops,
            "train_mfu": train_mfu,
            "bf16_train_steps_per_sec": round(bf16_steps_per_sec, 4),
            "bf16_train_mfu": bf16_mfu,
            "sample_flops_per_sampler_step": sample_flops,
            "sample_mfu": sample_mfu,
            "peak_flops": peak,
            "fused_samples_per_sec": (
                round(fused_samples_per_sec, 4)
                if fused_samples_per_sec else None
            ),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
