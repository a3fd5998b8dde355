"""Minimal repro for the bf16-sampler compile crash + mitigation probes.

KNOWN LIMIT (docs/DESIGN_NOTES.md, round 2): with
model.compute_dtype=bfloat16, compiling the 1000-step TauL sampler scan at
N=256 reliably crashes this box's TPU worker ("TPU worker process crashed or
restarted") — at COMPILE time, before any execution. f32 activations with
the same nets compile fine (convs already hit the MXU bf16 path), and bf16
works at N<=128 / <=50 steps.

WARNING: mode=repro intentionally crashes the TPU client on affected
stacks. Run it alone (no other TPU client attached).

Usage:
  python scripts/bf16_scan_repro.py --mode repro          # pinned crash case
  python scripts/bf16_scan_repro.py --mode remat          # mitigation A:
        jax.checkpoint on the scan body (shrinks the live program) —
        re-ruled-out 2026-08-20: still crashes the worker
  python scripts/bf16_scan_repro.py --mode chunked        # mitigation B:
        sampler.host_chunk_steps=50 — ONE 50-step scan program (known-good
        size) driven 20x from the host, carry device-resident; bitwise
        identical to the single-scan program (test_sampler_convergence.py)
  python scripts/bf16_scan_repro.py --mode small          # control: N=128,
        50 steps, bf16 — known good
  python scripts/bf16_scan_repro.py --mode f32            # control: same
        shapes as repro, f32 — known good

Each mode prints one line: MODE ok <samples/s> | MODE crashed-at-compile.
The crash signature observed on this box (jax 0.9.x, axon PJRT tunnel,
TPU v5e) is a worker-process abort during XLA compilation of the scanned
UNet body with bf16 activation types; no python traceback is produced
client-side beyond the PJRT "worker crashed or restarted" error.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctdd_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode", default="repro",
        choices=["repro", "remat", "chunked", "small", "f32"],
    )
    args = ap.parse_args()

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.sampling.samplers import get_sampler

    # pinned crash configuration: flagship MNIST tau-UNet, S=256, D=784
    cfg = get_preset("tauUnet_mnist")
    N = 256
    num_steps = 1000
    if args.mode != "f32":
        cfg.model.compute_dtype = "bfloat16"
    if args.mode == "small":
        N, num_steps = 128, 50
    if args.mode == "remat":
        # mitigation A: rematerialize the scan body so XLA compiles a
        # checkpointed (smaller-live-set) program
        cfg.sampler.remat_scan_body = True
    if args.mode == "chunked":
        # mitigation B: pin the compiled program at the known-good 50-step
        # size and drive 1000/50 chunks from the host
        cfg.sampler.host_chunk_steps = 50
    cfg.sampler.num_steps = num_steps

    model = create_model(cfg)
    D = cfg.model.concat_dim
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32),
        jnp.full((2,), 0.5),
    )
    sampler = get_sampler(cfg)
    print(
        f"mode={args.mode} N={N} steps={num_steps} "
        f"dtype={cfg.model.get('compute_dtype', 'float32')}: compiling...",
        flush=True,
    )
    t0 = time.time()
    out = sampler.sample(model, params, jax.random.PRNGKey(1), N=N)
    x = out[0] if isinstance(out, tuple) else out
    compile_s = time.time() - t0
    t0 = time.time()
    out = sampler.sample(model, params, jax.random.PRNGKey(2), N=N)
    jax.block_until_ready(out[0] if isinstance(out, tuple) else out)
    dt = time.time() - t0
    print(
        f"{args.mode} ok shape={tuple(x.shape)} compile={compile_s:.0f}s "
        f"{N / dt:.2f} samples/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
