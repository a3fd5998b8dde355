"""Self-contained repro: bf16 activations make the B=256 MNIST train step
~3x SLOWER than f32 on TPU v5e (VERDICT r4 directive #7b).

Round-4 roofline measurement (docs/DESIGN_NOTES.md roofline table): the
tauUnet_mnist CTElbo train step at B=256 runs ~37 ms/step f32 (≈59% HBM BW)
but ~276 ms/step with model.compute_dtype=bfloat16 (20% BW, 7% MFU) — the
opposite of the expected bf16 speedup, and only at large batch (B=64 bf16 is
a small win). The repro reuses the roofline harness (same jit, same XLA cost
analysis) and stamps the full software versions so the pathology is
reportable upstream as-is.

Expected output: two jsonl records (f32, bf16) + a verdict line. The bug
reproduces when bf16 steps/s < f32 steps/s at B=256.

Run: python scripts/bf16_train_regression_repro.py
"""

from __future__ import annotations

import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jaxlib

    stamps = {
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "python": sys.version.split()[0],
        "device": str(jax.devices()[0]),
        "device_kind": getattr(jax.devices()[0], "device_kind", "?"),
        "platform": jax.devices()[0].platform,
        "XLA_FLAGS": os.environ.get("XLA_FLAGS", ""),
        "LIBTPU_INIT_ARGS": os.environ.get("LIBTPU_INIT_ARGS", ""),
    }
    try:
        from jax._src.lib import xla_extension_version

        stamps["xla_extension_version"] = int(xla_extension_version)
    except Exception:
        pass
    try:
        import libtpu

        stamps["libtpu"] = getattr(libtpu, "__version__", "?")
    except Exception:
        pass
    print("STAMPS " + json.dumps(stamps))

    from roofline_train_step import measure

    buf = io.StringIO()
    recs = []
    for dtype in ("f32", "bf16"):
        measure(256, dtype, buf)
    for line in buf.getvalue().splitlines():
        recs.append(json.loads(line))

    by = {r["dtype"]: r for r in recs}
    f32, bf16 = by["f32"], by["bf16"]
    ratio = bf16["ms_per_step"] / f32["ms_per_step"]
    print(
        f"VERDICT: B=256 f32 {f32['steps_per_sec']} steps/s "
        f"({f32['ms_per_step']} ms), bf16 {bf16['steps_per_sec']} steps/s "
        f"({bf16['ms_per_step']} ms) -> bf16 is {ratio:.2f}x "
        f"{'SLOWER — regression reproduces' if ratio > 1.2 else 'vs f32 — regression did NOT reproduce'}"
    )


if __name__ == "__main__":
    main()
