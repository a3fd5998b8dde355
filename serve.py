"""Sampling service CLI: load a checkpoint, serve /generate over HTTP.

Usage:
  python serve.py --preset mlp_synthetic --ckpt runs/.../checkpoints \
      --port 8901 --batch 32
  curl 'localhost:8901/generate?n=8'
"""

from __future__ import annotations

import argparse


def main():
    from ctdd_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--port", type=int, default=8901)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--no-ema", action="store_true")
    args = ap.parse_args()

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.serving import SamplerService, run_http_server

    cfg = get_preset(args.preset)
    service = SamplerService(
        cfg, args.ckpt, batch=args.batch, use_ema=not args.no_ema
    )
    print("compiling sampler ...", flush=True)
    service.warmup()
    server = run_http_server(service, args.port)
    print(f"serving on http://127.0.0.1:{args.port} (step {service.step})",
          flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
