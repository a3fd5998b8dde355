"""Minimal production sampling service.

The reference has no serving story (notebook-driven sampling only); a
production framework needs one. `SamplerService` wraps a checkpoint into a
pre-compiled fixed-batch sampler handle (compile once, generate many), and
`serve.py` exposes it over HTTP. Requests for arbitrary n are served from
fixed-size compiled batches (no recompiles at serving time).
"""

from __future__ import annotations

import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class SamplerService:
    """Checkpointed model -> thread-safe sample generation at a fixed batch."""

    def __init__(self, cfg, ckpt_dir: str, batch: int = 16, use_ema: bool = True,
                 seed: int = 0):
        from ctdd_tpu.models.base import create_model
        from ctdd_tpu.sampling.samplers import get_sampler
        from ctdd_tpu.training.optimizers import get_optimizer
        from ctdd_tpu.training.state import create_train_state
        from ctdd_tpu.utils.bookkeeping import CheckpointManager

        self.cfg = cfg
        self.batch = batch
        self.model = create_model(cfg)
        self.has_label = bool(getattr(self.model, "has_label", False))
        D = cfg.model.concat_dim
        init_label = jnp.zeros((2,), jnp.int32) if self.has_label else None
        params = self.model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32),
            jnp.full((2,), 0.5), label=init_label,
        )
        state = create_train_state(params, get_optimizer(cfg))
        state = CheckpointManager(ckpt_dir).restore(state)
        self.params = state.ema_params if use_ema else state.params
        self.sampler = get_sampler(cfg)
        self._key = jax.random.PRNGKey(seed)
        self._lock = threading.Lock()
        self.step = int(state.step)

    def warmup(self):
        """Compile the sampler ahead of the first request."""
        label = [0] if self.has_label else None
        self._generate_batch(jax.random.PRNGKey(0), label=label)

    def _generate_batch(self, key, label=None, cfg_scale: float = 0.0
                        ) -> np.ndarray:
        kwargs = {}
        if label is not None:
            # cycle the requested classes over the fixed compiled batch;
            # label values are data (no recompile), cfg_scale is static
            # (one compile per distinct scale)
            kwargs["label"] = jnp.asarray(
                np.resize(np.asarray(label, np.int32), self.batch)
            )
            kwargs["cfg_scale"] = float(cfg_scale)
        out = self.sampler.sample(
            self.model, self.params, key, N=self.batch, **kwargs
        )
        return out[0] if isinstance(out, tuple) else out

    def generate(self, n: int, label=None, cfg_scale: float = 0.0
                 ) -> np.ndarray:
        """n samples from fixed-size compiled batches; `label` is an optional
        list of class ids cycled over the batch (label-conditional models
        only), `cfg_scale` the classifier-free guidance scale."""
        if label is not None and not self.has_label:
            raise ValueError(
                f"model {self.cfg.model.name} is not label-conditional"
            )
        chunks = []
        produced = 0
        while produced < n:
            with self._lock:
                self._key, sub = jax.random.split(self._key)
            chunks.append(
                self._generate_batch(sub, label=label, cfg_scale=cfg_scale)
            )
            produced += self.batch
        return np.concatenate(chunks, axis=0)[:n]


def run_http_server(service: SamplerService, port: int = 8901):
    """Tiny stdlib HTTP front end: GET /healthz, GET /generate?n=16."""
    import json
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            ...

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/healthz":
                body = json.dumps(
                    {"ok": True, "step": service.step,
                     "batch": service.batch,
                     "label_conditional": service.has_label}
                ).encode()
                self.send_response(200)
            elif url.path == "/generate":
                try:
                    q = parse_qs(url.query)
                    n = int(q.get("n", ["16"])[0])
                    n = max(1, min(n, 4096))
                    label = None
                    if "label" in q:
                        label = [int(c) for c in q["label"][0].split(",")]
                    cfg_scale = float(q.get("cfg_scale", ["0.0"])[0])
                    samples = service.generate(
                        n, label=label, cfg_scale=cfg_scale
                    )
                    body = json.dumps(
                        {"shape": list(samples.shape),
                         "samples": samples.tolist()}
                    ).encode()
                    self.send_response(200)
                except ValueError as e:  # bad request (e.g. label on
                    body = json.dumps({"error": str(e)}).encode()  # uncond)
                    self.send_response(400)
                except Exception as e:  # surface errors as 500 JSON
                    body = json.dumps({"error": str(e)}).encode()
                    self.send_response(500)
            else:
                body = json.dumps({"error": "unknown path"}).encode()
                self.send_response(404)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = HTTPServer(("127.0.0.1", port), Handler)
    return server
