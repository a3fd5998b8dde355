"""Serving layer: checkpoint -> SamplerService -> HTTP round trip."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp

from ctdd_tpu.config.presets import get_preset
from ctdd_tpu.models.base import create_model
from ctdd_tpu.training.optimizers import get_optimizer
from ctdd_tpu.training.state import create_train_state
from ctdd_tpu.utils.bookkeeping import CheckpointManager


def _make_ckpt(tmp_path):
    cfg = get_preset("mlp_synthetic")
    cfg.data.shape = [8]
    cfg.data.num_samples = 64
    cfg.data.location = ""
    cfg.model.concat_dim = 8
    cfg.model.d_model = 16
    cfg.model.hidden_dim = 32
    cfg.model.num_layers = 1
    cfg.model.temb_dim = 8
    cfg.sampler.num_steps = 4
    model = create_model(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 8), jnp.int32), jnp.full((2,), 0.5)
    )
    state = create_train_state(params, get_optimizer(cfg))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state)
    return cfg, str(tmp_path / "ckpt")


def test_sampler_service_and_http(tmp_path):
    from ctdd_tpu.serving import SamplerService, run_http_server

    cfg, ckpt = _make_ckpt(tmp_path)
    svc = SamplerService(cfg, ckpt, batch=4)
    out = svc.generate(6)  # spans two compiled batches
    assert out.shape == (6, 8)
    assert out.min() >= 0 and out.max() < cfg.data.S

    server = run_http_server(svc, port=0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["ok"] and health["batch"] == 4

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/generate?n=3"
        ) as r:
            payload = json.loads(r.read())
        assert payload["shape"] == [3, 8]

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/nope") as r:
            pass
    except urllib.error.HTTPError as e:
        assert e.code == 404
    finally:
        server.shutdown()


def test_sampler_service_labels_cfg(tmp_path):
    """Label-conditional checkpoint served with label + cfg_scale, and a 400
    on label requests against an unconditional model."""
    from ctdd_tpu.serving import SamplerService, run_http_server
    from tests.test_conditional_dit import tiny_dit_cfg

    cfg = tiny_dit_cfg(tmp_path)
    model = create_model(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 64), jnp.int32),
        jnp.full((2,), 0.5), label=jnp.zeros((2,), jnp.int32),
    )
    state = create_train_state(params, get_optimizer(cfg))
    mgr = CheckpointManager(str(tmp_path / "dit_ckpt"))
    mgr.save(1, state)

    svc = SamplerService(cfg, str(tmp_path / "dit_ckpt"), batch=4)
    assert svc.has_label
    out = svc.generate(4, label=[0, 1], cfg_scale=1.5)
    assert out.shape == (4, 64)

    server = run_http_server(svc, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/generate?n=2&label=3,7&cfg_scale=2.0"
        ) as r:
            payload = json.loads(r.read())
        assert payload["shape"] == [2, 64]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.loads(r.read())["label_conditional"]
    finally:
        server.shutdown()


def test_sampler_service_rejects_label_on_unconditional(tmp_path):
    from ctdd_tpu.serving import SamplerService

    cfg, ckpt = _make_ckpt(tmp_path)
    svc = SamplerService(cfg, ckpt, batch=2)
    assert not svc.has_label
    try:
        svc.generate(2, label=[0])
        assert False, "expected ValueError"
    except ValueError as e:
        assert "not label-conditional" in str(e)
