"""Preset wiring tests: every preset resolves against the registries."""

import os

import pytest

from ctdd_tpu import registry
from ctdd_tpu.config.base import load_config, save_config
from ctdd_tpu.config.presets import get_preset, preset_names

# losses constructed outside the loss registry (reference does the same for
# d3pm: losses.py:1107 is not registered, scripts build it directly)
SPECIAL_LOSSES = {"d3pm"}


@pytest.mark.parametrize("name", preset_names())
def test_preset_wiring(name):
    import ctdd_tpu.data  # noqa: F401  (registers datasets)
    import ctdd_tpu.losses  # noqa: F401
    import ctdd_tpu.models  # noqa: F401
    import ctdd_tpu.sampling  # noqa: F401
    import ctdd_tpu.training  # noqa: F401  (registers optimizers/train steps)

    cfg = get_preset(name)
    for section in ("loss", "training", "data", "model", "optimizer",
                    "saving", "sampler"):
        assert section in cfg, f"{name} missing {section}"
    assert cfg.model.name in registry.models, f"{name}: model {cfg.model.name}"
    if cfg.loss.name not in SPECIAL_LOSSES:
        assert cfg.loss.name in registry.losses, f"{name}: loss {cfg.loss.name}"
    assert cfg.sampler.name in registry.samplers, (
        f"{name}: sampler {cfg.sampler.name}"
    )
    assert cfg.data.name in registry.datasets, f"{name}: data {cfg.data.name}"
    assert cfg.optimizer.name in registry.optimizers
    assert cfg.training.train_step_name in registry.train_steps


def test_yaml_roundtrip(tmp_path):
    cfg = get_preset("mlp_synthetic")
    path = save_config(cfg, str(tmp_path / "config.yaml"))
    assert os.path.exists(path)
    cfg2 = load_config(path)
    assert cfg2.to_dict() == cfg.to_dict()


def test_d3pm_presets_have_diffusion_sections():
    for name in ("mnist_d3pm", "synthetic_d3pm"):
        cfg = get_preset(name)
        for k in ("type", "num_timesteps", "model_prediction",
                  "transition_mat_type", "loss_type", "num_pixel_vals"):
            assert k in cfg.model, f"{name} missing model.{k}"
