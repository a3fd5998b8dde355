"""End-to-end slice: synthetic data -> model -> losses -> train step -> samplers.

SURVEY.md §7 build step 2 (train_synthetic.py parity), on tiny shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctdd_tpu.config.presets import get_preset
from ctdd_tpu.data.loaders import get_dataset, iterate_batches
from ctdd_tpu.losses.losses import get_loss
from ctdd_tpu.models.base import create_model
from ctdd_tpu.sampling.samplers import get_sampler
from ctdd_tpu.training.optimizers import get_optimizer
from ctdd_tpu.training.state import create_train_state
from ctdd_tpu.training.train_step import make_train_step


def tiny_cfg(loss_name="CatRM", sampler_name="LBJF", **loss_overrides):
    cfg = get_preset("mlp_synthetic")
    cfg.data.shape = [8]
    cfg.data.num_samples = 256
    cfg.data.location = ""
    cfg.data.batch_size = 16
    cfg.model.concat_dim = 8
    cfg.model.d_model = 16
    cfg.model.hidden_dim = 32
    cfg.model.num_layers = 1
    cfg.model.temb_dim = 8
    cfg.loss.name = loss_name
    cfg.sampler.name = sampler_name
    cfg.sampler.num_steps = 5
    for k, v in loss_overrides.items():
        cfg.loss[k] = v
    return cfg


def build(cfg):
    model = create_model(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, cfg.data.shape[0]), jnp.int32)
    t = jnp.ones((2,), jnp.float32) * 0.5
    params = model.init(key, x, t)
    return model, params


def test_dataset_generation_and_batches():
    cfg = tiny_cfg()
    ds = get_dataset(cfg)
    assert len(ds) == 256 and ds.data.shape[1] == 8
    assert set(np.unique(ds.data)) <= {0, 1}
    it = iterate_batches(ds, 16)
    batch, label = next(it)
    assert batch.shape == (16, 8) and label is None


@pytest.mark.parametrize(
    "loss_name,overrides",
    [
        ("CTElbo", {}),
        ("SDDMElbo", {"logit_type": "direct"}),
        ("CatRM", {"loss_type": "rm"}),
        ("CatRM", {"loss_type": "mle"}),
        ("CatRM", {"loss_type": "elbo"}),
        ("CatRMNLL", {"loss_type": "rm", "nll_weight": 0.1}),
        ("ScoreElbo", {"logit_type": "direct", "nll_weight": 0.01}),
        ("NLL", {}),
        ("NLLOriginal", {}),
        ("CTElboLambda", {}),
    ],
)
def test_losses_finite(loss_name, overrides):
    cfg = tiny_cfg(loss_name=loss_name, **overrides)
    model, params = build(cfg)
    loss = get_loss(cfg)
    ds = get_dataset(cfg)
    batch = jnp.asarray(ds.data[:16])
    val = loss.calc_loss(
        model, params, jax.random.PRNGKey(1), batch, n_iter=10, train=False
    )
    assert np.isfinite(float(val)), f"{loss_name} produced {val}"


def test_train_step_descends():
    cfg = tiny_cfg(loss_name="CatRM")
    model, params = build(cfg)
    loss = get_loss(cfg)
    tx = get_optimizer(cfg)
    state = create_train_state(params, tx)
    step = make_train_step(model, loss, tx, ema_decay=0.9999, donate=False)
    ds = get_dataset(cfg)
    batch = jnp.asarray(ds.data[:16])
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        state, l = step(state, batch, sub)
        losses.append(float(l))
    assert int(state.step) == 30
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    # EMA params moved but stayed close to params
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        state.params, state.ema_params)
    assert max(jax.tree.leaves(diff)) > 0.0


def test_nan_guard_skips_update():
    cfg = tiny_cfg(loss_name="CatRM")
    model, params = build(cfg)
    tx = get_optimizer(cfg)
    state = create_train_state(params, tx)

    class BadLoss:
        def calc_loss(self, model, params, key, batch, **kw):
            return jnp.float32(jnp.nan)

    step = make_train_step(model, BadLoss(), tx, ema_decay=0.0, donate=False)
    batch = jnp.zeros((4, 8), jnp.int32)
    new_state, l = step(state, batch, jax.random.PRNGKey(0))
    assert float(l) == 1e9  # sentinel (ref training.py:24)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize(
    "sampler_name,loss_name",
    [
        ("TauL", "CTElbo"),
        ("TauL", "CatRM"),
        ("LBJF", "CTElbo"),
        ("LBJF", "CatRM"),
        ("MidPointTauL", "CTElbo"),
        ("PCTauL", "CTElbo"),
        ("ExactSampling", "CatRM"),
    ],
)
def test_samplers_run(sampler_name, loss_name):
    cfg = tiny_cfg(loss_name=loss_name, sampler_name=sampler_name)
    if loss_name == "CatRM":
        cfg.loss.logit_type = "direct"
    model, params = build(cfg)
    sampler = get_sampler(cfg)
    out = sampler.sample(model, params, jax.random.PRNGKey(0), N=6)
    samples = out[0] if isinstance(out, tuple) else out
    assert samples.shape == (6, 8)
    assert samples.min() >= 0 and samples.max() < cfg.data.S


def test_sampler_with_corrector_runs():
    cfg = tiny_cfg(loss_name="CTElbo", sampler_name="TauL")
    cfg.sampler.num_corrector_steps = 2
    cfg.sampler.corrector_entry_time = 0.5
    model, params = build(cfg)
    sampler = get_sampler(cfg)
    samples, _ = sampler.sample(model, params, jax.random.PRNGKey(0), N=4)
    assert samples.shape == (4, 8)


def test_gray_binarization_roundtrip_and_reference_parity():
    from ctdd_tpu.data import synthetic as syn

    rng = np.random.RandomState(0)
    pts = rng.randn(64, 2) * 2.0
    int_scale = 2**15 / 8.0
    bits = syn.float2bin(pts, 32, int_scale, "gray")
    rec = syn.bin2float(bits, 32, int_scale, "gray")
    np.testing.assert_allclose(rec, np.trunc(pts * int_scale) / int_scale, atol=1e-9)

    # parity with the reference's string-table mapping (synthetic.py:164-224)
    def ref_compress(x, discrete_dim):
        bx = np.binary_repr(int(abs(x)), width=discrete_dim // 2 - 1)
        return ("0" + bx) if x >= 0 else ("1" + bx)

    b = 15
    # string gray table for a few sampled magnitudes
    for x, y in pts[:8]:
        sx = ref_compress(x * int_scale, 32)
        m = int(sx[1:], 2)
        g = m ^ (m >> 1)
        expect = sx[0] + np.binary_repr(g, width=b)
        got = "".join(map(str, bits[list(pts[:, 0]).index(x)][:16]))
        assert got == expect


def test_generator_cli_writes_npy(tmp_path, monkeypatch):
    # parity with the reference's standalone generator CLI (synthetic.py:273-317)
    import sys

    from ctdd_tpu.data import synthetic as syn

    out = tmp_path / "data_2spirals.npy"
    monkeypatch.setattr(
        sys, "argv",
        ["synthetic", "--type", "2spirals", "--num-samples", "500",
         "--out", str(out), "--seed", "3"],
    )
    syn._main()
    data = np.load(out)
    assert data.shape == (500, 32) and data.dtype == np.int8
    assert set(np.unique(data)) <= {0, 1}
    # decoded floats land in the generator's float envelope
    f = syn.bin2float(data.astype(np.int32), 32,
                      syn.OnlineToyDataset("2spirals", seed=3).int_scale,
                      "gray")
    assert np.all(np.abs(f) < 10.0)
