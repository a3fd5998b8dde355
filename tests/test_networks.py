"""Network zoo tests: hollow/masked/bert/EBM/DDSM shapes + loss integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctdd_tpu.config.presets import get_preset
from ctdd_tpu.models.base import create_model


def hollow_cfg(model_name="UniVarHollowEMA", **model_overrides):
    cfg = get_preset("bert_synthetic")
    cfg.data.shape = [6]
    cfg.data.num_samples = 64
    cfg.model.concat_dim = 6
    cfg.model.embed_dim = 16
    cfg.model.qkv_dim = 16
    cfg.model.mlp_dim = 32
    cfg.model.num_layers = 1
    cfg.model.num_heads = 2
    cfg.model.num_output_ffresiduals = 1
    cfg.model.name = model_name
    cfg.model.t_func = "log_sqr"
    for k, v in model_overrides.items():
        cfg.model[k] = v
    return cfg


def _roundtrip(cfg, B=2):
    model = create_model(cfg)
    D = cfg.model.concat_dim
    x = jnp.zeros((B, D), jnp.int32)
    t = jnp.full((B,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)
    logits = model.apply(params, x, t)
    return model, params, logits


@pytest.mark.parametrize(
    "overrides",
    [
        {"nets": "bidir_transformer2", "net_arch": "bidir_transformer",
         "bidir_readout": "res_concat"},
        {"nets": "bidir_transformer", "net_arch": "bidir_transformer",
         "bidir_readout": "attention"},
        {"nets": "bidir_transformer", "net_arch": "bidir_transformer",
         "bidir_readout": "concat"},
    ],
)
def test_hollow_transformer_variants(overrides):
    cfg = hollow_cfg("UniVarHollowEMA", **overrides)
    model, params, logits = _roundtrip(cfg)
    assert logits.shape == (2, 6, cfg.data.S)
    assert np.isfinite(np.asarray(logits)).all()


def test_hollow_property():
    """The hollow condition: logits at dim d do not depend on x_d."""
    cfg = hollow_cfg(
        "UniVarHollowEMA",
        nets="bidir_transformer",
        net_arch="bidir_transformer",
        bidir_readout="res_concat",
    )
    model, params, _ = _roundtrip(cfg)
    t = jnp.full((1,), 0.5)
    x1 = jnp.zeros((1, 6), jnp.int32)
    x2 = x1.at[0, 3].set(1)  # change only dim 3
    l1 = model.apply(params, x1, t)
    l2 = model.apply(params, x2, t)
    np.testing.assert_allclose(
        np.asarray(l1[0, 3]), np.asarray(l2[0, 3]), atol=1e-5
    )
    # other dims DO see the change
    assert not np.allclose(np.asarray(l1[0, 4]), np.asarray(l2[0, 4]), atol=1e-5)


def test_bert_enum_transformer():
    cfg = hollow_cfg("UniVarBertEMA", readout="resnet")
    model, params, logits = _roundtrip(cfg)
    assert logits.shape == (2, 6, cfg.data.S)


def test_enumerative_masked_transformer():
    cfg = hollow_cfg("UniVarMaskedEMA", readout="resnet")
    model, params, logits = _roundtrip(cfg)
    assert logits.shape == (2, 6, cfg.data.S)
    # the masked readout at d must not depend on x_d (masking property)
    t = jnp.full((1,), 0.5)
    x1 = jnp.zeros((1, 6), jnp.int32)
    x2 = x1.at[0, 2].set(1)
    l1 = model.apply(params, x1, t)
    l2 = model.apply(params, x2, t)
    np.testing.assert_allclose(np.asarray(l1[0, 2]), np.asarray(l2[0, 2]), atol=1e-5)


def test_binary_ebm():
    cfg = hollow_cfg("UniVarBinaryEBMEMA", readout="resnet", is_ebm=True)
    model = create_model(cfg)
    x = jnp.zeros((3, 6), jnp.int32)
    t = jnp.full((3,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)
    energy = model.apply(params, x, t)
    assert energy.shape == (3,)

    from ctdd_tpu.losses.losses import BinEBMAux, EBMAux

    cfg.loss.name = "BinEBMAux"
    cfg.loss.logit_type = "direct"
    loss = BinEBMAux(cfg)
    batch = jax.random.randint(jax.random.PRNGKey(1), (3, 6), 0, 2)
    val = loss.calc_loss(model, params, jax.random.PRNGKey(2), batch, train=False)
    assert np.isfinite(float(val))

    cfg.loss.name = "EBMAux"
    loss2 = EBMAux(cfg)
    val2 = loss2.calc_loss(model, params, jax.random.PRNGKey(3), batch, train=False)
    assert np.isfinite(float(val2))


def test_sudoku_scorenet():
    import ml_collections

    cfg = ml_collections.ConfigDict()
    cfg.data = ml_collections.ConfigDict(
        {"S": 9, "shape": [81], "batch_size": 4, "num_samples": 8}
    )
    cfg.model = ml_collections.ConfigDict(
        {"name": "UniVarScoreNetEMA", "concat_dim": 81, "embed_dim": 16,
         "rate_const": 1.0, "t_func": "log_sqr", "ema_decay": 0.999}
    )
    cfg.loss = ml_collections.ConfigDict({"logit_type": "direct"})
    model = create_model(cfg)
    x = jnp.zeros((2, 81), jnp.int32)
    t = jnp.full((2,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)
    logits = model.apply(params, x, t)
    assert logits.shape == (2, 81, 9)
    # centered over states
    np.testing.assert_allclose(
        np.asarray(logits.sum(-1)), 0.0, atol=1e-4
    )


def test_protein_scorenet():
    import ml_collections

    cfg = ml_collections.ConfigDict()
    cfg.data = ml_collections.ConfigDict(
        {"S": 21, "shape": [12], "batch_size": 4, "num_samples": 8}
    )
    cfg.model = ml_collections.ConfigDict(
        {"name": "UniVarProteinScoreNetEMA", "concat_dim": 12, "embed_dim": 16,
         "rate_const": 1.0, "t_func": "log_sqr", "ema_decay": 0.999}
    )
    cfg.loss = ml_collections.ConfigDict({"logit_type": "direct"})
    model = create_model(cfg)
    x = jnp.zeros((2, 12), jnp.int32)
    t = jnp.full((2,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)
    logits = model.apply(params, x, t)
    assert logits.shape == (2, 12, 21)


def test_datasets_maze_sudoku_protein():
    from ctdd_tpu.data.maze import find_path, maze_acc, maze_gen
    from ctdd_tpu.data.sudoku import gen_sudoku, sudoku_acc

    mazes = maze_gen(4, seed=0)
    assert mazes.shape == (4, 1, 15, 15)
    assert set(np.unique(mazes)) <= {0, 1, 2}
    # generated solved mazes are 100% solvable by construction
    assert maze_acc(mazes) == 1.0

    boards = gen_sudoku(3, seed=0)
    assert boards.shape == (3, 9, 9)
    assert sudoku_acc(boards.reshape(3, 81) - 1) == 1.0
    bad = boards.reshape(3, 81).copy() - 1
    bad[:, 0] = bad[:, 1]  # corrupt
    assert sudoku_acc(bad) == 0.0


def test_prefix_conditional_bidir_transformer():
    from ctdd_tpu.networks.hollow import PrefixConditionalBidirTransformer
    from ctdd_tpu.config.base import FrozenCfg

    cfg = hollow_cfg(
        "UniVarHollowEMA", nets="bidir_transformer",
        net_arch="bidir_transformer", bidir_readout="res_concat",
        conditional_dim=2,
    )
    net = PrefixConditionalBidirTransformer(cfg=FrozenCfg(cfg))
    x = jnp.zeros((2, 6), jnp.int32)
    t = jnp.full((2,), 0.5)
    params = net.init(jax.random.PRNGKey(0), x, t)
    logits = net.apply(params, x, t)
    assert logits.shape == (2, 6, cfg.data.S)
    # the conditional prefix gets dummy zero logits (ref :1127-1132)
    np.testing.assert_allclose(np.asarray(logits[:, :2]), 0.0)


def test_sequence_transformer_input_embedding_scale():
    """scale_input_embedding=True multiplies the token embedding by
    sqrt(d_model) before the PE; False keeps reference bit-parity."""
    from ctdd_tpu.networks.transformer import SequenceTransformer

    # the drowning effect is geometry-dependent (embedding std ~1/sqrt(S)
    # vs unit-scale PE, recovered by sqrt(d_model)) — test at the
    # pianoroll-like geometry where it was measured, not at toy width
    kwargs = dict(
        S=129, num_layers=1, d_model=128, num_heads=2, dim_feedforward=64,
        dropout=0.0, num_output_FFresiduals=1, time_scale_factor=100,
        temb_dim=8, use_one_hot_input=True, max_len=12,
    )
    x = jnp.arange(2 * 12, dtype=jnp.int32).reshape(2, 12) % 129
    t = jnp.full((2,), 0.5)
    plain = SequenceTransformer(**kwargs)
    scaled = SequenceTransformer(scale_input_embedding=True, **kwargs)
    params = plain.init(jax.random.PRNGKey(0), x, t)
    out_plain = plain.apply(params, x, t)
    out_scaled = scaled.apply(params, x, t)  # same params, different scale
    assert out_plain.shape == out_scaled.shape == (2, 12, 129)
    assert np.isfinite(np.asarray(out_scaled)).all()
    assert not np.allclose(np.asarray(out_plain), np.asarray(out_scaled))

    # the scaled net's logits must be materially more sensitive to the input
    # tokens (the collapse diagnosis: unscaled sensitivity ~1e-3 at init)
    x2 = (x + 1) % 129
    sens_plain = float(np.abs(np.asarray(plain.apply(params, x2, t) - out_plain)).mean())
    sens_scaled = float(np.abs(np.asarray(scaled.apply(params, x2, t) - out_scaled)).mean())
    assert sens_scaled > 2.0 * sens_plain


def test_sequence_transformer_qk_norm():
    """qk_norm=True inserts per-head QK LayerNorms (bounded attention
    logits — the conditional decode-collapse fix, DESIGN_NOTES 'the
    conditioning is dead'); False keeps reference bit-parity."""
    import jax.tree_util as jtu

    from ctdd_tpu.networks.transformer import SequenceTransformer

    kwargs = dict(
        S=17, num_layers=1, d_model=32, num_heads=2, dim_feedforward=48,
        dropout=0.0, num_output_FFresiduals=1, time_scale_factor=100,
        temb_dim=8, use_one_hot_input=True, max_len=12,
        scale_input_embedding=True,
    )
    x = jnp.arange(2 * 12, dtype=jnp.int32).reshape(2, 12) % 17
    t = jnp.full((2,), 0.5)
    plain = SequenceTransformer(**kwargs)
    qk = SequenceTransformer(qk_norm=True, **kwargs)
    p_plain = plain.init(jax.random.PRNGKey(0), x, t)
    p_qk = qk.init(jax.random.PRNGKey(0), x, t)

    # qk_norm adds LayerNorm leaves under the attention scope and nothing else
    names_plain = {jtu.keystr(k) for k, _ in jtu.tree_leaves_with_path(p_plain)}
    names_qk = {jtu.keystr(k) for k, _ in jtu.tree_leaves_with_path(p_qk)}
    extra = names_qk - names_plain
    assert extra and all("_ln" in n or "norm" in n.lower() for n in extra), extra
    assert not (names_plain - names_qk)

    out = qk.apply(p_qk, x, t)
    assert out.shape == (2, 12, 17)
    assert np.isfinite(np.asarray(out)).all()

    # cross-position sensitivity at matched init: qk_norm must not attenuate
    # the prefix->suffix path relative to the plain net (any random-init
    # attention net has nonzero sensitivity, so a bare >0 check is vacuous —
    # the guard is that the QK LayerNorms keep it the same order of magnitude)
    x2 = x.at[:, :4].set((x[:, :4] + 5) % 17)
    d_rest = np.abs(np.asarray(qk.apply(p_qk, x2, t) - out))[:, 4:].max()
    d_plain = np.abs(
        np.asarray(plain.apply(p_plain, x2, t) - plain.apply(p_plain, x, t))
    )[:, 4:].max()
    assert d_plain > 1e-4, d_plain
    assert d_rest > 0.01 * d_plain, (d_rest, d_plain)
