"""Instantiate EVERY registered model-zoo name and run one forward pass.

Guards the full §2.2 inventory: each of the ~25 registered combos builds,
initializes, and produces (B, D, S) logits (or (B,) energies for EBMs).
"""

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest

from ctdd_tpu import registry
from ctdd_tpu.models.base import create_model
import ctdd_tpu.models.zoo  # noqa: F401

SIZE = 6  # image side for image models
D_IMG = SIZE * SIZE
D_SEQ = 8


def mega_cfg(name: str) -> ml_collections.ConfigDict:
    """One config with every knob the zoo's wrappers might need, tiny."""
    is_img = any(
        k in name for k in ("ImageX0", "Unet", "DiT", "UViT")
    )
    D = D_IMG if is_img else D_SEQ
    S = 6
    cfg = ml_collections.ConfigDict()
    cfg.data = ml_collections.ConfigDict(
        dict(S=S, shape=[1, SIZE, SIZE] if is_img else [D], image_size=SIZE,
             batch_size=2, num_samples=8)
    )
    cfg.model = ml_collections.ConfigDict(
        dict(
            name=name, concat_dim=D, ema_decay=0.999,
            # processes
            rate_const=1.0, t_func="log_sqr", time_base=3.0, time_exp=100.0,
            sigma_min=1.0, sigma_max=8.0, rate_sigma=2.0, Q_sigma=20.0,
            # unet family
            padding=False, ch=8, num_res_blocks=1, ch_mult=[1, 2],
            input_channels=1, scale_count_to_put_attn=1,
            data_min_max=[0, S - 1], dropout=0.1, skip_rescale=True,
            time_embed_dim=8, time_scale_factor=1000, fix_logistic=False,
            model_output="logits", num_heads=2, attn_resolutions=[SIZE // 2],
            num_scales=2,
            # vit family
            patch_size=2, input_channel=1, hidden_dim=16, depth=2,
            mlp_ratio=2.0,
            # hollow family
            net_arch="bidir_transformer", nets="bidir_transformer2",
            use_cat=False, embed_dim=16, bidir_readout="res_concat",
            use_one_hot_input=False, dropout_rate=0.0, num_layers=1,
            attention_dropout_rate=0.0, transformer_norm_type="prenorm",
            mlp_dim=32, out_dim=S, readout_dim=S, num_output_ffresiduals=1,
            qkv_dim=16, readout="resnet", is_ebm=False, log_prob="cat",
            # sequence transformer / mlp
            d_model=16, dim_feedforward=32, num_output_FFresiduals=1,
            temb_dim=8,
        )
    )
    cfg.loss = ml_collections.ConfigDict({"logit_type": "direct"})
    return cfg


EBM_NAMES = {"UniVarBinaryEBMEMA"}
SPECIAL_D = {
    "UniVarScoreNetEMA": 81,  # sudoku: 81 cells, S=9
    "UniVarProteinScoreNetEMA": D_SEQ,
    "UniProteinD3PM": D_SEQ,
}


@pytest.mark.parametrize("name", sorted(registry.models.names()))
def test_zoo_forward(name):
    cfg = mega_cfg(name)
    if name == "UniVarScoreNetEMA":
        cfg.data.S = 9
        cfg.data.shape = [81]
        cfg.model.concat_dim = 81
    if name in ("UniVarProteinScoreNetEMA", "UniProteinD3PM"):
        cfg.data.S = 21
    if name in EBM_NAMES:
        cfg.data.S = 2
        cfg.model.is_ebm = True
    model = create_model(cfg)
    D = cfg.model.concat_dim
    B = 2
    x = jnp.zeros((B, D), jnp.int32)
    t = jnp.full((B,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    if name in EBM_NAMES:
        assert out.shape == (B,)
    else:
        assert out.shape == (B, D, cfg.data.S), f"{name}: {out.shape}"
    assert np.isfinite(np.asarray(out)).all()
    if model.process is not None:
        qt0 = model.transition(t)
        assert qt0.shape == (B, cfg.data.S, cfg.data.S)
