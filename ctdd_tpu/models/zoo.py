"""The registered model zoo: network wrapper × forward process combos.

Counterpart of reference lib/models/models.py:832-1083 (the ~25 registered
EMA × wrapper × process classes). Here each entry is `(net builder, process
name)`; EMA is uniform (TrainState.ema_params whenever cfg.model.ema_decay is
set), so the reference's EMA/non-EMA class split collapses. Registered names
match the reference registry so its configs resolve unchanged.

Wrapper families (reference class -> builder here):
- ResidualMLP        models.py:458-492
- SequenceTransformer models.py:403-455
- ImageX0PredBasePaul models.py:192-299 (unet.UNet)
- ImageX0PredBase     models.py:302-400 (tau_networks.UNet, logistic head)
- HollowTransformer(, Logistics) models.py:495-614
- MaskedModel / BertMLPRes       models.py:617-658
- SudokuScoreNet / ProteinScoreNet models.py:661-704
- BinaryEBM          models.py:707-726
- UViTModel / DiTModel models.py:77-189
"""

from __future__ import annotations

from ctdd_tpu import registry
from ctdd_tpu.models.base import DiffusionModel, compose


def _with_rate(cfg, rate_name: str):
    """Bind the process name into the config (the reference encodes it in the
    class; we keep cfg.model.rate_name as the explicit switch)."""
    if "rate_name" not in cfg.model:
        with cfg.unlocked():
            cfg.model.rate_name = rate_name
    return cfg


def _residual_mlp(cfg):
    from ctdd_tpu.networks.mlp import ResidualMLP

    D = cfg.data.shape[0]
    return ResidualMLP(
        D=D,
        S=cfg.data.S,
        num_layers=cfg.model.num_layers,
        d_model=cfg.model.d_model,
        hidden_dim=cfg.model.hidden_dim,
        time_scale_factor=cfg.model.time_scale_factor,
        temb_dim=cfg.model.temb_dim,
    )


def _sequence_transformer(cfg):
    from ctdd_tpu.networks.transformer import SequenceTransformer

    return SequenceTransformer(
        S=cfg.data.S,
        num_layers=cfg.model.num_layers,
        d_model=cfg.model.d_model,
        num_heads=cfg.model.num_heads,
        dim_feedforward=cfg.model.dim_feedforward,
        dropout=cfg.model.dropout,
        num_output_FFresiduals=cfg.model.num_output_FFresiduals,
        time_scale_factor=cfg.model.time_scale_factor,
        temb_dim=cfg.model.temb_dim,
        use_one_hot_input=cfg.model.use_one_hot_input,
        use_cat=cfg.model.get("use_cat", True),
        max_len=cfg.data.shape[0],
        scale_input_embedding=cfg.model.get("scale_input_embedding", False),
        qk_norm=cfg.model.get("qk_norm", False),
        aux_key_classes=cfg.model.get("aux_key_classes", 0),
    )


def _unet_paul(cfg):
    from ctdd_tpu.networks.unet import UNetWrapper

    return UNetWrapper(cfg=_freeze(cfg))


def _tau_unet(cfg):
    from ctdd_tpu.networks.tau_unet import TauUNetWrapper

    return TauUNetWrapper(cfg=_freeze(cfg))


def _hollow(cfg, readout_dim=None):
    from ctdd_tpu.networks.hollow import HollowTransformerWrapper

    return HollowTransformerWrapper(cfg=_freeze(cfg), readout_dim=readout_dim)


def _hollow_logistics(cfg):
    from ctdd_tpu.networks.hollow import HollowLogisticsWrapper

    return HollowLogisticsWrapper(cfg=_freeze(cfg))


def _masked(cfg):
    from ctdd_tpu.networks.hollow import EnumerativeTransformerWrapper

    return EnumerativeTransformerWrapper(cfg=_freeze(cfg))


def _bert_enum(cfg):
    from ctdd_tpu.networks.hollow import BertEnumTransformerWrapper

    return BertEnumTransformerWrapper(cfg=_freeze(cfg))


def _sudoku(cfg):
    from ctdd_tpu.networks.ddsm import SudokuScoreNetWrapper

    return SudokuScoreNetWrapper(cfg=_freeze(cfg))


def _protein(cfg):
    from ctdd_tpu.networks.ddsm import ProteinScoreNetWrapper

    return ProteinScoreNetWrapper(cfg=_freeze(cfg))


def _binary_ebm(cfg):
    from ctdd_tpu.networks.ebm import BinaryTransformerScoreFunc

    return BinaryTransformerScoreFunc(cfg=_freeze(cfg))


def _uvit(cfg):
    from ctdd_tpu.networks.uvit import UViTWrapper

    return UViTWrapper(cfg=_freeze(cfg))


def _dit(cfg):
    from ctdd_tpu.networks.dit import DiTWrapper

    return DiTWrapper(cfg=_freeze(cfg))


def _freeze(cfg):
    """ConfigDicts are unhashable; flax modules need hashable attrs."""
    from ctdd_tpu.config.base import FrozenCfg

    return FrozenCfg(cfg)


_ZOO = {
    # name                                   (net builder,          process)
    "GaussianUViTEMA":                        (_uvit, "GaussianTargetRate"),
    "GaussianDiTEMA":                         (_dit, "GaussianTargetRate"),
    "UniformRateImageX0PredEMA":              (_unet_paul, "UniformRate"),
    "UniVarHollowEMA":                        (_hollow, "UniformVariantRate"),
    "UniVarHollowEMALogistics":               (_hollow_logistics, "UniformVariantRate"),
    "UniformMaskedEMA":                       (_masked, "UniformRate"),
    "UniVarMaskedEMA":                        (_masked, "UniformVariantRate"),
    "UniformHollowEMA":                       (_hollow, "UniformRate"),
    "UniVarScoreNetEMA":                      (_sudoku, "UniformVariantRate"),
    "UniVarProteinScoreNetEMA":               (_protein, "UniformVariantRate"),
    "UniProteinD3PM":                         (_protein, None),
    "GaussianTargetRateImageX0PredEMAPaul":   (_unet_paul, "GaussianTargetRate"),
    "GaussianHollowEMA":                      (_hollow, "GaussianTargetRate"),
    "GaussianTargetRateImageX0PredEMA":       (_tau_unet, "GaussianTargetRate"),
    "UniformRateUnetEMA":                     (_unet_paul, "UniformRate"),
    "UniVarUnetEMA":                          (_unet_paul, "UniformVariantRate"),
    "UniformRateSequenceTransformerEMA":      (_sequence_transformer, "UniformRate"),
    "BirthDeathRateSequenceTransformerEMA":   (_sequence_transformer, "BirthDeathForwardBase"),
    "GaussianRateResidualMLP":                (_residual_mlp, "GaussianTargetRate"),
    "UniformRateResMLP":                      (_residual_mlp, "UniformRate"),
    "UniVarBertEMA":                          (_bert_enum, "UniformVariantRate"),
    "UniBertD3PM":                            (_bert_enum, None),
    "UniformBertEMA":                         (_bert_enum, "UniformRate"),
    "UniVarBinaryEBMEMA":                     (_binary_ebm, "UniformVariantRate"),
    "UniformBDTEMA":                          (_hollow, "UniformRate"),
}


# label-conditional networks: only DiT carries a LabelEmbedder in the
# reference zoo (dit.py:240; the other wrappers accept y and ignore it)
_LABEL_MODELS = frozenset({"GaussianDiTEMA"})


def _make_builder(name, net_builder, process_name):
    def build(cfg) -> DiffusionModel:
        has_label = name in _LABEL_MODELS
        if process_name is not None:
            cfg = _with_rate(cfg, process_name)
            return compose(cfg, net_builder(cfg), has_label=has_label)
        # D3PM models carry no CTMC process
        return DiffusionModel(
            module=net_builder(cfg), process=None, cfg=cfg, has_label=has_label
        )

    build.__name__ = name
    return build


for _name, (_net, _proc) in _ZOO.items():
    registry.models.register(_make_builder(_name, _net, _proc), name=_name)
