"""Lakh pianoroll + SequenceTransformer + CondNLL + ConditionalTauLeaping.

The reference carries the full conditional stack — LakhPianoroll dataset
(mnist.py:90-103), CondCTElbo (losses.py:547-781), conditional samplers
(sampling.py:649-905) and the ConditionalDenoisingNoteSeq logger
(loggers.py:62-113) — but ships no config for it (the tauLDR-era piano
experiments). This preset wires those pieces so the conditional path is
user-reachable end-to-end.

Two defaults deliberately deviate from a literal CondCTElbo transcription,
both measured on this box (docs/DESIGN_NOTES.md "Conditional ELBO: the
all-rest collapse"):

- ``loss.name = "CondNLL"``: at the stand-in's SNR the CondCTElbo objective
  is indifferent between a collapsed marginal predictor and a real denoiser
  (score gap ~4 vs per-batch std ~44), and every nll_weight in
  {1e-3..1e3} under grad clipping trains to all-REST suffixes. The pure
  suffix-CE objective trains an input-sensitive denoiser in <1k iters; its
  p0t is exactly what ConditionalTauLeaping consumes. CondCTElbo stays
  registered for parity (``--set loss.name=CondCTElbo``).
- ``model.scale_input_embedding = True``: the reference's PositionalEncoding
  port drops the tutorial's sqrt(d_model) embedding scale, leaving token
  embeddings ~11x below the PE at init — measured input sensitivity 0.0016
  decaying to 0 under training. The Vaswani scale restores it (0.39 by 3k
  iters). False = bit-parity with the reference net.
- ``model.qk_norm = True``: the round-3i layer probes (README "round 3i",
  docs/DESIGN_NOTES.md "QK-norm follow-up") show both trained checkpoints
  *attenuate* the prefix signal ~4-9 orders of magnitude through the stack —
  distributed per-layer damping, not a single saturated layer — and the old
  (qk_norm=False) net additionally reaches *bitwise* prefix-invariant suffix
  logits. QK LayerNorm keeps a nonzero prefix trickle alive through training
  but does NOT by itself fix the decode collapse; it stays the default
  because it removes the exact-zero failure mode at no measured cost.
  False = bit-parity with the reference net.

Checkpoint compatibility: ``qk_norm=True`` adds ``query_ln``/``key_ln``
LayerNorm parameters to every attention block, so checkpoints trained before
this default (round-3 runs under ``runs/pianoroll_cond/``) only restore with
``--set model.qk_norm=False``.
"""

import ml_collections

from ctdd_tpu.config.presets._base import (
    adam, base_config, loss_section, sampler_section, saving_section,
    training_section,
)


def get_config():
    config = base_config("pianoroll_cond")
    # aux_key_weight > 0 (with model.aux_key_classes=12) turns on the
    # auxiliary suffix-position key-readout CE — the round-4 attack on the
    # decode collapse (see CondNLL docstring). 0 = plain CondNLL.
    loss_section(
        config, name="CondNLL", nll_weight=0.001, min_time=0.01,
        condition_dim=32, aux_key_weight=0.0,
    )
    training_section(config, n_iters=300000, grad_norm=1.0, max_t=0.99999)
    config.data = ml_collections.ConfigDict(
        dict(
            name="LakhPianoroll", S=129, batch_size=64, shuffle=True,
            shape=[256], location="data/pianoroll/train.npy",
        )
    )
    config.model = ml_collections.ConfigDict(
        dict(
            name="UniformRateSequenceTransformerEMA", concat_dim=256,
            rate_const=0.03, Q_sigma=20.0, num_layers=6, d_model=128,
            num_heads=8, dim_feedforward=2048, dropout=0.1,
            num_output_FFresiduals=2, time_scale_factor=1000, temb_dim=128,
            use_one_hot_input=True, use_cat=True, ema_decay=0.9999,
            log_prob="cat", scale_input_embedding=True, qk_norm=True,
            aux_key_classes=0,
        )
    )
    adam(config, 2e-4)
    saving_section(config)
    sampler_section(config, name="ConditionalTauLeaping", num_steps=1000)
    config.sampler.condition_dim = 32
    config.sampler.reject_multiple_jumps = True
    return config
