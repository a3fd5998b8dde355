"""Lakh pianoroll + SequenceTransformer + CondNLL + ConditionalTauLeaping.

The reference carries the full conditional stack — LakhPianoroll dataset
(mnist.py:90-103), CondCTElbo (losses.py:547-781), conditional samplers
(sampling.py:649-905) and the ConditionalDenoisingNoteSeq logger
(loggers.py:62-113) — but ships no config for it (the tauLDR-era piano
experiments). This preset wires those pieces so the conditional path is
user-reachable end-to-end.

Defaults carry the round-5 MEASURED-WORKING recipe (see get_config
comments): unconditional NLLOriginal training at lr 5e-5 + clean-clamp
conditional decode — the first configuration whose decode demonstrably
follows the prefix (scale_consistency 0.92 vs 0.60 chance). The history of
the three-round collapse hunt that led here is in docs/DESIGN_NOTES.md
("Conditional ELBO: the all-rest collapse" -> "Round 5: two-attractor
training dynamic"). Earlier deviations kept for context:

- ``loss.name = "CondNLL"`` (rounds 3-4 default, now a ``--set`` path): at
  the stand-in's SNR the CondCTElbo objective is indifferent between a
  collapsed marginal predictor and a real denoiser, and CondNLL's
  suffix-CE — while input-sensitive early — collapses the same way under
  lr 2e-4. Both stay registered for parity.
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
    # ROUND-5 RESOLUTION: the working conditional recipe is tauLDR's piano
    # protocol — train UNconditionally on full sequences (NLLOriginal) at
    # lr 5e-5, clamp the clean prefix only at decode. At the reference-
    # parity lr 2e-4 training finds the input-reading solution around 7k
    # iters and then catastrophically abandons it for the input-free
    # marginal attractor by ~16-30k (bitwise prefix-invariant logits; the
    # three-round "all-REST collapse"). At 5e-5 the collapse never happens:
    # 20k iters -> suffix CE 0.65 vs the 3.79 input-free floor, and the
    # full 1000-step clamped decode (EMA, n=256) scores cond_mmd 4e-4
    # (collapsed: 0.369), scale_consistency 0.92 (GT 0.93, chance 0.60),
    # rest_frac 0.09 (GT 0.10) — docs/assets/round5/cond_demo_matrix.jsonl,
    # DESIGN_NOTES "Round 5". Parity escapes: ``--set loss.name=CondNLL``
    # (or CondCTElbo) for the reference's conditional losses,
    # ``optimizer.lr=2e-4`` for the reference schedule.
    # aux_key_weight > 0 (with model.aux_key_classes=12) turns on the
    # auxiliary suffix-position key-readout CE — the round-4 attack on the
    # decode collapse (see CondNLL docstring); moot after the lr cure.
    loss_section(
        config, name="NLLOriginal", nll_weight=0.001, min_time=0.01,
        condition_dim=32, aux_key_weight=0.0,
    )
    training_section(config, n_iters=20000, grad_norm=1.0, max_t=0.99999)
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
    adam(config, 5e-5)  # round-5 cure; 2e-4 = reference parity (collapses)
    saving_section(config)
    # clean-clamp ConditionalTauLeaping measured best for key-following
    # (sc 0.918 vs noised-prefix 0.70 at identical cond_mmd); LBJF ties.
    sampler_section(config, name="ConditionalTauLeaping", num_steps=1000)
    config.sampler.condition_dim = 32
    config.sampler.reject_multiple_jumps = True
    return config
