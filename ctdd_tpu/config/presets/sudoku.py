"""Sudoku + DDSM score net + L_ll (NLLOriginal) + LBJF
(net/process/schedule from ref config/sudoku_config/config_sudoku_unet.py).

Shape note: the reference wires concat_dim = 81·9 against a (B, 81, 9) net
output, which its losses cannot consume (SURVEY.md §2.2 caveat); the coherent
form used here is 81 cells × 9 states.

Two defaults deviate from the reference config, both measured (README
"sudoku: the objective was the ceiling"): the reference's CTElbo recipe
plateaus at 23.8% fully-valid boards over a full 400k fresh-stream schedule,
while the CE-primary L_ll objective — the reference's own winning MNIST
recipe (ref README.md:163) — reaches 99.2% at 50k iters on the identical
net/process/data. LBJF decode beats the reference's TauL decode everywhere
we measured (docs/assets/round3/sudoku_decode_sweep.jsonl). CTElbo + TauL
stay one ``--set loss.name=CTElbo sampler.name=TauL`` away for bit-parity.

One known t-range deviation: NLLOriginal here samples t in
[min_time, training.max_t] = [0.001, 0.99], while the reference's
NLLOriginal samples t in [min_time, 1.0] (ref losses.py:1047); pass
``--set training.max_t=1.0`` for exact parity.
"""

import ml_collections

from ctdd_tpu.config.presets._base import (
    adam, base_config, loss_section, sampler_section, saving_section,
    training_section,
)


def get_config():
    config = base_config("sudoku")
    # nll_weight is dead under NLLOriginal (losses.py NLLOriginal never reads
    # it); kept at the round-3 value only so --auto-resume's config-equality
    # check still matches the committed sudoku_nll runs.
    loss_section(config, name="NLLOriginal", nll_weight=0.001, min_time=0.001)
    training_section(config, n_iters=50000, grad_norm=2.0, max_t=0.99)
    config.data = ml_collections.ConfigDict(
        dict(
            name="SudokuDataset", train=True, download=False, S=9,
            batch_size=128, shuffle=True, shape=[81], num_samples=12800,
            # fresh-data stream (ref SudokuDataset generates a new board per
            # __getitem__, sudoku.py:108-119): pool regenerated every 4
            # epochs on a background thread — the C++ generator produces the
            # 12.8k pool in ~2.6s vs ~1.3s/epoch, so period 4 lets prefetch
            # fully overlap training
            seed=0, stream_fresh=True, stream_refresh_period=4,
        )
    )
    config.model = ml_collections.ConfigDict(
        dict(
            name="UniVarScoreNetEMA", padding=False, ema_decay=0.9999,
            embed_dim=256, rate_const=0.35, t_func="sqrt_cos", Q_sigma=512.0,
            concat_dim=81, time_scale_factor=1000, log_prob="cat",
        )
    )
    adam(config, 1.5e-4)
    saving_section(config)
    sampler_section(config, name="LBJF", num_steps=1000, is_ordinal=True)
    return config
