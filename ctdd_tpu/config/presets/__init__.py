"""Experiment presets mirroring the reference's 27 config modules.

Reference layout: config/<dataset>_config/config_<net>_<dataset>.py, each a
`get_config()` returning an ml_collections.ConfigDict (README.md:95-155
documents the sections). Here each preset is a module with `get_config()`;
`get_preset(name)` resolves by module name.
"""

from __future__ import annotations

import importlib

_PRESETS = {
    # mnist
    "tauUnet_mnist": "ctdd_tpu.config.presets.mnist_tau_unet",
    "tauUnet_mnist_ll": "ctdd_tpu.config.presets.mnist_tau_unet_ll",
    "hollow_mnist": "ctdd_tpu.config.presets.mnist_hollow",
    "holvisual_mnist": "ctdd_tpu.config.presets.mnist_hollow_crm",
    "bert_mnist": "ctdd_tpu.config.presets.mnist_bert",
    "dit_mnist": "ctdd_tpu.config.presets.mnist_dit",
    "uvit_mnist": "ctdd_tpu.config.presets.mnist_uvit",
    "mnist_d3pm": "ctdd_tpu.config.presets.mnist_d3pm",
    # cifar10
    "tauUnet_cifar10": "ctdd_tpu.config.presets.cifar10_tau_unet",
    "uvit_cifar10": "ctdd_tpu.config.presets.cifar10_uvit",
    # synthetic
    "hollow_synthetic": "ctdd_tpu.config.presets.synthetic_hollow",
    "hollow_synthetic_rmdirect": "ctdd_tpu.config.presets.synthetic_hollow_rmdirect",
    "bert_synthetic": "ctdd_tpu.config.presets.synthetic_bert",
    "masked_synthetic": "ctdd_tpu.config.presets.synthetic_masked",
    "ebm_synthetic": "ctdd_tpu.config.presets.synthetic_ebm",
    "synthetic_d3pm": "ctdd_tpu.config.presets.synthetic_d3pm",
    "mlp_synthetic": "ctdd_tpu.config.presets.synthetic_mlp",
    # maze
    "hollow_maze": "ctdd_tpu.config.presets.maze_hollow",
    "tauUnet_maze": "ctdd_tpu.config.presets.maze_tau_unet",
    "bert_maze": "ctdd_tpu.config.presets.maze_bert",
    "protein_maze": "ctdd_tpu.config.presets.maze_protein",
    "protein_maze_d3pm": "ctdd_tpu.config.presets.maze_protein_d3pm",
    "bert_mazemasked": "ctdd_tpu.config.presets.maze_bert_masked",
    "hollow_maze_distr": "ctdd_tpu.config.presets.maze_hollow_distr",
    # sudoku / protein
    "sudoku": "ctdd_tpu.config.presets.sudoku",
    "pianoroll_cond": "ctdd_tpu.config.presets.pianoroll_conditional",
    "hollow_protein": "ctdd_tpu.config.presets.protein_hollow",
    "bin_mnist_hollow": "ctdd_tpu.config.presets.bin_mnist_hollow",
}


def preset_names():
    return sorted(_PRESETS)


def get_preset(name: str):
    if name not in _PRESETS:
        raise KeyError(f"no preset {name!r}; known: {preset_names()}")
    mod = importlib.import_module(_PRESETS[name])
    return mod.get_config()
