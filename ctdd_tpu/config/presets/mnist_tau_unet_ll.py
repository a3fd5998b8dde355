"""MNIST + UNet + GaussianTargetRate + L_ll (NLLOriginal) + MidPointTauL.

The reference's WINNING recipe: "tauLDR + L_ll + Midpoint Tau-Leaping" is
rank-1 (FID 1.75) in the reference README results table (README.md:163-167).
The reference ships no dedicated config file for it — the notebooks flip
loss/sampler on top of config_tauUnet_mnist.py:25-86 — so this preset is the
flagship config with loss.name=NLLOriginal (losses.py:1048-1103, plain CE of
p0t) and sampler.name=MidPointTauL (sampling_utils.py midpoint scheme).
"""

from ctdd_tpu.config.presets.mnist_tau_unet import get_config as _flagship


def get_config():
    config = _flagship()
    config.experiment_name = "mnist_ll"
    config.save_location = "runs/mnist_ll"
    config.loss.name = "NLLOriginal"
    config.sampler.name = "MidPointTauL"
    # MidPointTauL in the reference is run without correctors (it has no
    # corrector branch in sampling_utils.py); keep the knobs but default off.
    config.sampler.num_corrector_steps = 0
    config.saving.sample_plot_path = "runs/mnist_ll/pngs"
    return config
