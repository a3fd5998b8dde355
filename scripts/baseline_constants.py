"""Reference (PyTorch-CPU) throughput measured on this machine.

Produced by scripts/measure_torch_baseline.py, which runs the ACTUAL
reference code (/root/reference, read-only) on torch-CPU with the flagship
MNIST config (GaussianTargetRateImageX0PredEMAPaul, S=256, D=784):

- TauL sampler, N=16, per-step 1.309s -> 1000-step protocol 1310.6s
- CTElbo train step, B=64: 32.49 s/step

Host: 1 vCPU (this box). Measured 2026-08-16.
"""

TORCH_CPU_SAMPLES_PER_SEC = 0.01221
TORCH_CPU_TRAIN_STEPS_PER_SEC = 0.03078
