"""ctdd_tpu — TPU-native continuous-time discrete-state diffusion framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
paulffm/Continuous-Time-Diffusion-Models-for-Discrete-Data (TAUnSDDM):
CTMC forward processes, tauLDR / SDDM losses, device-resident samplers
(tau-leaping, Euler/LBJF, midpoint, predictor-corrector, exact), a D3PM
discrete-time baseline, score-network zoo, dataset pipelines and metrics —
built for TPU meshes (pjit / shard_map data parallelism, lax.scan samplers,
bfloat16 matmuls, Pallas kernels for the hot reverse-rate math).
"""

__version__ = "0.1.0"
