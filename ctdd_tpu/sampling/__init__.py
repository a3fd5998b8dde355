from ctdd_tpu.sampling.samplers import (  # noqa: F401
    ConditionalPCTauLeaping,
    ConditionalTauLeaping,
    ExactSampling,
    LBJF,
    MidPointTauL,
    PCTauL,
    TauL,
    get_initial_samples,
    get_sampler,
    reverse_rates,
)
