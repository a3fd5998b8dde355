"""reverse_rates_shared == reverse_rates when t is constant over the batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctdd_tpu.models.base import DiffusionModel
from ctdd_tpu.ops.forward_process import make_uniform_variant
from ctdd_tpu.sampling.samplers import reverse_rates, reverse_rates_shared


class _Dummy:
    pass


@pytest.mark.parametrize(
    "rate_param,logit_type",
    [
        ("p0t", "direct"),
        ("ratio", "direct"),
        ("ratio", "reverse_prob"),
        ("ratio", "reverse_logscale"),
    ],
)
def test_shared_matches_batched(rate_param, logit_type):
    S, N, D = 5, 3, 7
    proc = make_uniform_variant(S, rate_const=1.3, t_func="log_sqr")
    model = DiffusionModel(module=None, process=proc, cfg=None)
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (N, D, S))
    x = jax.random.randint(jax.random.PRNGKey(1), (N, D), 0, S)
    t_scalar = 0.37
    t_ones = jnp.full((N,), t_scalar)

    want, _ = reverse_rates(
        model, None, logits, x, t_ones,
        rate_param=rate_param, logit_type=logit_type, eps=1e-9,
    )
    got = reverse_rates_shared(
        proc, logits, x, jnp.float32(t_scalar),
        rate_param=rate_param, logit_type=logit_type, eps=1e-9,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=1e-5)
