"""poisson_inversion vs jax.random.poisson: distributional equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from ctdd_tpu.sampling.samplers import poisson_inversion


def test_poisson_inversion_moments():
    key = jax.random.PRNGKey(0)
    for lam in (0.01, 0.1, 0.5, 1.5, 3.0):
        lam_arr = jnp.full((200_000,), lam)
        n = np.asarray(poisson_inversion(key, lam_arr))
        np.testing.assert_allclose(n.mean(), lam, rtol=0.03)
        np.testing.assert_allclose(n.var(), lam, rtol=0.06)


def test_poisson_inversion_pmf_small_lambda():
    lam = 0.3
    key = jax.random.PRNGKey(1)
    n = np.asarray(poisson_inversion(key, jnp.full((300_000,), lam)))
    from scipy.stats import poisson as sp_poisson

    for k in range(4):
        emp = np.mean(n == k)
        np.testing.assert_allclose(emp, sp_poisson.pmf(k, lam), atol=3e-3)


def test_poisson_inversion_saturates():
    # huge lambda saturates at max_k instead of diverging
    n = poisson_inversion(jax.random.PRNGKey(2), jnp.full((100,), 50.0), max_k=12)
    assert int(n.max()) == 12
