"""Golden tests for CTMC forward processes.

Strategy per SURVEY.md §4: pin transition/rate numerics against closed-form
small-S CTMCs and dense scipy expm, plus invariants (row sums, positivity,
semigroup property).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm

from ctdd_tpu.ops import forward_process as fp


def dense_transition(base_rate, integral):
    """Ground truth q = expm(R * ∫β) row-normalized + clamped like the impl."""
    q = expm(np.asarray(base_rate, np.float64) * integral)
    return q


@pytest.mark.parametrize("S", [2, 3, 8])
def test_uniform_transition_matches_expm(S):
    proc = fp.make_uniform(S, rate_const=1.3)
    t = jnp.array([0.05, 0.4, 1.0])
    got = np.asarray(proc.transition(t))
    for i, ti in enumerate(np.asarray(t)):
        want = dense_transition(proc.base_rate, float(ti))
        want[want < 1e-8] = 0.0  # impl clamps; uniform does not renormalize
        np.testing.assert_allclose(got[i], want, atol=2e-5)


def test_uniform_closed_form_S2():
    # For S=2 uniform rate c: q_00 = 0.5 + 0.5 exp(-2ct)
    c = 0.7
    proc = fp.make_uniform(2, rate_const=c)
    t = jnp.array([0.3])
    q = np.asarray(proc.transition(t))[0]
    expected = 0.5 + 0.5 * np.exp(-2 * c * 0.3)
    np.testing.assert_allclose(q[0, 0], expected, atol=1e-5)
    np.testing.assert_allclose(q[0, 1], 1 - expected, atol=1e-5)


def test_birth_death_rows_sum_to_one():
    proc = fp.make_birth_death(16, sigma_min=1.0, sigma_max=8.0)
    t = jnp.array([0.1, 0.5, 0.9])
    q = np.asarray(proc.transition(t))
    # renormalized before clamp; rows sum to 1 up to the clamp loss
    np.testing.assert_allclose(q.sum(-1), 1.0, atol=1e-4)
    assert (q >= 0).all()


def test_birth_death_matches_expm():
    proc = fp.make_birth_death(8, sigma_min=1.0, sigma_max=4.0)
    sig_min, sig_max = 1.0, 4.0
    t = 0.35
    integral = 0.5 * sig_min**2 * (sig_max / sig_min) ** (2 * t) - 0.5 * sig_min**2
    want = dense_transition(proc.base_rate, integral)
    want = want / want.sum(-1, keepdims=True)
    want[want < 1e-8] = 0.0
    got = np.asarray(proc.transition(jnp.array([t])))[0]
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("t_func", ["log_sqr", "sqrt_cos", "log"])
def test_uniform_variant_semigroup(t_func):
    proc = fp.make_uniform_variant(
        6, rate_const=1.0, t_func=t_func, time_base=3.0, time_exp=100.0
    )
    t1 = jnp.array([0.2])
    t2 = jnp.array([0.6])
    q1 = proc.transition(t1)
    q12 = proc.transit_between(t1, t2)
    q2 = proc.transition(t2)
    # q_{t2|0} = q_{t1|0} @ q_{t2|t1} (Chapman-Kolmogorov); clamp adds tiny error
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bij,bjk->bik", q1, q12)),
        np.asarray(q2),
        atol=3e-4,
    )


def test_uniform_variant_transition_at_zero_is_identity():
    # sqrt_cos has a nonzero antiderivative at t=0; transition(0) must be I
    proc = fp.make_uniform_variant(5, rate_const=1.0, t_func="sqrt_cos")
    q = np.asarray(proc.transition(jnp.array([0.0])))[0]
    np.testing.assert_allclose(q, np.eye(5), atol=1e-5)


def test_gaussian_base_rate_matches_reference_loops():
    """Vectorized banded builder == literal double-loop (forward_model.py:216-236)."""
    S, rate_sigma, Q_sigma = 12, 2.0, 20.0
    vals = np.exp(-np.arange(0, S) ** 2 / (rate_sigma**2))
    rate = np.zeros((S, S))
    for i in range(S):
        for j in range(S):
            if i < S // 2:
                if j > i and j < S - i:
                    rate[i, j] = vals[j - i - 1]
            elif i > S // 2:
                if j < i and j > -i + S - 1:
                    rate[i, j] = vals[i - j - 1]
    for i in range(S):
        for j in range(S):
            if rate[j, i] > 0.0:
                rate[i, j] = rate[j, i] * np.exp(
                    -((j + 1) ** 2 - (i + 1) ** 2 + S * (i + 1) - S * (j + 1))
                    / (2 * Q_sigma**2)
                )
    rate = rate - np.diag(np.diag(rate))
    rate = rate - np.diag(np.sum(rate, axis=1))
    got = fp.gaussian_target_base_rate(S, rate_sigma, Q_sigma)
    np.testing.assert_allclose(got, rate, atol=1e-12)


def test_gaussian_target_transition_stochastic():
    proc = fp.make_gaussian_target(
        16, rate_sigma=6.0, Q_sigma=32.0, time_base=3.0, time_exp=100.0
    )
    q = np.asarray(proc.transition(jnp.array([0.01, 0.5, 1.0])))
    assert (q >= 0).all()
    np.testing.assert_allclose(q.sum(-1), 1.0, atol=1e-3)


def test_rate_mat_gathers_rows():
    proc = fp.make_uniform(5, rate_const=2.0)
    t = jnp.array([0.1, 0.2])
    y = jnp.array([[0, 3], [4, 1]])
    r = proc.rate(t)
    rm = proc.rate_mat(y, t)
    np.testing.assert_allclose(np.asarray(rm[0, 1]), np.asarray(r[0, 3]))
    np.testing.assert_allclose(np.asarray(rm[1, 0]), np.asarray(r[1, 4]))


def test_transition_jit_and_grad_safe():
    proc = fp.make_uniform_variant(4, rate_const=1.0, t_func="log_sqr")

    @jax.jit
    def f(t):
        return proc.transition(t).sum()

    assert np.isfinite(float(f(jnp.array([0.5]))))


def test_gaussian_target_semigroup():
    """Chapman-Kolmogorov for the non-symmetric eig path (true inverse
    eigvecs; the reference's transit_between mistakenly uses eigvecsᵀ)."""
    proc = fp.make_gaussian_target(
        10, rate_sigma=3.0, Q_sigma=20.0, time_base=3.0, time_exp=100.0
    )
    t1 = jnp.array([0.15])
    t2 = jnp.array([0.45])
    q1 = proc.transition(t1)
    q12 = proc.transit_between(t1, t2)
    q2 = proc.transition(t2)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bij,bjk->bik", q1, q12)),
        np.asarray(q2),
        atol=5e-4,
    )


def test_gaussian_target_matches_expm():
    proc = fp.make_gaussian_target(
        8, rate_sigma=2.0, Q_sigma=20.0, time_base=3.0, time_exp=100.0
    )
    t = 0.3
    integral = 3.0 * (100.0**t) - 3.0
    want = dense_transition(proc.base_rate, integral)
    want = want / want.sum(-1, keepdims=True)
    want[want < 1e-8] = 0.0
    got = np.asarray(proc.transition(jnp.array([t])))[0]
    np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.parametrize(
    "maker,integral_of",
    [
        (lambda: fp.make_uniform(4, 1.5), lambda t: 1.5 * 0 + t * 1.5),
        (
            lambda: fp.make_uniform_variant(3, rate_const=2.0, t_func="log_sqr"),
            None,  # read the integral off the process schedule below
        ),
        (
            lambda: fp.make_uniform_variant(
                4, rate_const=1.0, t_func="log", time_base=3.0, time_exp=100.0
            ),
            None,
        ),
    ],
)
@pytest.mark.parametrize("t1,t2", [(0.005, 0.01), (0.05, 0.1), (0.001, 0.002)])
def test_transit_between_matches_expm_small_intervals(maker, integral_of, t1, t2):
    """q_{t2|t1} == expm(R_base · (∫β(t2) − ∫β(t1))) at SMALL times.

    The regime that matters for exact reverse sampling near t→0 (the
    round-3 ExactSampling bridge bug lived entirely below t=0.15); the
    semigroup test above only pins (0.2, 0.6).
    """
    proc = maker()
    d = float(
        fp._beta_integral(proc.schedule, proc.schedule_params, jnp.array(t2))
        - fp._beta_integral(proc.schedule, proc.schedule_params, jnp.array(t1))
    )
    want = expm(np.asarray(proc.base_rate, np.float64) * d)
    want = want / want.sum(-1, keepdims=True)
    want[want < proc.clamp] = 0.0
    got = np.asarray(
        proc.transit_between(jnp.array([t1]), jnp.array([t2]))
    )[0]
    np.testing.assert_allclose(got, want, atol=2e-5)
    # row-stochastic; diagonally dominant whenever the rate integral is
    # actually small (the "log" schedule with time_exp=100 has ∫β ≈ 1 even
    # over [0.05, 0.1] — there only the expm match above applies)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)
    if d < 0.05:
        assert np.all(np.diag(got) > 0.9)
