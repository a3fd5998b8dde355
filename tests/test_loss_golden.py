"""Golden-value test: CTElbo arithmetic vs an independent dense numpy
transcription of the reference formulas (losses.py:106-286), with injected
(x_t, x̃) so randomness is out of the picture (SURVEY.md §4b)."""

import jax
import jax.numpy as jnp
import numpy as np

from ctdd_tpu.config.presets import get_preset
from ctdd_tpu.losses import losses as L
from ctdd_tpu.models.base import create_model


def numpy_ctelbo(qt0, rate, x0, x_t, x_tilde, logits, eps):
    """Literal per-element transcription of reference losses.py:106-286."""
    B, D = x0.shape
    S = qt0.shape[-1]
    p0t = np.exp(logits - logits.max(-1, keepdims=True))
    p0t = p0t / p0t.sum(-1, keepdims=True)
    reg_x = x_tilde

    # regularizer term
    reg_term = np.zeros(B)
    for b in range(B):
        for d in range(D):
            qt0_denom = qt0[b, :, reg_x[b, d]] + eps  # over x0 states
            mask_rate = rate[b, :, reg_x[b, d]].copy()
            # mask_reg zeroes target state reg_x[b,d]
            reg_tmp = np.zeros(S)
            for k in range(S):
                acc = 0.0
                for s in range(S):
                    m = 0.0 if s == reg_x[b, d] else 1.0
                    acc += m * rate[b, s, reg_x[b, d]] * qt0[b, k, s]
                reg_tmp[k] = acc
            reg_term[b] += np.sum(p0t[b, d] / qt0_denom * reg_tmp)

    # signal term
    outer_sum = np.zeros(B)
    sig_norm = np.zeros(B)
    rate_row_sums = -np.array([np.diag(rate[b]) for b in range(B)])  # (B, S)
    base_Z_tmp = np.array(
        [[rate_row_sums[b, x_tilde[b, d]] for d in range(D)] for b in range(B)]
    )
    base_Z = base_Z_tmp.sum(1)
    for b in range(B):
        for d in range(D):
            qt0_denom_sig = qt0[b, :, x_tilde[b, d]] + eps
            inner = np.log(
                (p0t[b, d] / qt0_denom_sig) @ qt0[b] + eps
            )  # (S,)
            denom = qt0[b, x0[b, d], x_tilde[b, d]] + eps
            for s in range(S):
                if s == x_tilde[b, d]:
                    continue
                r = rate[b, s, x_tilde[b, d]]
                numer = qt0[b, x0[b, d], s]
                outer_sum[b] += r * (numer / denom) * inner[s]
                Z = base_Z[b] - base_Z_tmp[b, d] + rate_row_sums[b, s]
                sig_norm[b] += r * numer / (Z * denom)

    sig_mean = np.mean(-outer_sum / sig_norm)
    reg_mean = np.mean(reg_term)
    return sig_mean + reg_mean


def test_ctelbo_matches_dense_numpy():
    cfg = get_preset("mlp_synthetic")
    cfg.data.shape = [5]
    cfg.model.concat_dim = 5
    cfg.model.d_model = 8
    cfg.model.hidden_dim = 16
    cfg.model.num_layers = 1
    cfg.model.temb_dim = 4
    cfg.data.S = 3
    cfg.model.rate_const = 1.3
    model = create_model(cfg)

    B, D, S = 3, 5, 3
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((B, D), jnp.int32)
    ts = jnp.array([0.3, 0.55, 0.8])
    params = model.init(key, x, ts)

    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randint(0, S, (B, D)))
    x_t = jnp.asarray(rng.randint(0, S, (B, D)))
    x_tilde = x_t.at[jnp.arange(B), jnp.asarray(rng.randint(0, D, B))].set(
        jnp.asarray(rng.randint(0, S, (B,)))
    )

    eps = 1e-9
    neg_elbo, x_logits = L._ctelbo_terms(
        model, params, jax.random.PRNGKey(2), x0, ts, eps,
        one_forward_pass=True, train=False, rngs=None,
        samples=(x_t, x_tilde),
    )

    qt0 = np.asarray(model.transition(ts), np.float64)
    rate = np.asarray(model.rate(ts), np.float64)
    logits_np = np.asarray(x_logits, np.float64)
    want = numpy_ctelbo(
        qt0, rate, np.asarray(x0), np.asarray(x_t), np.asarray(x_tilde),
        logits_np, eps,
    )
    np.testing.assert_allclose(float(neg_elbo), want, rtol=2e-4)


def test_sample_xt_statistics():
    """x_t ~ q_{t|0}: empirical marginals match the transition rows."""
    from ctdd_tpu.ops.forward_process import make_uniform

    proc = make_uniform(3, rate_const=1.0)
    B, D = 1, 4000
    x0 = jnp.zeros((B, D), jnp.int32)
    ts = jnp.array([0.5])
    qt0 = proc.transition(ts)
    x_t = L.sample_xt(jax.random.PRNGKey(0), qt0, x0)
    emp = np.bincount(np.asarray(x_t).ravel(), minlength=3) / D
    np.testing.assert_allclose(emp, np.asarray(qt0[0, 0]), atol=0.03)


def test_sample_xtilde_one_dim_changed():
    from ctdd_tpu.ops.forward_process import make_uniform

    proc = make_uniform(4, rate_const=1.0)
    B, D = 8, 10
    x0 = jnp.zeros((B, D), jnp.int32)
    ts = jnp.full((B,), 0.5)
    qt0 = proc.transition(ts)
    rate = proc.rate(ts)
    x_t, x_tilde = L.sample_xt_xtilde(jax.random.PRNGKey(0), qt0, rate, x0)
    diffs = np.sum(np.asarray(x_t) != np.asarray(x_tilde), axis=1)
    assert (diffs == 1).all()  # exactly one dimension flipped (losses.py:61-101)
