"""Tests for indexing gathers, logprob conversions, logistic head, embeddings."""

import jax
import jax.numpy as jnp
import numpy as np

from ctdd_tpu.ops import forward_process as fp
from ctdd_tpu.ops import indexing, logistic, timestep
from ctdd_tpu.ops.logprob import logprob_with_logits
from ctdd_tpu.utils import math as umath


def _rand_mat(key, B, S):
    return jax.random.uniform(key, (B, S, S)) + 0.1


def test_indexing_rows_cols_elems():
    key = jax.random.PRNGKey(0)
    B, D, S = 3, 4, 5
    mat = _rand_mat(key, B, S)
    idx = jax.random.randint(jax.random.PRNGKey(1), (B, D), 0, S)
    cidx = jax.random.randint(jax.random.PRNGKey(2), (B, D), 0, S)
    m = np.asarray(mat)
    i = np.asarray(idx)
    c = np.asarray(cidx)
    rows = np.asarray(indexing.rows(mat, idx))
    cols = np.asarray(indexing.cols(mat, idx))
    el = np.asarray(indexing.elems(mat, idx, cidx))
    for b in range(B):
        for d in range(D):
            np.testing.assert_allclose(rows[b, d], m[b, i[b, d], :])
            np.testing.assert_allclose(cols[b, d], m[b, :, i[b, d]])
            np.testing.assert_allclose(el[b, d], m[b, i[b, d], c[b, d]])
    dg = np.asarray(indexing.diag(mat))
    for b in range(B):
        np.testing.assert_allclose(dg[b], np.diagonal(m[b]))


def test_zero_at_and_onehot_mask():
    x = jnp.ones((2, 3, 4))
    idx = jnp.array([[0, 1, 2], [3, 3, 0]])
    z = np.asarray(indexing.zero_at(x, idx))
    assert z[0, 0, 0] == 0 and z[0, 0, 1] == 1
    assert z[1, 0, 3] == 0 and z[1, 2, 0] == 0
    m = np.asarray(indexing.onehot_mask(idx, 4))
    np.testing.assert_allclose(m, z)


def test_log1mexp():
    x = jnp.array([0.1, 1.0, 5.0, 20.0])
    got = np.asarray(umath.log1mexp(-x))  # accepts negative log-probs
    want = np.log(1 - np.exp(-np.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


def test_logprob_direct_vs_reverse_consistency():
    B, D, S = 2, 3, 4
    proc = fp.make_uniform(S, rate_const=1.0)
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (B, D, S))
    xt = jax.random.randint(jax.random.PRNGKey(1), (B, D), 0, S)
    t = jnp.array([0.5, 0.7])

    ll_direct, ll_xt = logprob_with_logits("direct", proc, xt, t, logits)
    np.testing.assert_allclose(
        np.asarray(ll_direct),
        np.asarray(jax.nn.log_softmax(logits, axis=-1)),
        atol=1e-6,
    )
    # reverse_prob and reverse_logscale agree with each other
    ll_rp, _ = logprob_with_logits("reverse_prob", proc, xt, t, logits)
    ll_rl, _ = logprob_with_logits("reverse_logscale", proc, xt, t, logits)
    np.testing.assert_allclose(np.asarray(ll_rp), np.asarray(ll_rl), atol=1e-4)
    # gather correctness
    for b in range(B):
        for d in range(D):
            np.testing.assert_allclose(
                np.asarray(ll_xt)[b, d],
                np.asarray(ll_direct)[b, d, int(xt[b, d])],
                atol=1e-6,
            )


def test_logistic_bins_sum_to_one():
    S = 16
    mu = jnp.array([[0.0, 0.3], [-0.5, 0.9]])
    log_scale = jnp.zeros((2, 2))
    logits = logistic.logistic_bin_logits(mu, log_scale, S, fix_logistic=False)
    assert logits.shape == (2, 2, S)
    # bin probabilities should be close to a proper distribution over [-1,1]
    probs = np.exp(np.asarray(logits))
    assert (probs.sum(-1) < 1.05).all() and (probs.sum(-1) > 0.5).all()
    # mass concentrates near mu
    center_bin = probs[0, 0].argmax()
    assert abs(center_bin - S // 2) <= 1


def test_logistic_fix_variant_monotone():
    S = 8
    mu = jnp.zeros((1,))
    ls = jnp.zeros((1,))
    l1 = logistic.logistic_bin_logits(mu, ls, S, fix_logistic=False)
    l2 = logistic.logistic_bin_logits(mu, ls, S, fix_logistic=True)
    assert (np.asarray(l2) <= np.asarray(l1) + 1e-6).all()


def test_timestep_embedding_shape_and_values():
    t = jnp.array([0.0, 1.0, 10.0])
    emb = timestep.timestep_embedding(t, 8)
    assert emb.shape == (3, 8)
    np.testing.assert_allclose(np.asarray(emb[0, :4]), 0.0, atol=1e-6)  # sin(0)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), 1.0, atol=1e-6)  # cos(0)


def test_center_data():
    x = jnp.array([0, 255])
    got = np.asarray(timestep.center_data(x, (0, 255)))
    np.testing.assert_allclose(got, [-1.0, 1.0], atol=1e-6)
