"""Training losses for continuous-time discrete diffusion.

TPU-native counterparts of reference lib/losses/losses.py (2057 LoC). Every
loss is a pure function of (model, params, key, batch): the reference's
gather-heavy `arange(B).repeat_interleave(...)` indexing becomes batched
take_along_axis gathers (ops/indexing.py) plus (B,D,S)x(B,S,S) einsums that
XLA tiles onto the MXU; the torch Categorical draws become jax.random calls
with threaded keys. Shapes and math follow the reference exactly:

- CTElbo          losses.py:11-287   (tauLDR continuous-time ELBO + CE)
- SDDMElbo        losses.py:290-544  (ELBO with hollow-net log-prob ratios)
- CondCTElbo      losses.py:547-781  (prefix-conditioned CTElbo)
- CondNLL         losses.py:547-781 corruption + :1503-1778 CE-only objective
- CatRM           losses.py:785-890  (categorical ratio matching rm/mle/elbo)
- EBMAux          losses.py:893-968  (all-mutation energy ratio matching)
- BinEBMAux       losses.py:971-1045 (binary EBM variant)
- NLLOriginal     losses.py:1048-1103 (plain CE of p0t)
- CatRMNLL        losses.py:1134-1242 (CatRM + CE)
- ScoreElbo       losses.py:1245-1500 (SDDMElbo + ratio-matching aux)
- NLL             losses.py:1503-1778 (CTElbo pipeline, returns only CE)
- CTElboLambda    losses.py:1782-2058 (iteration-annealed ELBO/CE mix)

All losses share a uniform signature — the reference's argument-order
inconsistency between loss families (SURVEY.md §7 "known quirks") is fixed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ctdd_tpu import registry
from ctdd_tpu.ops import indexing
from ctdd_tpu.ops.logprob import logprob_with_logits
from ctdd_tpu.utils.math import log1mexp, mean_cross_entropy, safe_log


def get_loss(cfg):
    return registry.losses.get(cfg.loss.name)(cfg)


def _flatten_batch(minibatch: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) -> (B, D); already-flat batches pass through."""
    if minibatch.ndim == 4:
        B = minibatch.shape[0]
        return minibatch.reshape(B, -1)
    return minibatch


def _sample_ts(key, B, min_time, max_t, clamp_hi: Optional[float] = None):
    ts = jax.random.uniform(key, (B,)) * (max_t - min_time) + min_time
    if clamp_hi is not None:
        ts = jnp.minimum(ts, clamp_hi)
    return ts


def sample_xt(key, qt0: jnp.ndarray, x0: jnp.ndarray) -> jnp.ndarray:
    """x_t ~ Cat(q_{t|0}(·|x0)) per dimension (ref losses.py:46-59)."""
    qt0_rows = indexing.rows(qt0, x0)  # (B, D, S)
    return jax.random.categorical(key, safe_log(qt0_rows), axis=-1)


def sample_xt_xtilde(
    key, qt0: jnp.ndarray, rate: jnp.ndarray, x0: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample (x_t, x̃): x_t from q_{t|0}, then one uniformized jump of x_t.

    x̃ differs from x_t in exactly one dimension, chosen ∝ off-diagonal rate
    mass, with the new state drawn ∝ off-diagonal rates (ref losses.py:44-101).
    """
    B, D = x0.shape
    k1, k2, k3 = jax.random.split(key, 3)
    x_t = sample_xt(k1, qt0, x0)

    rate_rows = indexing.rows(rate, x_t)  # (B, D, S)
    rate_rows = indexing.zero_at(rate_rows, x_t)  # zero diagonal
    dim_mass = jnp.sum(rate_rows, axis=-1)  # (B, D)
    square_dims = jax.random.categorical(k2, safe_log(dim_mass), axis=-1)  # (B,)
    newval_probs = jnp.take_along_axis(
        rate_rows, square_dims[:, None, None], axis=1
    )[:, 0, :]  # (B, S)
    newval = jax.random.categorical(k3, safe_log(newval_probs), axis=-1)  # (B,)

    dim_onehot = jnp.arange(D)[None, :] == square_dims[:, None]
    x_tilde = jnp.where(dim_onehot, newval[:, None], x_t)
    return x_t, x_tilde


# ---------------------------------------------------------------------------
# tauLDR CT-ELBO core (shared by CTElbo / NLL / CTElboLambda / CondCTElbo)
# ---------------------------------------------------------------------------


def _ctelbo_terms(model, params, key, x0, ts, eps, one_forward_pass, train, rngs,
                  samples=None):
    """neg_elbo (scalar) and the training-pass logits (ref losses.py:106-282).

    `samples` optionally injects (x_t, x_tilde) — used by the golden tests to
    pin the deterministic ELBO arithmetic against an independent dense
    implementation (SURVEY.md §4b).
    """
    B, D = x0.shape
    qt0 = model.transition(ts)  # (B, S, S)
    rate = model.rate(ts)  # (B, S, S)
    S = qt0.shape[-1]

    if samples is None:
        k_sample, k_net = jax.random.split(key)
        x_t, x_tilde = sample_xt_xtilde(k_sample, qt0, rate, x0)
    else:
        x_t, x_tilde = samples

    # -- regularizer term (losses.py:106-153) -------------------------------
    if one_forward_pass:
        x_logits = model.apply(params, x_t, ts, train=train, rngs=rngs)
        p0t_reg = jax.nn.softmax(x_logits, axis=-1)
        reg_x = x_tilde
    else:
        x_logits = model.apply(params, x_t, ts, train=train, rngs=rngs)
        p0t_reg = jax.nn.softmax(x_logits, axis=-1)
        reg_x = x_t

    mask_reg = indexing.onehot_mask(reg_x, S)  # (B, D, S)
    qt0_denom_reg = indexing.cols(qt0, reg_x) + eps  # q_{t|0}(x̃ | ·) columns
    rate_vals_reg = indexing.cols(rate, reg_x)
    # (mask·R(·,x̃)) @ q_{t|0}ᵀ  (losses.py:148-150)
    reg_tmp = jnp.einsum(
        "bds,bks->bdk", mask_reg * rate_vals_reg, qt0,
        preferred_element_type=jnp.float32,
    )
    reg_term = jnp.sum((p0t_reg / qt0_denom_reg) * reg_tmp, axis=(1, 2))  # (B,)

    # -- signal term (losses.py:155-278) -------------------------------------
    if one_forward_pass:
        p0t_sig = p0t_reg
    else:
        sig_logits = model.apply(params, x_tilde, ts, train=train, rngs=rngs)
        p0t_sig = jax.nn.softmax(sig_logits, axis=-1)

    qt0_denom_sig = indexing.cols(qt0, x_tilde) + eps
    inner_log_sig = jnp.log(
        jnp.einsum(
            "bds,bsk->bdk", p0t_sig / qt0_denom_sig, qt0,
            preferred_element_type=jnp.float32,
        )
        + eps
    )

    x_tilde_mask = indexing.onehot_mask(x_tilde, S)
    outer_rate_sig = indexing.cols(rate, x_tilde)  # R(s, x̃_d) over s
    outer_qt0_numer_sig = indexing.rows(qt0, x0)  # q_{t|0}(s | x0_d) over s
    outer_qt0_denom_sig = indexing.elems(qt0, x0, x_tilde) + eps  # (B, D)

    outer_sum_sig = jnp.sum(
        x_tilde_mask
        * outer_rate_sig
        * (outer_qt0_numer_sig / outer_qt0_denom_sig[:, :, None])
        * inner_log_sig,
        axis=(1, 2),
    )

    # -- Z_σ normalization (losses.py:223-276) -------------------------------
    rate_row_sums = -indexing.diag(rate)  # (B, S)
    base_Z_tmp = jnp.take_along_axis(
        rate_row_sums, x_tilde.astype(jnp.int32), axis=1
    )  # (B, D)
    base_Z = jnp.sum(base_Z_tmp, axis=1)  # (B,)
    Z_sig_norm = (
        base_Z[:, None, None]
        - base_Z_tmp[:, :, None]
        + rate_row_sums[:, None, :]
    )
    sig_norm = jnp.sum(
        (outer_rate_sig * outer_qt0_numer_sig * x_tilde_mask)
        / (Z_sig_norm * outer_qt0_denom_sig[:, :, None]),
        axis=(1, 2),
    )

    sig_mean = jnp.mean(-outer_sum_sig / sig_norm)
    reg_mean = jnp.mean(reg_term)
    return sig_mean + reg_mean, x_logits


@registry.losses.register
class CTElbo:
    """tauLDR continuous-time ELBO + nll_weight·CE (losses.py:11-287)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.ratio_eps = cfg.loss.eps_ratio
        self.nll_weight = cfg.loss.nll_weight
        self.min_time = cfg.loss.min_time
        self.one_forward_pass = cfg.loss.one_forward_pass
        self.max_t = cfg.training.max_t

    def calc_loss(self, model, params, key, minibatch, label=None, n_iter=0,
                  train=True, rngs=None):
        x0 = _flatten_batch(minibatch)
        kt, kr = jax.random.split(key)
        ts = _sample_ts(kt, x0.shape[0], self.min_time, self.max_t)
        neg_elbo, x_logits = _ctelbo_terms(
            model, params, kr, x0, ts, self.ratio_eps, self.one_forward_pass,
            train, rngs,
        )
        nll = mean_cross_entropy(x_logits, x0)
        return neg_elbo + self.nll_weight * nll


@registry.losses.register
class NLL:
    """Full CTElbo computation but returns only the CE term (losses.py:1503-1778).

    The reference runs the whole ELBO pipeline and discards it (losses.py:1778);
    we keep the x_t/x̃ sampling + forward pass (behavior-defining: which x the
    net is trained on) but skip the dead ELBO arithmetic — same gradient, less
    compute.
    """

    def __init__(self, cfg):
        self.cfg = cfg
        self.min_time = cfg.loss.min_time
        self.one_forward_pass = cfg.loss.one_forward_pass
        self.max_t = cfg.training.max_t

    def calc_loss(self, model, params, key, minibatch, label=None, n_iter=0,
                  train=True, rngs=None):
        x0 = _flatten_batch(minibatch)
        kt, ks, kn = jax.random.split(key, 3)
        ts = _sample_ts(kt, x0.shape[0], self.min_time, self.max_t)
        qt0 = model.transition(ts)
        rate = model.rate(ts)
        x_t, x_tilde = sample_xt_xtilde(ks, qt0, rate, x0)
        x_logits = model.apply(params, x_t, ts, train=train, rngs=rngs)
        return mean_cross_entropy(x_logits, x0)


@registry.losses.register
class CTElboLambda:
    """Iteration-annealed mix w·neg_elbo + (1-w)·CE, w = n_iter/n_iters
    (losses.py:1782-2058)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.ratio_eps = cfg.loss.eps_ratio
        self.min_time = cfg.loss.min_time
        self.one_forward_pass = cfg.loss.one_forward_pass
        self.max_t = cfg.training.max_t
        self.n_iters = cfg.training.n_iters

    def calc_loss(self, model, params, key, minibatch, label=None, n_iter=0,
                  train=True, rngs=None):
        x0 = _flatten_batch(minibatch)
        kt, kr = jax.random.split(key)
        ts = _sample_ts(kt, x0.shape[0], self.min_time, self.max_t)
        neg_elbo, x_logits = _ctelbo_terms(
            model, params, kr, x0, ts, self.ratio_eps, self.one_forward_pass,
            train, rngs,
        )
        nll = mean_cross_entropy(x_logits, x0)
        w = jnp.asarray(n_iter, jnp.float32) / self.n_iters
        return w * neg_elbo + (1.0 - w) * nll


@registry.losses.register
class CondCTElbo:
    """CTElbo conditioned on the first condition_dim dims (losses.py:547-781)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.ratio_eps = cfg.loss.eps_ratio
        self.nll_weight = cfg.loss.nll_weight
        self.min_time = cfg.loss.min_time
        self.one_forward_pass = cfg.loss.one_forward_pass
        self.condition_dim = cfg.loss.condition_dim

    def calc_loss(self, model, params, key, minibatch, label=None, n_iter=0,
                  train=True, rngs=None):
        x0_full = _flatten_batch(minibatch)
        B = x0_full.shape[0]
        cond = x0_full[:, : self.condition_dim]
        data = x0_full[:, self.condition_dim :]

        kt, ks, kn = jax.random.split(key, 3)
        ts = _sample_ts(kt, B, self.min_time, 1.0)
        qt0 = model.transition(ts)
        rate = model.rate(ts)
        S = qt0.shape[-1]
        x_t, x_tilde = sample_xt_xtilde(ks, qt0, rate, data)

        reg_x = x_tilde if self.one_forward_pass else x_t
        model_in = jnp.concatenate([cond, reg_x], axis=1)
        logits_full = model.apply(params, model_in, ts, train=train, rngs=rngs)
        x_logits = logits_full[:, self.condition_dim :, :]
        p0t_reg = jax.nn.softmax(x_logits, axis=-1)
        p0t_sig = p0t_reg  # one_forward_pass shares the pass (losses.py:660-666)

        eps = self.ratio_eps
        mask_reg = indexing.onehot_mask(reg_x, S)
        qt0_denom_reg = indexing.cols(qt0, reg_x) + eps
        rate_vals_reg = indexing.cols(rate, reg_x)
        reg_tmp = jnp.einsum(
            "bds,bks->bdk", mask_reg * rate_vals_reg, qt0,
            preferred_element_type=jnp.float32,
        )
        reg_term = jnp.sum((p0t_reg / qt0_denom_reg) * reg_tmp, axis=(1, 2))

        qt0_denom_sig = indexing.cols(qt0, x_tilde) + eps
        inner_log_sig = jnp.log(
            jnp.einsum(
                "bds,bsk->bdk", p0t_sig / qt0_denom_sig, qt0,
                preferred_element_type=jnp.float32,
            )
            + eps
        )
        x_tilde_mask = indexing.onehot_mask(x_tilde, S)
        outer_rate_sig = indexing.cols(rate, x_tilde)
        outer_qt0_numer_sig = indexing.rows(qt0, data)
        outer_qt0_denom_sig = indexing.elems(qt0, data, x_tilde) + eps
        outer_sum_sig = jnp.sum(
            x_tilde_mask
            * outer_rate_sig
            * (outer_qt0_numer_sig / outer_qt0_denom_sig[:, :, None])
            * inner_log_sig,
            axis=(1, 2),
        )
        rate_row_sums = -indexing.diag(rate)
        base_Z_tmp = jnp.take_along_axis(
            rate_row_sums, x_tilde.astype(jnp.int32), axis=1
        )
        base_Z = jnp.sum(base_Z_tmp, axis=1)
        Z_sig_norm = (
            base_Z[:, None, None]
            - base_Z_tmp[:, :, None]
            + rate_row_sums[:, None, :]
        )
        sig_norm = jnp.sum(
            (outer_rate_sig * outer_qt0_numer_sig * x_tilde_mask)
            / (Z_sig_norm * outer_qt0_denom_sig[:, :, None]),
            axis=(1, 2),
        )
        neg_elbo = jnp.mean(-outer_sum_sig / sig_norm) + jnp.mean(reg_term)
        nll = mean_cross_entropy(x_logits, data)
        return neg_elbo + self.nll_weight * nll


@registry.losses.register
class CondNLL:
    """Prefix-conditioned denoising CE — the NLL analog of CondCTElbo.

    Same corruption and forward pass as CondCTElbo (clean prefix of
    condition_dim tokens concatenated with the q_{t|0}-corrupted suffix,
    ref losses.py:605-666), but the objective is only the cross-entropy of
    the suffix logits against the clean suffix — the conditional counterpart
    of the reference's NLL loss (losses.py:1503-1778), which runs the full
    ELBO pipeline and keeps only the CE term.

    Rationale (docs/DESIGN_NOTES.md "Conditional ELBO: the all-rest
    collapse"): at the pianoroll stand-in's SNR the CondCTElbo objective is
    statistically indifferent between a collapsed marginal predictor and a
    real denoiser (the ELBO importance ratios bury the signal in variance,
    and under global-norm clipping no nll_weight escapes it), while the pure
    CE term trains an input-sensitive denoiser within 150 iterations. A
    CE-trained p0t is exactly what ConditionalTauLeaping consumes, so this
    loss is the supported way to train the conditional sampler stack.

    Auxiliary key-readout term (round 4, the remaining live attack on the
    decode collapse): with ``loss.aux_key_weight > 0`` and
    ``model.aux_key_classes = 12`` the network grows a per-position key head
    and this loss adds λ · CE(suffix-position key logits, key inferred from
    the clean prefix). The key labels come from `infer_key_jnp` — the same
    deterministic prefix→key map `scale_consistency` scores against — and the
    CE is taken at suffix positions only, so the term is minimized *only* by
    routing prefix information across the prefix/suffix boundary through
    attention: a direct training signal on the path the collapse kills.
    """

    def __init__(self, cfg):
        self.cfg = cfg
        self.min_time = cfg.loss.min_time
        self.one_forward_pass = cfg.loss.one_forward_pass
        self.condition_dim = cfg.loss.condition_dim
        self.aux_key_weight = float(cfg.loss.get("aux_key_weight", 0.0))
        if self.aux_key_weight > 0.0 and not int(
            cfg.model.get("aux_key_classes", 0)
        ):
            raise ValueError(
                "loss.aux_key_weight > 0 requires model.aux_key_classes > 0 "
                "(the SequenceTransformer aux head)"
            )

    def calc_loss(self, model, params, key, minibatch, label=None, n_iter=0,
                  train=True, rngs=None):
        x0_full = _flatten_batch(minibatch)
        B = x0_full.shape[0]
        cond = x0_full[:, : self.condition_dim]
        data = x0_full[:, self.condition_dim :]

        kt, ks = jax.random.split(key)
        ts = _sample_ts(kt, B, self.min_time, 1.0)
        qt0 = model.transition(ts)
        rate = model.rate(ts)
        x_t, x_tilde = sample_xt_xtilde(ks, qt0, rate, data)
        reg_x = x_tilde if self.one_forward_pass else x_t
        model_in = jnp.concatenate([cond, reg_x], axis=1)
        if self.aux_key_weight > 0.0:
            from ctdd_tpu.data.pianoroll import infer_key_jnp

            logits_full, key_logits = model.apply(
                params, model_in, ts, train=train, rngs=rngs, return_aux=True
            )
            x_logits = logits_full[:, self.condition_dim :, :]
            key_label = infer_key_jnp(cond)  # (B,) from the CLEAN prefix
            suffix_key_logits = key_logits[:, self.condition_dim :, :]
            key_ce = mean_cross_entropy(
                suffix_key_logits,
                jnp.broadcast_to(
                    key_label[:, None], suffix_key_logits.shape[:2]
                ),
            )
            return (
                mean_cross_entropy(x_logits, data)
                + self.aux_key_weight * key_ce
            )
        logits_full = model.apply(params, model_in, ts, train=train, rngs=rngs)
        x_logits = logits_full[:, self.condition_dim :, :]
        return mean_cross_entropy(x_logits, data)


# ---------------------------------------------------------------------------
# SDDM-style ELBO (backward ratios from logprob_with_logits)
# ---------------------------------------------------------------------------


def _sddm_elbo_terms(cfg, model, params, key, x0, ts, eps, one_forward_pass,
                     train, rngs):
    """neg_elbo, logits, (ll_all, ll_xt) per losses.py:315-539."""
    qt0 = model.transition(ts)
    rate = model.rate(ts)
    S = qt0.shape[-1]
    ks, kn = jax.random.split(key)
    x_t, x_tilde = sample_xt_xtilde(ks, qt0, rate, x0)

    reg_x = x_tilde if one_forward_pass else x_t
    logits_reg = model.apply(params, reg_x, ts, train=train, rngs=rngs)

    mask_reg = indexing.onehot_mask(reg_x, S)
    rate_vals_reg = indexing.cols(rate, reg_x)
    reg_tmp = mask_reg * rate_vals_reg

    ll_all, ll_xt = logprob_with_logits(
        cfg.loss.logit_type, model.process, x_tilde, ts, logits_reg
    )
    ll_xt_e = ll_xt[..., None]
    backwd = jnp.exp(ll_all - ll_xt_e)
    reg_term = jnp.sum(backwd * reg_tmp, axis=(1, 2))

    inner_log_sig = ll_all - ll_xt_e
    x_tilde_mask = indexing.onehot_mask(x_tilde, S)
    outer_rate_sig = indexing.cols(rate, x_tilde)
    outer_qt0_numer_sig = indexing.rows(qt0, x0)
    outer_qt0_denom_sig = indexing.elems(qt0, x0, x_tilde) + eps
    outer_sum_sig = jnp.sum(
        x_tilde_mask
        * outer_rate_sig
        * (outer_qt0_numer_sig / outer_qt0_denom_sig[:, :, None])
        * inner_log_sig,
        axis=(1, 2),
    )
    rate_row_sums = -indexing.diag(rate)
    base_Z_tmp = jnp.take_along_axis(rate_row_sums, x_tilde.astype(jnp.int32), axis=1)
    base_Z = jnp.sum(base_Z_tmp, axis=1)
    Z_sig_norm = (
        base_Z[:, None, None] - base_Z_tmp[:, :, None] + rate_row_sums[:, None, :]
    )
    sig_norm = jnp.sum(
        (outer_rate_sig * x_tilde_mask * outer_qt0_numer_sig)
        / (Z_sig_norm * outer_qt0_denom_sig[:, :, None]),
        axis=(1, 2),
    )
    neg_elbo = jnp.mean(-outer_sum_sig / sig_norm) + jnp.mean(reg_term)
    return neg_elbo, logits_reg, ll_all, ll_xt


@registry.losses.register
class SDDMElbo:
    """CT-ELBO with SDDM backward ratios + nll_weight·CE (losses.py:290-544)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.ratio_eps = cfg.loss.eps_ratio
        self.nll_weight = cfg.loss.nll_weight
        self.min_time = cfg.loss.min_time
        self.one_forward_pass = cfg.loss.one_forward_pass

    def calc_loss(self, model, params, key, minibatch, label=None, n_iter=0,
                  train=True, rngs=None):
        x0 = _flatten_batch(minibatch)
        kt, kr = jax.random.split(key)
        ts = _sample_ts(kt, x0.shape[0], self.min_time, 1.0, clamp_hi=0.99999)
        neg_elbo, logits, _, _ = _sddm_elbo_terms(
            self.cfg, model, params, kr, x0, ts, self.ratio_eps,
            self.one_forward_pass, train, rngs,
        )
        nll = mean_cross_entropy(logits, x0)
        return neg_elbo + self.nll_weight * nll


@registry.losses.register
class ScoreElbo:
    """SDDMElbo + nll_weight · ratio-matching aux (-Σ ll_xt / B)
    (losses.py:1245-1500)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.ratio_eps = cfg.loss.eps_ratio
        self.nll_weight = cfg.loss.nll_weight
        self.min_time = cfg.loss.min_time
        self.one_forward_pass = cfg.loss.one_forward_pass

    def calc_loss(self, model, params, key, minibatch, label=None, n_iter=0,
                  train=True, rngs=None):
        x0 = _flatten_batch(minibatch)
        B = x0.shape[0]
        kt, kr = jax.random.split(key)
        ts = _sample_ts(kt, B, self.min_time, 1.0, clamp_hi=0.99999)
        neg_elbo, logits, ll_all, ll_xt = _sddm_elbo_terms(
            self.cfg, model, params, kr, x0, ts, self.ratio_eps,
            self.one_forward_pass, train, rngs,
        )
        loss_rm = jnp.sum(-ll_xt) / B
        return neg_elbo + self.nll_weight * loss_rm


# ---------------------------------------------------------------------------
# Categorical ratio matching family
# ---------------------------------------------------------------------------


def _catrm_comp_loss(cfg, model, xt, t, ll_all, ll_xt):
    """rm / mle / elbo variants (losses.py:794-836)."""
    S = cfg.data.S
    loss_type = cfg.loss.loss_type
    if loss_type == "rm":
        return -ll_xt
    if loss_type == "mle":
        return -(
            (S - 1) * ll_xt
            + jnp.sum(log1mexp(ll_all), axis=-1)
            - log1mexp(ll_xt)
        )
    if loss_type == "elbo":
        xt_onehot = jax.nn.one_hot(xt, S)
        qt0_x2y = model.transition(t)  # (B, S, S)
        qt0_y2x_rows = indexing.rows(jnp.swapaxes(qt0_x2y, 1, 2), xt)  # (B,D,S)
        ll_xt_e = ll_xt[..., None]
        backwd = jnp.exp(ll_all - ll_xt_e) * qt0_y2x_rows
        first_term = jnp.sum(backwd * (1.0 - xt_onehot), axis=-1)
        qt0_x2y_rows = indexing.rows(qt0_x2y, xt)
        fwd = (ll_xt_e - ll_all) * qt0_x2y_rows
        second_term = jnp.sum(fwd * (1.0 - xt_onehot), axis=-1)
        return first_term - second_term
    raise ValueError(f"unknown loss_type {loss_type}")


@registry.losses.register
class CatRM:
    """SDDM categorical ratio matching (losses.py:785-890)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.min_time = cfg.loss.min_time

    def calc_loss(self, model, params, key, minibatch, label=None, n_iter=0,
                  train=True, rngs=None):
        x0 = _flatten_batch(minibatch)
        B = x0.shape[0]
        kt, ks = jax.random.split(key)
        ts = _sample_ts(kt, B, self.min_time, 1.0, clamp_hi=0.99999)
        qt0 = model.transition(ts)
        xt = sample_xt(ks, qt0, x0)
        logits = model.apply(params, xt, ts, train=train, rngs=rngs)
        ll_all, ll_xt = logprob_with_logits(
            self.cfg.loss.logit_type, model.process, xt, ts, logits
        )
        loss = _catrm_comp_loss(self.cfg, model, xt, ts, ll_all, ll_xt)
        loss = loss * (1.0 - self.cfg.loss.ce_coeff)
        return jnp.sum(loss) / B


@registry.losses.register
class CatRMNLL:
    """CatRM + nll_weight·CE (losses.py:1134-1242)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.min_time = cfg.loss.min_time
        self.max_t = cfg.training.max_t
        self.nll_weight = cfg.loss.nll_weight

    def calc_loss(self, model, params, key, minibatch, label=None, n_iter=0,
                  train=True, rngs=None):
        x0 = _flatten_batch(minibatch)
        B = x0.shape[0]
        kt, ks = jax.random.split(key)
        ts = _sample_ts(kt, B, self.min_time, self.max_t)
        qt0 = model.transition(ts)
        xt = sample_xt(ks, qt0, x0)
        logits = model.apply(params, xt, ts, train=train, rngs=rngs)
        ll_all, ll_xt = logprob_with_logits(
            self.cfg.loss.logit_type, model.process, xt, ts, logits
        )
        loss = _catrm_comp_loss(self.cfg, model, xt, ts, ll_all, ll_xt)
        loss = loss * (1.0 - self.cfg.loss.ce_coeff)
        nll = mean_cross_entropy(logits, x0)
        return jnp.sum(loss) / B + self.nll_weight * nll


# ---------------------------------------------------------------------------
# Energy-based-model auxiliary losses (model.apply returns scalar energies)
# ---------------------------------------------------------------------------


def ebm_all_mutation_logits(model, params, xt, ts, S, train=False, rngs=None):
    """Score all D·S single-site mutations with the energy net -> (B, D, S).

    Counterpart of the mask/candidate tiling at losses.py:947-957 and
    sampling.py:920-944 (`ebm_logits`). The energy net maps (B', D) -> (B',).
    """
    B, D = xt.shape
    # xall[d, s, b] = xt[b] with dimension d replaced by state s
    mask = jnp.eye(D, dtype=xt.dtype)  # (D, D)
    cand = jnp.arange(S, dtype=xt.dtype)  # (S,)
    xall = (
        mask[:, None, None, :] * cand[None, :, None, None]
        + (1 - mask)[:, None, None, :] * xt[None, None, :, :]
    )  # (D, S, B, D)
    t_all = jnp.broadcast_to(ts[None, None, :], (D, S, B)).reshape(-1)
    qall = model.apply(
        params, xall.reshape(D * S * B, D), t_all, train=train, rngs=rngs
    )  # (D*S*B,)
    logits = qall.reshape(D, S, B)
    return jnp.transpose(logits, (2, 0, 1))  # (B, D, S)


def bin_ebm_flip_logits(model, params, xt, ts, train=False, rngs=None):
    """Binary EBM logits from energies of x and its D single-bit flips.

    Counterpart of losses.py:1022-1039 / sampling.py:947-965
    (`bin_ebm_logits`): logits[b,d,s] = q(x) if s == x_d else q(flip_d(x)).
    """
    B, D = xt.shape
    qxt = model.apply(params, xt, ts, train=train, rngs=rngs)  # (B,)
    mask = jnp.eye(D, dtype=xt.dtype)  # (D, D)
    # xneg[d, b] = xt[b] with bit d flipped (for binary states {0,1})
    xneg = (mask[:, None, :] - xt[None, :, :]) * mask[:, None, :] + (
        1 - mask[:, None, :]
    ) * xt[None, :, :]
    t_all = jnp.broadcast_to(ts[None, :], (D, B)).reshape(-1)
    qxneg = model.apply(
        params, xneg.reshape(D * B, D), t_all, train=train, rngs=rngs
    ).reshape(D, B).T  # (B, D)
    qxt_bd = jnp.broadcast_to(qxt[:, None], (B, D))
    xt_onehot = jax.nn.one_hot(xt, 2)
    return xt_onehot * qxt_bd[..., None] + (1.0 - xt_onehot) * qxneg[..., None]


@registry.losses.register
class EBMAux:
    """Energy-based ratio matching over all D·S mutations (losses.py:893-968)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.min_time = cfg.loss.min_time
        self.S = cfg.data.S

    def calc_loss(self, model, params, key, minibatch, label=None, n_iter=0,
                  train=True, rngs=None):
        x0 = _flatten_batch(minibatch)
        B, D = x0.shape
        kt, ks = jax.random.split(key)
        ts = _sample_ts(kt, B, self.min_time, 1.0, clamp_hi=0.99999)
        qt0 = model.transition(ts)
        xt = sample_xt(ks, qt0, x0)
        logits = ebm_all_mutation_logits(
            model, params, xt, ts, self.S, train=train, rngs=rngs
        )
        ll_all = jax.nn.log_softmax(logits, axis=-1)
        ll_xt = jnp.take_along_axis(ll_all, xt[..., None].astype(jnp.int32), -1)[
            ..., 0
        ]
        return jnp.mean(-jnp.sum(ll_xt, axis=-1))


@registry.losses.register
class BinEBMAux:
    """Binary EBM ratio matching via single-bit flips (losses.py:971-1045)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.min_time = cfg.loss.min_time

    def calc_loss(self, model, params, key, minibatch, label=None, n_iter=0,
                  train=True, rngs=None):
        x0 = _flatten_batch(minibatch)
        B = x0.shape[0]
        kt, ks = jax.random.split(key)
        ts = _sample_ts(kt, B, self.min_time, 1.0, clamp_hi=0.99999)
        qt0 = model.transition(ts)
        xt = sample_xt(ks, qt0, x0)
        logits = bin_ebm_flip_logits(model, params, xt, ts, train=train, rngs=rngs)
        _, ll_xt = logprob_with_logits(
            self.cfg.loss.logit_type, model.process, xt, ts, logits
        )
        return jnp.sum(-ll_xt) / B


@registry.losses.register
class NLLOriginal:
    """Plain CE of p^θ_{0|t}(x0 | x_t), x_t ~ q_{t|0} (losses.py:1048-1103)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.min_time = cfg.loss.min_time
        self.max_t = cfg.training.max_t

    def calc_loss(self, model, params, key, minibatch, label=None, n_iter=0,
                  train=True, rngs=None):
        x0 = _flatten_batch(minibatch)
        kt, ks = jax.random.split(key)
        ts = _sample_ts(kt, x0.shape[0], self.min_time, self.max_t)
        qt0 = model.transition(ts)
        xt = sample_xt(ks, qt0, x0)
        logits = model.apply(params, xt, ts, label=label, train=train, rngs=rngs)
        return mean_cross_entropy(logits, x0)
