"""D3PM discrete-time categorical diffusion baseline.

Counterpart of reference lib/d3pm.py (760 LoC): β schedules (:31-57),
one-step Q_t matrices — uniform band / gaussian band / absorbing (:156-299),
cumulative q̄_t products (:123-150), q_sample via the Gumbel trick (:386-413),
q_posterior_logits (:441-471), x_start-parameterized p_logits (:473-520),
ancestral p_sample/p_sample_loop (:523-589, here a lax.scan), and the
kl / cross_entropy_x_start / hybrid training losses (:593-725) plus
calc_bpd_loop (:727-759).

Matrices are built once on host (float64 numpy) and stored as (T, S, S)
device arrays; every sampling/loss op is jit-able.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special

from ctdd_tpu.d3pm import utils as d3pm_utils


def get_diffusion_betas(spec) -> np.ndarray:
    """β_t schedules: linear / cosine / jsd (ref d3pm.py:31-57)."""
    T = spec.num_timesteps
    if spec.type == "linear":
        return np.linspace(spec.start, spec.stop, T)
    if spec.type == "cosine":
        steps = np.arange(T + 1, dtype=np.float64) / T
        alpha_bar = np.cos((steps + 0.008) / 1.008 * np.pi / 2)
        return np.minimum(1 - alpha_bar[1:] / alpha_bar[:-1], 0.999)
    if spec.type == "jsd":
        return 1.0 / np.linspace(T, 1.0, T)
    raise NotImplementedError(spec.type)


def _uniform_band_mat(beta_t: float, S: int, bands: Optional[int]) -> np.ndarray:
    """(ref :156-221)."""
    if bands is None:
        mat = np.full((S, S), beta_t / S, np.float64)
        np.fill_diagonal(mat, 1.0 - beta_t * (S - 1.0) / S)
        return mat
    mat = np.zeros((S, S), np.float64)
    off = np.full(S - 1, beta_t / S, np.float64)
    for k in range(1, bands + 1):
        mat += np.diag(off, k=k) + np.diag(off, k=-k)
        off = off[:-1]
    mat += np.diag(1.0 - mat.sum(1))
    return mat


def _gaussian_band_mat(beta_t: float, S: int, bands: Optional[int]) -> np.ndarray:
    """(ref :223-278)."""
    tb = bands if bands else S - 1
    mat = np.zeros((S, S), np.float64)
    values = np.linspace(0.0, 255.0, S, dtype=np.float64)
    values = values * 2.0 / (S - 1.0)
    values = values[: tb + 1]
    values = -values * values / beta_t
    values = np.concatenate([values[:0:-1], values])
    values = scipy.special.softmax(values, axis=0)
    values = values[tb:]
    for k in range(1, tb + 1):
        off = np.full(S - k, values[k], np.float64)
        mat += np.diag(off, k=k) + np.diag(off, k=-k)
    mat += np.diag(1.0 - mat.sum(1))
    return mat


def _absorbing_mat(beta_t: float, S: int) -> np.ndarray:
    """Absorbing state at S//2 (ref :280-299)."""
    mat = np.diag(np.full(S, 1.0 - beta_t, np.float64))
    mat[:, S // 2] += beta_t
    return mat


@dataclasses.dataclass
class CategoricalDiffusion:
    """Discrete-time categorical diffusion (ref CategoricalDiffusion :60-759)."""

    betas: np.ndarray
    model_prediction: str  # 'x_start' (xprev unimplemented, as in ref :507-516)
    model_output: str  # 'logits' | 'logistic_pars'
    transition_mat_type: str  # 'uniform' | 'gaussian' | 'absorbing'
    transition_bands: Optional[int]
    loss_type: str  # 'kl' | 'hybrid' | 'cross_entropy_x_start'
    hybrid_coeff: float
    num_pixel_vals: int
    eps: float = 1e-6

    def __post_init__(self):
        S = self.num_pixel_vals
        betas = np.asarray(self.betas, np.float64)
        assert ((betas > 0) & (betas <= 1)).all(), "betas must be in (0, 1]"
        self.num_timesteps = len(betas)
        if self.transition_mat_type == "uniform":
            mats = [_uniform_band_mat(b, S, self.transition_bands) for b in betas]
        elif self.transition_mat_type == "gaussian":
            mats = [_gaussian_band_mat(b, S, self.transition_bands) for b in betas]
        elif self.transition_mat_type == "absorbing":
            mats = [_absorbing_mat(b, S) for b in betas]
        else:
            raise ValueError(self.transition_mat_type)
        q_onestep = np.stack(mats)  # (T, S, S)
        q_mats = [q_onestep[0]]
        for t in range(1, self.num_timesteps):
            q_mats.append(q_mats[-1] @ q_onestep[t])
        self.q_onestep_mats = jnp.asarray(q_onestep, jnp.float32)
        self.q_mats = jnp.asarray(np.stack(q_mats), jnp.float32)
        self.transpose_q_onestep_mats = jnp.swapaxes(self.q_onestep_mats, 1, 2)

    # -- gathers (ref :301-366) ----------------------------------------------
    def _at(self, a, t, x):
        """a[t][x] -> (B, ..., S) via one-hot matmul (MXU path)."""
        a_t = a[t]  # (B, S, S)
        shape = x.shape
        x_oh = jax.nn.one_hot(x.reshape(shape[0], -1), self.num_pixel_vals)
        out = jnp.einsum(
            "bds,bsk->bdk", x_oh, a_t, preferred_element_type=jnp.float32
        )
        return out.reshape(shape + (self.num_pixel_vals,))

    def _at_onehot(self, a, t, x):
        """dot(x, a[t]) for one-hot/soft x (B, ..., S)."""
        a_t = a[t]
        shape = x.shape
        out = jnp.einsum(
            "bds,bsk->bdk",
            x.reshape(shape[0], -1, self.num_pixel_vals),
            a_t,
            preferred_element_type=jnp.float32,
        )
        return out.reshape(shape)

    # -- forward process -----------------------------------------------------
    def q_probs(self, x_start, t):
        """q(x_t | x_start) probabilities (ref :368-384)."""
        return self._at(self.q_mats, t, x_start)

    def q_sample(self, key, x_start, t):
        """Gumbel-trick sample of q(x_t | x_start) (ref :386-413)."""
        logits = jnp.log(self.q_probs(x_start, t) + self.eps)
        return jax.random.categorical(key, logits, axis=-1)

    def _get_logits_from_logistic_pars(self, loc, log_scale):
        """(ref :415-439): note bin_width 2/(S-1) and centers spanning [-1,1]
        — the D3PM convention, distinct from the CTMC logistic head."""
        loc = loc[..., None]
        log_scale = log_scale[..., None]
        inv_scale = jnp.exp(-(log_scale - 2.0))
        S = self.num_pixel_vals
        bin_width = 2.0 / (S - 1.0)
        bin_centers = jnp.linspace(-1.0, 1.0, S)
        bin_centers = bin_centers.reshape((1,) * (loc.ndim - 1) + (S,)) - loc
        log_cdf_min = jax.nn.log_sigmoid(inv_scale * (bin_centers - 0.5 * bin_width))
        log_cdf_plus = jax.nn.log_sigmoid(inv_scale * (bin_centers + 0.5 * bin_width))
        return d3pm_utils.log_min_exp(log_cdf_plus, log_cdf_min, self.eps)

    # -- reverse process -----------------------------------------------------
    def q_posterior_logits(self, x_start, x_t, t, x_start_logits: bool):
        """logits of q(x_{t-1} | x_t, x_start) (ref :441-471)."""
        fact1 = self._at(self.transpose_q_onestep_mats, t, x_t)
        t_1 = jnp.where(t == 0, t, t - 1)
        if x_start_logits:
            fact2 = self._at_onehot(
                self.q_mats, t_1, jax.nn.softmax(x_start, axis=-1)
            )
            tzero_logits = x_start
        else:
            fact2 = self._at(self.q_mats, t_1, x_start)
            tzero_logits = jnp.log(
                jax.nn.one_hot(x_start, self.num_pixel_vals) + self.eps
            )
        out = jnp.log(fact1 + self.eps) + jnp.log(fact2 + self.eps)
        t_b = t.reshape((t.shape[0],) + (1,) * (out.ndim - 1))
        return jnp.where(t_b == 0, tzero_logits, out)

    def p_logits(self, model_fn: Callable, x, t):
        """logits of p(x_{t-1} | x_t) (ref :473-520)."""
        model_output = model_fn(x, t)
        if self.model_output == "logits":
            model_logits = model_output
        elif self.model_output == "logistic_pars":
            loc, log_scale = model_output
            model_logits = self._get_logits_from_logistic_pars(loc, log_scale)
        else:
            raise NotImplementedError(self.model_output)
        if self.model_prediction != "x_start":
            raise NotImplementedError(self.model_prediction)
        pred_x_start_logits = model_logits
        t_b = t.reshape((t.shape[0],) + (1,) * (model_logits.ndim - 1))
        model_logits = jnp.where(
            t_b == 0,
            pred_x_start_logits,
            self.q_posterior_logits(pred_x_start_logits, x, t, x_start_logits=True),
        )
        return model_logits, pred_x_start_logits

    # -- sampling --------------------------------------------------------------
    def p_sample(self, key, model_fn, x, t):
        """One ancestral step (ref :523-543); no noise at t == 0."""
        model_logits, pred_x_start_logits = self.p_logits(model_fn, x, t)
        nonzero = (t != 0).reshape((x.shape[0],) + (1,) * x.ndim).astype(
            model_logits.dtype
        )
        u = jax.random.uniform(
            key, model_logits.shape, minval=jnp.finfo(jnp.float32).tiny, maxval=1.0
        )
        gumbel = -jnp.log(-jnp.log(u))
        sample = jnp.argmax(model_logits + nonzero * gumbel, axis=-1)
        return sample, jax.nn.softmax(pred_x_start_logits, axis=-1)

    def p_sample_loop(self, key, model_fn, shape, num_timesteps: Optional[int] = None):
        """Ancestral sampling as one device-resident lax.scan (ref :545-589
        runs a host loop with tqdm)."""
        T = num_timesteps or self.num_timesteps
        k_init, k_scan = jax.random.split(key)
        if self.transition_mat_type in ("gaussian", "uniform"):
            x_init = jax.random.randint(k_init, shape, 0, self.num_pixel_vals)
        elif self.transition_mat_type == "absorbing":
            x_init = jnp.full(shape, self.num_pixel_vals // 2, jnp.int32)
        else:
            raise ValueError(self.transition_mat_type)

        ts = jnp.arange(T - 1, -1, -1)
        keys = jax.random.split(k_scan, T)

        def step(x, inp):
            ti, k = inp
            t = jnp.full((shape[0],), ti, jnp.int32)
            x, _ = self.p_sample(k, model_fn, x, t)
            return x, None

        x, _ = jax.lax.scan(step, x_init, (ts, keys))
        return x

    # -- losses -----------------------------------------------------------------
    def vb_terms_bpd(self, model_fn, x_start, x_t, t):
        """(ref :593-627)."""
        true_logits = self.q_posterior_logits(x_start, x_t, t, x_start_logits=False)
        model_logits, pred_x_start_logits = self.p_logits(model_fn, x_t, t)
        kl = d3pm_utils.categorical_kl_logits(true_logits, model_logits)
        kl = d3pm_utils.meanflat(kl) / jnp.log(2.0)
        decoder_nll = -d3pm_utils.categorical_log_likelihood(x_start, model_logits)
        decoder_nll = d3pm_utils.meanflat(decoder_nll) / jnp.log(2.0)
        return jnp.where(t == 0, decoder_nll, kl), pred_x_start_logits

    def prior_bpd(self, x_start):
        """(ref :629-664)."""
        T = self.num_timesteps
        t = jnp.full((x_start.shape[0],), T - 1, jnp.int32)
        q_probs = self.q_probs(x_start, t)
        if self.transition_mat_type in ("gaussian", "uniform"):
            prior = jnp.ones_like(q_probs) / self.num_pixel_vals
        else:
            prior = jax.nn.one_hot(
                jnp.full(q_probs.shape[:-1], self.num_pixel_vals // 2, jnp.int32),
                self.num_pixel_vals,
            )
        kl = d3pm_utils.categorical_kl_probs(q_probs, prior)
        return d3pm_utils.meanflat(kl) / jnp.log(2.0)

    def cross_entropy_x_start(self, x_start, pred_x_start_logits):
        """(ref :666-683)."""
        ce = -d3pm_utils.categorical_log_likelihood(x_start, pred_x_start_logits)
        return d3pm_utils.meanflat(ce) / jnp.log(2.0)

    def training_losses(self, key, model_fn, x_start, t):
        """(ref :685-725). Note the reference's 'hybrid' branch computes the
        vb terms then returns only ce (d3pm.py:717-718) — kept verbatim via
        hybrid == ce + 0·vb so gradients match."""
        k_noise, _ = jax.random.split(key)
        x_t = self.q_sample(k_noise, x_start, t)
        if self.loss_type == "kl":
            losses, _ = self.vb_terms_bpd(model_fn, x_start, x_t, t)
        elif self.loss_type == "cross_entropy_x_start":
            _, pred_x_start_logits = self.p_logits(model_fn, x_t, t)
            losses = self.cross_entropy_x_start(x_start, pred_x_start_logits)
        elif self.loss_type == "hybrid":
            vb_losses, pred_x_start_logits = self.vb_terms_bpd(
                model_fn, x_start, x_t, t
            )
            ce_losses = self.cross_entropy_x_start(x_start, pred_x_start_logits)
            losses = ce_losses  # ref d3pm.py:717-718 discards the vb term
        else:
            raise NotImplementedError(self.loss_type)
        return losses

    def calc_bpd_loop(self, key, model_fn, x_start):
        """Full variational bound over all timesteps (ref :727-759)."""
        B = x_start.shape[0]
        keys = jax.random.split(key, self.num_timesteps)
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)

        def step(_, inp):
            ti, k = inp
            t_b = jnp.full((B,), ti, jnp.int32)
            x_t = self.q_sample(k, x_start, t_b)
            vb, _ = self.vb_terms_bpd(model_fn, x_start, x_t, t_b)
            return None, vb

        _, vbterms = jax.lax.scan(step, None, (ts, keys))  # (T, B)
        prior_b = self.prior_bpd(x_start)
        total_b = vbterms.sum(axis=0) + prior_b
        return {"total": total_b, "vbterms": vbterms.T, "prior": prior_b}


def make_diffusion(model_cfg) -> CategoricalDiffusion:
    """Build from cfg.model (ref d3pm.py:16-28)."""
    return CategoricalDiffusion(
        betas=get_diffusion_betas(model_cfg),
        model_prediction=model_cfg.model_prediction,
        model_output=model_cfg.model_output,
        transition_mat_type=model_cfg.transition_mat_type,
        transition_bands=model_cfg.transition_bands,
        loss_type=model_cfg.loss_type,
        hybrid_coeff=model_cfg.hybrid_coeff,
        num_pixel_vals=model_cfg.num_pixel_vals,
    )


class D3PMLoss:
    """Wrapper loss (ref losses.py:1107-1130): uniform integer t, mean loss.

    Registered separately from the CTMC losses because it needs the
    diffusion object; train scripts construct it directly, as the
    reference's do (train_synthetic_d3pm.py:74).
    """

    def __init__(self, cfg, diffusion: CategoricalDiffusion):
        self.cfg = cfg
        self.diffusion = diffusion
        self.num_timesteps = cfg.model.num_timesteps

    def calc_loss(self, model, params, key, minibatch, label=None, n_iter=0,
                  train=True, rngs=None):
        kt, kl = jax.random.split(key)
        B = minibatch.shape[0]
        t = jax.random.randint(kt, (B,), 0, self.num_timesteps)

        def model_fn(x, ti):
            return model.apply(params, x, ti, train=train, rngs=rngs)

        return jnp.mean(
            self.diffusion.training_losses(kl, model_fn, minibatch, t)
        )
