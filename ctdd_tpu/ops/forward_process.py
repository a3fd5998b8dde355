"""CTMC forward processes as pure-functional pytrees.

TPU-native counterpart of reference lib/models/forward_model.py (classes
BirthDeathForwardBase :9-75, UniformRate :78-129, UniformVariantRate :132-204,
GaussianTargetRate :207-306). Instead of stateful torch modules, each process
is a frozen flax.struct pytree holding the host-precomputed eigendecomposition
of its base rate matrix; `rate` / `transition` / `transit_between` / `rate_mat`
are jit-able einsums over those arrays, so they live inside the compiled
loss/sampler graphs and the (B,S,S) tensors never leave the device.

Eigendecompositions are done once on host in float64 (as the reference does in
numpy) and cast to float32. All processes share the spectral-propagator form
    q_{t2|t1} = V · exp(Λ · ∫_{t1}^{t2} β) · V⁻¹
with per-kind β(t) schedules; the kinds differ in the base matrix and in
whether rows are renormalized before the 1e-8 zero-clamp (the reference
renormalizes all kinds except plain UniformRate — behavior we preserve).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ctdd_tpu import registry
from ctdd_tpu.ops import indexing

# ---------------------------------------------------------------------------
# β(t) schedules (static python scalars; evaluated on traced t)
# ---------------------------------------------------------------------------

SCHEDULE_CONST = "const"
SCHEDULE_BD_EXP = "bd_exp"  # birth-death σ_min/σ_max exponential
SCHEDULE_LOG_SQR = "log_sqr"
SCHEDULE_SQRT_COS = "sqrt_cos"
SCHEDULE_LOG = "log"  # time_base · time_exp^t family (GaussianTargetRate too)


def _beta(kind: str, p: Tuple[float, ...], t: jnp.ndarray) -> jnp.ndarray:
    """β(t) — instantaneous rate scalar (ref: _rate_scalar variants)."""
    if kind == SCHEDULE_CONST:
        return jnp.ones_like(t)
    if kind == SCHEDULE_BD_EXP:
        sig_min, sig_max = p
        return (
            sig_min**2
            * (sig_max / sig_min) ** (2.0 * t)
            * math.log(sig_max / sig_min)
        )
    if kind == SCHEDULE_LOG_SQR:
        return 2.0 * t / (t**2 + 1.0)
    if kind == SCHEDULE_SQRT_COS:
        th = jnp.pi / 2.0 * t
        return jnp.pi / 4.0 * jnp.sin(th) / jnp.sqrt(jnp.cos(th))
    if kind == SCHEDULE_LOG:
        time_base, time_exp = p
        return time_base * math.log(time_exp) * time_exp**t
    raise ValueError(f"unknown schedule {kind}")


def _beta_integral(kind: str, p: Tuple[float, ...], t: jnp.ndarray) -> jnp.ndarray:
    """∫₀ᵗ β (up to a constant; only differences matter for transit_between)."""
    if kind == SCHEDULE_CONST:
        return t
    if kind == SCHEDULE_BD_EXP:
        sig_min, sig_max = p
        return 0.5 * sig_min**2 * (sig_max / sig_min) ** (2.0 * t) - 0.5 * sig_min**2
    if kind == SCHEDULE_LOG_SQR:
        return jnp.log(t**2 + 1.0)
    if kind == SCHEDULE_SQRT_COS:
        return -jnp.sqrt(jnp.cos(jnp.pi / 2.0 * t))
    if kind == SCHEDULE_LOG:
        time_base, time_exp = p
        return time_base * time_exp**t - time_base
    raise ValueError(f"unknown schedule {kind}")


# ---------------------------------------------------------------------------
# The process pytree
# ---------------------------------------------------------------------------


@struct.dataclass
class ForwardProcess:
    """A CTMC with rate R_t = β(t)·R_base and spectral transition kernels."""

    base_rate: jnp.ndarray  # (S, S) — includes negative diagonal
    eigvals: jnp.ndarray  # (S,)
    eigvecs: jnp.ndarray  # (S, S)
    inv_eigvecs: jnp.ndarray  # (S, S); Vᵀ when the base matrix is symmetric
    kind: str = struct.field(pytree_node=False, default="uniform")
    schedule: str = struct.field(pytree_node=False, default=SCHEDULE_CONST)
    schedule_params: Tuple[float, ...] = struct.field(pytree_node=False, default=())
    renormalize: bool = struct.field(pytree_node=False, default=True)
    # integral offset so transition(t) == transit_between(0, t) exactly
    # (matters for sqrt_cos whose antiderivative is -1 at t=0;
    #  ref forward_model.py:202-204 routes transition through transit_between)
    clamp: float = struct.field(pytree_node=False, default=1e-8)

    @property
    def S(self) -> int:
        return self.base_rate.shape[-1]

    # -- rate ---------------------------------------------------------------
    def rate(self, t: jnp.ndarray) -> jnp.ndarray:
        """R_t, shape (B, S, S). Ref: forward_model.py:43-49,95-101,166-172,252-257."""
        beta = _beta(self.schedule, self.schedule_params, t)
        return self.base_rate[None, :, :] * beta[:, None, None]

    def rate_mat(self, y: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """R_t[y] rows, shape (B, D, S). Ref: forward_model.py:103-105,174-178."""
        return indexing.rows(self.rate(t), y)

    # -- transition kernels ---------------------------------------------------
    def _propagate(self, w: jnp.ndarray) -> jnp.ndarray:
        """V · diag(exp(w)) · V⁻¹ for per-batch eigen-weights w (B, S)."""
        # (B,S,S): scale columns of V by exp(w), then one (S,S)x(S,S) matmul
        scaled = self.eigvecs[None, :, :] * jnp.exp(w)[:, None, :]
        # full f32 MXU precision: these are probabilities with entries near
        # the 1e-8 clamp; bf16 passes would corrupt the small transition mass
        trans = jnp.einsum(
            "bij,jk->bik",
            scaled,
            self.inv_eigvecs,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        if self.renormalize:
            trans = trans / jnp.sum(trans, axis=-1, keepdims=True)
        return jnp.where(trans < self.clamp, 0.0, trans)

    def transition(self, t: jnp.ndarray) -> jnp.ndarray:
        """q_{t|0}, shape (B, S, S). Ref: forward_model.py:51-75,108-126,202-204,265-287."""
        zero = jnp.zeros_like(t)
        integ = _beta_integral(self.schedule, self.schedule_params, t) - _beta_integral(
            self.schedule, self.schedule_params, zero
        )
        return self._propagate(integ[:, None] * self.eigvals[None, :])

    def transit_between(self, t1: jnp.ndarray, t2: jnp.ndarray) -> jnp.ndarray:
        """q_{t2|t1}, shape (B, S, S). Ref: forward_model.py:128-129,180-200,289-306.

        Note: the reference's GaussianTargetRate.transit_between uses eigvecsᵀ
        in place of V⁻¹ (forward_model.py:298) — incorrect for its
        non-symmetric base matrix. We use the true inverse everywhere.
        """
        d = _beta_integral(self.schedule, self.schedule_params, t2) - _beta_integral(
            self.schedule, self.schedule_params, t1
        )
        return self._propagate(d[:, None] * self.eigvals[None, :])


# ---------------------------------------------------------------------------
# Host-side constructors (numpy, float64, once at init — as the reference does)
# ---------------------------------------------------------------------------


def _symmetric(base_rate: np.ndarray):
    eigvals, eigvecs = np.linalg.eigh(base_rate)
    return eigvals, eigvecs, eigvecs.T.copy()


def birth_death_base_rate(S: int) -> np.ndarray:
    """Tridiagonal birth-death R_b (ref forward_model.py:14-17)."""
    r = np.diag(np.ones(S - 1), 1) + np.diag(np.ones(S - 1), -1)
    return r - np.diag(r.sum(axis=1))


def uniform_base_rate(S: int, rate_const: float) -> np.ndarray:
    """Uniform R = c·(𝟙 - S·I) (ref forward_model.py:84-86)."""
    r = rate_const * np.ones((S, S))
    r -= np.diag(np.diag(r))
    return r - np.diag(r.sum(axis=1))


def gaussian_target_base_rate(S: int, rate_sigma: float, Q_sigma: float) -> np.ndarray:
    """Banded Gaussian rate matrix with detailed-balance transposes.

    Vectorized equivalent of the reference's double loop
    (forward_model.py:216-236): upper-triangular band entries decay as
    exp(-(j-i-1)²/σ_r²) within |i - S/2|-dependent bands, then entries below
    the diagonal are filled by the detailed-balance factor
    exp(-((j+1)² - (i+1)² + S(i+1) - S(j+1)) / (2σ_Q²)).
    """
    i = np.arange(S)[:, None]
    j = np.arange(S)[None, :]
    vals = np.exp(-np.arange(S) ** 2 / rate_sigma**2)
    rate = np.zeros((S, S))
    upper = (i < S // 2) & (j > i) & (j < S - i)
    lower = (i > S // 2) & (j < i) & (j > S - i - 1)
    band = np.where(j > i, j - i - 1, i - j - 1)
    rate = np.where(upper | lower, vals[np.clip(band, 0, S - 1)], 0.0)
    # detailed-balance fill: wherever rate[j,i] > 0, set rate[i,j]
    db = rate.T * np.exp(
        -((j + 1.0) ** 2 - (i + 1.0) ** 2 + S * (i + 1.0) - S * (j + 1.0))
        / (2.0 * Q_sigma**2)
    )
    rate = np.where(rate.T > 0.0, db, rate)
    rate -= np.diag(np.diag(rate))
    return rate - np.diag(rate.sum(axis=1))


@registry.processes.register(name="BirthDeathForwardBase")
def make_birth_death(S: int, sigma_min: float, sigma_max: float) -> ForwardProcess:
    base = birth_death_base_rate(S)
    ev, V, Vi = _symmetric(base)
    return ForwardProcess(
        base_rate=jnp.asarray(base, jnp.float32),
        eigvals=jnp.asarray(ev, jnp.float32),
        eigvecs=jnp.asarray(V, jnp.float32),
        inv_eigvecs=jnp.asarray(Vi, jnp.float32),
        kind="birth_death",
        schedule=SCHEDULE_BD_EXP,
        schedule_params=(float(sigma_min), float(sigma_max)),
        renormalize=True,
    )


@registry.processes.register(name="UniformRate")
def make_uniform(S: int, rate_const: float) -> ForwardProcess:
    base = uniform_base_rate(S, rate_const)
    ev, V, Vi = _symmetric(base)
    return ForwardProcess(
        base_rate=jnp.asarray(base, jnp.float32),
        eigvals=jnp.asarray(ev, jnp.float32),
        eigvecs=jnp.asarray(V, jnp.float32),
        inv_eigvecs=jnp.asarray(Vi, jnp.float32),
        kind="uniform",
        schedule=SCHEDULE_CONST,
        schedule_params=(),
        renormalize=False,  # ref UniformRate.transition does not renormalize
    )


@registry.processes.register(name="UniformVariantRate")
def make_uniform_variant(
    S: int,
    rate_const: float,
    t_func: str,
    time_base: float = 1.0,
    time_exp: float = 1.0,
) -> ForwardProcess:
    base = uniform_base_rate(S, rate_const)
    ev, V, Vi = _symmetric(base)
    if t_func == "log_sqr":
        schedule, params = SCHEDULE_LOG_SQR, ()
    elif t_func == "sqrt_cos":
        schedule, params = SCHEDULE_SQRT_COS, ()
    elif t_func == "log":
        schedule, params = SCHEDULE_LOG, (float(time_base), float(time_exp))
    else:
        raise ValueError(f"unknown t_func {t_func}")
    return ForwardProcess(
        base_rate=jnp.asarray(base, jnp.float32),
        eigvals=jnp.asarray(ev, jnp.float32),
        eigvecs=jnp.asarray(V, jnp.float32),
        inv_eigvecs=jnp.asarray(Vi, jnp.float32),
        kind="uniform_variant",
        schedule=schedule,
        schedule_params=params,
        renormalize=True,
    )


@registry.processes.register(name="GaussianTargetRate")
def make_gaussian_target(
    S: int, rate_sigma: float, Q_sigma: float, time_base: float, time_exp: float
) -> ForwardProcess:
    base = gaussian_target_base_rate(S, rate_sigma, Q_sigma)
    eigvals, eigvecs = np.linalg.eig(base)
    inv_eigvecs = np.linalg.inv(eigvecs)
    # the spectrum of this rate matrix is real (similar to a symmetric matrix
    # via the detailed-balance weights); drop the zero imaginary parts like the
    # reference's float() cast does (forward_model.py:242-244)
    return ForwardProcess(
        base_rate=jnp.asarray(base, jnp.float32),
        eigvals=jnp.asarray(np.real(eigvals), jnp.float32),
        eigvecs=jnp.asarray(np.real(eigvecs), jnp.float32),
        inv_eigvecs=jnp.asarray(np.real(inv_eigvecs), jnp.float32),
        kind="gaussian_target",
        schedule=SCHEDULE_LOG,
        schedule_params=(float(time_base), float(time_exp)),
        renormalize=True,
    )


def build_process(cfg) -> ForwardProcess:
    """Build the forward process named by a config (see config schema).

    Mirrors how reference model classes mix in their process by name
    (models.py:832-1083): the model config carries the process type and its
    scalar parameters.
    """
    name = cfg.model.rate_name
    S = cfg.data.S
    m = cfg.model
    if name == "BirthDeathForwardBase":
        return make_birth_death(S, m.sigma_min, m.sigma_max)
    if name == "UniformRate":
        return make_uniform(S, m.rate_const)
    if name == "UniformVariantRate":
        return make_uniform_variant(
            S,
            m.rate_const,
            m.t_func,
            time_base=m.get("time_base", 1.0),
            time_exp=m.get("time_exp", 1.0),
        )
    if name == "GaussianTargetRate":
        return make_gaussian_target(S, m.rate_sigma, m.Q_sigma, m.time_base, m.time_exp)
    raise ValueError(f"unknown forward process {name}")
