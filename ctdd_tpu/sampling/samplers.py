"""Reverse-CTMC samplers, fully device-resident.

TPU-native counterparts of reference lib/sampling/sampling.py (1277 LoC).
The reference runs a host python loop over np.linspace timesteps with one
network call per step and tqdm in between (sampling.py:116-234 et al.) —
the #1 throughput loss it leaves on the table. Here every sampler is a
`jax.lax.scan` over a precomputed (num_steps,) time grid: one compiled
program, zero host round-trips, per-step diagnostics returned as scan
outputs. Correctors run inside the scan via lax.cond + fori_loop.

Samplers (registry names match the reference):
- TauL                    sampling.py:81-234   (tau-leaping, ordinal clamp or
                                                multi-jump rejection, corrector)
- LBJF                    sampling.py:237-356  (Euler / locally-balanced jump
                                                factorization, eq.17)
- MidPointTauL            sampling.py:359-526  (midpoint tau-leaping; the
                                                state-change matrix is the
                                                ordinal difference s - x,
                                                replacing the reference's
                                                .pth artifact dependency)
- PCTauL                  sampling.py:529-646  (tauLDR predictor-corrector)
- ConditionalTauLeaping   sampling.py:649-758
- ConditionalPCTauLeaping sampling.py:761-905
- ExactSampling           sampling.py:975-1061 (exact reverse step via
                                                q_{t-h|0} and q_{t|t-h})

`reverse_rates` replaces the loss-name dispatch of sampling.py:31-78 with an
explicit `rate_param` switch; `rate_param_from_loss` reproduces the reference
dispatch (including the effect of its always-true branch at sampling.py:61:
every non-tauLDR loss takes the CRM path).

- TAULStepSize            sampling.py:1088-1277 (tau-leaping + per-step
                                                step-size diagnostics; see
                                                class docstring for what of
                                                the reference's debug
                                                scaffolding is reproduced)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ctdd_tpu import registry
from ctdd_tpu.ops import indexing
from ctdd_tpu.ops.logprob import logprob_with_logits
from ctdd_tpu.utils.math import safe_log

TAULDR_LOSSES = ("CTElbo", "NLL", "CTElboLambda", "NLLOriginal")


def rate_param_from_loss(loss_name: str) -> str:
    """'p0t' (tauLDR x0-parameterization) or 'ratio' (CRM log-prob ratios).

    NLLOriginal trains the identical x0-parameterization as CTElbo (plain CE
    of p^θ_{0|t}, ref losses.py:1048-1103), so its reverse rates take the p0t
    path. The reference's dispatch (sampling.py:61) would instead route it
    down the CRM branch via the always-true `or "ScoreElbo"` bug — treating
    p(x0|xt) logits as marginal log-probs, which is not the math the loss
    trained. We normalize this (SURVEY.md §7 "known quirks")."""
    return "p0t" if loss_name in TAULDR_LOSSES else "ratio"


def get_sampler(cfg):
    return registry.samplers.get(cfg.sampler.name)(cfg)


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------


def get_initial_samples(
    key, N: int, D: int, S: int, initial_dist: str, initial_dist_std: float = None
) -> jnp.ndarray:
    """Uniform or discretized-Gaussian prior x_T (sampling.py:14-28)."""
    if initial_dist == "uniform":
        return jax.random.randint(key, (N, D), 0, S)
    if initial_dist == "gaussian":
        target = np.exp(
            -((np.arange(1, S + 1) - S // 2) ** 2) / (2 * float(initial_dist_std) ** 2)
        )
        logits = jnp.asarray(np.log(target / target.sum()), jnp.float32)
        return jax.random.categorical(key, jnp.broadcast_to(logits, (N, D, S)), axis=-1)
    raise ValueError(f"unrecognized initial dist {initial_dist}")


def reverse_rates(
    model, params, logits, x, t, *, rate_param: str, logit_type: str, eps: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """R̂_t(x → ·) per dim, shape (N, D, S)  (sampling.py:31-78).

    p0t path:   R̂(x,y) = R(y,x) · Σ_{x0} q_{t|0}(y|x0) p0t(x0|x) / q_{t|0}(x|x0)
    ratio path: R̂(x,y) = exp(ll_all - ll_xt) · R(x,y)
    """
    if rate_param == "p0t":
        qt0 = model.transition(t)  # (N, S, S)
        rate = model.rate(t)
        p0t = jax.nn.softmax(logits, axis=-1)  # (N, D, S)
        qt0_denom = indexing.cols(qt0, x) + eps  # q_{t|0}(x | x0) over x0
        forward_rates = indexing.cols(rate, x)  # R(·, x) over target states
        ratio = jnp.einsum(
            "bds,bsk->bdk", p0t / qt0_denom, qt0, preferred_element_type=jnp.float32
        )
        return forward_rates * ratio, ratio
    elif rate_param == "ratio":
        ll_all, ll_xt = logprob_with_logits(logit_type, model.process, x, t, logits)
        ratio = jnp.exp(ll_all - ll_xt[..., None])
        fwd_rate = model.rate_mat(x, t)  # (N, D, S)
        return ratio * fwd_rate, ratio
    raise ValueError(f"unknown rate_param {rate_param}")


def _shared_mats(process, t_scalar):
    """(S, S) transition/rate at one shared timestep (sampler steps share t;
    the batched (N, S, S) build would be N identical copies)."""
    t1 = jnp.reshape(t_scalar, (1,)).astype(jnp.float32)
    return process.transition(t1)[0], process.rate(t1)[0]


def reverse_rates_shared(
    process, logits, x, t_scalar, *, rate_param: str, logit_type: str,
    eps: float,
):
    """Shared-timestep reverse rates: one (S, S) q_{t|0}/R build for the whole
    batch and O(N·D) row-takes instead of (N, S, S) materialization + batched
    gathers. Semantics identical to `reverse_rates` when t is constant over
    the batch — which is every sampler step (sampling.py:120: t · ones(N))."""
    qt0, rate = _shared_mats(process, t_scalar)
    if rate_param == "p0t":
        p0t = jax.nn.softmax(logits, axis=-1)  # (N, D, S)
        qt0_denom = jnp.take(qt0.T, x, axis=0) + eps  # [n,d,s] = qt0[s, x[n,d]]
        forward_rates = jnp.take(rate.T, x, axis=0)  # R(s, x[n,d])
        ratio = jnp.einsum(
            "bds,sk->bdk", p0t / qt0_denom, qt0,
            preferred_element_type=jnp.float32,
        )
        return forward_rates * ratio
    elif rate_param == "ratio":
        if logit_type == "direct":
            log_prob = jax.nn.log_softmax(logits, axis=-1)
        elif logit_type == "reverse_prob":
            p0t = jax.nn.softmax(logits, axis=-1)
            log_prob = jnp.log(
                jnp.einsum("bds,sk->bdk", p0t, qt0,
                           preferred_element_type=jnp.float32) + 1e-35
            )
        elif logit_type == "reverse_logscale":
            log_p0t = jax.nn.log_softmax(logits, axis=-1)
            log_qt0 = jnp.where(qt0 <= 1e-35, -1e9, jnp.log(qt0 + 1e-35))
            log_prob = jax.nn.logsumexp(
                log_p0t[:, :, :, None] + log_qt0[None, None, :, :], axis=-2
            )
        else:
            raise ValueError(logit_type)
        ll_xt = jnp.take_along_axis(
            log_prob, x.astype(jnp.int32)[..., None], axis=-1
        )
        ratio = jnp.exp(log_prob - ll_xt)
        fwd_rate = jnp.take(rate, x, axis=0)  # R(x[n,d], s) rows
        return ratio * fwd_rate
    raise ValueError(f"unknown rate_param {rate_param}")


def poisson_inversion(key, lam, max_k: int = 12):
    """Poisson sampling by CDF inversion with a fixed unrolled series.

    XLA's `jax.random.poisson` (transformed rejection) costs ~5.5 ms on a
    (16, 784, 256) tensor on v5e — 80% of a whole tau-leap step, measured.
    Tau-leaping rates λ·h are ≪ 1 for all but the final few timesteps, so
    N = #{k < max_k : u > P(Poisson ≤ k)} with max_k terms is exact up to
    P(N > max_k), which is < 1e-6 for λ ≤ 3. For the rare λ > max_k/2
    entries (blow-up near t→min_t, where the reference clamps/rejects
    anyway) counts saturate at max_k.
    """
    u = jax.random.uniform(key, lam.shape)
    pmf = jnp.exp(-lam)  # P(N = 0)
    cdf = pmf
    n = jnp.zeros(lam.shape, jnp.int32)
    for k in range(1, max_k + 1):
        n = n + (u > cdf).astype(jnp.int32)
        pmf = pmf * lam / k
        cdf = cdf + pmf
    return n


def _poisson_jump_update(key, x, rates, h, S, is_ordinal: bool,
                         exact_poisson: bool = False):
    """Poisson tau-leap state update (sampling.py:129-164).

    Draw jump counts per (dim, target-state), apply the summed ordinal offset,
    clamp to [0, S-1]; non-ordinal mode rejects dims with >1 total jumps.
    """
    if exact_poisson:
        jump_nums = jax.random.poisson(key, rates * h, dtype=jnp.int32)
    else:
        jump_nums = poisson_inversion(key, rates * h)  # (N,D,S)
    if not is_ordinal:
        jump_num_sum = jnp.sum(jump_nums, axis=2)
        jump_nums = jump_nums * (jump_num_sum <= 1)[:, :, None]
    diff = jnp.arange(S, dtype=jnp.int32)[None, None, :] - x[:, :, None]
    overall_jump = jnp.sum(jump_nums * diff, axis=2)
    return jnp.clip(x + overall_jump, 0, S - 1)


def _categorical_euler_update(key, x, rev_rates, h, S):
    """LBJF / Euler categorical step (sampling.py:278-293, eq.17)."""
    xt_onehot = jax.nn.one_hot(x, S)
    post_0 = rev_rates * (1.0 - xt_onehot)
    off_diag = jnp.sum(post_0, axis=-1, keepdims=True)
    diag = jnp.clip(1.0 - h * off_diag, 0.0, None)
    posterior = post_0 * h + diag * xt_onehot
    posterior = posterior / jnp.sum(posterior, axis=-1, keepdims=True)
    return jax.random.categorical(key, jnp.log(posterior + 1e-35), axis=-1)


def _time_grid(max_t: float, min_t: float, num_steps: int):
    """ts ⊕ [0]; returns (t_k, h_k) pairs for the scan (sampling.py:107-109)."""
    ts = np.concatenate((np.linspace(max_t, min_t, num_steps), np.array([0.0])))
    hs = ts[:-1] - ts[1:]
    return jnp.asarray(ts[:-1], jnp.float32), jnp.asarray(hs, jnp.float32)


def _denoise_argmax(model, params, x, min_t, N):
    """Final argmax denoise p_{0|min_t} (sampling.py:223-229)."""
    t_ones = min_t * jnp.ones((N,), jnp.float32)
    p = jax.nn.softmax(model.apply(params, x, t_ones), axis=-1)
    return jnp.argmax(p, axis=-1)


class _SamplerBase:
    """Common config unpack shared by the registered samplers."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.D = cfg.model.concat_dim
        self.S = cfg.data.S
        self.num_steps = cfg.sampler.num_steps
        self.min_t = cfg.sampler.min_t
        self.max_t = cfg.training.get("max_t", 1.0)
        self.initial_dist = cfg.sampler.initial_dist
        self.initial_dist_std = cfg.model.get("Q_sigma", None)
        self.eps_ratio = cfg.sampler.eps_ratio
        self.num_corrector_steps = cfg.sampler.get("num_corrector_steps", 0)
        self.corrector_entry_time = cfg.sampler.get("corrector_entry_time", 0.0)
        self.corrector_step_size_multiplier = cfg.sampler.get(
            "corrector_step_size_multiplier", 1.5
        )
        self.is_ordinal = cfg.sampler.get("is_ordinal", True)
        # inversion Poisson by default (see poisson_inversion); flip to the
        # XLA rejection sampler with sampler.exact_poisson = True
        self.exact_poisson = bool(cfg.sampler.get("exact_poisson", False))
        self.loss_name = cfg.loss.name
        self.rate_param = rate_param_from_loss(self.loss_name)
        self.logit_type = cfg.loss.get("logit_type", "direct")
        # EBM models expose energies, not per-dim logits; build the per-dim
        # logits from all-mutation / bit-flip energy differences, exactly as
        # the reference's pluggable logit fns do (sampling.py:908-972)
        self.log_prob_kind = cfg.model.get("log_prob", "cat")
        # static dead-branch elimination: when the corrector can never fire
        # (entry time below the time grid), don't trace it at all — the
        # reference configs ship corrector_entry_time=0.0 with
        # num_corrector_steps=10, i.e. a corrector that never runs
        if self.corrector_entry_time < self.min_t:
            self.num_corrector_steps = 0
        # fused single-kernel tau-leap update (ops/fused_update.py): applies
        # on the p0t path with per-dim categorical logits; uses the Pallas
        # kernel on TPU when S is lane-aligned, the bit-faithful XLA mirror
        # otherwise (so the flag is testable on CPU)
        self.use_fused_update = bool(cfg.sampler.get("use_fused_update", False))
        # rematerialize the scan body (jax.checkpoint): shrinks the compiled
        # program's live set — mitigation probe for the bf16 1000-step scan
        # compile crash (scripts/bf16_scan_repro.py)
        self.remat_scan_body = bool(cfg.sampler.get("remat_scan_body", False))
        # host-chunked scan: compile ONE K-step scan program and drive it
        # num_steps/K times from the host, carry device-resident. The
        # workaround for the bf16 1000-step scan worker crash: short-trip
        # bf16 scans compile fine on this stack (<=50 steps at every batch
        # measured), so K pins program size at a known-good point while the
        # PRNG stream, time grid and carry chain stay bitwise identical to
        # the single-scan program (regression-tested). Costs one host
        # dispatch per chunk (~ms against seconds of chunk compute).
        self.host_chunk_steps = int(cfg.sampler.get("host_chunk_steps", 0))
        if self.host_chunk_steps and self.num_steps % self.host_chunk_steps:
            raise ValueError(
                f"sampler.host_chunk_steps={self.host_chunk_steps} must "
                f"divide sampler.num_steps={self.num_steps}"
            )

    def _maybe_remat(self, step_fn):
        return jax.checkpoint(step_fn) if self.remat_scan_body else step_fn

    def _fused_applicable(self):
        # exact_poisson requests the XLA rejection sampler; the fused kernel
        # only implements the max_k CDF-inversion Poisson, so the two flags
        # would silently contradict — let exact_poisson win
        return (
            self.use_fused_update
            and not self.exact_poisson
            and self.rate_param == "p0t"
            and self.log_prob_kind == "cat"
        )

    def _fused_step(self, logits, x_gather, x_base, qt0, rate, h, key_or_seed,
                    *, mode):
        from ctdd_tpu.ops import fused_update as _fu

        if jax.default_backend() == "tpu" and self.S % 128 == 0:
            seed = (
                0 if mode == "expected"
                else jax.random.randint(key_or_seed, (), 0, 2**31 - 1)
            )
            return _fu.fused_tau_leap_update(
                logits, x_gather, x_base, qt0, rate, h, self.eps_ratio, seed,
                mode=mode, is_ordinal=self.is_ordinal,
            )
        return _fu.fused_tau_leap_update_xla(
            logits, x_gather, x_base, qt0, rate, h, self.eps_ratio,
            key=None if mode == "expected" else key_or_seed, mode=mode,
            is_ordinal=self.is_ordinal,
        )

    def _net_logits(self, model, params, x, t_ones):
        """(N, D, S) logits; EBM energies routed through the mutation
        enumerators (ref cat_logits/ebm_logits/bin_ebm_logits, :908-972)."""
        if self.log_prob_kind == "ebm":
            from ctdd_tpu.losses.losses import ebm_all_mutation_logits

            return ebm_all_mutation_logits(model, params, x, t_ones, self.S)
        if self.log_prob_kind == "bin_ebm":
            from ctdd_tpu.losses.losses import bin_ebm_flip_logits

            return bin_ebm_flip_logits(model, params, x, t_ones)
        return model.apply(params, x, t_ones)

    def _rev_rates(self, model, params, x, t_ones):
        logits = self._net_logits(model, params, x, t_ones)
        return reverse_rates_shared(
            model.process, logits, x, t_ones[0],
            rate_param=self.rate_param, logit_type=self.logit_type,
            eps=self.eps_ratio,
        )

    def sample(self, model, params, key, N: int, label=None,
               cfg_scale: float = 0.0):
        """Host entry: jits the device loop once per (model, N) and runs it.

        `label` (per-sample class ids) + `cfg_scale` drive label-conditional
        generation on label-capable models (DiT): the label is bound into the
        model handle so every per-step network call — and the final argmax
        denoise — is conditioned (classifier-free guided when cfg_scale > 0).
        """
        with_label = label is not None
        lab = (
            jnp.asarray(label, jnp.int32)
            if with_label
            else jnp.zeros((N,), jnp.int32)
        )
        if self.host_chunk_steps:
            x, diags = self._sample_host_chunked(
                model, params, key, N, lab, with_label, float(cfg_scale)
            )
        else:
            x, diags = self._jitted(
                model.module, N, with_label, float(cfg_scale)
            )(model.process, params, key, lab)
        return np.asarray(jax.device_get(x)).astype(int), jax.device_get(diags)

    @functools.lru_cache(maxsize=8)
    def _jitted(self, module, N, with_label=False, cfg_scale=0.0):
        from ctdd_tpu.models.base import DiffusionModel

        def run(process, params, key, label):
            model = DiffusionModel(
                module=module, process=process, cfg=self.cfg,
                has_label=with_label,
                bound_label=label if with_label else None,
                cfg_scale=cfg_scale,
                # DiTWrapper builds LabelEmbedder(num_classes=S); its dropped-
                # label row is index S (dit.py:240 convention)
                null_label=self.S,
            )
            return self._sample_loop(model, params, key, N)

        return jax.jit(run)

    def _make_step(self, model, params, N):
        """Return the (carry, (t, h, key)) -> (carry, diags) scan body.

        Samplers with the common init → scan → denoise skeleton define only
        this; they inherit `_sample_loop` and host-chunked sampling."""
        raise NotImplementedError(
            f"{type(self).__name__} does not factor its scan body through "
            "_make_step (required for sampler.host_chunk_steps)"
        )

    def _sample_loop(self, model, params, key, N):
        """Default device loop: init → scan(_make_step) → argmax denoise."""
        k_init, k_scan = jax.random.split(key)
        x = get_initial_samples(
            k_init, N, self.D, self.S, self.initial_dist, self.initial_dist_std
        )
        ts, hs = _time_grid(self.max_t, self.min_t, self.num_steps)
        keys = jax.random.split(k_scan, self.num_steps)
        x, diags = jax.lax.scan(
            self._maybe_remat(self._make_step(model, params, N)),
            x, (ts, hs, keys),
        )
        if self.loss_name in TAULDR_LOSSES:
            x = _denoise_argmax(model, params, x, self.min_t, N)
        return x, diags

    @functools.lru_cache(maxsize=8)
    def _jitted_chunked(self, module, N, with_label=False, cfg_scale=0.0):
        from ctdd_tpu.models.base import DiffusionModel

        def bind(process, label):
            return DiffusionModel(
                module=module, process=process, cfg=self.cfg,
                has_label=with_label,
                bound_label=label if with_label else None,
                cfg_scale=cfg_scale, null_label=self.S,
            )

        def init_fn(key):
            return get_initial_samples(
                key, N, self.D, self.S, self.initial_dist,
                self.initial_dist_std,
            )

        def chunk_fn(process, params, x, ts_c, hs_c, keys_c, label):
            model = bind(process, label)
            step = self._maybe_remat(self._make_step(model, params, N))
            return jax.lax.scan(step, x, (ts_c, hs_c, keys_c))

        def denoise_fn(process, params, x, label):
            return _denoise_argmax(bind(process, label), params, x,
                                   self.min_t, N)

        return jax.jit(init_fn), jax.jit(chunk_fn), jax.jit(denoise_fn)

    def _sample_host_chunked(self, model, params, key, N, label, with_label,
                             cfg_scale):
        """Drive the scan as num_steps/K host-dispatched K-step programs.

        Same step fn, same up-front key fan-out, same carry chain as the
        single-scan program — only the program boundary moves, so results
        are bitwise-identical (tests/test_sampler_convergence.py pins this)
        while the compiled program stays at the known-good K-step size
        (bf16 1000-step worker-crash workaround, docs/DESIGN_NOTES.md)."""
        init_fn, chunk_fn, denoise_fn = self._jitted_chunked(
            model.module, N, with_label, cfg_scale
        )
        K = self.host_chunk_steps
        k_init, k_scan = jax.random.split(key)
        x = init_fn(k_init)
        ts, hs = _time_grid(self.max_t, self.min_t, self.num_steps)
        keys = jax.random.split(k_scan, self.num_steps)
        chunk_diags = []
        for c in range(self.num_steps // K):
            sl = slice(c * K, (c + 1) * K)
            x, d = chunk_fn(
                model.process, params, x, ts[sl], hs[sl], keys[sl], label
            )
            chunk_diags.append(d)
        if self.loss_name in TAULDR_LOSSES:
            x = denoise_fn(model.process, params, x, label)
        diags = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *chunk_diags
        )
        return x, diags


# ---------------------------------------------------------------------------
# TauL — tau-leaping with optional corrector (sampling.py:81-234)
# ---------------------------------------------------------------------------


@registry.samplers.register
class TauL(_SamplerBase):
    def _corrector_rates(self, model, params, x, t_ones):
        _, rate = _shared_mats(model.process, t_ones[0])
        rev = self._rev_rates(model, params, x, t_ones)
        rev = indexing.zero_at(rev, x)
        transpose_forward = jnp.take(rate, x, axis=0)  # R(x, ·) rows
        corrector = transpose_forward + rev
        return indexing.zero_at(corrector, x)

    def _make_step(self, model, params, N):
        S = self.S

        def step(x, inp):
            t, h, k = inp
            k_jump, k_corr = jax.random.split(k)
            t_ones = t * jnp.ones((N,), jnp.float32)
            if self._fused_applicable():
                logits = self._net_logits(model, params, x, t_ones)
                qt0, rate = _shared_mats(model.process, t)
                x_new = self._fused_step(
                    logits, x, x, qt0, rate, h, k_jump, mode="poisson"
                )
            else:
                rev = self._rev_rates(model, params, x, t_ones)
                rev = rev * indexing.onehot_mask(x, S)
                x_new = _poisson_jump_update(
                    k_jump, x, rev, h, S, self.is_ordinal, self.exact_poisson
                )
            changes = jnp.sum(x != x_new) / N

            if self.num_corrector_steps > 0:
                def do_corr(x_c):
                    def body(i, carry):
                        xc, kc = carry
                        kc, ku = jax.random.split(kc)
                        corr = self._corrector_rates(model, params, xc, t_ones)
                        xc = _poisson_jump_update(
                            ku, xc, corr, h, S, self.is_ordinal,
                            self.exact_poisson,
                        )
                        return (xc, kc)

                    out, _ = jax.lax.fori_loop(
                        0, self.num_corrector_steps, body, (x_c, k_corr)
                    )
                    return out

                x_new = jax.lax.cond(
                    t <= self.corrector_entry_time, do_corr, lambda xc: xc, x_new
                )
            return x_new, changes

        return step


# ---------------------------------------------------------------------------
# TAULStepSize — tau-leaping + step-size diagnostics (sampling.py:1088-1277)
# ---------------------------------------------------------------------------


@registry.samplers.register
class TAULStepSize(TauL):
    """Tau-leaping with per-step step-size diagnostics (sampling.py:1088-1277).

    The reference version is research scaffolding — per-element autograd
    ``print()`` calls inside the hot loop make it unrunnable beyond toy
    sizes — but its measurable intent is a TauL run that reports, per
    timestep, how the step size h interacts with the Poisson jump proposal:

    - ``frac_jumped``:  fraction of (n, d) coordinates proposing any net jump
      (the reference's ``change_jump``, sampling.py:1205)
    - ``frac_multi``:   fraction proposing >1 total jumps — the ordinal-clamp
      / rejection load (``change_clamp``, sampling.py:1190-1192)
    - ``frac_clipped``: fraction whose post-clamp state actually changed
      (``change_clip``, sampling.py:1208); ``frac_jumped - frac_clipped`` is
      the proposal mass lost to the [0, S-1] boundary clip

    ``sample()`` returns ``(x0, diags)`` with each trace a (num_steps,)
    array — one scan, no host round-trips. The per-element rate-gradient
    prints the reference computes and discards (sampling.py:1127-1152) are
    deliberately not reproduced: they were debug output, not sampler
    function. The corrector branch matches TauL's (as the reference's does,
    sampling.py:1211-1266).
    """

    def _make_step(self, model, params, N):
        S = self.S

        def step(x, inp):
            t, h, k = inp
            k_jump, k_corr = jax.random.split(k)
            t_ones = t * jnp.ones((N,), jnp.float32)
            rev = self._rev_rates(model, params, x, t_ones)
            rev = rev * indexing.onehot_mask(x, S)
            if self.exact_poisson:
                jump_nums = jax.random.poisson(k_jump, rev * h, dtype=jnp.int32)
            else:
                jump_nums = poisson_inversion(k_jump, rev * h)
            jump_sum = jnp.sum(jump_nums, axis=2)
            frac_multi = jnp.mean((jump_sum > 1).astype(jnp.float32))
            if not self.is_ordinal:
                jump_nums = jump_nums * (jump_sum <= 1)[:, :, None]
            diff = (
                jnp.arange(S, dtype=jnp.int32)[None, None, :] - x[:, :, None]
            )
            xp = x + jnp.sum(jump_nums * diff, axis=2)
            frac_jumped = jnp.mean((xp != x).astype(jnp.float32))
            x_new = jnp.clip(xp, 0, S - 1)
            frac_clipped = jnp.mean((x_new != x).astype(jnp.float32))

            if self.num_corrector_steps > 0:
                def do_corr(x_c):
                    def body(i, carry):
                        xc, kc = carry
                        kc, ku = jax.random.split(kc)
                        corr = self._corrector_rates(model, params, xc, t_ones)
                        xc = _poisson_jump_update(
                            ku, xc, corr, h, S, self.is_ordinal,
                            self.exact_poisson,
                        )
                        return (xc, kc)

                    out, _ = jax.lax.fori_loop(
                        0, self.num_corrector_steps, body, (x_c, k_corr)
                    )
                    return out

                x_new = jax.lax.cond(
                    t <= self.corrector_entry_time, do_corr, lambda xc: xc,
                    x_new,
                )
            diags = dict(
                frac_jumped=frac_jumped, frac_multi=frac_multi,
                frac_clipped=frac_clipped,
            )
            return x_new, diags

        return step


# ---------------------------------------------------------------------------
# LBJF — Euler / locally-balanced jump factorization (sampling.py:237-356)
# ---------------------------------------------------------------------------


@registry.samplers.register
class LBJF(_SamplerBase):
    # argmax denoise for every x0-parameterization loss (the reference
    # gates LBJF's on CTElbo only, sampling.py:349; normalized here) —
    # inherited _sample_loop applies the same TAULDR_LOSSES gate
    def _make_step(self, model, params, N):
        S = self.S

        def step(x, inp):
            t, h, k = inp
            k_cat, k_corr = jax.random.split(k)
            t_ones = t * jnp.ones((N,), jnp.float32)
            rev = self._rev_rates(model, params, x, t_ones)
            x_new = _categorical_euler_update(k_cat, x, rev, h, S)
            changes = jnp.sum(x != x_new) / N

            if self.num_corrector_steps > 0:
                _, rate1 = _shared_mats(model.process, t)

                def do_corr(x_c):
                    def body(i, carry):
                        xc, kc = carry
                        kc, ku = jax.random.split(kc)
                        rev_c = self._rev_rates(model, params, xc, t_ones)
                        transpose_forward = jnp.take(rate1, xc, axis=0)
                        corr = indexing.zero_at(rev_c + transpose_forward, xc)
                        xc = _categorical_euler_update(ku, xc, corr, h, S)
                        return (xc, kc)

                    out, _ = jax.lax.fori_loop(
                        0, self.num_corrector_steps, body, (x_c, k_corr)
                    )
                    return out

                x_new = jax.lax.cond(
                    t <= self.corrector_entry_time, do_corr, lambda xc: xc, x_new
                )
            return x_new, changes

        return step


# ---------------------------------------------------------------------------
# MidPointTauL — midpoint tau-leaping (sampling.py:359-526)
# ---------------------------------------------------------------------------


@registry.samplers.register
class MidPointTauL(_SamplerBase):
    """Midpoint tau-leaping (the thesis' novel sampler, README.md:24).

    state_change[s, x] = s - x — the ordinal difference, matching the
    hardcoded maze/binary matrices (sampling.py:382-388) and replacing the
    MNIST .pth artifact (sampling.py:377-380) with the same ordinal rule.
    """

    def _sample_loop(self, model, params, key, N):
        S, D = self.S, self.D
        k_init, k_scan = jax.random.split(key)
        x = get_initial_samples(
            k_init, N, D, S, self.initial_dist, self.initial_dist_std
        )
        h = (self.max_t - self.min_t) / self.num_steps
        # while t - h/2 > min_t  (sampling.py:414)
        n_steps = int(np.ceil((self.max_t - 0.5 * h - self.min_t) / h - 1e-9))
        ts = jnp.asarray(
            self.max_t - h * np.arange(n_steps), jnp.float32
        )
        keys = jax.random.split(k_scan, n_steps)

        def _state_change(xc):
            # gathered state-change matrix entry [s, x_d] = s - x_d
            return (
                jnp.arange(S, dtype=jnp.float32)[None, None, :]
                - xc[:, :, None].astype(jnp.float32)
            )

        def step(x, inp):
            t, k = inp
            t_ones = t * jnp.ones((N,), jnp.float32)
            t_05 = t_ones - 0.5 * h

            if self._fused_applicable():
                # half-step expected drift -> x' (one fused kernel)
                logits = self._net_logits(model, params, x, t_ones)
                qt0, rate = _shared_mats(model.process, t)
                x_prime = self._fused_step(
                    logits, x, x, qt0, rate, 0.5 * h, k, mode="expected"
                )
                # full Poisson step with rates at (x', t - h/2), from x
                logits_p = self._net_logits(model, params, x_prime, t_05)
                qt0_05, rate_05 = _shared_mats(model.process, t_05[0])
                x_new = self._fused_step(
                    logits_p, x_prime, x, qt0_05, rate_05, h, k,
                    mode="poisson",
                )
                changes = jnp.sum(x != x_new) / (N * D)
                return x_new, changes

            # half-step expected drift -> x'
            rev = self._rev_rates(model, params, x, t_ones)
            rev = indexing.zero_at(rev, x)
            change = jnp.round(
                0.5 * h * jnp.sum(rev * _state_change(x), axis=-1)
            ).astype(jnp.int32)
            x_prime = jnp.clip(x + change, 0, S - 1)

            # full step with rates at (x', t - h/2), applied from x
            rev_p = self._rev_rates(model, params, x_prime, t_05)
            rev_p = indexing.zero_at(rev_p, x_prime)
            state_change_p = _state_change(x_prime)
            if self.exact_poisson:
                flips = jax.random.poisson(k, rev_p * h, dtype=jnp.int32)
            else:
                flips = poisson_inversion(k, rev_p * h)
            if not self.is_ordinal:
                tot = jnp.sum(flips, axis=-1, keepdims=True)
                flips = flips * (tot <= 1)
            avg_offset = jnp.sum(
                flips.astype(jnp.float32) * state_change_p, axis=-1
            ).astype(jnp.int32)
            x_new = jnp.clip(x + avg_offset, 0, S - 1)
            changes = jnp.sum(x != x_new) / (N * D)
            return x_new, changes

        x, change_dim = jax.lax.scan(self._maybe_remat(step), x, (ts, keys))
        if self.loss_name in TAULDR_LOSSES:
            x = _denoise_argmax(model, params, x, self.min_t, N)
        return x, change_dim


# ---------------------------------------------------------------------------
# PCTauL — tauLDR predictor-corrector (sampling.py:529-646)
# ---------------------------------------------------------------------------


@registry.samplers.register
class PCTauL(_SamplerBase):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.rate_param = "p0t"  # original tauLDR scheme
        # PCTauL hardcodes gaussian std 200 in the reference (sampling.py:548)
        self.initial_dist_std = 200.0

    def _rates_pair(self, model, params, x, t_ones):
        rev = self._rev_rates(model, params, x, t_ones)
        rev = indexing.zero_at(rev, x)
        _, rate = _shared_mats(model.process, t_ones[0])
        transpose_forward = jnp.take(rate, x, axis=0)
        return transpose_forward, rev

    def _sample_loop(self, model, params, key, N):
        S, D = self.S, self.D
        k_init, k_scan = jax.random.split(key)
        x = get_initial_samples(
            k_init, N, D, S, self.initial_dist, self.initial_dist_std
        )
        h0 = 1.0 / self.num_steps
        ts = np.linspace(1.0, self.min_t + h0, self.num_steps)
        hs = ts[:-1] - ts[1:]
        ts_scan = jnp.asarray(ts[:-1], jnp.float32)
        hs_scan = jnp.asarray(hs, jnp.float32)
        keys = jax.random.split(k_scan, len(hs))

        def step(x, inp):
            t, h, k = inp
            k_pred, k_corr = jax.random.split(k)
            t_ones = t * jnp.ones((N,), jnp.float32)
            _, rev = self._rates_pair(model, params, x, t_ones)
            x = _poisson_jump_update(
                k_pred, x, rev, h, S, is_ordinal=True,
                exact_poisson=self.exact_poisson,
            )

            def do_corr(x_c):
                t_corr = (t - h) * jnp.ones((N,), jnp.float32)

                def body(i, carry):
                    xc, kc = carry
                    kc, ku = jax.random.split(kc)
                    tf, rv = self._rates_pair(model, params, xc, t_corr)
                    corr = indexing.zero_at(tf + rv, xc)
                    xc = _poisson_jump_update(
                        ku, xc, corr, self.corrector_step_size_multiplier * h,
                        S, is_ordinal=True, exact_poisson=self.exact_poisson,
                    )
                    return (xc, kc)

                out, _ = jax.lax.fori_loop(
                    0, self.num_corrector_steps, body, (x_c, k_corr)
                )
                return out

            if self.num_corrector_steps > 0:
                x = jax.lax.cond(
                    t <= self.corrector_entry_time, do_corr, lambda xc: xc, x
                )
            return x, jnp.float32(0.0)

        x, _ = jax.lax.scan(self._maybe_remat(step), x, (ts_scan, hs_scan, keys))
        x = _denoise_argmax(model, params, x, self.min_t, N)
        return x, jnp.zeros((1,))


# ---------------------------------------------------------------------------
# Conditional samplers (sampling.py:649-905)
# ---------------------------------------------------------------------------


class _ConditionalBase(_SamplerBase):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.condition_dim = cfg.sampler.condition_dim
        self.total_D = cfg.data.shape[0]
        self.sample_D = self.total_D - self.condition_dim
        self.reject_multiple_jumps = cfg.sampler.get("reject_multiple_jumps", False)
        self.noise_prefix = cfg.sampler.get("noise_prefix", False)
        if self.initial_dist != "gaussian":
            self.initial_dist_std = None

    def sample(self, model, params, key, N: int, conditioner=None):
        assert conditioner is not None and conditioner.shape[0] == N
        out = self._jitted(model.module, N)(
            model.process, params, key, jnp.asarray(conditioner)
        )
        x, diags = out
        return np.asarray(jax.device_get(x)).astype(int)

    @functools.lru_cache(maxsize=8)
    def _jitted(self, module, N):
        from ctdd_tpu.models.base import DiffusionModel

        def run(process, params, key, conditioner):
            model = DiffusionModel(module=module, process=process, cfg=self.cfg)
            return self._sample_loop(model, params, key, N, conditioner)

        return jax.jit(run)

    def _cond_p0t(self, model, params, conditioner, x, t_ones):
        model_in = jnp.concatenate([conditioner, x], axis=1)
        logits = model.apply(params, model_in, t_ones)
        return logits[:, self.condition_dim :, :]

    def _prefix_at_t(self, model, key, conditioner, t_scalar):
        """Forward-diffuse the clean prefix to the chain's current time.

        ``sampler.noise_prefix = True`` decode rule for models trained
        UNconditionally on full sequences (loss.name=NLLOriginal — the
        tauLDR piano protocol; the reference's ConditionalTauLeaping,
        sampling.py:649-758, always feeds the clean conditioner instead).
        A clean prefix concatenated to a t≈1 suffix is off the training
        distribution of such a model — q_{t|0}-noising the prefix to the
        chain's own t keeps every network input in-distribution, while the
        returned sample still carries the true clean prefix (the final
        p0t/denoise call at min_t uses the clean conditioner). One fresh
        draw per scan step (not a bridged trajectory): exact for the
        factorized forward process marginals the model was trained on.
        """
        qt0, _ = _shared_mats(model.process, t_scalar)
        logits = safe_log(jnp.take(qt0, conditioner, axis=0))
        return jax.random.categorical(key, logits, axis=-1)

    def _step_conditioner(self, model, key, conditioner, t_scalar):
        """(key', conditioner') for one scan step. Splits the step key ONLY
        when noise_prefix is on, so the default decode's RNG stream — and
        the bitwise regression pins on it — is unchanged by the flag's
        existence."""
        if not self.noise_prefix:
            return key, conditioner
        key, k_pre = jax.random.split(key)
        return key, self._prefix_at_t(model, k_pre, conditioner, t_scalar)

    def _cond_rates(self, model, params, conditioner, x, t_ones):
        """(transpose_forward, reverse) rates on sampled dims
        (sampling.py:699-726, 802-856)."""
        qt0, rate = _shared_mats(model.process, t_ones[0])
        logits = self._cond_p0t(model, params, conditioner, x, t_ones)
        p0t = jax.nn.softmax(logits, axis=-1)
        qt0_denom = jnp.take(qt0.T, x, axis=0) + self.eps_ratio
        forward_rates = jnp.take(rate.T, x, axis=0)
        inner = jnp.einsum(
            "bds,sk->bdk", p0t / qt0_denom, qt0, preferred_element_type=jnp.float32
        )
        rev = indexing.zero_at(forward_rates * inner, x)
        transpose_forward = jnp.take(rate, x, axis=0)
        return transpose_forward, rev


@registry.samplers.register
class ConditionalTauLeaping(_ConditionalBase):
    def _sample_loop(self, model, params, key, N, conditioner):
        S = self.S
        k_init, k_scan = jax.random.split(key)
        x = get_initial_samples(
            k_init, N, self.sample_D, S, self.initial_dist, self.initial_dist_std
        )
        ts, hs = _time_grid(1.0, self.min_t, self.num_steps)
        keys = jax.random.split(k_scan, self.num_steps)

        def step(x, inp):
            t, h, k = inp
            k, cond_step = self._step_conditioner(model, k, conditioner, t)
            t_ones = t * jnp.ones((N,), jnp.float32)
            _, rev = self._cond_rates(model, params, cond_step, x, t_ones)
            # NOTE: reference computes the rejection mask but then overwrites
            # adj_diffs with the unmasked product (sampling.py:734-744) — so
            # reject_multiple_jumps is a no-op there; we honor the flag.
            x_new = _poisson_jump_update(
                k, x, rev, h, S, is_ordinal=not self.reject_multiple_jumps,
                exact_poisson=self.exact_poisson,
            )
            return x_new, jnp.float32(0.0)

        x, _ = jax.lax.scan(self._maybe_remat(step), x, (ts, hs, keys))
        t_min = self.min_t * jnp.ones((N,), jnp.float32)
        p0t = jax.nn.softmax(
            self._cond_p0t(model, params, conditioner, x, t_min), axis=-1
        )
        x0max = jnp.argmax(p0t, axis=-1)
        return jnp.concatenate([conditioner, x0max], axis=1), jnp.zeros((1,))


@registry.samplers.register
class ConditionalPCTauLeaping(_ConditionalBase):
    def _sample_loop(self, model, params, key, N, conditioner):
        S = self.S
        k_init, k_scan = jax.random.split(key)
        x = get_initial_samples(
            k_init, N, self.sample_D, S, self.initial_dist, self.initial_dist_std
        )
        h0 = 1.0 / self.num_steps
        ts = np.linspace(1.0, self.min_t + h0, self.num_steps)
        hs = ts[:-1] - ts[1:]
        keys = jax.random.split(k_scan, len(hs))

        def step(x, inp):
            t, h, k = inp
            k_pred, k_corr = jax.random.split(k)
            t_ones = t * jnp.ones((N,), jnp.float32)
            _, rev = self._cond_rates(model, params, conditioner, x, t_ones)
            x = _poisson_jump_update(
                k_pred, x, rev, h, S,
                is_ordinal=not self.reject_multiple_jumps,
                exact_poisson=self.exact_poisson,
            )

            def do_corr(x_c):
                t_corr = (t - h) * jnp.ones((N,), jnp.float32)

                def body(i, carry):
                    xc, kc = carry
                    kc, ku = jax.random.split(kc)
                    tf, rv = self._cond_rates(model, params, conditioner, xc, t_corr)
                    corr = indexing.zero_at(tf + rv, xc)
                    xc = _poisson_jump_update(
                        ku, xc, corr, self.corrector_step_size_multiplier * h,
                        S, is_ordinal=not self.reject_multiple_jumps,
                        exact_poisson=self.exact_poisson,
                    )
                    return (xc, kc)

                out, _ = jax.lax.fori_loop(
                    0, self.num_corrector_steps, body, (x_c, k_corr)
                )
                return out

            if self.num_corrector_steps > 0:
                x = jax.lax.cond(
                    t <= self.corrector_entry_time, do_corr, lambda xc: xc, x
                )
            return x, jnp.float32(0.0)

        x, _ = jax.lax.scan(self._maybe_remat(step), x, (jnp.asarray(ts[:-1], jnp.float32),
                                      jnp.asarray(hs, jnp.float32), keys))
        t_min = self.min_t * jnp.ones((N,), jnp.float32)
        p0t = jax.nn.softmax(
            self._cond_p0t(model, params, conditioner, x, t_min), axis=-1
        )
        x0max = jnp.argmax(p0t, axis=-1)
        return jnp.concatenate([conditioner, x0max], axis=1), jnp.zeros((1,))


@registry.samplers.register
class ConditionalLBJF(_ConditionalBase):
    """Conditional categorical-Euler (LBJF) decode — beyond-reference.

    The reference ships only Poisson tau-leap conditional decoders
    (sampling.py:649-905). On this repo's decode sweeps LBJF is the best
    decode on both maze (44.5% vs 37.1%) and sudoku (23.4% vs 15.2%) at
    identical checkpoints, so the conditional path exposes it too: the
    same `_cond_rates` reverse rates, stepped with the exact one-jump
    categorical posterior (eq.17, `_categorical_euler_update`) instead of
    Poisson jump counts. Unlike tau-leaping — which freezes wherever the
    per-step jump mass λ·h ≪ 1 and a zero Poisson draw keeps the state —
    the Euler posterior renormalizes over {stay, jump} each step, so small
    but directed reverse rates still move the chain.
    """

    def _sample_loop(self, model, params, key, N, conditioner):
        S = self.S
        k_init, k_scan = jax.random.split(key)
        x = get_initial_samples(
            k_init, N, self.sample_D, S, self.initial_dist, self.initial_dist_std
        )
        ts, hs = _time_grid(1.0, self.min_t, self.num_steps)
        keys = jax.random.split(k_scan, self.num_steps)

        def step(x, inp):
            t, h, k = inp
            k, cond_step = self._step_conditioner(model, k, conditioner, t)
            t_ones = t * jnp.ones((N,), jnp.float32)
            _, rev = self._cond_rates(model, params, cond_step, x, t_ones)
            x_new = _categorical_euler_update(k, x, rev, h, S)
            return x_new, jnp.float32(0.0)

        x, _ = jax.lax.scan(self._maybe_remat(step), x, (ts, hs, keys))
        t_min = self.min_t * jnp.ones((N,), jnp.float32)
        p0t = jax.nn.softmax(
            self._cond_p0t(model, params, conditioner, x, t_min), axis=-1
        )
        x0max = jnp.argmax(p0t, axis=-1)
        return jnp.concatenate([conditioner, x0max], axis=1), jnp.zeros((1,))


# ---------------------------------------------------------------------------
# ExactSampling (sampling.py:975-1061)
# ---------------------------------------------------------------------------


@registry.samplers.register
class ExactSampling(_SamplerBase):
    """Exact reverse-CTMC ancestral step via q_{t-h|0} and q_{t|t-h}.

    Per-dim bridge posterior, marginalized over the model's x0:
        p(x_{t-h}=k | x_t, x0=s) = q_{t-h|0}(k|s) · q_{t|t-h}(x_t|k) / q_{t|0}(x_t|s)
        p(x_{t-h}=k | x_t)       = Σ_s p0t(s|x_t) · p(k | x_t, s)
    computed as one (N,D,S)x(S,S) MXU matmul plus a column gather — S× less
    memory than the reference's (N,D,S,S) logsumexp (sampling.py:1047-1052).

    NOTE a deliberate parity break: the reference OMITS the 1/q_{t|0}(x_t|s)
    bridge denominator (sampling.py:1040-1052 multiplies q_teps_0 by
    q_t_teps only), which biases the mixture toward x0-states that explain
    x_t and suppresses late-time corrections by a factor of ~q_{t|0}'s
    off-diagonal mass (≈0.02 at t=0.1 on the maze process) — measured on a
    trained maze net, its one-step kernel carries 27× too little jump mass
    at t=0.1 vs the CTElbo reverse rates, the chain freezes, and maze
    solvability collapses to ~0%. With the denominator the h→0 limit of
    this kernel IS the tauLDR reverse rate R̂ (identical to get_reverse_rates'
    CTElbo path), the oracle convergence test passes at tight min_t, and
    trained-net Exact quality matches the other samplers.
    """

    def _sample_loop(self, model, params, key, N):
        S = self.S
        k_init, k_scan = jax.random.split(key)
        x = get_initial_samples(
            k_init, N, self.D, S, self.initial_dist, self.initial_dist_std
        )
        ts, hs = _time_grid(self.max_t, self.min_t, self.num_steps)
        keys = jax.random.split(k_scan, self.num_steps)

        def step(x, inp):
            t, h, k = inp
            t_ones = t * jnp.ones((N,), jnp.float32)
            logits = self._net_logits(model, params, x, t_ones)
            p0t = jax.nn.softmax(logits, axis=-1)  # (N, D, S)

            t1 = jnp.reshape(t, (1,)).astype(jnp.float32)
            q_teps_0 = model.transition(t1 - h)[0]  # (S, S)
            q_t_teps = model.transit_between(t1 - h, t1)[0]  # (S, S)
            qt0 = model.transition(t1)[0]  # (S, S)
            # q_{t|t-h}(x_t | k) as a function of k, per dim:
            trans_cols = jnp.take(q_t_teps.T, x, axis=0)  # (N, D, S)
            # bridge denominator q_{t|0}(x_t | s) as a function of s:
            qt0_denom = jnp.take(qt0.T, x, axis=0) + self.eps_ratio  # (N, D, S)
            marg = jnp.einsum(
                "bds,sk->bdk", p0t / qt0_denom, q_teps_0,
                preferred_element_type=jnp.float32,
            )
            log_prob = safe_log(marg) + safe_log(trans_cols)
            x_new = jax.random.categorical(k, log_prob, axis=-1)
            changes = jnp.sum(x_new != x) / (N * self.D)
            return x_new, changes

        x, change_jump = jax.lax.scan(self._maybe_remat(step), x, (ts, hs, keys))
        return x, change_jump


# Reference-config alias names. The reference configs ship sampler names that
# its own registry never registers (its notebooks override cfg.sampler.name at
# runtime — SURVEY.md §7 "known quirks"): ElboTauL/TauLeaping are TauL runs,
# CRMLBJF/LBJFSampling/CRMebmLBJF are LBJF runs (the ebm variant picks up the
# energy logit builder via cfg.model.log_prob). Registering the aliases makes
# every reference config resolve verbatim.
registry.samplers.alias("ElboTauL", "TauL")
registry.samplers.alias("TauLeaping", "TauL")
registry.samplers.alias("CRMLBJF", "LBJF")
registry.samplers.alias("LBJFSampling", "LBJF")
registry.samplers.alias("CRMebmLBJF", "LBJF")


def lbjf_corrector_step(cfg, model, params, key, xt, t, h, N, xt_target=None):
    """Standalone LBJF corrector kernel (sampling.py:1064-1085)."""
    if xt_target is None:
        xt_target = xt
    S = cfg.data.S
    t_ones = t * jnp.ones((N,), jnp.float32)
    logits = model.apply(params, xt, t_ones)
    ll_all, ll_xt = logprob_with_logits(
        cfg.loss.get("logit_type", "direct"), model.process, xt, t_ones, logits
    )
    log_weight = ll_all - ll_xt[..., None]
    fwd_rate = model.rate_mat(xt, t_ones)
    xt_onehot = jax.nn.one_hot(xt_target, S)
    posterior = h * (jnp.exp(log_weight) * fwd_rate + fwd_rate)
    off_diag_post = posterior * (1.0 - xt_onehot)
    off_diag = jnp.sum(off_diag_post, axis=-1, keepdims=True)
    diag = jnp.clip(1.0 - off_diag, 0.0, None)
    posterior = off_diag_post + diag * xt_onehot
    posterior = posterior / jnp.sum(posterior, axis=-1, keepdims=True)
    return jax.random.categorical(key, jnp.log(posterior + 1e-35), axis=-1)
