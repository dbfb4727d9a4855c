"""Adaptive-tempering SMC sampler over a static target (SURVEY.md A.5:
"optional tempering for the marginal-likelihood estimate").

Likelihood annealing: pi_beta(theta) \\propto p(theta) L(theta)^beta with an
adaptive schedule 0 = beta_0 < ... < beta_K = 1 chosen online so each
reweighting keeps the effective sample size at ``ess_target * N`` (bisection
on beta, Jasra et al. 2011). Each stage: reweight -> systematic resample ->
rejuvenate with ``n_moves`` random-walk Metropolis steps targeting pi_beta
(proposal scaled by the per-dimension particle standard deviation). The
product of weight-mean increments is an unbiased estimate of the marginal
likelihood Z = \\int p(theta) L(theta) dtheta.

Everything is fixed-shape and jit-compatible: the stage loop is a
``lax.while_loop`` capped at ``max_stages``; the bisection for the next beta
is a ``fori_loop``. Randomness is fold_in-derived from (key, stage) so runs
are deterministic. This capability has no counterpart in the reference
(GPy/RGP has no SMC at all — SURVEY.md S3.5).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .smc import systematic_resample

__all__ = ["smc_tempered", "TemperedSMCResult"]


class TemperedSMCResult(NamedTuple):
    particles: jnp.ndarray  # (N, D) final particles ~ pi_1 = posterior
    log_Z: jnp.ndarray  # log marginal-likelihood estimate
    betas: jnp.ndarray  # (max_stages,) schedule, padded with 1.0
    n_stages: jnp.ndarray  # number of tempering stages actually used
    accept_rate: jnp.ndarray  # mean MH acceptance over stages/moves
    beta_final: jnp.ndarray  # last temperature reached; < 1 means max_stages
    #   truncated the anneal and log_Z only covers the prefix to beta_final


def _ess_from_logw(log_w):
    log_w = log_w - jax.scipy.special.logsumexp(log_w)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * log_w))


def _sanitize_logL(logL):
    """A non-finite log likelihood (failed Cholesky at extreme hyperparameters
    in f32, SURVEY.md S7 hard-part 1) means the particle has zero target
    density: map NaN/+inf to -inf so it gets zero weight instead of poisoning
    every logsumexp downstream."""
    return jnp.where(jnp.isfinite(logL), logL, -jnp.inf)


def _incr_logw(delta_beta, logL):
    """delta_beta * logL with the 0 * (-inf) -> NaN corner pinned to -inf."""
    return jnp.where(jnp.isneginf(logL), -jnp.inf, delta_beta * logL)


def _next_beta(beta, logL, n_particles, ess_target, n_bisect: int = 40):
    """Largest beta' in (beta, 1] whose incremental weights keep
    ESS >= ess_target * N; bisection (monotone in beta')."""
    target = ess_target * n_particles

    def ess_at(b):
        return _ess_from_logw(_incr_logw(b - beta, logL))

    def body(_, ab):
        lo, hi = ab
        mid = 0.5 * (lo + hi)
        ok = ess_at(mid) >= target
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = lax.fori_loop(0, n_bisect, body, (beta, jnp.asarray(1.0, logL.dtype)))
    # if even beta'=1 satisfies the ESS constraint, jump straight to 1
    return jnp.where(ess_at(jnp.asarray(1.0, logL.dtype)) >= target, 1.0, lo)


def smc_tempered(
    log_prior: Callable,  # (D,) -> scalar
    log_likelihood: Callable,  # (D,) -> scalar  (the FULL-data log likelihood)
    init_sample: Callable,  # (key, N) -> (N, D) draws from the prior
    key,
    n_particles: int,
    *,
    max_stages: int = 50,
    ess_target: float = 0.5,
    n_moves: int = 3,
    step_scale: float = 0.5,
) -> TemperedSMCResult:
    """Run adaptive-tempering SMC from the prior to the posterior.

    Returns posterior particles, an unbiased ``log_Z`` (marginal likelihood),
    the adaptive beta schedule and the MH rejuvenation acceptance rate.
    """
    k_init, k_loop = jax.random.split(key)
    parts0 = init_sample(k_init, n_particles)
    D = parts0.shape[-1]
    dtype = parts0.dtype
    logL0 = _sanitize_logL(jax.vmap(log_likelihood)(parts0))
    logP0 = jax.vmap(log_prior)(parts0)

    def mh_stage(parts, logL, logP, beta, k, n_total):
        """n_moves random-walk Metropolis steps targeting pi_beta."""
        std = jnp.std(parts, axis=0) + 1e-12  # (D,) adaptive proposal scale

        def one_move(carry, i):
            parts, logL, logP, acc_sum = carry
            km = jax.random.fold_in(k, i)
            k_prop, k_u = jax.random.split(km)
            eps = jax.random.normal(k_prop, parts.shape, dtype)
            prop = parts + step_scale * std * eps
            logL_p = _sanitize_logL(jax.vmap(log_likelihood)(prop))
            logP_p = jax.vmap(log_prior)(prop)
            log_alpha = (logP_p + _incr_logw(beta, logL_p)) - (
                logP + _incr_logw(beta, logL)
            )
            # current particle at -inf: always escape to any finite proposal
            log_alpha = jnp.where(
                jnp.isneginf(logL) & jnp.isfinite(logL_p), jnp.inf, log_alpha
            )
            u = jnp.log(jax.random.uniform(k_u, (n_particles,), dtype))
            accept = u < log_alpha
            parts = jnp.where(accept[:, None], prop, parts)
            logL = jnp.where(accept, logL_p, logL)
            logP = jnp.where(accept, logP_p, logP)
            return (parts, logL, logP, acc_sum + jnp.mean(accept)), None

        (parts, logL, logP, acc), _ = lax.scan(
            one_move, (parts, logL, logP, jnp.asarray(0.0, dtype)), jnp.arange(n_moves)
        )
        return parts, logL, logP, acc / n_moves

    def cond(state):
        _, _, _, beta, _, _, stage, _, _ = state
        return jnp.logical_and(beta < 1.0, stage < max_stages)

    def body(state):
        parts, logL, logP, beta, log_Z, betas, stage, acc_sum, _ = state
        k_stage = jax.random.fold_in(k_loop, stage)
        k_res, k_mh = jax.random.split(k_stage)

        beta_new = _next_beta(beta, logL, n_particles, ess_target)
        log_w = _incr_logw(beta_new - beta, logL)
        # unbiased increment: log mean of incremental weights
        log_Z = log_Z + jax.scipy.special.logsumexp(log_w) - jnp.log(
            jnp.asarray(float(n_particles), dtype)
        )
        idx = systematic_resample(k_res, log_w)
        parts, logL, logP = parts[idx], logL[idx], logP[idx]

        parts, logL, logP, acc = mh_stage(parts, logL, logP, beta_new, k_mh, n_particles)
        betas = betas.at[stage].set(beta_new)
        return (parts, logL, logP, beta_new, log_Z, betas, stage + 1, acc_sum + acc, acc)

    state0 = (
        parts0,
        logL0,
        logP0,
        jnp.asarray(0.0, dtype),
        jnp.asarray(0.0, dtype),
        jnp.ones(max_stages, dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0.0, dtype),
        jnp.asarray(0.0, dtype),
    )
    parts, logL, logP, beta, log_Z, betas, n_stages, acc_sum, _ = lax.while_loop(
        cond, body, state0
    )
    acc_rate = acc_sum / jnp.maximum(n_stages.astype(dtype), 1.0)
    return TemperedSMCResult(parts, log_Z, betas, n_stages, acc_rate, beta)
