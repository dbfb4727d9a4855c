"""Sequential Monte Carlo over latent state trajectories.

Mandated addition beyond the reference (SURVEY.md A.5, S2.4 "Particle
parallel", config 5 of BASELINE.json:11): a bootstrap/guided particle filter
for the learned RGP state-space model, with systematic resampling and an
unbiased log-marginal-likelihood estimate.

Particle parallelism: particles shard over the mesh 'particle' axis inside
``shard_map``. Systematic resampling is a global operation — implemented as
``all_gather`` of the (small) weight vector, a replicated inverse-CDF pass,
and an ``all_gather``-based particle exchange (SURVEY.md S5.8; for very large
particle states a ``ppermute`` ring exchange would replace the state gather).
Determinism: resampling consumes one shared key per step, so sharded and
single-device runs produce IDENTICAL trajectories given the same key
(SURVEY.md S4 item 5).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["systematic_resample", "smc_filter", "smc_filter_sharded", "SMCResult", "ess"]


def ess(log_w):
    """Effective sample size of normalized log-weights."""
    w = jnp.exp(log_w - jax.scipy.special.logsumexp(log_w))
    return 1.0 / jnp.sum(w * w)


def systematic_resample(key, log_w, n: Optional[int] = None):
    """Systematic (low-variance) resampling: returns ancestor indices (n,).

    Deterministic given (key, log_w) — the backbone of the sharded variant.
    """
    N = log_w.shape[0]
    n = N if n is None else n
    w = jnp.exp(log_w - jax.scipy.special.logsumexp(log_w))
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), log_w.dtype)
    us = (u0 + jnp.arange(n, dtype=log_w.dtype)) / n
    idx = jnp.searchsorted(cdf, us, side="right")
    return jnp.clip(idx, 0, N - 1)


class SMCResult(NamedTuple):
    log_marginal: jnp.ndarray  # unbiased log p(y_{1:T}) estimate
    particles: jnp.ndarray  # final particle states (N, ...)
    log_weights: jnp.ndarray  # final unnormalized log weights (N,)
    ess_history: jnp.ndarray  # (T,)


def smc_filter(
    transition_sample: Callable,  # (keys (N,), particles (N,S), t) -> (N,S)
    emission_logpdf: Callable,  # (particles (N,S), t) -> (N,) log p(y_t | x_t)
    init_sample: Callable,  # (key, N) -> particles (N,S)
    n_steps: int,
    key,
    n_particles: int,
    *,
    ess_threshold: float = 0.5,
) -> SMCResult:
    """Bootstrap particle filter with adaptive systematic resampling.

    All callables are traced once; the time loop is a ``lax.scan``. The
    log-marginal estimate is the standard product of weight means.
    """
    k_init, k_loop = jax.random.split(key)
    parts0 = init_sample(k_init, n_particles)
    log_w0 = jnp.zeros(n_particles, jnp.result_type(parts0))

    def step(carry, inp):
        parts, log_w, log_Z = carry
        t, k = inp
        k_res, k_trans = jax.random.split(k)

        # adaptive resampling on the *incoming* weights
        cur_ess = ess(log_w)
        do_resample = cur_ess < ess_threshold * n_particles
        idx = systematic_resample(k_res, log_w)
        parts_r = jnp.where(do_resample, parts[idx], parts)
        log_w_r = jnp.where(do_resample, jnp.zeros_like(log_w), log_w)

        pkeys = jax.vmap(lambda i: jax.random.fold_in(k_trans, i))(
            jnp.arange(n_particles)
        )
        parts_new = transition_sample(pkeys, parts_r, t)
        log_inc = emission_logpdf(parts_new, t)
        log_w_new = log_w_r + log_inc

        # running log-marginal: log mean of normalized-weight increments
        lse_prev = jax.scipy.special.logsumexp(log_w_r)
        lse_new = jax.scipy.special.logsumexp(log_w_new)
        log_Z = log_Z + (lse_new - lse_prev)
        return (parts_new, log_w_new, log_Z), cur_ess

    ts = jnp.arange(n_steps)
    keys = jax.random.split(k_loop, n_steps)
    (parts, log_w, log_Z), ess_hist = jax.lax.scan(step, (parts0, log_w0, 0.0), (ts, keys))
    return SMCResult(log_Z, parts, log_w, ess_hist)


def smc_filter_sharded(
    transition_sample: Callable,
    emission_logpdf: Callable,
    init_sample: Callable,
    n_steps: int,
    key,
    n_particles: int,
    mesh: Mesh,
    *,
    axis: str = "particle",
    ess_threshold: float = 0.5,
) -> SMCResult:
    """Particle-sharded SMC: identical math and identical randomness to
    :func:`smc_filter`, with particles sharded over ``axis``.

    Weight normalization / ESS use ``psum``-style global reductions (via
    all_gather of the weight vector); systematic resampling runs replicated on
    the gathered weights so every shard computes the same ancestor table, then
    picks out its slice of ancestors from the all-gathered states.
    """
    n_dev = mesh.shape[axis]
    assert n_particles % n_dev == 0, "n_particles must divide over the mesh axis"
    shard = n_particles // n_dev

    def _run(key):
        k_init, k_loop = jax.random.split(key)
        # identical init randomness to the single-device run: generate the
        # full particle set from the shared key, keep our slice
        parts_full0 = init_sample(k_init, n_particles)
        my = jax.lax.axis_index(axis)
        lo = my * shard
        parts0 = jax.lax.dynamic_slice_in_dim(parts_full0, lo, shard, axis=0)
        dtype = jnp.result_type(parts_full0)
        # mark the carry as varying over the particle axis up front, or the
        # scan carry types disagree after the first collective
        log_w0 = jax.lax.pcast(jnp.zeros(shard, dtype), axis, to="varying")
        log_Z0 = jax.lax.pcast(jnp.asarray(0.0, dtype), axis, to="varying")

        def step(carry, inp):
            parts, log_w, log_Z = carry
            t, k = inp
            k_res, k_trans = jax.random.split(k)

            log_w_full = jax.lax.all_gather(log_w, axis).reshape(-1)
            cur_ess = ess(log_w_full)
            do_resample = cur_ess < ess_threshold * n_particles
            idx_full = systematic_resample(k_res, log_w_full)  # replicated
            parts_full = jax.lax.all_gather(parts, axis).reshape(
                (n_particles,) + parts.shape[1:]
            )
            my_idx = jax.lax.dynamic_slice_in_dim(idx_full, lo, shard, axis=0)
            parts_r = jnp.where(do_resample, parts_full[my_idx], parts)
            log_w_r = jnp.where(do_resample, jnp.zeros_like(log_w), log_w)

            # per-particle keys by GLOBAL particle index — bitwise identical
            # to the single-device run's key batch
            pkeys = jax.vmap(lambda i: jax.random.fold_in(k_trans, i))(
                lo + jnp.arange(shard)
            )
            parts_new = transition_sample(pkeys, parts_r, t)
            log_inc = emission_logpdf(parts_new, t)
            log_w_new = log_w_r + log_inc

            lse_prev = jax.scipy.special.logsumexp(
                jax.lax.all_gather(log_w_r, axis).reshape(-1)
            )
            lse_new = jax.scipy.special.logsumexp(
                jax.lax.all_gather(log_w_new, axis).reshape(-1)
            )
            log_Z = log_Z + (lse_new - lse_prev)
            return (parts_new, log_w_new, log_Z), cur_ess

        ts = jnp.arange(n_steps)
        keys = jax.random.split(k_loop, n_steps)
        (parts, log_w, log_Z), ess_hist = jax.lax.scan(
            step, (parts0, log_w0, log_Z0), (ts, keys)
        )
        # log_Z / ess are computed from all-gathered quantities and identical
        # on every shard; pmean re-establishes their replicated type
        log_Z = jax.lax.pmean(log_Z, axis)
        ess_hist = jax.lax.pmean(ess_hist, axis)
        return log_Z, parts, log_w, ess_hist

    run = jax.shard_map(
        _run,
        mesh=mesh,
        in_specs=P(),
        out_specs=(P(), P(axis), P(axis), P()),
    )
    log_Z, parts, log_w, ess_hist = run(key)
    return SMCResult(log_Z, parts, log_w, ess_hist)
