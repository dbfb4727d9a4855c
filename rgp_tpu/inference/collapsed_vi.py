"""Collapsed sparse variational inference (VarDTC) with uncertain inputs.

TPU-native rebuild of `GPy:GPy/inference/latent_function_inference/var_dtc.py`
[H] specialized as in the reference's `RGP:autoreg/inference.py` [M] for targets
that may themselves be variational (mean + variance) — SURVEY.md S2.1/S2.2 and
Appendix A.3. One pure function computes the bound; *all* gradients (the
reference's hand-built ``grad_dict``: dL_dpsi0/1/2, dL_dKmm, dL_dthetaL) come
from autodiff through it.

Bound (A.3), with beta = 1/sigma^2, Lm = chol(Kmm + jitter), A = beta Lm^{-1}
Psi2 Lm^{-T}, B = I + A, Lb = chol(B), c = Lb^{-1} Lm^{-1} Psi1^T Y:

  F0 = -TD/2 log(2 pi sigma^2) - D/2 log|B| - E||Y||^2_F/(2 sigma^2)
       + ||c||^2_F/(2 sigma^4) - D/(2 sigma^2) (Psi0 - tr(Kmm^{-1} Psi2))

where E||Y||^2 = ||Y_mean||^2 + sum(Y_var) absorbs the hidden-layer
"-tr(S)/(2 sigma^2)" REVARB correction (A.4) when targets are variational.

Moment-matched prediction at uncertain inputs (Girard et al. 2003; the
reference's ``freerun`` path, SURVEY.md S3.3): with W = (Kmm + beta Psi2)^{-1}
and alpha = beta W Psi1^T Y,

  mu*    = Psi1* alpha
  var*_d = alpha_d^T (Psi2* - Psi1*^T Psi1*) alpha_d
           + Psi0* - tr((Kmm^{-1} - W) Psi2*)  [+ sigma^2]
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..kernels import Kernel
from ..linalg import (
    backsub_both_sides,
    cho_solve,
    default_jitter,
    hdot,
    jitchol,
    jitchol_with_jitter,
    log_det_from_chol,
    solve_triangular,
)
from ..ops.psi_stats import PsiStats, psi01, psi2_per_t
from ..params import positive

__all__ = [
    "collapsed_bound",
    "SparsePosterior",
    "posterior",
    "predict_uncertain",
    "predict_certain",
    "posterior_f_samples",
    "log_predictive_density",
    "predict_quantiles",
]

_LOG2PI = 1.8378770664093453  # log(2*pi), host constant (no import-time device op)


def _common(kern: Kernel, kp, Z, psi2, noise, jitter: Optional[float],
            need_trace: bool = True):
    """Shared factorizations for the collapsed bound.

    NOTE on the f32/TPU formulation: GPy factors B = I + beta Lm^{-1} Psi2
    Lm^{-T} (congruence first). In f32 that amplifies the rounding error of
    Psi2 by cond(Kmm) and makes B numerically indefinite (observed eigmin
    ~ -90 on the actuator config). We instead factor C = Kmm + beta Psi2
    directly — mathematically identical (log|B| = log|C| - log|Kmm|,
    Lm^{-T} B^{-1} Lm^{-1} = C^{-1}) but the error stays relative to ||C||,
    so f32 survives (SURVEY.md S7 hard-part 1).
    """
    Kmm = kern.K(kp, Z)
    if jitter is None:
        jitter = default_jitter(Kmm.dtype)
    Lm, jit_abs = jitchol_with_jitter(Kmm, jitter0=jitter)
    beta = 1.0 / noise
    # the SAME absolute jitter that entered Lm must enter C so the tiny
    # eigenvalues cancel in log|C| - log|Kmm|
    M = Kmm.shape[-1]
    Kmm_j = Kmm + jit_abs * jnp.eye(M, dtype=Kmm.dtype)
    C = Kmm_j + beta * 0.5 * (psi2 + psi2.T)
    Lc = jitchol(C, jitter0=1e-10)
    # tr(Kmm^{-1} Psi2): congruence only for a trace (no Cholesky of it);
    # skipped for callers that don't need the bound's trace term (posterior)
    LmiP2Lmt = backsub_both_sides(Lm, psi2, "right") if need_trace else None
    return Kmm, Lm, LmiP2Lmt, Lc, beta


def collapsed_bound_from_suffstats(
    kern: Kernel,
    kp,
    Z,
    log_noise,
    psi0_sum,
    psi1Y,
    psi2,
    trYY,
    T,
    D,
    *,
    jitter: Optional[float] = None,
):
    """Assemble F0 from the additive sufficient statistics
    (sum_t psi0_t, Psi1^T Y, sum_t Psi2_t, E||Y||^2, T).

    This is the reduction point of the data-parallel path: partial sums of
    these four statistics over time shards are ``psum``-reduced across the mesh
    (the TPU-native equivalent of the reference's MPI ``Allreduce`` in
    `GPy:.../var_dtc_parallel.py` [M], SURVEY.md N5/S3.4) and assembled
    identically on every device.
    """
    noise = positive(log_noise)
    _, Lm, LmiP2Lmt, Lc, beta = _common(kern, kp, Z, psi2, noise, jitter)

    c = solve_triangular(Lc, psi1Y)  # ||Lc^{-1} Psi1^T Y||^2 = Y^T Psi1 C^{-1} Psi1^T Y
    tr_KmmInvPsi2 = jnp.trace(LmiP2Lmt)
    log_det_B = log_det_from_chol(Lc) - log_det_from_chol(Lm)

    return (
        -0.5 * T * D * (_LOG2PI + jnp.log(noise))
        - 0.5 * D * log_det_B
        - 0.5 * beta * trYY
        + 0.5 * beta * beta * jnp.sum(c * c)
        - 0.5 * D * beta * (psi0_sum - tr_KmmInvPsi2)
    )


def collapsed_bound(
    kern: Kernel,
    kp,
    Z,
    log_noise,
    stats: PsiStats,
    Y,
    Y_var=None,
    *,
    jitter: Optional[float] = None,
):
    """The collapsed bound F0 (A.3). ``Y`` are target means (T, D); ``Y_var``
    optional target variances (T, D) for variational (hidden-layer) targets."""
    T, D = Y.shape
    psi1Y = hdot(stats.psi1.T, Y)  # (M, D)
    trYY = jnp.sum(Y * Y)
    if Y_var is not None:
        trYY = trYY + jnp.sum(Y_var)
    return collapsed_bound_from_suffstats(
        kern, kp, Z, log_noise,
        jnp.sum(stats.psi0), psi1Y, stats.psi2, trYY, T, D,
        jitter=jitter,
    )


class SparsePosterior(NamedTuple):
    """Sufficient statistics of the collapsed posterior q(u) for prediction.

    alpha: (M, D) predictive weight vector(s), beta W Psi1^T Y.
    woodbury_inv: (M, M) Kmm^{-1} - W (reference posterior.woodbury_inv [H]).
    W: (M, M) (Kmm + beta Psi2)^{-1}.
    """

    alpha: jnp.ndarray
    woodbury_inv: jnp.ndarray
    W: jnp.ndarray


def posterior(
    kern: Kernel,
    kp,
    Z,
    log_noise,
    stats: PsiStats,
    Y,
    *,
    jitter: Optional[float] = None,
) -> SparsePosterior:
    noise = positive(log_noise)
    _, Lm, _, Lc, beta = _common(kern, kp, Z, stats.psi2, noise, jitter,
                                 need_trace=False)
    M = Z.shape[0]

    psi1Y = hdot(stats.psi1.T, Y)
    alpha = beta * cho_solve(Lc, psi1Y)  # beta C^{-1} Psi1^T Y

    eye = jnp.eye(M, dtype=Z.dtype)
    W = cho_solve(Lc, eye)  # (Kmm + beta Psi2)^{-1}
    Kmm_inv = backsub_both_sides(Lm, eye, "left")
    return SparsePosterior(alpha=alpha, woodbury_inv=Kmm_inv - W, W=W)


def predict_certain(
    kern: Kernel,
    kp,
    Z,
    log_noise,
    post: SparsePosterior,
    Xs,
    *,
    full_cov: bool = False,
    include_noise: bool = False,
):
    """Sparse-posterior predictive at certain inputs Xs (any kernel).

    Reference: GPy ``predict(Xnew, full_cov=)`` on a VarDTC posterior [H] —
    mean = Kxz alpha, cov = Kxx - Kxz (Kmm^{-1} - W) Kzx. Returns
    (mean (T*, D), var (T*, D)) or, with ``full_cov``, (mean, cov (T*, T*))
    shared across output dims.
    """
    noise = positive(log_noise)
    Kxz = kern.K(kp, Xs, Z)
    mean = hdot(Kxz, post.alpha)
    if full_cov:
        Kxx = kern.K(kp, Xs)
        cov = Kxx - hdot(Kxz, hdot(post.woodbury_inv, Kxz.T))
        if include_noise:
            cov = cov + noise * jnp.eye(Xs.shape[0], dtype=cov.dtype)
        return mean, cov
    kdiag = kern.Kdiag(kp, Xs)
    var = kdiag - jnp.einsum("tm,mn,tn->t", Kxz, post.woodbury_inv, Kxz)
    var = jnp.maximum(var, 1e-12)[:, None] + (noise if include_noise else 0.0)
    return mean, jnp.broadcast_to(var, mean.shape)


def posterior_f_samples(
    kern: Kernel,
    kp,
    Z,
    log_noise,
    post: SparsePosterior,
    Xs,
    key,
    *,
    n_samples: int = 10,
    include_noise: bool = False,
):
    """Joint samples of f* at Xs from the sparse posterior (the reference's
    ``m.posterior_samples_f`` [H]). Returns (n_samples, T*, D)."""
    import jax

    mean, cov = predict_certain(
        kern, kp, Z, log_noise, post, Xs, full_cov=True, include_noise=include_noise
    )
    L = jitchol(cov)
    eps = jax.random.normal(key, (n_samples, Xs.shape[0], mean.shape[1]), dtype=mean.dtype)
    return mean[None] + jnp.einsum("ts,nsd->ntd", L, eps)


def log_predictive_density(y, mean, var):
    """Mean Gaussian log predictive density of held-out targets (reference
    ``m.log_predictive_density`` [H]). All args (T, D); returns a scalar."""
    return jnp.mean(
        -0.5 * (_LOG2PI + jnp.log(var)) - 0.5 * (y - mean) ** 2 / var
    )


def predict_quantiles(mean, var, quantiles=(2.5, 97.5)):
    """Gaussian predictive quantiles in percent (reference
    ``m.predict_quantiles`` [H]). Returns a tuple of arrays shaped like
    ``mean``, one per requested percentile."""
    import scipy.stats

    sd = jnp.sqrt(var)
    return tuple(
        mean + float(scipy.stats.norm.ppf(q / 100.0)) * sd for q in quantiles
    )


def predict_uncertain(
    kern: Kernel,
    kp,
    Z,
    log_noise,
    post: SparsePosterior,
    mu_star,
    s_star=None,
    *,
    include_noise: bool = False,
):
    """Moment-matched predictive at q(x*) = N(mu*, diag(s*)) (batch over rows).

    Returns (mean (T*, D), var (T*, D)). ``s_star=None`` gives the standard
    sparse-GP predictive at certain inputs (same code path, s = 0).
    """
    noise = positive(log_noise)
    psi0, psi1 = psi01(kern, kp, Z, mu_star, s_star)
    p2t = psi2_per_t(kern, kp, Z, mu_star, s_star)  # (T*, M, M)

    mean = hdot(psi1, post.alpha)  # (T*, D)

    # alpha_d^T Psi2*_t alpha_d for each t, d
    quad = jnp.einsum("md,tmn,nd->td", post.alpha, p2t, post.alpha)
    trace_term = jnp.einsum("mn,tnm->t", post.woodbury_inv, p2t)  # (T*,)
    var = quad - mean * mean + (psi0 - trace_term)[:, None]
    if include_noise:
        var = var + noise
    # guard tiny negative values from f32 cancellation
    var = jnp.maximum(var, 1e-12)
    return mean, var
