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

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..kernels import Kernel
from ..linalg import (
    backsub_both_sides,
    cho_solve,
    default_jitter,
    hdot,
    jitchol,
    log_det_from_chol,
    solve_triangular,
)
from ..ops.psi_stats import PsiStats, psi2_per_t, psi_statistics
from ..params import positive

__all__ = ["collapsed_bound", "SparsePosterior", "posterior", "predict_uncertain"]

_LOG2PI = float(jnp.log(2.0 * jnp.pi))


def _common(kern: Kernel, kp, Z, stats: PsiStats, noise, jitter: Optional[float]):
    M = Z.shape[0]
    Kmm = kern.K(kp, Z)
    if jitter is None:
        jitter = default_jitter(Kmm.dtype)
    Lm = jitchol(Kmm, jitter0=jitter)
    beta = 1.0 / noise
    LmiP2Lmt = backsub_both_sides(Lm, stats.psi2, "right")  # Lm^{-1} Psi2 Lm^{-T}
    # symmetrize: f32 rounding through the two triangular solves breaks the
    # exact symmetry that Cholesky(B) requires
    LmiP2Lmt = 0.5 * (LmiP2Lmt + LmiP2Lmt.T)
    A = beta * LmiP2Lmt
    B = A + jnp.eye(M, dtype=A.dtype)
    Lb = jitchol(B, jitter0=1e-9)
    return Kmm, Lm, LmiP2Lmt, B, Lb, beta


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
    noise = positive(log_noise)
    _, Lm, LmiP2Lmt, _, Lb, beta = _common(kern, kp, Z, stats, noise, jitter)

    psi1Y = hdot(stats.psi1.T, Y)  # (M, D)
    tmp = solve_triangular(Lm, psi1Y)
    c = solve_triangular(Lb, tmp)

    trYY = jnp.sum(Y * Y)
    if Y_var is not None:
        trYY = trYY + jnp.sum(Y_var)

    psi0_sum = jnp.sum(stats.psi0)
    tr_KmmInvPsi2 = jnp.trace(LmiP2Lmt)

    return (
        -0.5 * T * D * (_LOG2PI + jnp.log(noise))
        - 0.5 * D * log_det_from_chol(Lb)
        - 0.5 * beta * trYY
        + 0.5 * beta * beta * jnp.sum(c * c)
        - 0.5 * D * beta * (psi0_sum - tr_KmmInvPsi2)
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
    _, Lm, _, _, Lb, beta = _common(kern, kp, Z, stats, noise, jitter)
    M = Z.shape[0]

    psi1Y = hdot(stats.psi1.T, Y)
    tmp = solve_triangular(Lm, psi1Y)
    c = solve_triangular(Lb, tmp)
    # alpha = beta Lm^{-T} Lb^{-T} c
    alpha = beta * solve_triangular(Lm, solve_triangular(Lb, c, trans=True), trans=True)

    eye = jnp.eye(M, dtype=Z.dtype)
    # W = Lm^{-T} B^{-1} Lm^{-1}
    Binv = cho_solve(Lb, eye)
    W = backsub_both_sides(Lm, Binv, "left")
    Kmm_inv = backsub_both_sides(Lm, eye, "left")
    return SparsePosterior(alpha=alpha, woodbury_inv=Kmm_inv - W, W=W)


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
    stats = psi_statistics(kern, kp, Z, mu_star, s_star, block=None)
    p2t = psi2_per_t(kern, kp, Z, mu_star, s_star)  # (T*, M, M)

    mean = hdot(stats.psi1, post.alpha)  # (T*, D)

    # alpha_d^T Psi2*_t alpha_d for each t, d
    quad = jnp.einsum("md,tmn,nd->td", post.alpha, p2t, post.alpha)
    trace_term = jnp.einsum("mn,tnm->t", post.woodbury_inv, p2t)  # (T*,)
    var = quad - mean * mean + (stats.psi0 - trace_term)[:, None]
    if include_noise:
        var = var + noise
    # guard tiny negative values from f32 cancellation
    var = jnp.maximum(var, 1e-12)
    return mean, var
