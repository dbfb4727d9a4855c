"""Stochastic (uncollapsed) sparse variational inference — explicit q(u).

Rebuilds the reference ecosystem's minibatch VarDTC / SVI-GP capability
(`GPy:.../var_dtc_parallel.py` VarDTC_minibatch [M], Hensman et al. 2013/2015;
SURVEY.md S2.2, S3.4, config 4 of BASELINE.json:10). Unlike the collapsed bound,
q(u) = N(m, S) is explicit, so the bound decomposes over datapoints and
supports minibatching + natural-gradient updates (SURVEY.md A.5).

Per-batch bound (uncertain inputs; certain = s=0):

  ELBO = w * sum_{t in batch} E_q(x_t) E_q(u) [ log N(y_t | f_t, sigma^2) ]
         - KL(q(u) || N(0, Kmm)),      w = T_total / |batch|

with E[f_t] = psi1_t^T Kmm^{-1} m and

  E[(y_t - f_t)^2] = y_t^2 - 2 y_t psi1_t^T a
                     + tr((S + m m^T) Kmm^{-1} psi2_t Kmm^{-1})
                     + psi0_t - tr(Kmm^{-1} psi2_t),  a = Kmm^{-1} m.

All per-t quantities reduce through the ADDITIVE statistics (Psi0 sum, Psi1^T y,
Psi2 sum), so one PsiStats evaluation per batch suffices and the data-parallel
psum path applies unchanged.

q(u) covariance parameterization: S_d = L_d L_d^T per output dim, L_d lower
triangular with softplus-positive diagonal (stored unconstrained).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..kernels import Kernel
from ..linalg import cho_solve, hdot, jitchol, log_det_from_chol, solve_triangular
from ..ops.psi_stats import PsiStats, psi01, psi2_per_t
import numpy as np

from ..params import positive

__all__ = ["init_qu", "qu_moments", "svi_bound", "svi_predict"]

_LOG2PI = 1.8378770664093453  # log(2*pi), host constant (no import-time device op)


def init_qu(M: int, D: int, *, init_scale: float = 0.1, dtype=jnp.float32):
    """Variational q(u) parameters: means (M, D) and per-dim Cholesky factors.

    ``log_diag`` stores the unconstrained diagonal; ``tril`` the strict lower
    triangle (D, M, M) (upper part ignored).
    """
    raw = np.log(np.expm1(init_scale))
    return {
        "m": jnp.zeros((M, D), dtype),
        "log_diag": jnp.asarray(np.full((D, M), raw), dtype),
        "tril": jnp.zeros((D, M, M), dtype),
    }


def qu_moments(qu):
    """-> (m (M,D), S (D,M,M), L_S (D,M,M))."""
    m = qu["m"]
    diag = positive(qu["log_diag"])  # (D, M)
    L = jnp.tril(qu["tril"], k=-1) + jax.vmap(jnp.diag)(diag)
    S = jnp.einsum("dij,dkj->dik", L, L)
    return m, S, L


def svi_bound(
    kern: Kernel,
    kp,
    Z,
    log_noise,
    qu,
    stats: PsiStats,
    Y,
    *,
    T_total: Optional[int] = None,
    Y_var=None,
    jitter: Optional[float] = None,
):
    """Minibatch ELBO. ``stats`` are the psi statistics of the batch inputs;
    ``Y`` (B, D) the batch targets (optionally variational with ``Y_var``).

    Assembled in the same stop-gradient spectral whitening basis as the
    collapsed bound (:func:`rgp_tpu.inference.collapsed_vi.whitening_basis`) —
    identical Kmm regularization, so a natural-gradient-optimal q(u) matches
    the collapsed optimum exactly, and the f32 robustness analysis carries
    over to the minibatch path (config 4, BASELINE.json:10).
    """
    from .collapsed_vi import whitening_basis

    B, D = Y.shape
    if T_total is None:
        T_total = B
    w = T_total / B
    noise = positive(log_noise)
    beta = 1.0 / noise

    Kmm = kern.K(kp, Z)
    wh = whitening_basis(Kmm, stats.psi2, beta)
    Wb = wh.W
    WtKW = hdot(Wb.T, hdot(Kmm, Wb))
    Kt = 0.5 * (WtKW + WtKW.T) + jnp.diag(wh.topup)  # ~ I
    j0 = 1e-12 if jnp.dtype(Kmm.dtype).itemsize >= 8 else 1e-6
    Lk = jitchol(Kt, jitter0=j0)

    m, S, L_S = qu_moments(qu)  # (M,D), (D,M,M)
    mt = hdot(Wb.T, m)  # whitened mean, (M, D)
    at = cho_solve(Lk, mt)  # Kt^{-1} W^T m
    a = hdot(Wb, at)  # Kmm_reg^{-1} m, (M, D)

    psi1Y = hdot(stats.psi1.T, Y)  # (M, D)
    psi0_sum = jnp.sum(stats.psi0)
    psi2s = 0.5 * (stats.psi2 + stats.psi2.T)
    P2t = hdot(Wb.T, hdot(psi2s, Wb))  # whitened Psi2 (well-scaled)
    KiP2t = cho_solve(Lk, P2t)  # Kt^{-1} P2t
    tr_KiP2 = jnp.trace(KiP2t)
    G = cho_solve(Lk, KiP2t.T).T  # Kt^{-1} P2t Kt^{-1}
    St = jnp.einsum("im,dij,jn->dmn", Wb, S, Wb)  # whitened S, (D, M, M)

    # sum_t E[(y_t - f_t)^2] over the batch, all outputs
    trYY = jnp.sum(Y * Y)
    if Y_var is not None:
        trYY = trYY + jnp.sum(Y_var)
    cross = -2.0 * jnp.sum(psi1Y * a)
    quad_m = jnp.einsum("md,mn,nd->", a, psi2s, a)
    quad_S = jnp.einsum("dij,ij->", St, G)
    sq_err = trYY + cross + quad_m + quad_S + D * (psi0_sum - tr_KiP2)

    data_term = w * (-0.5 * B * D * (_LOG2PI + jnp.log(noise)) - 0.5 * beta * sq_err)

    # KL(q(u) || N(0, Kmm_reg)) summed over output dims; the differentiable
    # log-det correction is log|Kt| (= 0 at the linearization point) on top of
    # the stop-grad half_logdet of the regularized spectrum
    M_ = Z.shape[0]
    mKm = jnp.sum(m * a)
    eye = jnp.eye(M_, dtype=m.dtype)
    tr_KiS = jnp.einsum("dij,ij->", St, cho_solve(Lk, eye))
    logdet_S = 2.0 * jnp.sum(jnp.log(jnp.abs(jax.vmap(jnp.diagonal)(L_S))))
    logdet_K = 2.0 * wh.half_logdet + log_det_from_chol(Lk)
    kl = 0.5 * (tr_KiS + mKm - M_ * D + D * logdet_K - logdet_S)

    return data_term - kl


def svi_predict(
    kern: Kernel,
    kp,
    Z,
    log_noise,
    qu,
    mu_star,
    s_star=None,
    *,
    include_noise: bool = False,
    jitter: Optional[float] = None,
):
    """Predictive at q(x*): mean = Psi1* Kmm^{-1} m; variance includes the
    q(u) covariance and the psi-statistic moment-matching terms. Uses the
    same whitened Kmm regularization as :func:`svi_bound`."""
    from .collapsed_vi import whitening_basis

    noise = positive(log_noise)
    Kmm = kern.K(kp, Z)
    wh = whitening_basis(Kmm)
    Wb = wh.W
    WtKW = hdot(Wb.T, hdot(Kmm, Wb))
    Kt = 0.5 * (WtKW + WtKW.T) + jnp.diag(wh.topup)
    j0 = 1e-12 if jnp.dtype(Kmm.dtype).itemsize >= 8 else 1e-6
    Lk = jitchol(Kt, jitter0=j0)
    m, S, _ = qu_moments(qu)
    a = hdot(Wb, cho_solve(Lk, hdot(Wb.T, m)))  # Kmm_reg^{-1} m, (M, D)

    psi0_s, psi1_s = psi01(kern, kp, Z, mu_star, s_star)
    p2t = psi2_per_t(kern, kp, Z, mu_star, s_star)  # (T*, M, M)
    mean = hdot(psi1_s, a)  # (T*, D)

    M_ = Z.shape[0]
    Rk = solve_triangular(Lk, Wb.T)
    Ki = hdot(Rk.T, Rk)  # Kmm_reg^{-1}
    KiSKi = jnp.einsum("ij,djk,kl->dil", Ki, S, Ki)  # (D, M, M)

    quad = jnp.einsum("md,tmn,nd->td", a, p2t, a)
    tr_Ki = jnp.einsum("mn,tnm->t", Ki, p2t)
    tr_S = jnp.einsum("dmn,tnm->td", KiSKi, p2t)
    var = quad - mean * mean + (psi0_s - tr_Ki)[:, None] + tr_S
    if include_noise:
        var = var + noise
    return mean, jnp.maximum(var, 1e-12)
