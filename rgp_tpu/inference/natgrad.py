"""Natural-gradient updates for Gaussian variational blocks q(u).

Mandated addition beyond the reference (SURVEY.md A.5, BASELINE.json:5,10;
Salimbeni, Eleftheriadis & Hensman, AISTATS 2018): for an exponential-family
Gaussian q(u) = N(m, S) per output dim, a step of size gamma in natural
parameters theta = (S^{-1} m, -1/2 S^{-1}) along dL/d(expectation params)
eta = (m, S + m m^T) is the natural gradient.

Implementation: re-express the ELBO as a function of (eta1, eta2) with
m = eta1, S = eta2 - eta1 eta1^T; autodiff gives dL/deta directly; update
theta <- theta + gamma dL/deta; convert back to (m, chol(S)). All conversions
are batched (vmap over output dims) Cholesky/solves on (M, M) blocks.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..linalg import cho_solve, jitchol
from ..params import positive_inv
from .svi import qu_moments

__all__ = ["natgrad_step"]


def _qu_from_mS(m, S, template):
    """Rebuild the unconstrained qu pytree from moments (inverse of qu_moments)."""
    L = jitchol(S, jitter0=1e-8)  # (D, M, M)
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)  # (D, M)
    return {
        "m": m,
        "log_diag": positive_inv(jnp.maximum(diag, 1e-10)),
        "tril": jnp.tril(L, k=-1),
    }


def natgrad_step(elbo_of_qu: Callable, qu, lr: float):
    """One natural-gradient ascent step on q(u).

    ``elbo_of_qu(qu_pytree) -> scalar``. Returns the updated qu pytree.
    """
    m, S, _ = qu_moments(qu)  # m (M, D), S (D, M, M)
    M, D = m.shape
    eye = jnp.eye(M, dtype=m.dtype)

    # expectation parameters (per output dim)
    mT = m.T  # (D, M)
    eta1 = mT
    eta2 = S + jnp.einsum("di,dj->dij", mT, mT)

    def elbo_eta(e1, e2):
        m_ = e1.T
        S_ = e2 - jnp.einsum("di,dj->dij", e1, e1)
        qu_ = _qu_from_mS(m_, S_, qu)
        return elbo_of_qu(qu_)

    g1, g2 = jax.grad(elbo_eta, argnums=(0, 1))(eta1, eta2)
    g2 = 0.5 * (g2 + jnp.swapaxes(g2, -1, -2))

    # natural parameters
    LS = jitchol(S, jitter0=1e-8)
    Sinv = cho_solve(LS, jnp.broadcast_to(eye, S.shape))
    theta1 = jnp.einsum("dij,dj->di", Sinv, mT)  # S^{-1} m
    theta2 = -0.5 * Sinv

    theta1 = theta1 + lr * g1
    theta2 = theta2 + lr * g2

    # back to moments: S = (-2 theta2)^{-1}, m = S theta1
    P = -2.0 * theta2  # precision, must stay PD (small enough lr)
    LP = jitchol(P, jitter0=1e-8)
    S_new = cho_solve(LP, jnp.broadcast_to(eye, P.shape))
    S_new = 0.5 * (S_new + jnp.swapaxes(S_new, -1, -2))
    m_new = jnp.einsum("dij,dj->di", S_new, theta1).T  # (M, D)

    return _qu_from_mS(m_new, S_new, qu)
