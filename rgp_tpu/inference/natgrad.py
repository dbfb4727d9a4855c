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

    Cost note: the backtracking guard below evaluates all three candidate
    scales unconditionally (no early exit exists under jit), tripling the
    natural->moment conversion (Cholesky + solves) relative to an unguarded
    step — accepted, since the conversion is O(D M^3) with M ~ 100 and the
    ELBO/grad evaluation dominates. The finiteness test is a single global
    ``ok`` over all D output dims: one non-finite dim rejects the whole
    candidate scale (conservative; healthy dims then also take the smaller
    step, which only slows — never breaks — their convergence).
    (A vmapped single-(3,D,M,M)-batched trial was tried round 3 and measured
    SLOWER end-to-end than the three sequential trials on the config-4 run —
    140.7 vs 206.0 iters/s warm — XLA schedules the small sequential
    factorizations better than the batched one here; keep the loop.)
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

    def step_at(scale):
        """Candidate update at step size scale*lr; (qu', ok)."""
        t1 = theta1 + scale * lr * g1
        t2 = theta2 + scale * lr * g2
        # back to moments: S = (-2 theta2)^{-1}, m = S theta1. The precision
        # P must stay PD; a RAW Cholesky (no jitter rescue) makes violation
        # detectable as non-finite output instead of being silently "fixed"
        # into a garbage step.
        P = -2.0 * t2
        LP = jnp.linalg.cholesky(P)
        S_new = cho_solve(LP, jnp.broadcast_to(eye, P.shape))
        S_new = 0.5 * (S_new + jnp.swapaxes(S_new, -1, -2))
        m_new = jnp.einsum("dij,dj->di", S_new, t1).T  # (M, D)
        qu_new = _qu_from_mS(m_new, S_new, qu)
        ok = jnp.all(
            jnp.array([jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(qu_new)])
        )
        return qu_new, ok

    # guarded step: a full natural-gradient step can push the precision
    # indefinite in f32 late in training (measured: NaN at ~iter 1e3 on the
    # config-4 long-corpus run at lr=0.5). Backtrack lr -> lr/4 -> lr/16,
    # falling back to no update — every branch is finite, so one bad step can
    # never poison the scan carry. (A same-batch monotonicity trust region
    # was tried and REJECTED: with minibatch gradients it stalls q(u) —
    # measured config-4 ELBO -39768 vs +7099 at matched budgets. Overshoot at
    # small likelihood noise is instead controlled by the caller DECAYING lr
    # over the run, Hoffman et al. 2013-style; see train.fit_minibatch.)
    out = jax.tree.map(lambda x: jnp.asarray(x), qu)  # scale-0 fallback
    for scale in (1.0 / 16.0, 1.0 / 4.0, 1.0):  # keep the LARGEST valid step
        cand, ok = step_at(scale)
        out = jax.tree.map(lambda new, old: jnp.where(ok, new, old), cand, out)
    return out
