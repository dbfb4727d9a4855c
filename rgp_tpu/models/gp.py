"""Exact GP regression (P0 foundation model, SURVEY.md S7).

The reference's `GPy.models.GPRegression` equivalent [H]. Serves two roles:
(1) the exactness oracle that the collapsed sparse bound must match when Z = X
    (SURVEY.md S4 test 3), and
(2) the smallest end-to-end exercise of kernels + linalg + autodiff gradients.

Everything is a pure function of (config, params, data); training is
``rgp_tpu.train.fit`` on :func:`neg_log_marginal`.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..kernels import Kernel
from ..linalg import cho_solve, hdot, jitchol, log_det_from_chol, solve_triangular
from ..params import np_positive_inv, positive

__all__ = ["GPConfig", "init_params", "log_marginal", "predict"]

_LOG2PI = 1.8378770664093453  # log(2*pi), host constant (no import-time device op)


@dataclasses.dataclass(frozen=True)
class GPConfig:
    kernel: Kernel


def init_params(cfg: GPConfig, noise: float = 1.0, dtype=jnp.float32, **kern_kw):
    return {
        "kern": cfg.kernel.init(dtype=dtype, **kern_kw),
        "log_noise": np_positive_inv(noise, dtype),
    }


def log_marginal(cfg: GPConfig, params, X, Y):
    """log N(Y | 0, K + sigma^2 I), summed over output dims."""
    T, D = Y.shape
    noise = positive(params["log_noise"])
    K = cfg.kernel.K(params["kern"], X)
    L = jitchol(K + noise * jnp.eye(T, dtype=K.dtype))
    a = solve_triangular(L, Y)  # L^{-1} Y
    return (
        -0.5 * T * D * _LOG2PI
        - 0.5 * D * log_det_from_chol(L)
        - 0.5 * jnp.sum(a * a)
    )


def neg_log_marginal(cfg: GPConfig, params, X, Y):
    return -log_marginal(cfg, params, X, Y)


def predict(cfg: GPConfig, params, X, Y, Xs, *, full_cov: bool = False, include_noise: bool = True):
    """Posterior predictive at Xs. Returns (mean (T*,D), var (T*,) or (T*,T*))."""
    T = X.shape[0]
    noise = positive(params["log_noise"])
    K = cfg.kernel.K(params["kern"], X)
    L = jitchol(K + noise * jnp.eye(T, dtype=K.dtype))
    Ks = cfg.kernel.K(params["kern"], X, Xs)  # (T, T*)
    alpha = cho_solve(L, Y)
    mean = hdot(Ks.T, alpha)
    v = solve_triangular(L, Ks)  # (T, T*)
    if full_cov:
        Kss = cfg.kernel.K(params["kern"], Xs)
        cov = Kss - hdot(v.T, v)
        if include_noise:
            cov = cov + noise * jnp.eye(Xs.shape[0], dtype=cov.dtype)
        return mean, cov
    kss = cfg.kernel.Kdiag(params["kern"], Xs)
    var = kss - jnp.sum(v * v, axis=0)
    if include_noise:
        var = var + noise
    return mean, var
