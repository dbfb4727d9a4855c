"""SVGP: sparse GP with explicit q(u) for minibatch training (config 4 model).

Couples :mod:`rgp_tpu.inference.svi` (uncollapsed bound) with the kernel layer
into a trainable model: hyperparameters + Z + q(u) in one pytree; minibatch
ELBO; Adam on hyperparameters with optional interleaved natural-gradient steps
on q(u) (`rgp_tpu.inference.natgrad`). The data-parallel mesh path shards the
batch axis and psums the additive psi statistics (SURVEY.md S3.4).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ..inference import svi
from ..kernels import Kernel
from ..ops.psi_stats import psi_statistics
from ..params import np_positive_inv
from .sparse_gp import kmeans_init

__all__ = ["SVGPConfig", "init_params", "elbo", "predict", "freerun_narx"]


@dataclasses.dataclass(frozen=True)
class SVGPConfig:
    kernel: Kernel
    num_inducing: int
    output_dim: int = 1


def init_params(
    cfg: SVGPConfig,
    X,
    noise: float = 0.1,
    seed: int = 0,
    dtype=jnp.float32,
    **kern_kw,
):
    Z = kmeans_init(X, cfg.num_inducing, seed=seed)
    return {
        "kern": cfg.kernel.init(dtype=dtype, **kern_kw),
        "Z": jnp.asarray(Z, dtype),
        "log_noise": np_positive_inv(noise, dtype),
        "qu": svi.init_qu(cfg.num_inducing, cfg.output_dim, dtype=dtype),
    }


def elbo(
    cfg: SVGPConfig,
    params,
    X,
    Y,
    *,
    X_var=None,
    T_total: Optional[int] = None,
    block=None,
):
    """Minibatch ELBO; (X, Y) may be a subset of the data (pass T_total)."""
    stats = psi_statistics(cfg.kernel, params["kern"], params["Z"], X, X_var, block=block)
    return svi.svi_bound(
        cfg.kernel,
        params["kern"],
        params["Z"],
        params["log_noise"],
        params["qu"],
        stats,
        Y,
        T_total=T_total,
    )


def predict(cfg: SVGPConfig, params, Xs, *, Xs_var=None, include_noise: bool = True):
    return svi.svi_predict(
        cfg.kernel,
        params["kern"],
        params["Z"],
        params["log_noise"],
        params["qu"],
        Xs,
        Xs_var,
        include_noise=include_noise,
    )


def freerun_narx(
    cfg: SVGPConfig,
    params,
    y_win: int,
    u_win: int,
    Y_train,
    U_train,
    U_test,
    *,
    moment_match: bool = True,
    include_noise_in_state: bool = True,
):
    """Closed-loop NARX free simulation with the SVGP posterior q(u) —
    mirrors :func:`rgp_tpu.models.gp_narx.freerun` but predicts through
    :func:`rgp_tpu.inference.svi.svi_predict` (config 4: the minibatch-trained
    model scored by the same free-simulation protocol as the collapsed ones).
    """
    import jax

    from ..data.windows import current_window

    Y_train = jnp.asarray(Y_train)
    U_test = jnp.asarray(U_test)
    Dy = Y_train.shape[1]
    Du = U_test.shape[1]
    Ly, Lu = y_win, u_win

    if Lu > 1:
        U_cat = jnp.concatenate([jnp.asarray(U_train)[-(Lu - 1):], U_test], axis=0)
        Uw = current_window(U_cat, Lu)[Lu - 1:]
    elif Lu == 1:
        Uw = current_window(U_test, 1)
    else:
        Uw = jnp.zeros((U_test.shape[0], 0))

    def step(carry, uw):
        y_mu, y_var = carry  # (Ly, Dy) most-recent-first
        x_mu = jnp.concatenate([y_mu.reshape(1, -1), uw.reshape(1, -1)], axis=-1)
        x_var = jnp.concatenate(
            [y_var.reshape(1, -1), jnp.zeros((1, Lu * Du), dtype=y_var.dtype)],
            axis=-1,
        )
        m, v = svi.svi_predict(
            cfg.kernel, params["kern"], params["Z"], params["log_noise"],
            params["qu"], x_mu, x_var if moment_match else None,
            include_noise=include_noise_in_state,
        )
        m, v = m[0], v[0]
        y_mu = jnp.concatenate([m[None, :], y_mu[:-1]], axis=0)
        y_var = jnp.concatenate([v[None, :], y_var[:-1]], axis=0)
        return (y_mu, y_var), (m, v)

    y0 = Y_train[::-1][:Ly]
    _, (means, vars_) = jax.lax.scan(step, (y0, jnp.zeros_like(y0)), Uw)
    return means, vars_
