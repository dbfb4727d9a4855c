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

__all__ = ["SVGPConfig", "init_params", "elbo", "predict"]


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
