"""Sparse variational GP regression (certain inputs) — Titsias' collapsed bound.

The `GPy.models.SparseGPRegression` equivalent [H]; config 3's substrate
(BASELINE.json:9) and the Z=X exactness test bed (SURVEY.md S4 item 3). Uses
the psi-statistics path with s = 0, which reduces exactly to the plain VarDTC
bound — one inference code path for certain and uncertain inputs.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..inference.collapsed_vi import (
    SparsePosterior,
    collapsed_bound,
    posterior,
    predict_uncertain,
)
from ..kernels import Kernel
from ..ops.psi_stats import psi_statistics
from ..params import np_positive_inv

__all__ = ["SparseGPConfig", "init_params", "elbo", "predict"]


@dataclasses.dataclass(frozen=True)
class SparseGPConfig:
    kernel: Kernel
    num_inducing: int


def kmeans_init(X, k: int, seed: int = 0, iters: int = 10,
                max_points: int = 4096) -> np.ndarray:
    """Tiny host-side Lloyd's k-means for inducing-point init (the reference's
    'subset or k-means' Z init [M], SURVEY.md S3.1). K-means is preferred: data
    subsets of windowed autoregressive designs contain near-duplicate rows
    (piecewise-constant inputs), which make Kmm numerically singular in f32.

    Distances use the GEMM form ||x||^2 - 2 x.c + ||c||^2 (BLAS-threaded)
    instead of a broadcast (N, k, D) temporary, and inputs beyond
    ``max_points`` are uniformly subsampled first — inducing-point init needs
    coverage of the input distribution, not every row. Measured necessity
    (round 4): the broadcast form on the full T=12278 long_corpus design took
    ~190 s of host time on a contended 2-core box and dominated the config-4
    wall clock; this form takes <2 s and yields statistically equivalent Z."""
    X = np.asarray(X, np.float64)
    rng = np.random.default_rng(seed)
    n = X.shape[0]
    if k >= n:
        return X + 1e-3 * rng.standard_normal(X.shape)
    if n > max_points:
        X = X[rng.permutation(n)[:max_points]]
        n = max_points
    C = X[rng.permutation(n)[:k]].copy()
    x2 = (X * X).sum(-1)[:, None]  # (n, 1)
    for _ in range(iters):
        d2 = x2 - 2.0 * (X @ C.T) + (C * C).sum(-1)[None, :]
        assign = d2.argmin(1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                C[j] = X[mask].mean(0)
            else:  # re-seed empty cluster
                C[j] = X[rng.integers(n)] + 1e-3 * rng.standard_normal(X.shape[1])
    return C


def init_params(
    cfg: SparseGPConfig,
    X,
    noise: float = 0.1,
    seed: int = 0,
    dtype=jnp.float32,
    **kern_kw,
):
    """Inducing inputs initialized by k-means over the (windowed) inputs."""
    Z = kmeans_init(X, cfg.num_inducing, seed=seed)
    return {
        "kern": cfg.kernel.init(dtype=dtype, **kern_kw),
        "Z": jnp.asarray(Z, dtype),
        "log_noise": np_positive_inv(noise, dtype),
    }


def elbo(cfg: SparseGPConfig, params, X, Y, *, block=None):
    stats = psi_statistics(cfg.kernel, params["kern"], params["Z"], X, None, block=block)
    # certain inputs: assemble the whitened Psi2 from its factor Psi1 = K
    # (PSD by construction, avoids the normal-equations f32 precision loss)
    return collapsed_bound(
        cfg.kernel, params["kern"], params["Z"], params["log_noise"], stats, Y,
        certain=True,
    )


def _posterior(cfg: SparseGPConfig, params, X, Y) -> SparsePosterior:
    stats = psi_statistics(cfg.kernel, params["kern"], params["Z"], X, None, block=None)
    return posterior(
        cfg.kernel, params["kern"], params["Z"], params["log_noise"], stats, Y,
        certain=True,
    )


def predict(cfg: SparseGPConfig, params, X, Y, Xs, *, include_noise: bool = True,
            full_cov: bool = False):
    post = _posterior(cfg, params, X, Y)
    if full_cov:
        from ..inference.collapsed_vi import predict_certain

        return predict_certain(
            cfg.kernel, params["kern"], params["Z"], params["log_noise"], post, Xs,
            full_cov=True, include_noise=include_noise,
        )
    return predict_uncertain(
        cfg.kernel,
        params["kern"],
        params["Z"],
        params["log_noise"],
        post,
        Xs,
        None,
        include_noise=include_noise,
    )


def posterior_samples_f(cfg: SparseGPConfig, params, X, Y, Xs, key, *,
                        n_samples: int = 10, include_noise: bool = False):
    """Joint posterior function samples at Xs (reference
    ``m.posterior_samples_f`` [H]). Returns (n_samples, T*, D)."""
    from ..inference.collapsed_vi import posterior_f_samples

    post = _posterior(cfg, params, X, Y)
    return posterior_f_samples(
        cfg.kernel, params["kern"], params["Z"], params["log_noise"], post, Xs, key,
        n_samples=n_samples, include_noise=include_noise,
    )
