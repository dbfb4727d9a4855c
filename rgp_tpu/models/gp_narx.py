"""GP-NARX: sparse-VI autoregressive GP baseline (config 3, BASELINE.json:9).

The reference benchmark's GP-NARX method [L] (SURVEY.md S2.1 "Benchmark
harness"): regress y_t on [y_{t-1..t-Ly}, u_t..u_{t-Lu+1}] with a sparse GP —
"exercises psi-statistics without recurrent latent states". Free simulation
rolls the model closed-loop; with ``moment_match=True`` the fed-back outputs
carry their predictive variance through the psi-statistics (Girard 2003), which
is the same uncertain-input machinery the full RGP freerun uses (SURVEY.md S3.3).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..data.windows import narx_design
from ..inference.collapsed_vi import posterior, predict_uncertain
from ..kernels import Kernel
from ..ops.psi_stats import psi_statistics
from . import sparse_gp

__all__ = ["NARXConfig", "init_params", "elbo", "freerun"]


@dataclasses.dataclass(frozen=True)
class NARXConfig:
    kernel: Kernel
    num_inducing: int
    y_win: int
    u_win: int
    # additive lower bound on the noise variance (0 disables) — same measured
    # f32 pathology and fix as RGPConfig.noise_floor: long cosine schedules
    # collapse the noise and the beta^2 rounding then corrupts the bound
    # (config-3 at 2000 iters recorded elbo ~2.4e11 and freerun 1.84 vs the
    # floored 0.12-0.25 optima; BASELINE.md r4)
    noise_floor: float = 1e-4

    @property
    def sparse(self) -> sparse_gp.SparseGPConfig:
        return sparse_gp.SparseGPConfig(self.kernel, self.num_inducing)


def init_params(cfg: NARXConfig, Y, U=None, noise: float = 0.1, seed: int = 0,
                dtype=jnp.float32, **kern_kw):
    X, _ = narx_design(Y, U, cfg.y_win, cfg.u_win)
    return sparse_gp.init_params(cfg.sparse, X, noise=noise, seed=seed, dtype=dtype, **kern_kw)


def _fln(cfg: NARXConfig, log_noise):
    if cfg.noise_floor <= 0.0:
        return log_noise
    from ..params import positive

    return jnp.log(jnp.expm1(positive(log_noise) + cfg.noise_floor))


def elbo(cfg: NARXConfig, params, Y, U=None, *, block=None):
    X, Yt = narx_design(Y, U, cfg.y_win, cfg.u_win)
    params = {**params, "log_noise": _fln(cfg, params["log_noise"])}
    return sparse_gp.elbo(cfg.sparse, params, X, Yt, block=block)


@functools.partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=("moment_match", "include_noise_in_state"),
)
def freerun(
    cfg: NARXConfig,
    params,
    Y_train,
    U_train,
    U_test,
    y_init,
    *,
    moment_match: bool = True,
    include_noise_in_state: bool = True,
):
    """Closed-loop simulation over the test inputs under ``lax.scan``.

    ``y_init``: (y_win, Dy) the last training outputs seeding the feedback
    window. Returns (means (T*, Dy), vars (T*, Dy)).
    """
    X, Yt = narx_design(Y_train, U_train, cfg.y_win, cfg.u_win)
    ln_eff = _fln(cfg, params["log_noise"])
    stats = psi_statistics(cfg.kernel, params["kern"], params["Z"], X, None, block=None)
    post = posterior(
        cfg.kernel, params["kern"], params["Z"], ln_eff, stats, Yt,
        certain=True,
    )
    kern, kp, Z, ln = cfg.kernel, params["kern"], params["Z"], ln_eff
    Dy = Y_train.shape[1]
    Ly, Lu = cfg.y_win, cfg.u_win

    U_test = jnp.asarray(U_test)
    Du = U_test.shape[1]
    # exogenous window rows [u_t, ..., u_{t-Lu+1}] over test steps, seeded from
    # the TRAINING tail so the first steps see real lags (training trims all
    # zero-padded rows, so zeros here would be out-of-distribution).
    from ..data.windows import current_window

    if Lu > 1:
        U_cat = jnp.concatenate([jnp.asarray(U_train)[-(Lu - 1):], U_test], axis=0)
        Uw = current_window(U_cat, Lu)[Lu - 1:]
    elif Lu == 1:
        Uw = current_window(U_test, 1)
    else:
        Uw = jnp.zeros((U_test.shape[0], 0))

    def step(carry, uw):
        y_mu, y_var = carry  # (Ly, Dy) most-recent-first window
        x_mu = jnp.concatenate([y_mu.reshape(1, -1), uw.reshape(1, -1)], axis=-1)
        x_var = jnp.concatenate(
            [y_var.reshape(1, -1), jnp.zeros((1, Lu * Du), dtype=y_var.dtype)], axis=-1
        )
        s = x_var if moment_match else None
        m, v = predict_uncertain(kern, kp, Z, ln, post, x_mu, s,
                                 include_noise=include_noise_in_state)
        m, v = m[0], v[0]
        y_mu = jnp.concatenate([m[None, :], y_mu[:-1]], axis=0)
        y_var = jnp.concatenate([v[None, :], y_var[:-1]], axis=0)
        return (y_mu, y_var), (m, v)

    y0 = jnp.asarray(y_init)[::-1][:Ly]  # most recent first
    carry0 = (y0, jnp.zeros_like(y0))
    _, (means, vars_) = jax.lax.scan(step, carry0, Uw)
    return means, vars_
