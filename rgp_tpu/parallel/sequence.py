"""Explicit sequence-sharded REVARB ELBO: the SP/CP analog with halo exchange.

SURVEY.md S2.4/S5.7: REVARB's mean-field q(x_t) factorizes the bound over
timesteps, so the time axis shards over the mesh 'data' axis. Each shard's
lag windows need the last ``max(L_h, L_u-1)`` states from its LEFT neighbor —
a ring ``ppermute`` halo exchange (the honest analog of ring/context
parallelism for this model class). Partial psi-statistics and the per-timestep
entropy/KL terms then ``psum``-reduce, and the bound assembles replicated.

This is the hand-written counterpart of the GSPMD path (jit with time-sharded
arrays, tests/test_gspmd_sharding.py): identical math, explicit collectives.
Back-constrained (encoder) means are supported — the encoder input windows of
(Y, U) halo-exchange the same way.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..data.windows import current_window, lagged
from ..inference.collapsed_vi import collapsed_bound_from_suffstats
from ..linalg import hdot
from ..models import rgp as rgp_model
from ..models.encoder import mlp_apply
from ..ops.psi_stats import psi_statistics

__all__ = ["sequence_sharded_rgp_elbo"]


def _halo_from_left(x_loc, halo: int, axis_name: str, first_fill):
    """Bring the last ``halo`` rows of the LEFT neighbor's block; the first
    shard receives ``first_fill`` (shape (halo, D)) instead."""
    if halo == 0:
        return jnp.zeros((0,) + x_loc.shape[1:], x_loc.dtype)
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    tail = x_loc[-halo:]
    perm = [(i, (i + 1) % n) for i in range(n)]  # send right
    recv = jax.lax.ppermute(tail, axis_name, perm)
    return jnp.where((idx == 0), first_fill.astype(x_loc.dtype), recv)


def _windows_local(x_loc, halo_rows, L: int, mode: str):
    """Build per-timestep windows for the local block given its left halo.

    mode='lagged': [x_{t-1..t-L}];  mode='current': [x_t..x_{t-L+1}].
    """
    ext = jnp.concatenate([halo_rows, x_loc], axis=0)
    if mode == "lagged":
        return lagged(ext, L)[halo_rows.shape[0]:]
    return current_window(ext, L)[halo_rows.shape[0]:]


def sequence_sharded_rgp_elbo(
    cfg: rgp_model.RGPConfig,
    params,
    Y,
    U,
    mesh: Mesh,
    *,
    axis: str = "data",
    block: Optional[int] = None,
):
    """REVARB ELBO with the time axis sharded over ``axis``.

    ``Y``/``U`` and the per-timestep variational state (params['layers'][h]
    ['mu'/'log_lam']) must have time length divisible by the axis size.
    Returns a replicated scalar equal (up to reduction order) to
    ``rgp_model.elbo``. NOTE: take gradients under ``jax.jit`` — eager
    grad-of-shard_map trips an XLA sharding assert on this jax version.
    """
    T = Y.shape[0]
    n_dev = mesh.shape[axis]
    assert T % n_dev == 0, "sequence length must divide the mesh axis"

    specs = cfg.layers
    in_specs = (
        _params_spec(cfg, axis),
        P(axis),  # Y
        P(axis),  # U
    )

    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=P())
    def _elbo(p, Y_loc, U_loc):
        # Gradient-correct accumulation: terms assembled identically on every
        # device from psum-reduced statistics ("replicated" terms) are divided
        # by the axis size and the grand total is psum'd once at the end —
        # forward value unchanged, and every cotangent is counted exactly once
        # (a bare replicated output would n-fold-overcount replicated-param
        # gradients under shard_map autodiff).
        n_ax = jax.lax.axis_size(axis)
        repl = 0.0   # identical on every device
        local = 0.0  # this shard's own contribution

        # encoder moments are amortized from (Y, U) windows — build them
        # locally with halo'd observations when back-constraints are on;
        # with ``amortize_var`` the encoder output doubles to (mu, log-var)
        # per latent dim, exactly as models/rgp._hidden_moments does
        mu_ts, lam_ts = [], []
        for h, spec in enumerate(specs):
            lp = p["layers"][h]
            lam_t = jnp.exp(lp["log_lam"])
            if cfg.back_cstr:
                feats = []
                if spec.win > 0:
                    haloY = _halo_from_left(
                        Y_loc, spec.win, axis, jnp.zeros((spec.win, cfg.y_dim))
                    )
                    feats.append(_windows_local(Y_loc, haloY, spec.win, "lagged"))
                if cfg.u_win > 0:
                    haloU = _halo_from_left(
                        U_loc, cfg.u_win - 1, axis,
                        jnp.zeros((max(cfg.u_win - 1, 0), cfg.u_dim)),
                    )
                    feats.append(_windows_local(U_loc, haloU, cfg.u_win, "current"))
                enc_in = jnp.concatenate(feats, axis=-1)
                out = mlp_apply(p["encoder"][h], enc_in)
                if cfg.amortize_var:
                    mu_ts.append(out[:, : spec.q_dim])
                    lam_t = jnp.exp(
                        out[:, spec.q_dim:] + rgp_model._LOG_LAM_BIAS
                    )
                else:
                    mu_ts.append(out)
            else:
                mu_ts.append(lp["mu"])
            lam_ts.append(lam_t)

        mu_lower = lam_lower = None
        for h, spec in enumerate(specs):
            lp = p["layers"][h]
            L = spec.win
            mu_t = mu_ts[h]
            lam_t = lam_ts[h]

            # own lag windows: halo = left neighbor's last L latents;
            # the FIRST shard's halo is the initial window mu0 (most recent
            # last — mu0 is stored oldest-first, matching concat semantics)
            halo_mu = _halo_from_left(mu_t, L, axis, lp["mu0"])
            halo_lam = _halo_from_left(lam_t, L, axis, jnp.exp(lp["log_lam0"]))
            own_mu = _windows_local(mu_t, halo_mu, L, "lagged")
            own_s = _windows_local(lam_t, halo_lam, L, "lagged")

            if h == 0:
                haloU = _halo_from_left(
                    U_loc, cfg.u_win - 1, axis,
                    jnp.zeros((max(cfg.u_win - 1, 0), cfg.u_dim)),
                )
                low_mu = _windows_local(U_loc, haloU, cfg.u_win, "current")
                low_s = jnp.zeros_like(low_mu)
            else:
                halo_lmu = _halo_from_left(
                    mu_lower, L - 1, axis, jnp.zeros((L - 1, specs[h - 1].q_dim))
                )
                halo_lS = _halo_from_left(
                    lam_lower, L - 1, axis, jnp.zeros((L - 1, specs[h - 1].q_dim))
                )
                low_mu = _windows_local(mu_lower, halo_lmu, L, "current")
                low_s = _windows_local(lam_lower, halo_lS, L, "current")

            X_mu = jnp.concatenate([own_mu, low_mu], axis=-1)
            X_s = jnp.concatenate([own_s, low_s], axis=-1)

            stats = psi_statistics(spec.kernel, lp["kern"], lp["Z"], X_mu, X_s, block=block)
            psi0_sum = jax.lax.psum(jnp.sum(stats.psi0), axis)
            psi1Y = jax.lax.psum(hdot(stats.psi1.T, mu_t), axis)
            psi2 = jax.lax.psum(stats.psi2, axis)
            trYY = jax.lax.psum(jnp.sum(mu_t * mu_t) + jnp.sum(lam_t), axis)
            repl = repl + collapsed_bound_from_suffstats(
                spec.kernel, lp["kern"], lp["Z"], rgp_model._fln(cfg, lp["log_noise"]),
                psi0_sum, psi1Y, psi2, trYY, T, spec.q_dim,
            )
            # entropy over this shard's targets (local) + KL of the replicated
            # initial window (replicated)
            local = local + 0.5 * jnp.sum(jnp.log(2.0 * jnp.pi * jnp.e * lam_t))
            mu0, lam0 = lp["mu0"], jnp.exp(lp["log_lam0"])
            repl = repl - 0.5 * jnp.sum(mu0 * mu0 + lam0 - jnp.log(lam0) - 1.0)

            mu_lower, lam_lower = mu_t, lam_t

        # output layer
        op = p["out"]
        W = cfg.out_win
        halo_tmu = _halo_from_left(mu_lower, W - 1, axis, jnp.zeros((W - 1, specs[-1].q_dim)))
        halo_tS = _halo_from_left(lam_lower, W - 1, axis, jnp.zeros((W - 1, specs[-1].q_dim)))
        Xo_mu = _windows_local(mu_lower, halo_tmu, W, "current")
        Xo_s = _windows_local(lam_lower, halo_tS, W, "current")
        stats = psi_statistics(cfg.out_kernel, op["kern"], op["Z"], Xo_mu, Xo_s, block=block)
        psi0_sum = jax.lax.psum(jnp.sum(stats.psi0), axis)
        psi1Y = jax.lax.psum(hdot(stats.psi1.T, Y_loc), axis)
        psi2 = jax.lax.psum(stats.psi2, axis)
        trYY = jax.lax.psum(jnp.sum(Y_loc * Y_loc), axis)
        repl = repl + collapsed_bound_from_suffstats(
            cfg.out_kernel, op["kern"], op["Z"], rgp_model._fln(cfg, op["log_noise"]),
            psi0_sum, psi1Y, psi2, trYY, T, cfg.y_dim,
        )
        return jax.lax.psum(local + repl / n_ax, axis)

    # place the time-sharded operands explicitly (grad-of-shard_map asserts
    # that XLA's inferred input shardings match the specs; unplaced arrays
    # trip it on some jax versions)
    from jax.sharding import NamedSharding

    shard = NamedSharding(mesh, P(axis))

    def _place_layer(lp):
        return {**lp,
                "mu": jax.device_put(lp["mu"], shard),
                "log_lam": jax.device_put(lp["log_lam"], shard)}

    params = {**params, "layers": tuple(_place_layer(lp) for lp in params["layers"])}
    Y = jax.device_put(jnp.asarray(Y), shard)
    U = jax.device_put(jnp.asarray(U), shard)
    return _elbo(params, Y, U)


def _params_spec(cfg: rgp_model.RGPConfig, axis: str):
    """PartitionSpec pytree for the RGP params: per-timestep variational state
    sharded over ``axis``; everything else replicated."""
    layer_specs = tuple(
        {
            "kern": P(), "Z": P(), "log_noise": P(),
            "mu0": P(), "log_lam0": P(),
            "mu": P(axis), "log_lam": P(axis),
        }
        for _ in cfg.layers
    )
    spec = {"layers": layer_specs,
            "out": {"kern": P(), "Z": P(), "log_noise": P()}}
    if cfg.back_cstr:
        spec["encoder"] = P()
    return spec
