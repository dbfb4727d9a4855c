"""SMC adapter: the trained deep RGP as a particle-filterable state-space model.

Builds the (transition, emission, init) closures that
:func:`rgp_tpu.sample.smc.smc_filter` consumes (SURVEY.md A.5: "SMC over latent
trajectories: particles follow the transition GPs, weights from emission
terms"). A particle is the concatenated per-layer state window (concrete
values, not moments); the transition samples each layer's next state from its
sparse-GP predictive at the particle's windowed input (bootstrap proposal),
and the emission weights by the output GP's predictive density at the observed
y_t. Uses the same trained posteriors as ``freerun``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..data.windows import current_window
from ..inference.collapsed_vi import predict_uncertain
from . import rgp

__all__ = ["make_ssm", "SSM"]


class SSM(NamedTuple):
    transition_sample: Callable
    emission_logpdf: Callable
    init_sample: Callable
    n_steps: int
    state_dim: int
    unpack: Callable  # state vector -> list of per-layer windows


def make_ssm(
    cfg: rgp.RGPConfig,
    params,
    Y_train,
    U_train,
    U_test,
    Y_test,
) -> SSM:
    """Build the particle-filter view of the trained model over the test span."""
    posts, _ = rgp._posteriors(cfg, params, Y_train, U_train)
    mus, _ = rgp._hidden_moments(cfg, params, jnp.asarray(Y_train), jnp.asarray(U_train))
    U_test = jnp.asarray(U_test)
    Y_test = jnp.asarray(Y_test)
    H = cfg.n_hidden
    specs = cfg.layers

    buf_lens = []
    for h, spec in enumerate(specs):
        need_above = specs[h + 1].win if h + 1 < H else cfg.out_win
        buf_lens.append(max(spec.win, need_above))
    offsets = [0]
    for h, spec in enumerate(specs):
        offsets.append(offsets[-1] + buf_lens[h] * spec.q_dim)
    state_dim = offsets[-1]

    Lu = cfg.u_win
    U_cat = (
        jnp.concatenate([jnp.asarray(U_train)[-max(Lu - 1, 0):], U_test], axis=0)
        if Lu > 1
        else U_test
    )
    Uw = (
        current_window(U_cat, Lu)[max(Lu - 1, 0):]
        if Lu > 0
        else jnp.zeros((U_test.shape[0], 0), dtype=U_test.dtype)
    )

    def unpack(state):
        """(state_dim,) -> [(B_h, Q_h)] most-recent-first windows."""
        return [
            state[offsets[h]: offsets[h + 1]].reshape(buf_lens[h], specs[h].q_dim)
            for h in range(H)
        ]

    def pack(bufs):
        return jnp.concatenate([b.reshape(-1) for b in bufs], axis=0)

    def _layer_step(key, bufs, uw):
        """One particle's transition: sample each layer's new state."""
        new_vals = []
        for h, spec in enumerate(specs):
            lp = params["layers"][h]
            L = spec.win
            own = bufs[h][:L].reshape(1, -1)
            if h == 0:
                low = uw.reshape(1, -1)
            else:
                prev = new_vals[h - 1][None, :]
                low = (
                    jnp.concatenate([prev, bufs[h - 1][: L - 1]], axis=0).reshape(1, -1)
                    if L > 1
                    else prev.reshape(1, -1)
                )
            x = jnp.concatenate([own, low], axis=-1)
            m, v = predict_uncertain(
                spec.kernel, lp["kern"], lp["Z"], rgp._fln(cfg, lp["log_noise"]), posts[h],
                x, None, include_noise=True,
            )
            key, sub = jax.random.split(key)
            val = m[0] + jnp.sqrt(v[0]) * jax.random.normal(sub, m[0].shape, m.dtype)
            new_vals.append(val)
        bufs = [
            jnp.concatenate([new_vals[h][None, :], bufs[h][:-1]], axis=0)
            for h in range(H)
        ]
        return pack(bufs)

    def transition_sample(keys, particles, t):
        uw = Uw[t]
        return jax.vmap(lambda k, s: _layer_step(k, unpack(s), uw))(keys, particles)

    def emission_logpdf(particles, t):
        op = params["out"]
        W = cfg.out_win
        y = Y_test[t]

        def one(state):
            bufs = unpack(state)
            top = bufs[-1][:W].reshape(1, -1)
            m, v = predict_uncertain(
                cfg.out_kernel, op["kern"], op["Z"], rgp._fln(cfg, op["log_noise"]), posts[-1],
                top, None, include_noise=True,
            )
            return jnp.sum(
                -0.5 * jnp.log(2 * jnp.pi * v[0]) - 0.5 * (y - m[0]) ** 2 / v[0]
            )

        return jax.vmap(one)(particles)

    def init_sample(key, n):
        """Start every particle at the trained variational tail, with per-state
        noise scaled by the trained q(x) standard deviations."""
        bufs, stds = [], []
        for h, spec in enumerate(specs):
            B = buf_lens[h]
            lam_t = jnp.exp(params["layers"][h]["log_lam"])
            bufs.append(mus[h][-B:][::-1])
            stds.append(jnp.sqrt(lam_t[-B:][::-1]))
        base = pack(bufs)
        std = pack(stds)
        return base[None, :] + std[None, :] * jax.random.normal(
            key, (n, state_dim), base.dtype
        )

    return SSM(
        transition_sample=transition_sample,
        emission_logpdf=emission_logpdf,
        init_sample=init_sample,
        n_steps=U_test.shape[0],
        state_dim=state_dim,
        unpack=unpack,
    )
