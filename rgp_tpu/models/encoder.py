"""MLP back-constraint encoder (amortized q(X) means).

Rebuilds the reference's hand-rolled numpy MLP with manual backward
(`RGP:autoreg/encoder.py` [M], SURVEY.md S2.1 "Back-constraint encoder",
enabled by ``back_cstr=True`` and sized by ``MLP_dims``): maps a window of
observed outputs (and exogenous inputs) at time t to the variational mean
mu^h_t. Here it is an explicit-pytree tanh MLP whose backward pass is autodiff
(deleting the reference's manual backprop entirely).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = ["init_mlp", "mlp_apply"]


def init_mlp(key, dims: Sequence[int], dtype=jnp.float32):
    """dims = (d_in, h1, ..., d_out). Glorot-initialized weights."""
    params = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        fan_in, fan_out = dims[i], dims[i + 1]
        w = jax.random.normal(sub, (fan_in, fan_out), dtype) * jnp.sqrt(
            2.0 / (fan_in + fan_out)
        ).astype(dtype)
        b = jnp.zeros((fan_out,), dtype)
        params.append({"w": w, "b": b})
    return tuple(params)


def mlp_apply(params, x):
    """tanh hidden layers, linear output (reference MLP activation [M])."""
    h = x
    for layer in params[:-1]:
        h = jnp.tanh(h @ layer["w"] + layer["b"])
    out = h @ params[-1]["w"] + params[-1]["b"]
    return out
