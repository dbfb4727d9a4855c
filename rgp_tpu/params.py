"""Parameter transforms and pytree packing.

TPU-native replacement for the reference's paramz parameter framework
(`paramz:paramz/{param.py,parameterized.py,transformations.py}` [H], see SURVEY.md
S2.2): instead of a mutable named-parameter tree with constraint callbacks, models
here are plain pytrees of *unconstrained* arrays. Positivity (the reference's
``Logexp`` transform, ln(1+e^x)) is applied functionally at use sites via
:func:`softplus`; gradients flow through the bijector by autodiff, which replaces
paramz's hand-written transform chain rule.

Packing/unpacking the flat optimizer vector (paramz's ``optimizer_array``) is
:func:`ravel` / the unravel closure it returns — used by L-BFGS, the finite
difference checkgrad harness, and NUTS (which samples in the unconstrained space).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

__all__ = [
    "softplus",
    "softplus_inv",
    "np_positive_inv",
    "positive",
    "positive_inv",
    "ravel",
    "log_jacobian_softplus",
]


def softplus(x):
    """Numerically stable ln(1 + e^x); maps R -> R+ (reference ``Logexp``)."""
    return jnp.logaddexp(x, 0.0)


def softplus_inv(y):
    """Inverse of :func:`softplus`: x = y + log(1 - e^{-y}), stable for y>0."""
    y = jnp.asarray(y)
    return y + jnp.log(-jnp.expm1(-y))


def np_positive_inv(y, dtype):
    """Host-side (numpy) softplus inverse for initialization code: avoids
    per-op device round trips, which are very costly under remote-compile
    TPU backends. Returns a committed jax array of ``dtype``."""
    import numpy as _np

    y = _np.asarray(y, _np.float64)
    x = y + _np.log(-_np.expm1(-y))
    return jnp.asarray(x, dtype)


# Aliases that read well at call sites: raw (unconstrained) -> constrained.
positive = softplus
positive_inv = softplus_inv


def log_jacobian_softplus(x):
    """log |d softplus(x) / dx| = log sigmoid(x), summed over all elements.

    Needed by HMC/NUTS when sampling hyperparameters in unconstrained space with
    a prior placed on the *constrained* parameter (SURVEY.md A.5).
    """
    return jnp.sum(jax.nn.log_sigmoid(x))


def ravel(pytree):
    """Flatten a parameter pytree to a 1-D vector + an unravel closure.

    The vector plays the role of paramz's ``optimizer_array``: the single flat
    unconstrained vector seen by L-BFGS / finite-difference checkgrad / NUTS.
    """
    flat, unravel = ravel_pytree(pytree)
    return flat, unravel
