"""Finite-difference gradient checking — the ecosystem's universal test oracle.

Reborn ``Model.checkgrad()`` (`paramz` [H], SURVEY.md S4 item 1): central
differences on the *flat unconstrained vector* vs ``jax.grad``, per coordinate,
with a relative-error report. Used by the test suite for every kernel,
psi-statistic, bound, and model.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import numpy as np

from ..params import ravel

__all__ = ["checkgrad", "CheckgradResult"]


class CheckgradResult(NamedTuple):
    max_abs_err: float
    max_rel_err: float
    analytic: np.ndarray
    numeric: np.ndarray

    @property
    def ok(self):
        """Finite analytic gradient AND FD agreement within 1e-4 relative."""
        return bool(np.isfinite(self.analytic).all()) and self.max_rel_err < 1e-4

    def passed(self, rel_tol: float = 1e-4) -> bool:
        return bool(np.isfinite(self.analytic).all()) and self.max_rel_err < rel_tol


def checkgrad(
    f: Callable,
    params,
    eps: float = 1e-5,
    *,
    max_coords: int | None = None,
    seed: int = 0,
) -> CheckgradResult:
    """Compare jax.grad(f) with central finite differences at ``params``.

    ``f`` maps a param pytree to a scalar. If ``max_coords`` is given, a random
    subset of coordinates is checked (for large models). Run under x64 for
    meaningful tolerances.
    """
    flat, unravel = ravel(params)
    flat = np.asarray(flat, dtype=np.float64)

    def f_flat(v):
        return f(unravel(v))

    analytic = np.asarray(jax.grad(f_flat)(flat))

    n = flat.size
    idx = np.arange(n)
    if max_coords is not None and n > max_coords:
        idx = np.random.default_rng(seed).choice(n, size=max_coords, replace=False)

    numeric = np.full(n, np.nan)
    f_jit = jax.jit(f_flat)
    for i in idx:
        e = np.zeros(n)
        e[i] = eps
        fp = float(f_jit(flat + e))
        fm = float(f_jit(flat - e))
        numeric[i] = (fp - fm) / (2.0 * eps)

    sel = idx
    abs_err = np.abs(analytic[sel] - numeric[sel])
    denom = np.maximum(np.abs(analytic[sel]) + np.abs(numeric[sel]), 1e-10)
    rel_err = 2.0 * abs_err / denom
    return CheckgradResult(float(abs_err.max()), float(rel_err.max()), analytic, numeric)
