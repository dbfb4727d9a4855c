"""NARX windowing and normalization utilities.

Rebuilds the reference's `RGP:autoreg/util.py` windowing helpers [M]
(SURVEY.md S2.1): lagged design matrices for autoregressive GP models, plus
standardization. Host-side (numpy-friendly) versions for dataset prep and
jit-safe versions (pure gather) for in-graph windowing.

Lag convention (matches A.1): ``lagged(X, L)[t] = [x_{t-1}, ..., x_{t-L}]``
flattened feature-major, i.e. most recent lag first. ``current_window(X, L)[t]
= [x_t, ..., x_{t-L+1}]`` includes the current step (exogenous/lower-layer
windows).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["lagged", "current_window", "narx_design", "Standardizer",
           "np_lagged", "np_current_window"]


def _np_stack_lags(X, lags):
    """Host-side numpy twin of ``_stack_lags`` for init-time use (avoids
    device round-trips — costly under remote-compile TPU backends)."""
    X = np.asarray(X)
    T = X.shape[0]
    cols = []
    for k in lags:
        if k == 0:
            cols.append(X)
        else:
            pad = np.zeros((k,) + X.shape[1:], dtype=X.dtype)
            cols.append(np.concatenate([pad, X[: T - k]], axis=0))
    return np.concatenate(cols, axis=-1)


def np_lagged(X, L: int):
    """numpy twin of :func:`lagged` (host-side, for initialization code)."""
    return _np_stack_lags(X, list(range(1, L + 1)))


def np_current_window(X, L: int):
    """numpy twin of :func:`current_window`."""
    return _np_stack_lags(X, list(range(0, L)))


def _stack_lags(X, lags):
    """X: (T, D); lags: list of nonneg ints k meaning x_{t-k}. Rows where t-k < 0
    are zero-padded (the in-model path never uses them; NARX trimming drops them)."""
    X = jnp.asarray(X)
    T = X.shape[0]
    cols = []
    for k in lags:
        if k == 0:
            cols.append(X)
        else:
            pad = jnp.zeros((k,) + X.shape[1:], dtype=X.dtype)
            cols.append(jnp.concatenate([pad, X[: T - k]], axis=0))
    return jnp.concatenate(cols, axis=-1)


def lagged(X, L: int):
    """(T, D) -> (T, L*D): [x_{t-1}, ..., x_{t-L}]."""
    return _stack_lags(X, list(range(1, L + 1)))


def current_window(X, L: int):
    """(T, D) -> (T, L*D): [x_t, ..., x_{t-L+1}]."""
    return _stack_lags(X, list(range(0, L)))


def narx_design(Y, U=None, y_win: int = 0, u_win: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build a GP-NARX regression problem: targets y_t, inputs
    [y_{t-1..t-y_win}, u_t..u_{t-u_win+1}], trimmed to valid rows.

    Returns (X_design, Y_targets) with T' = T - max(y_win, u_win-1) rows.
    """
    Y = jnp.asarray(Y)
    feats = []
    if y_win > 0:
        feats.append(lagged(Y, y_win))
    if U is not None and u_win > 0:
        feats.append(current_window(jnp.asarray(U), u_win))
    if not feats:
        raise ValueError("need y_win > 0 or (U, u_win > 0)")
    X = jnp.concatenate(feats, axis=-1)
    start = max(y_win, u_win - 1 if u_win > 0 else 0)
    return X[start:], Y[start:]


class Standardizer(NamedTuple):
    """Zero-mean/unit-variance scaling fit on the training split (reference
    notebooks standardize before fitting [M])."""

    mean: np.ndarray
    std: np.ndarray

    @classmethod
    def fit(cls, X) -> "Standardizer":
        X = np.asarray(X)
        return cls(mean=X.mean(0), std=X.std(0) + 1e-12)

    def transform(self, X):
        return (np.asarray(X) - self.mean) / self.std

    def inverse(self, X):
        return np.asarray(X) * self.std + self.mean

    def inverse_var(self, V):
        return np.asarray(V) * self.std**2
