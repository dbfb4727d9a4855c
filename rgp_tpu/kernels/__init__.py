"""Covariance functions (kernel layer L2).

TPU-native replacement for `GPy:GPy/kern/src/{rbf.py,linear.py,white.py,bias.py,
add.py,prod.py}` [H] (SURVEY.md S2.2). Design differences from the reference:

* Kernels are *stateless, hashable* frozen dataclasses describing structure only
  (input dim, ARD flag, active dims). Hyperparameters live in a separate pytree of
  **unconstrained** arrays created by :meth:`init`; positivity is applied with
  softplus at use sites. This makes every kernel a valid ``jit`` static argument
  and every hyperparameter a differentiable pytree leaf — no ``update_gradients_*``
  callback plumbing (autodiff replaces `GPy:GPy/kern/src/stationary_cython.pyx`,
  SURVEY.md N2).
* ``K`` builds Gram matrices from MXU matmuls (||x||^2 + ||x'||^2 - 2 x.x') at
  HIGHEST precision rather than pairwise Cython loops.

Psi-statistics (the uncertain-input expectations, `GPy:GPy/kern/src/psi_comp/`)
live in :mod:`rgp_tpu.ops.psi_stats` and dispatch on these kernel classes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from ..linalg import hdot
import numpy as np

from ..params import np_positive_inv, positive

__all__ = ["Kernel", "RBF", "Linear", "White", "Bias", "Sum", "Prod", "kern_slice"]


def kern_slice(kern: "Kernel", X):
    """Apply a kernel's active_dims restriction to an input matrix."""
    if kern.active_dims is None:
        return X
    return X[..., jnp.asarray(kern.active_dims)]


@dataclasses.dataclass(frozen=True)
class Kernel:
    """Base: structural description of a covariance function."""

    input_dim: int
    active_dims: Optional[Tuple[int, ...]] = None

    # -- interface -----------------------------------------------------------
    def init(self, **kw):  # -> param pytree (dict of unconstrained arrays)
        raise NotImplementedError

    def K(self, p, X, X2=None):
        raise NotImplementedError

    def Kdiag(self, p, X):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class RBF(Kernel):
    """RBF / squared-exponential with optional ARD lengthscales.

    k(x,x') = s_f^2 exp(-1/2 sum_q (x_q-x'_q)^2 / l_q^2)
    (reference `GPy:GPy/kern/src/rbf.py` [H]).
    """

    ard: bool = True

    def init(self, variance: float = 1.0, lengthscale=1.0, dtype=jnp.float32):
        nls = self.input_dim if self.ard else 1
        ls = np.broadcast_to(np.asarray(lengthscale, np.float64), (nls,))
        return {
            "log_var": np_positive_inv(variance, dtype),
            "log_ls": np_positive_inv(ls, dtype),
        }

    def _scaled(self, p, X):
        ls = positive(p["log_ls"])
        return kern_slice(self, X) / ls

    def K(self, p, X, X2=None):
        var = positive(p["log_var"])
        Xs = self._scaled(p, X)
        X2s = Xs if X2 is None else self._scaled(p, X2)
        r2 = self._sqdist(Xs, X2s)
        return var * jnp.exp(-0.5 * r2)

    @staticmethod
    def _sqdist(A, B):
        # ||a||^2 + ||b||^2 - 2 a.b via MXU; clamp tiny negatives from rounding.
        aa = jnp.sum(A * A, axis=-1)[..., :, None]
        bb = jnp.sum(B * B, axis=-1)[..., None, :]
        ab = hdot(A, jnp.swapaxes(B, -1, -2))
        return jnp.maximum(aa + bb - 2.0 * ab, 0.0)

    def Kdiag(self, p, X):
        var = positive(p["log_var"])
        return jnp.broadcast_to(var, X.shape[:-1])


@dataclasses.dataclass(frozen=True)
class Linear(Kernel):
    """Linear kernel k(x,x') = sum_q v_q x_q x'_q (`GPy:GPy/kern/src/linear.py` [H])."""

    ard: bool = True

    def init(self, variance: float = 1.0, dtype=jnp.float32):
        nv = self.input_dim if self.ard else 1
        v = np.broadcast_to(np.asarray(variance, np.float64), (nv,))
        return {"log_var": np_positive_inv(v, dtype)}

    def K(self, p, X, X2=None):
        v = positive(p["log_var"])
        Xa = kern_slice(self, X)
        X2a = Xa if X2 is None else kern_slice(self, X2)
        return hdot(Xa * v, jnp.swapaxes(X2a, -1, -2))

    def Kdiag(self, p, X):
        v = positive(p["log_var"])
        Xa = kern_slice(self, X)
        return jnp.sum(Xa * Xa * v, axis=-1)


@dataclasses.dataclass(frozen=True)
class White(Kernel):
    """White noise: k = s^2 I on matching inputs (`GPy:.../white.py` [H])."""

    def init(self, variance: float = 1.0, dtype=jnp.float32):
        return {"log_var": np_positive_inv(variance, dtype)}

    def K(self, p, X, X2=None):
        var = positive(p["log_var"])
        n = X.shape[-2]
        if X2 is None:
            return var * jnp.eye(n, dtype=X.dtype)
        return jnp.zeros(X.shape[:-2] + (n, X2.shape[-2]), dtype=X.dtype)

    def Kdiag(self, p, X):
        var = positive(p["log_var"])
        return jnp.broadcast_to(var, X.shape[:-1])


@dataclasses.dataclass(frozen=True)
class Bias(Kernel):
    """Constant kernel k = s^2 (`GPy:.../bias.py` [H])."""

    def init(self, variance: float = 1.0, dtype=jnp.float32):
        return {"log_var": np_positive_inv(variance, dtype)}

    def K(self, p, X, X2=None):
        var = positive(p["log_var"])
        m = X.shape[-2] if X2 is None else X2.shape[-2]
        return jnp.broadcast_to(var, X.shape[:-2] + (X.shape[-2], m))

    def Kdiag(self, p, X):
        var = positive(p["log_var"])
        return jnp.broadcast_to(var, X.shape[:-1])


@dataclasses.dataclass(frozen=True)
class Prod(Kernel):
    """Multiplicative combination (`GPy:GPy/kern/src/prod.py` [H]).

    K/Kdiag only — psi-statistics of products are not closed-form in general
    (same restriction as the reference; typically used with disjoint
    active_dims, where the product of RBFs is again an RBF).
    """

    parts: Tuple[Kernel, ...] = ()

    def init(self, *part_kwargs, dtype=jnp.float32):
        if not part_kwargs:
            part_kwargs = tuple({} for _ in self.parts)
        return tuple(k.init(dtype=dtype, **kw) for k, kw in zip(self.parts, part_kwargs))

    def K(self, p, X, X2=None):
        out = self.parts[0].K(p[0], X, X2)
        for k, pk in zip(self.parts[1:], p[1:]):
            out = out * k.K(pk, X, X2)
        return out

    def Kdiag(self, p, X):
        out = self.parts[0].Kdiag(p[0], X)
        for k, pk in zip(self.parts[1:], p[1:]):
            out = out * k.Kdiag(pk, X)
        return out


@dataclasses.dataclass(frozen=True)
class Sum(Kernel):
    """Additive combination (`GPy:GPy/kern/src/add.py` [H]).

    Parameters are a tuple-pytree, one entry per part.
    """

    parts: Tuple[Kernel, ...] = ()

    def init(self, *part_kwargs, dtype=jnp.float32):
        if not part_kwargs:
            part_kwargs = tuple({} for _ in self.parts)
        return tuple(k.init(dtype=dtype, **kw) for k, kw in zip(self.parts, part_kwargs))

    def K(self, p, X, X2=None):
        out = self.parts[0].K(p[0], X, X2)
        for k, pk in zip(self.parts[1:], p[1:]):
            out = out + k.K(pk, X, X2)
        return out

    def Kdiag(self, p, X):
        out = self.parts[0].Kdiag(p[0], X)
        for k, pk in zip(self.parts[1:], p[1:]):
            out = out + k.Kdiag(pk, X)
        return out
