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

__all__ = [
    "Kernel",
    "RBF",
    "Linear",
    "White",
    "Bias",
    "Sum",
    "Prod",
    "Exponential",
    "Matern32",
    "Matern52",
    "RatQuad",
    "StdPeriodic",
    "MLP",
    "kern_slice",
]


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

    # -- combination operators (GPy `k1 + k2`, `k1 * k2` API parity [H]) ------
    def _dims_union(self, other: "Kernel") -> int:
        mine = self.active_dims if self.active_dims is not None else range(self.input_dim)
        theirs = other.active_dims if other.active_dims is not None else range(other.input_dim)
        return max(*mine, *theirs) + 1

    def __add__(self, other: "Kernel") -> "Sum":
        if not isinstance(other, Kernel):
            return NotImplemented
        a = self.parts if isinstance(self, Sum) else (self,)
        b = other.parts if isinstance(other, Sum) else (other,)
        return Sum(input_dim=self._dims_union(other), parts=a + b)

    def __mul__(self, other: "Kernel") -> "Prod":
        if not isinstance(other, Kernel):
            return NotImplemented
        a = self.parts if isinstance(self, Prod) else (self,)
        b = other.parts if isinstance(other, Prod) else (other,)
        return Prod(input_dim=self._dims_union(other), parts=a + b)


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


def _safe_r(r2):
    """sqrt(r2) with a gradient-safe zero: d sqrt/d r2 is masked where r2 == 0
    (the Matern-family K(r) forms all have dK/dr -> finite at r=0, and the
    chain through this masked sqrt yields the correct 0 diagonal gradient)."""
    pos = r2 > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, r2, 1.0)), 0.0)


@dataclasses.dataclass(frozen=True)
class _StationaryIso(Kernel):
    """Base for stationary kernels of the scaled distance r (GPy
    `GPy:GPy/kern/src/stationary.py` [H]: Exponential/Matern/RatQuad share the
    lengthscale/variance plumbing and differ only in K(r))."""

    ard: bool = True

    def init(self, variance: float = 1.0, lengthscale=1.0, dtype=jnp.float32):
        nls = self.input_dim if self.ard else 1
        ls = np.broadcast_to(np.asarray(lengthscale, np.float64), (nls,))
        return {
            "log_var": np_positive_inv(variance, dtype),
            "log_ls": np_positive_inv(ls, dtype),
        }

    def _r2(self, p, X, X2):
        ls = positive(p["log_ls"])
        A = kern_slice(self, X) / ls
        B = A if X2 is None else kern_slice(self, X2) / ls
        aa = jnp.sum(A * A, axis=-1)[..., :, None]
        bb = jnp.sum(B * B, axis=-1)[..., None, :]
        ab = hdot(A, jnp.swapaxes(B, -1, -2))
        return jnp.maximum(aa + bb - 2.0 * ab, 0.0)

    def K_of_r(self, r):
        raise NotImplementedError

    def K(self, p, X, X2=None):
        var = positive(p["log_var"])
        return var * self.K_of_r(_safe_r(self._r2(p, X, X2)))

    def Kdiag(self, p, X):
        var = positive(p["log_var"])
        return jnp.broadcast_to(var, X.shape[:-1])


@dataclasses.dataclass(frozen=True)
class Exponential(_StationaryIso):
    """k = s^2 exp(-r)  (Matern-1/2; `GPy:GPy/kern/src/stationary.py` [H])."""

    def K_of_r(self, r):
        return jnp.exp(-r)


@dataclasses.dataclass(frozen=True)
class Matern32(_StationaryIso):
    """k = s^2 (1 + sqrt(3) r) exp(-sqrt(3) r) (`GPy:.../stationary.py` [H])."""

    def K_of_r(self, r):
        a = jnp.sqrt(3.0) * r
        return (1.0 + a) * jnp.exp(-a)


@dataclasses.dataclass(frozen=True)
class Matern52(_StationaryIso):
    """k = s^2 (1 + sqrt(5) r + 5 r^2/3) exp(-sqrt(5) r) (`GPy:.../stationary.py` [H])."""

    def K_of_r(self, r):
        a = jnp.sqrt(5.0) * r
        return (1.0 + a + a * a / 3.0) * jnp.exp(-a)


@dataclasses.dataclass(frozen=True)
class RatQuad(_StationaryIso):
    """Rational quadratic k = s^2 (1 + r^2/(2 alpha))^(-alpha)
    (`GPy:.../stationary.py` RatQuad [H]); alpha ("power") is a positive
    hyperparameter learned alongside the lengthscales."""

    def init(self, variance: float = 1.0, lengthscale=1.0, power: float = 2.0, dtype=jnp.float32):
        p = super().init(variance=variance, lengthscale=lengthscale, dtype=dtype)
        p["log_power"] = np_positive_inv(power, dtype)
        return p

    def K(self, p, X, X2=None):
        var = positive(p["log_var"])
        alpha = positive(p["log_power"])
        r2 = self._r2(p, X, X2)
        return var * jnp.exp(-alpha * jnp.log1p(r2 / (2.0 * alpha)))


@dataclasses.dataclass(frozen=True)
class StdPeriodic(Kernel):
    """Standard periodic kernel (MacKay):
    k = s^2 exp(-2 sum_q sin^2(pi (x_q - x'_q)/T_q) / l_q^2)
    (`GPy:GPy/kern/src/standard_periodic.py` [H])."""

    ard: bool = True

    def init(self, variance: float = 1.0, period=1.0, lengthscale=1.0, dtype=jnp.float32):
        n = self.input_dim if self.ard else 1
        per = np.broadcast_to(np.asarray(period, np.float64), (n,))
        ls = np.broadcast_to(np.asarray(lengthscale, np.float64), (n,))
        return {
            "log_var": np_positive_inv(variance, dtype),
            "log_period": np_positive_inv(per, dtype),
            "log_ls": np_positive_inv(ls, dtype),
        }

    def K(self, p, X, X2=None):
        var = positive(p["log_var"])
        per = positive(p["log_period"])
        ls = positive(p["log_ls"])
        Xa = kern_slice(self, X)
        X2a = Xa if X2 is None else kern_slice(self, X2)
        d = Xa[..., :, None, :] - X2a[..., None, :, :]  # (N, N2, Q)
        sin2 = jnp.sin(jnp.pi * d / per) ** 2
        return var * jnp.exp(-2.0 * jnp.sum(sin2 / (ls * ls), axis=-1))

    def Kdiag(self, p, X):
        var = positive(p["log_var"])
        return jnp.broadcast_to(var, X.shape[:-1])


@dataclasses.dataclass(frozen=True)
class MLP(Kernel):
    """Arcsine / neural-network kernel (Williams 1998):
    k = s^2 (2/pi) asin( w x.x' + b ) / sqrt((w x.x + b + 1)(w x'.x' + b + 1))
    (`GPy:GPy/kern/src/mlp.py` [H]); w = weight variance, b = bias variance."""

    def init(self, variance: float = 1.0, weight_variance: float = 1.0,
             bias_variance: float = 1.0, dtype=jnp.float32):
        return {
            "log_var": np_positive_inv(variance, dtype),
            "log_w": np_positive_inv(weight_variance, dtype),
            "log_b": np_positive_inv(bias_variance, dtype),
        }

    def _inner(self, p, X, X2):
        w = positive(p["log_w"])
        b = positive(p["log_b"])
        Xa = kern_slice(self, X)
        X2a = Xa if X2 is None else kern_slice(self, X2)
        return w * hdot(Xa, jnp.swapaxes(X2a, -1, -2)) + b

    def K(self, p, X, X2=None):
        var = positive(p["log_var"])
        w = positive(p["log_w"])
        b = positive(p["log_b"])
        num = self._inner(p, X, X2)
        Xa = kern_slice(self, X)
        X2a = Xa if X2 is None else kern_slice(self, X2)
        dx = w * jnp.sum(Xa * Xa, axis=-1) + b + 1.0
        dx2 = w * jnp.sum(X2a * X2a, axis=-1) + b + 1.0
        denom = jnp.sqrt(dx[..., :, None] * dx2[..., None, :])
        # clip for f32 rounding: |num/denom| can exceed 1 by ~1e-7 on the diagonal
        z = jnp.clip(num / denom, -1.0, 1.0)
        return var * (2.0 / jnp.pi) * jnp.arcsin(z)

    def Kdiag(self, p, X):
        var = positive(p["log_var"])
        w = positive(p["log_w"])
        b = positive(p["log_b"])
        Xa = kern_slice(self, X)
        dx = w * jnp.sum(Xa * Xa, axis=-1) + b
        return var * (2.0 / jnp.pi) * jnp.arcsin(dx / (dx + 1.0))


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
