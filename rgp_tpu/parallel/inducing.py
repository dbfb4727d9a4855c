"""Inducing-point (M-axis) sharding — the TP analog (SURVEY.md S2.4).

The reference has no counterpart (GPy's VarDTC is single-process); SURVEY.md
S2.4 plans this as the tensor-parallel analog for very large M: shard the M
axis of Z / Psi1 / Psi2 over the mesh while the Kmm Cholesky (O(M^3), M small
relative to T) stays replicated.

What is actually parallelized — and why it is the honest decomposition:

* Psi1 (T, M): column block per device, computed from the local Z rows only
  (Psi1[t, m] depends on z_m alone).
* Psi2 (M, M) = sum_t E[k(x_t, z_m) k(x_t, z_m')]: ROW block per device —
  each device computes sum_t over the full sequence for its (M_loc, M) slab
  against an all-gathered Z (Z is tiny, (M, Q)). This splits the dominant
  O(T * M^2 * Q) exp/matmul work M-ways.
* Psi1^T Y (M, D) partial blocks and the Psi2 row slabs are `all_gather`-ed
  (ICI) and the collapsed bound (A.3) is assembled replicated, exactly as
  `collapsed_bound_from_suffstats` does on one chip.

Composes orthogonally with time sharding (`mesh.data_parallel_collapsed_elbo`):
time sharding splits the T axis of the same sums; this splits the M axis.

Closed-form two-block Psi2 is provided for the RBF and Linear kernels (the
kernels of every BASELINE.json config); other kernels raise.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..inference.collapsed_vi import collapsed_bound_from_suffstats
from ..kernels import RBF, Kernel, Linear, kern_slice
from ..linalg import hdot
from ..ops.psi_stats import _broadcast_s, _linear_psi1, _psi01, _rbf_psi1
from ..params import positive

__all__ = ["psi2_rows", "inducing_sharded_collapsed_elbo"]

_PREC = lax.Precision.HIGHEST


def _rbf_psi2_rows(p, Zr, Zc, mu, s, mask=None):
    """sum_t Psi2_t[i, j] for row block Zr (Mr, Q) x column block Zc (Mc, Q).

    Same closed form as ``ops.psi_stats._rbf_psi2_chunk`` (A.2) with the two
    inducing arguments decoupled; materializes (T, Mr, Mc).
    """
    var = positive(p["log_var"])
    ls = positive(p["log_ls"])
    l2 = ls * ls
    w = 1.0 / (l2 + 2.0 * s)  # (T, Q)
    logconst = 2.0 * jnp.log(var) - 0.5 * jnp.sum(jnp.log1p(2.0 * s / l2), axis=-1)
    Zrs, Zcs = Zr / (2.0 * ls), Zc / (2.0 * ls)
    zzr = jnp.sum(Zrs * Zrs, axis=-1)  # (Mr,)
    zzc = jnp.sum(Zcs * Zcs, axis=-1)  # (Mc,)
    D1 = zzr[:, None] + zzc[None, :] - 2.0 * hdot(Zrs, Zcs.T)  # (Mr, Mc)
    mu2w = jnp.sum(w * mu * mu, axis=-1)  # (T,)
    Ar = hdot(w * mu, Zr.T)  # (T, Mr)
    Br = hdot(w, (Zr * Zr).T)
    Ac = hdot(w * mu, Zc.T)  # (T, Mc)
    Bc = hdot(w, (Zc * Zc).T)
    C = jnp.einsum("tq,mq,nq->tmn", w, Zr, Zc, precision=_PREC)
    log_psi2 = (
        (logconst - mu2w)[:, None, None]
        - D1[None, :, :]
        + (Ar - 0.25 * Br)[:, :, None]
        + (Ac - 0.25 * Bc)[:, None, :]
        - 0.5 * C
    )
    per_t = jnp.exp(log_psi2)
    if mask is not None:
        per_t = per_t * mask[:, None, None]
    return jnp.sum(per_t, axis=0)


def _linear_psi2_rows(p, Zr, Zc, mu, s):
    v = positive(p["log_var"])
    p1r = hdot(mu * v, Zr.T)  # (T, Mr)
    p1c = hdot(mu * v, Zc.T)  # (T, Mc)
    s_tot = jnp.sum(s, axis=0)
    return hdot(p1r.T, p1c) + hdot(Zr * v * s_tot, (Zc * v).T)


def psi2_rows(kern: Kernel, p, Zr, Zc, mu, s, *, block: Optional[int] = None):
    """Row-block Psi2 partial: sum_t E[k(x_t, Zr) k(x_t, Zc)^T], (Mr, Mc)."""
    s = _broadcast_s(mu, s)
    if isinstance(kern, Linear):
        return _linear_psi2_rows(
            p, kern_slice(kern, Zr), kern_slice(kern, Zc),
            kern_slice(kern, mu), kern_slice(kern, s),
        )
    if isinstance(kern, RBF):
        Zra, Zca = kern_slice(kern, Zr), kern_slice(kern, Zc)
        mua, sa = kern_slice(kern, mu), kern_slice(kern, s)
        T = mua.shape[0]
        if block is None or T <= block:
            return _rbf_psi2_rows(p, Zra, Zca, mua, sa)
        n_chunks = -(-T // block)
        pad = n_chunks * block - T
        mup = jnp.pad(mua, ((0, pad), (0, 0))).reshape(n_chunks, block, -1)
        sp = jnp.pad(sa, ((0, pad), (0, 0))).reshape(n_chunks, block, -1)
        maskp = jnp.pad(jnp.ones((T,), dtype=mua.dtype), (0, pad)).reshape(n_chunks, block)

        def step(acc, inp):
            mu_c, s_c, m_c = inp
            return acc + _rbf_psi2_rows(p, Zra, Zca, mu_c, s_c, mask=m_c), None

        init = jnp.zeros((Zra.shape[0], Zca.shape[0]), dtype=mua.dtype)
        out, _ = lax.scan(step, init, (mup, sp, maskp))
        return out
    raise NotImplementedError(
        f"inducing-sharded psi2 for kernel {type(kern).__name__} (RBF/Linear only)"
    )


def inducing_sharded_collapsed_elbo(
    kern: Kernel,
    kp,
    Z,
    log_noise,
    X_mu,
    X_s,
    Y,
    Y_var,
    mesh: Mesh,
    *,
    axis: str = "data",
    block: Optional[int] = None,
):
    """Collapsed bound (A.3) with the INDUCING axis sharded over ``axis``.

    ``Z`` (M, Q) is row-sharded; ``X_mu/X_s/Y`` are replicated on every device.
    Each device computes its Psi1 column block and Psi2 row slab locally,
    all-gathers the (M, D) and (M, M) statistics, and assembles F0 replicated.
    Returns a scalar equal to ``collapsed_bound`` on the unsharded operands
    (to reduction-order rounding). Requires M divisible by the axis size.
    """
    T, D = Y.shape
    has_var = Y_var is not None
    Y_var_arr = Y_var if has_var else jnp.zeros_like(Y)
    has_s = X_s is not None
    X_s_arr = X_s if has_s else jnp.zeros_like(X_mu)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P(), P(), P()),
        out_specs=P(),
    )
    def _elbo(kp_, Z_loc, ln_, Xm, Xs, Yl, Yv):
        Xs_in = Xs if has_s else None
        Z_full = lax.all_gather(Z_loc, axis, tiled=True)
        # psi0 depends only on q(X): identical on every device
        psi0, psi1_loc = _psi01(kern, kp_, Z_loc, Xm, _broadcast_s(Xm, Xs_in))
        psi1Y = lax.all_gather(hdot(psi1_loc.T, Yl), axis, tiled=True)  # (M, D)
        psi2_loc = psi2_rows(kern, kp_, Z_loc, Z_full, Xm, Xs_in, block=block)
        psi2 = lax.all_gather(psi2_loc, axis, tiled=True)  # (M, M)
        trYY = jnp.sum(Yl * Yl) + jnp.sum(Yv)
        f0 = collapsed_bound_from_suffstats(
            kern, kp_, Z_full, ln_, jnp.sum(psi0), psi1Y, psi2, trYY, T, D
        )
        # every device computed the identical replicated value, but the VMA
        # analysis can't see through all_gather; pmean makes the invariance
        # explicit (and is exact: n identical addends, power-of-2 divisor)
        return lax.pmean(f0, axis)

    return _elbo(kp, Z, log_noise, X_mu, X_s_arr, Y, Y_var_arr)
