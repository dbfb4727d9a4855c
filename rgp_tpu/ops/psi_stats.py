"""Psi-statistics: kernel expectations under Gaussian input distributions.

The computational heart of uncertain-input sparse-GP inference (SURVEY.md S2.2
"Psi-statistics", Appendix A.2). Replaces `GPy:GPy/kern/src/psi_comp/` (Python +
optional CUDA variants, SURVEY.md N4) with closed forms expressed as MXU matmuls:

  Psi0[t]    = E_q [ k(x_t, x_t) ]
  Psi1[t,m]  = E_q [ k(x_t, z_m) ]
  Psi2[m,m'] = sum_t E_q [ k(x_t, z_m) k(x_t, z_m') ]

for q(x_t) = N(mu_t, diag(s_t)). Reverse-mode gradients w.r.t. (mu, s, Z, theta)
— the reference's ``update_gradients_expectations`` / ``gradients_qX_expectations``
hand-written chain — come from autodiff.

The RBF Psi2 inner term is a (T, M, M) tensor that must never be materialized in
full for long sequences (SURVEY.md S7 hard-part 2): :func:`psi_statistics`
accumulates it over time chunks with ``lax.scan`` in f32. A fused Pallas kernel
for the same computation lives in :mod:`rgp_tpu.ops.pallas.psi2`.

Certain inputs (s = 0) recover Psi1 = K(mu, Z) and Psi2 = K.T K exactly, which is
how the plain sparse-GP / GP-NARX path reuses this module.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..kernels import RBF, Bias, Kernel, Linear, Prod, Sum, White, kern_slice
from ..linalg import hdot
from ..params import positive

__all__ = ["PsiStats", "psi_statistics", "psi01", "psi2_per_t", "has_closed_psi"]

_PREC = lax.Precision.HIGHEST


class PsiStats(NamedTuple):
    psi0: jnp.ndarray  # (T,)
    psi1: jnp.ndarray  # (T, M)
    psi2: jnp.ndarray  # (M, M) summed over t


# --------------------------------------------------------------------------- RBF


def _rbf_psi0(p, mu):
    var = positive(p["log_var"])
    return jnp.broadcast_to(var, mu.shape[:-1])


def _rbf_psi1(p, Z, mu, s):
    """log Psi1 = log var - 1/2 sum_q log(1+s/l^2) - 1/2 (mu-z)^2/(l^2+s)."""
    var = positive(p["log_var"])
    ls = positive(p["log_ls"])
    l2 = ls * ls
    w = 1.0 / (l2 + s)  # (T, Q)
    logdet = -0.5 * jnp.sum(jnp.log1p(s / l2), axis=-1)  # (T,)
    mu2w = jnp.sum(w * mu * mu, axis=-1)  # (T,)
    A = hdot(w * mu, Z.T)  # (T, M)
    B = hdot(w, (Z * Z).T)  # (T, M)
    quad = mu2w[..., None] - 2.0 * A + B
    return var * jnp.exp(logdet[..., None] - 0.5 * quad)


def _rbf_psi2_chunk(p, Z, mu, s):
    """Sum_t Psi2_t over a chunk of timesteps; materializes (chunk, M, M)."""
    var = positive(p["log_var"])
    ls = positive(p["log_ls"])
    l2 = ls * ls
    w = 1.0 / (l2 + 2.0 * s)  # (T, Q)
    logconst = 2.0 * jnp.log(var) - 0.5 * jnp.sum(jnp.log1p(2.0 * s / l2), axis=-1)
    # (z_m - z_n)^2 / (4 l^2) term, (M, M)
    Zs = Z / (2.0 * ls)
    zz = jnp.sum(Zs * Zs, axis=-1)
    D1 = zz[:, None] + zz[None, :] - 2.0 * hdot(Zs, Zs.T)
    mu2w = jnp.sum(w * mu * mu, axis=-1)  # (T,)
    A = hdot(w * mu, Z.T)  # (T, M)
    B = hdot(w, (Z * Z).T)  # (T, M)
    C = jnp.einsum("tq,mq,nq->tmn", w, Z, Z, precision=_PREC)  # (T, M, M)
    log_psi2 = (
        (logconst - mu2w)[:, None, None]
        - D1[None, :, :]
        + (A - 0.25 * B)[:, :, None]
        + (A - 0.25 * B)[:, None, :]
        - 0.5 * C
    )
    return jnp.sum(jnp.exp(log_psi2), axis=0)


def _rbf_psi2_per_t(p, Z, mu, s):
    """Per-timestep Psi2_t, (T, M, M) — small-T use only (prediction)."""
    var = positive(p["log_var"])
    ls = positive(p["log_ls"])
    l2 = ls * ls
    w = 1.0 / (l2 + 2.0 * s)
    logconst = 2.0 * jnp.log(var) - 0.5 * jnp.sum(jnp.log1p(2.0 * s / l2), axis=-1)
    Zs = Z / (2.0 * ls)
    zz = jnp.sum(Zs * Zs, axis=-1)
    D1 = zz[:, None] + zz[None, :] - 2.0 * hdot(Zs, Zs.T)
    mu2w = jnp.sum(w * mu * mu, axis=-1)
    A = hdot(w * mu, Z.T)
    B = hdot(w, (Z * Z).T)
    C = jnp.einsum("tq,mq,nq->tmn", w, Z, Z, precision=_PREC)
    log_psi2 = (
        (logconst - mu2w)[:, None, None]
        - D1[None, :, :]
        + (A - 0.25 * B)[:, :, None]
        + (A - 0.25 * B)[:, None, :]
        - 0.5 * C
    )
    return jnp.exp(log_psi2)


# ------------------------------------------------------------------------ Linear


def _linear_psi0(p, mu, s):
    v = positive(p["log_var"])
    return jnp.sum(v * (mu * mu + s), axis=-1)


def _linear_psi1(p, Z, mu):
    v = positive(p["log_var"])
    return hdot(mu * v, Z.T)


def _linear_psi2_sum(p, Z, mu, s):
    v = positive(p["log_var"])
    psi1 = hdot(mu * v, Z.T)  # (T, M)
    Zv = Z * v  # (M, Q)
    s_tot = jnp.sum(s, axis=0) if s.ndim == 2 else s  # (Q,)
    return hdot(psi1.T, psi1) + hdot(Zv * s_tot, Zv.T)


def _linear_psi2_per_t(p, Z, mu, s):
    v = positive(p["log_var"])
    psi1 = hdot(mu * v, Z.T)  # (T, M)
    Zv = Z * v
    outer = psi1[:, :, None] * psi1[:, None, :]
    corr = jnp.einsum("tq,mq,nq->tmn", s, Zv, Zv, precision=_PREC)
    return outer + corr


# ---------------------------------------------------------------------- dispatch


def _broadcast_s(mu, s):
    if s is None:
        return jnp.zeros_like(mu)
    return jnp.broadcast_to(jnp.asarray(s, mu.dtype), mu.shape)


def has_closed_psi(kern: Kernel) -> bool:
    """True if closed-form uncertain-input psi statistics exist for ``kern``.

    Kernels without closed forms (Matern family, RatQuad, StdPeriodic, MLP,
    Prod over shared dims) are still fully usable on *certain* inputs
    (``s=None``): Psi1 = K(mu, Z), Psi2 = K^T K — which is all the plain
    sparse-GP / GP-NARX / SVGP paths need. This mirrors the reference split:
    GPy restricts `psi_comp` to RBF/Linear but every kernel works in
    non-uncertain `SparseGPRegression` [H].
    """
    if isinstance(kern, (RBF, Linear, Bias, White)):
        return True
    if isinstance(kern, Sum):
        return all(has_closed_psi(k) for k in kern.parts)
    if isinstance(kern, Prod):
        # disjoint active dims: q diagonal => expectations factorize per part
        return _prod_disjoint(kern) and all(has_closed_psi(k) for k in kern.parts)
    return False


def _prod_disjoint(kern: Prod) -> bool:
    seen = set()
    for k in kern.parts:
        dims = set(np.asarray(_active_dims(k)).tolist())
        if seen & dims:
            return False
        seen |= dims
    return True


def psi01(kern: Kernel, p, Z, mu, s):
    """(Psi0 (T,), Psi1 (T, M)) only — for prediction paths that pair this
    with :func:`psi2_per_t` and must not pay for the summed Psi2."""
    if s is None and not has_closed_psi(kern):
        return kern.Kdiag(p, mu), kern.K(p, mu, Z)
    s = _broadcast_s(mu, s)
    return _psi01(kern, p, Z, mu, s)


def psi2_per_t(kern: Kernel, p, Z, mu, s):
    """Per-timestep Psi2_t (T, M, M). Use for prediction/SVI on small batches."""
    if s is None and not has_closed_psi(kern):
        K = kern.K(p, mu, Z)
        return K[:, :, None] * K[:, None, :]
    s = _broadcast_s(mu, s)
    if isinstance(kern, RBF):
        return _rbf_psi2_per_t(p, kern_slice(kern, Z), kern_slice(kern, mu), kern_slice(kern, s))
    if isinstance(kern, Linear):
        return _linear_psi2_per_t(p, kern_slice(kern, Z), kern_slice(kern, mu), kern_slice(kern, s))
    if isinstance(kern, Bias):
        var = positive(p["log_var"])
        T, M = mu.shape[0], Z.shape[0]
        return jnp.full((T, M, M), var * var, dtype=mu.dtype)
    if isinstance(kern, White):
        return jnp.zeros((mu.shape[0], Z.shape[0], Z.shape[0]), dtype=mu.dtype)
    if isinstance(kern, Sum):
        parts = [psi2_per_t(k, pk, Z, mu, s) for k, pk in zip(kern.parts, p)]
        total = sum(parts)
        total = total + _sum_psi2_cross(kern, p, Z, mu, s, per_t=True)
        return total
    if isinstance(kern, Prod) and _prod_disjoint(kern):
        out = None
        for k, pk in zip(kern.parts, p):
            part = psi2_per_t(k, pk, Z, mu, s)
            out = part if out is None else out * part
        return out
    raise NotImplementedError(f"psi2 for kernel {type(kern).__name__}")


def _psi01(kern: Kernel, p, Z, mu, s):
    if isinstance(kern, RBF):
        Za, mua, sa = kern_slice(kern, Z), kern_slice(kern, mu), kern_slice(kern, s)
        return _rbf_psi0(p, mua), _rbf_psi1(p, Za, mua, sa)
    if isinstance(kern, Linear):
        Za, mua, sa = kern_slice(kern, Z), kern_slice(kern, mu), kern_slice(kern, s)
        return _linear_psi0(p, mua, sa), _linear_psi1(p, Za, mua)
    if isinstance(kern, Bias):
        var = positive(p["log_var"])
        T, M = mu.shape[0], Z.shape[0]
        return jnp.broadcast_to(var, (T,)), jnp.full((T, M), var, dtype=mu.dtype)
    if isinstance(kern, White):
        # white noise contributes to the diagonal expectation only
        var = positive(p["log_var"])
        T, M = mu.shape[0], Z.shape[0]
        return jnp.broadcast_to(var, (T,)), jnp.zeros((T, M), dtype=mu.dtype)
    if isinstance(kern, Sum):
        out0, out1 = None, None
        for k, pk in zip(kern.parts, p):
            p0, p1 = _psi01(k, pk, Z, mu, s)
            out0 = p0 if out0 is None else out0 + p0
            out1 = p1 if out1 is None else out1 + p1
        return out0, out1
    if isinstance(kern, Prod) and _prod_disjoint(kern):
        # disjoint dims + diagonal q(x) => the expectation of the product
        # factorizes into the product of per-part expectations (capability
        # beyond the reference: GPy has no Prod psi statistics at all)
        out0, out1 = None, None
        for k, pk in zip(kern.parts, p):
            p0, p1 = _psi01(k, pk, Z, mu, s)
            out0 = p0 if out0 is None else out0 * p0
            out1 = p1 if out1 is None else out1 * p1
        return out0, out1
    raise NotImplementedError(f"psi stats for kernel {type(kern).__name__}")


def _active_dims(kern: Kernel):
    if kern.active_dims is not None:
        return np.asarray(kern.active_dims, np.int64)
    return np.arange(kern.input_dim, dtype=np.int64)


def _scatter_full(vals, dims, Q, dtype):
    """Place per-active-dim values into a full-width (Q,) vector (zeros elsewhere)."""
    out = jnp.zeros((Q,), dtype=dtype)
    return out.at[jnp.asarray(dims)].set(jnp.broadcast_to(vals, (len(dims),)))


def _rbf_inv_l2_full(kern: RBF, p, Q, dtype):
    """Full-width inverse squared lengthscales: 1/l_q^2 on active dims, 0 off."""
    ls = positive(p["log_ls"])
    return _scatter_full(1.0 / (ls * ls), _active_dims(kern), Q, dtype)


def _linear_var_full(kern: Linear, p, Q, dtype):
    v = positive(p["log_var"])
    return _scatter_full(v, _active_dims(kern), Q, dtype)


def _rbf_linear_cross(ka: RBF, pa, kb: Linear, pb, Z, mu, s, per_t: bool):
    """E_q[k_rbf(x, z_m) k_lin(x, z_n)], closed form (one direction, not
    symmetrized).

    With q(x)=N(mu, diag(s)) and the Gaussian-product identity, conditioning x
    on the RBF factor centred at z_m gives E[x_q * g(x)] = Psi1_rbf[t,m] *
    mtilde_q with mtilde_q = mu_q - s_q w_q (mu_q - z_mq), w_q = 1/(l_q^2+s_q)
    on the RBF's active dims (0 elsewhere). Then
      cross[t,m,n] = Psi1_rbf[t,m] * sum_q v_q z_nq mtilde_q.
    All terms reduce to matmuls; the summed-over-t form never materializes
    (T, M, M). The reference (GPy `Add.psi2`) raises NotImplementedError for
    this pair — this is an additive capability.
    """
    Q = mu.shape[-1]
    ia = _rbf_inv_l2_full(ka, pa, Q, mu.dtype)  # (Q,)
    w = ia / (1.0 + s * ia)  # (T, Q): 1/(l^2+s) on A, 0 elsewhere
    vbZ = Z * _linear_var_full(kb, pb, Q, mu.dtype)  # (M, Q)

    psi1a = _rbf_psi1(pa, kern_slice(ka, Z), kern_slice(ka, mu), kern_slice(ka, s))

    sw = s * w  # (T, Q)
    T1 = hdot(mu, vbZ.T)  # (T, M): sum_q v z_n mu
    T2 = hdot(sw * mu, vbZ.T)  # (T, M)
    if per_t:
        T3 = jnp.einsum("tq,mq,nq->tmn", sw, Z, vbZ, precision=_PREC)
        return psi1a[:, :, None] * ((T1 - T2)[:, None, :] + T3)
    H = hdot(psi1a.T, sw)  # (M, Q)
    return hdot(psi1a.T, T1 - T2) + hdot(Z * H, vbZ.T)


def _linear_linear_cross(ka: Linear, pa, kb: Linear, pb, Z, mu, s, per_t: bool):
    """E_q[k_lina(x,z_m) k_linb(x,z_n)] = (va.z_m . mu)(vb.z_n . mu)
    + sum_q va_q vb_q z_mq z_nq s_q (one direction)."""
    Q = mu.shape[-1]
    vaZ = Z * _linear_var_full(ka, pa, Q, mu.dtype)
    vbZ = Z * _linear_var_full(kb, pb, Q, mu.dtype)
    A1 = hdot(mu, vaZ.T)  # (T, M)
    B1 = hdot(mu, vbZ.T)  # (T, M)
    if per_t:
        corr = jnp.einsum("tq,mq,nq->tmn", s, vaZ, vbZ, precision=_PREC)
        return A1[:, :, None] * B1[:, None, :] + corr
    s_sum = jnp.sum(s, axis=0)  # (Q,)
    return hdot(A1.T, B1) + hdot(vaZ * s_sum, vbZ.T)


def _rbf_rbf_cross(ka: RBF, pa, kb: RBF, pb, Z, mu, s, per_t: bool):
    """E_q[k_a(x,z_m) k_b(x,z_n)] for two RBF parts with different
    hyperparameters / active dims (one direction; symmetric in (m,n) swap with
    a/b swap). Completed-square identity per dim:
      ia (x-zm)^2 + ib (x-zn)^2 = g (x-c)^2 + (ia ib/g)(zm-zn)^2,
      g = ia+ib, c = (ia zm + ib zn)/g,
    then the Gaussian expectation is prod_q (1+s g)^{-1/2}
    exp(-h (mu-c)^2 / 2) with h = g/(1+s g); (mu-c)^2 is expanded so every
    term is a matmul or a tmn-einsum (no (T,M,N,Q) intermediate)."""
    Q = mu.shape[-1]
    ia = _rbf_inv_l2_full(ka, pa, Q, mu.dtype)
    ib = _rbf_inv_l2_full(kb, pb, Q, mu.dtype)
    va = positive(pa["log_var"])
    vb = positive(pb["log_var"])
    g = ia + ib  # (Q,)
    safe_g = jnp.where(g > 0, g, 1.0)
    h = g / (1.0 + s * g)  # (T, Q)
    # constant (m,n) term: sum_q (ia ib / g) (zm - zn)^2
    r = ia * ib / safe_g  # (Q,)
    Zr = Z * jnp.sqrt(r)
    zz = jnp.sum(Zr * Zr, axis=-1)
    D = zz[:, None] + zz[None, :] - 2.0 * hdot(Zr, Zr.T)  # (M, M)
    # log-determinant and mu^2 terms, (T,)
    logdet = -0.5 * jnp.sum(jnp.log1p(s * g), axis=-1)
    E0 = jnp.sum(h * mu * mu, axis=-1)
    # -2 mu c and c^2 terms split over (t,m) / (t,n) / (t,m,n)
    wa = ia / safe_g  # fraction of c from z_m
    wb = ib / safe_g
    Am = -2.0 * hdot(h * mu, (Z * wa).T) + hdot(h, ((Z * wa) ** 2).T)  # (T, M)
    An = -2.0 * hdot(h * mu, (Z * wb).T) + hdot(h, ((Z * wb) ** 2).T)  # (T, M)
    Cmn = 2.0 * jnp.einsum("tq,mq,nq->tmn", h, Z * wa, Z * wb, precision=_PREC)
    log_cross = (
        jnp.log(va * vb)
        + (logdet - 0.5 * E0)[:, None, None]
        - 0.5 * (Am[:, :, None] + An[:, None, :] + Cmn)
        - 0.5 * D[None, :, :]
    )
    cross = jnp.exp(log_cross)
    return cross if per_t else jnp.sum(cross, axis=0)


def _pair_cross_psi2(ki, pi, kj, pj, Z, mu, s, per_t: bool):
    """Symmetrized cross term sum over the (i,j) pair:
    E[k_i(x,zm)k_j(x,zn)] + E[k_j(x,zm)k_i(x,zn)] = C + C^T."""
    if isinstance(ki, RBF) and isinstance(kj, Linear):
        C = _rbf_linear_cross(ki, pi, kj, pj, Z, mu, s, per_t)
    elif isinstance(ki, Linear) and isinstance(kj, RBF):
        C = _rbf_linear_cross(kj, pj, ki, pi, Z, mu, s, per_t)
    elif isinstance(ki, Linear) and isinstance(kj, Linear):
        C = _linear_linear_cross(ki, pi, kj, pj, Z, mu, s, per_t)
    elif isinstance(ki, RBF) and isinstance(kj, RBF):
        C = _rbf_rbf_cross(ki, pi, kj, pj, Z, mu, s, per_t)
    else:
        raise NotImplementedError(
            f"psi2 cross term between {type(ki).__name__} and {type(kj).__name__}"
        )
    return C + (jnp.swapaxes(C, -1, -2))


def _sum_psi2_cross(kern: Sum, p, Z, mu, s, per_t: bool = False):
    """Cross terms E[k_a(x,zm) k_b(x,zm')] for additive kernels.

    Exceeds the reference (`GPy:GPy/kern/src/add.py` [M] raises for most
    pairs): closed forms for all pairs among {RBF, Linear, Bias} including
    RBF x Linear, RBF x RBF (distinct hyperparams/active dims) and
    Linear x Linear. White crosses vanish.
    """
    T, M = mu.shape[0], Z.shape[0]
    total = jnp.zeros((T, M, M) if per_t else (M, M), dtype=mu.dtype)
    n = len(kern.parts)
    for i in range(n):
        for j in range(i + 1, n):
            ki, kj = kern.parts[i], kern.parts[j]
            pi, pj = p[i], p[j]
            if isinstance(ki, White) or isinstance(kj, White):
                continue
            if isinstance(ki, Bias) or isinstance(kj, Bias):
                if isinstance(ki, Bias):
                    bvar, other, po = positive(pi["log_var"]), kj, pj
                else:
                    bvar, other, po = positive(pj["log_var"]), ki, pi
                _, psi1_o = _psi01(other, po, Z, mu, s)  # (T, M)
                if per_t:
                    cross = bvar * (psi1_o[:, :, None] + psi1_o[:, None, :])
                else:
                    colsum = jnp.sum(psi1_o, axis=0)  # (M,)
                    cross = bvar * (colsum[:, None] + colsum[None, :])
                total = total + cross
            else:
                total = total + _pair_cross_psi2(ki, pi, kj, pj, Z, mu, s, per_t)
    return total


def psi_statistics(
    kern: Kernel,
    p,
    Z,
    mu,
    s=None,
    *,
    block: Optional[int] = 128,
    prefer: str = "auto",
) -> PsiStats:
    """Compute (Psi0, Psi1, sum_t Psi2) for q(x_t) = N(mu_t, diag(s_t)).

    ``s=None`` means certain inputs (s=0), recovering Psi1=K(mu,Z),
    Psi2=K^T K. The Psi2 time sum is accumulated in chunks of ``block``
    timesteps under ``lax.scan`` so the (T, M, M) intermediate never
    materializes (pass ``block=None`` to materialize — fastest for small T).

    ``prefer``: ``"auto"`` applies the measured dispatch policy (dense XLA
    form / Pallas according to work size — see the policy note in
    :func:`_psi2_sum`); ``"scan"`` forces the chunked-scan accumulation and
    honors ``block`` strictly. Use ``"scan"`` when the call site is itself
    batched (``vmap`` over many chains/particles): the per-instance work
    heuristic cannot see the batch dimension, and the dense (B, T, M, M)
    form can exceed HBM or crash the compiler at B ~ 1024.

    Kernels without closed-form psi statistics (see :func:`has_closed_psi`)
    are supported on certain inputs only, via the K-based degeneration.
    """
    if s is None:
        # CERTAIN inputs: Psi1 = K(mu, Z), Psi2 = K^T K, Psi0 = Kdiag — exact
        # for EVERY kernel, and one MXU matmul instead of the O(T M^2)
        # exp-chain the s->0 limit of the closed forms would run. Measured
        # (round 4, the config-4 unlock): the full-batch collapsed GP-NARX
        # bound at T=12278/M=100 drops from ~70 ms to ~2 ms per fwd+bwd step,
        # turning exact full-corpus training from 14 it/s into hundreds/s.
        # Consumers on the certain path (collapsed_bound/posterior with
        # certain=True) use the PSD factor Psi1 and never read this psi2.
        K = kern.K(p, mu, Z)
        return PsiStats(kern.Kdiag(p, mu), K, hdot(K.T, K))
    s = _broadcast_s(mu, s)
    psi0, psi1 = _psi01(kern, p, Z, mu, s)
    psi2 = _psi2_sum(kern, p, Z, mu, s, block=block, prefer=prefer)
    return PsiStats(psi0, psi1, psi2)


def _psi2_sum(kern, p, Z, mu, s, *, block, prefer="auto"):
    if isinstance(kern, Linear):
        return _linear_psi2_sum(p, kern_slice(kern, Z), kern_slice(kern, mu), kern_slice(kern, s))
    if isinstance(kern, Bias):
        var = positive(p["log_var"])
        M = Z.shape[0]
        return jnp.full((M, M), mu.shape[0] * var * var, dtype=mu.dtype)
    if isinstance(kern, White):
        return jnp.zeros((Z.shape[0], Z.shape[0]), dtype=mu.dtype)
    if isinstance(kern, Sum):
        total = None
        for k, pk in zip(kern.parts, p):
            part = _psi2_sum(k, pk, Z, mu, s, block=block, prefer=prefer)
            total = part if total is None else total + part
        return total + _sum_psi2_cross(kern, p, Z, mu, s, per_t=False)
    if isinstance(kern, Prod) and _prod_disjoint(kern):
        return _chunked_per_t_sum(
            lambda mu_c, s_c: psi2_per_t(kern, p, Z, mu_c, s_c), Z, mu, s, block
        )
    if isinstance(kern, RBF):
        Za, mua, sa = kern_slice(kern, Z), kern_slice(kern, mu), kern_slice(kern, s)
        T = mua.shape[0]
        M = Za.shape[0]
        if prefer == "scan":
            return _rbf_psi2_sum_xla(p, Za, mua, sa, block)
        if (
            _PALLAS_PSI2
            and mua.dtype == jnp.float32
            and T * M * M >= _PALLAS_MIN_WORK
        ):
            from .pallas.psi2 import rbf_psi2_sum_pallas

            return lax.platform_dependent(
                p, Za, mua, sa,
                tpu=lambda p_, Z_, m_, s_: rbf_psi2_sum_pallas(p_, Z_, m_, s_),
                default=lambda p_, Z_, m_, s_: _rbf_psi2_sum_xla(p_, Z_, m_, s_, block),
            )
        if _XLA_DENSE_MIN_WORK <= T * M * M <= _XLA_DENSE_MAX_WORK:
            # MEASURED dispatch policy (round-3 fwd+bwd sweep on v5e, jax 0.9;
            # /tmp/psi2_sweep.py methodology, recorded in BASELINE.md): the
            # single-expression XLA path (dense (T,M,M) in the HLO, which XLA
            # fuses into the reduce and REMATERIALIZES in the backward — no
            # (T,M,M) residual ever hits HBM) beats BOTH the chunked scan and
            # the round-2 Pallas kernel at every production shape:
            #   T=2048/M=256: xla 4.23 vs scan 5.29 vs pallas 4.93 ms
            #   T=8192/M=256: xla 16.8 vs scan 18.5 vs pallas 16.9 ms
            #   T= 512/M=100: xla 1.11 vs scan 1.16 vs pallas 1.28 ms
            # so above this work size the caller's `block` (a memory-guard
            # chunking hint) is overridden in favor of the fused dense form.
            # The Pallas kernel remains available via RGP_TPU_PALLAS_PSI2=1
            # (it still wins the FORWARD alone: 1.24 vs 2.04 ms in-trace).
            return _rbf_psi2_chunk(p, Za, mua, sa)
        return _rbf_psi2_sum_xla(p, Za, mua, sa, block)
    raise NotImplementedError(f"psi2 for kernel {type(kern).__name__}")


# Dispatch thresholds (see the measured policy note above). The dense-HLO
# override stays off for tiny inputs where the caller's explicit chunking
# cannot matter anyway, and applies wherever the sweep showed it fastest.
# The MAX guard bounds the worst case if a future XLA failed to fuse the
# (T,M,M) intermediate: 2^30 f32 elements = 4 GiB, comfortably inside v5e
# HBM; beyond it the scan path (true O(block*M^2) working set) resumes.
_XLA_DENSE_MIN_WORK = 1 << 22
_XLA_DENSE_MAX_WORK = 1 << 30
# Pallas opt-in: measured SLOWER fwd+bwd than the dense XLA form on the
# current jax/libtpu (it beat the scan path round 2; XLA's remat fusion now
# wins). Kept behind an env flag for A/B on future toolchains.
_PALLAS_PSI2 = bool(int(__import__("os").environ.get("RGP_TPU_PALLAS_PSI2", "0")))
_PALLAS_MIN_WORK = 1 << 23


def _rbf_psi2_sum_xla(p, Za, mua, sa, block):
    T = mua.shape[0]
    if block is None or T <= block:
        return _rbf_psi2_chunk(p, Za, mua, sa)
    # pad T to a multiple of block with zero-weight (exp -> 0) entries:
    # padding uses mu=0, s=0 but a mask multiplies the chunk sums.
    n_chunks = -(-T // block)
    pad = n_chunks * block - T
    mup = jnp.pad(mua, ((0, pad), (0, 0)))
    sp = jnp.pad(sa, ((0, pad), (0, 0)))
    maskp = jnp.pad(jnp.ones((T,), dtype=mua.dtype), (0, pad))
    mup = mup.reshape(n_chunks, block, -1)
    sp = sp.reshape(n_chunks, block, -1)
    maskp = maskp.reshape(n_chunks, block)

    # remat the chunk: without it, autodiff-of-scan stores every chunk's
    # (block, M, M) residual — (n_chunks, block, M, M) == the full dense
    # intermediate, defeating the memory guard this path exists to provide
    # (measured: the 1024-chain vmapped NUTS potential stored
    # (16, 1024, 32, 100, 100) = 21 GB of residuals and killed the
    # compiler). Recompute-in-backward costs ~1 extra exp pass on the chunk.
    chunk_fn = jax.checkpoint(
        lambda mu_c, s_c, m_c: _rbf_psi2_masked(p, Za, mu_c, s_c, m_c)
    )

    def step(acc, inp):
        mu_c, s_c, m_c = inp
        return acc + chunk_fn(mu_c, s_c, m_c), None

    M = Za.shape[0]
    init = jnp.zeros((M, M), dtype=mua.dtype)
    out, _ = lax.scan(step, init, (mup, sp, maskp))
    return out


def _chunked_per_t_sum(per_t_fn, Z, mu, s, block):
    """sum_t of a per-timestep (T, M, M) psi2 without materializing it:
    scan over `block`-sized chunks with a 0/1 padding mask."""
    T = mu.shape[0]
    if block is None or T <= block:
        return jnp.sum(per_t_fn(mu, s), axis=0)
    n_chunks = -(-T // block)
    pad = n_chunks * block - T
    mup = jnp.pad(mu, ((0, pad), (0, 0))).reshape(n_chunks, block, -1)
    sp = jnp.pad(s, ((0, pad), (0, 0))).reshape(n_chunks, block, -1)
    maskp = jnp.pad(jnp.ones((T,), dtype=mu.dtype), (0, pad)).reshape(n_chunks, block)

    # remat: see the matching note in _rbf_psi2_sum_xla — without it the
    # scan's backward stores every chunk's (block, M, M) residual
    chunk_fn = jax.checkpoint(
        lambda mu_c, s_c, m_c: jnp.sum(
            per_t_fn(mu_c, s_c) * m_c[:, None, None], axis=0
        )
    )

    def step(acc, inp):
        mu_c, s_c, m_c = inp
        return acc + chunk_fn(mu_c, s_c, m_c), None

    M = Z.shape[0]
    init = jnp.zeros((M, M), dtype=mu.dtype)
    out, _ = lax.scan(step, init, (mup, sp, maskp))
    return out


def _rbf_psi2_masked(p, Z, mu, s, mask):
    """Chunked Psi2 partial sum with a 0/1 timestep mask (for padding)."""
    per_t = _rbf_psi2_per_t(p, Z, mu, s)
    return jnp.sum(per_t * mask[:, None, None], axis=0)
