"""Pallas TPU kernel: fused RBF Psi2 accumulation.

The N4 component (SURVEY.md S2.3): the reference offloads Psi2 to CUDA
(`GPy:GPy/kern/src/psi_comp/` GPU variants); the TPU-native equivalent tiles
the (T, M, M) Psi2 computation over a (M-tiles, M-tiles, T-tiles) grid,
computes the per-tile inner term with ONE MXU matmul (the q-contraction
C[t,m,n] = sum_q w_tq z_mq z_nq reshaped to (BT*BM, Q) @ (Q, BN)), applies the
exponential on the VPU, and accumulates sum_t in an f32 VMEM scratch without
ever materializing the (T, M, M) intermediate in HBM (SURVEY.md S7 hard-part
2: "compute as summed einsum / Pallas, never materialized").

Decomposition (Appendix A.2): with w = 1/(l^2 + 2s),

  log Psi2[t,m,n] = base[t] - D1[m,n] + E[t,m] + E[t,n] - 1/2 C[t,m,n]
  base[t] = 2 log sf^2 - 1/2 sum_q log1p(2 s/l^2) - sum_q w mu^2
  D1[m,n] = sum_q (z_m - z_n)^2 / (4 l^2)
  E[t,m]  = A[t,m] - B[t,m]/4,  A = (w mu) Z^T,  B = w (Z^2)^T

base/E/D1 are cheap O(TM) precomputations left to XLA (fused into neighbors);
the kernel owns the O(T M^2 Q) contraction + exp + reduction.

Gradients: ``rbf_psi2_sum_pallas`` carries a custom VJP whose backward is a
fully fused Pallas kernel (:func:`_psi2_bwd_kernel`): the per-tile
probabilities P are RECOMPUTED in-tile (never stored) and contracted against
the symmetrized cotangent on the MXU, emitting dbase/dE/dw and the C-term's
direct dZ; the cheap chain through the XLA-side precompute closes the VJP.

MEASUREMENT (P6 discipline — "only keep kernels that beat XLA"): on TPU v5e,
f32, HIGHEST matmul precision, fwd+bwd vs the XLA chunked scan:
T=2048/M=256/Q=32: 5.60 vs 6.34 ms (-12%); T=8192/M=256/Q=32: 17.5 vs 20.6 ms
(-15%); forward alone ties (2.7 vs 2.7 ms at T=2048/M=256/Q=24 — both near
the VPU-exp roofline). The win comes from the backward never materializing
the (T, M, M) forward residual + cotangent in HBM. Round 3 re-measured the
policy fwd+bwd across 7 production shapes and found the then-current XLA
toolchain's remat fusion of the DENSE form faster than both this kernel and
the chunked scan at every production shape, so the kernel is now OPT-IN via
``RGP_TPU_PALLAS_PSI2=1`` (`ops/psi_stats.py` measured dispatch policy; the
kernel still wins the forward alone: 67% vs 62% of the exp ceiling);
gradients agree with autodiff to ~4e-7 relative (tests/test_pallas.py).
(DEFAULT bf16 matmul precision would give 2.2 ms fwd but its 2e-3 relative
error is unacceptable for bound stability — see the f32 Psi2 indefiniteness
analysis in inference/collapsed_vi.py.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ...params import positive

__all__ = ["rbf_psi2_sum_pallas", "rbf_psi2_precompute"]


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl, pltpu


def rbf_psi2_precompute(p, Z, mu, s):
    """XLA-side precomputation of (base (T,), E (T,M), D1 (M,M), w (T,Q))."""
    var = positive(p["log_var"])
    ls = positive(p["log_ls"])
    l2 = ls * ls
    w = 1.0 / (l2 + 2.0 * s)
    base = (
        2.0 * jnp.log(var)
        - 0.5 * jnp.sum(jnp.log1p(2.0 * s / l2), axis=-1)
        - jnp.sum(w * mu * mu, axis=-1)
    )
    Zs = Z / (2.0 * ls)
    zz = jnp.sum(Zs * Zs, axis=-1)
    D1 = zz[:, None] + zz[None, :] - 2.0 * jnp.matmul(Zs, Zs.T, precision=lax.Precision.HIGHEST)
    A = jnp.matmul(w * mu, Z.T, precision=lax.Precision.HIGHEST)
    B = jnp.matmul(w, (Z * Z).T, precision=lax.Precision.HIGHEST)
    E = A - 0.25 * B
    return base, E, D1, w


def _psi2_kernel(base_ref, e_m_ref, e_n_ref, d1_ref, w_ref, zm_ref, zn_ref, out_ref):
    pl, pltpu = _pl()
    t_idx = pl.program_id(2)

    @pl.when(t_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = base_ref[:]  # (BT, 1)
    w = w_ref[:]  # (BT, Q)
    zm = zm_ref[:]  # (BM, Q)
    zn = zn_ref[:]  # (BN, Q)
    BT, Q = w.shape
    BM = zm.shape[0]
    BN = zn.shape[0]

    # C[t,m,n] = sum_q w[t,q] zm[m,q] zn[n,q] as one MXU matmul
    wzm = w[:, None, :] * zm[None, :, :]  # (BT, BM, Q)
    C = jax.lax.dot_general(
        wzm.reshape(BT * BM, Q),
        zn,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(BT, BM, BN)

    logp = (
        base[:, :, None]
        - d1_ref[:][None, :, :]
        + e_m_ref[:][:, :, None]
        + e_n_ref[:][:, None, :]
        - 0.5 * C
    )
    out_ref[:] += jnp.sum(jnp.exp(logp), axis=0)


@functools.partial(jax.jit, static_argnames=("bt", "bm", "interpret"))
def _psi2_pallas_raw(base, E, D1, w, Z, *, bt: int = 8, bm: int = 128, interpret: bool = False):
    pl, pltpu = _pl()
    T, Q = w.shape
    M = Z.shape[0]

    def cdiv(a, b):
        return -(-a // b)

    # pad T and M to tile multiples
    Tp = cdiv(T, bt) * bt
    Mp = cdiv(M, bm) * bm
    if Tp != T:
        pad = Tp - T
        # padded timesteps get base = -inf -> exp contributes exactly 0
        base = jnp.concatenate([base, jnp.full((pad,), -jnp.inf, base.dtype)])
        E = jnp.concatenate([E, jnp.zeros((pad, M), E.dtype)])
        w = jnp.concatenate([w, jnp.zeros((pad, Q), w.dtype)])
    if Mp != M:
        padm = Mp - M
        E = jnp.concatenate([E, jnp.zeros((Tp, padm), E.dtype)], axis=1)
        D1 = jnp.pad(D1, ((0, padm), (0, padm)))
        Z = jnp.concatenate([Z, jnp.zeros((padm, Q), Z.dtype)], axis=0)

    grid = (Mp // bm, Mp // bm, Tp // bt)
    vmem = pltpu.VMEM
    out = pl.pallas_call(
        _psi2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, 1), lambda j, k, t: (t, 0), memory_space=vmem),  # base
            pl.BlockSpec((bt, bm), lambda j, k, t: (t, j), memory_space=vmem),  # E (m)
            pl.BlockSpec((bt, bm), lambda j, k, t: (t, k), memory_space=vmem),  # E (n)
            pl.BlockSpec((bm, bm), lambda j, k, t: (j, k), memory_space=vmem),  # D1
            pl.BlockSpec((bt, Q), lambda j, k, t: (t, 0), memory_space=vmem),  # w
            pl.BlockSpec((bm, Q), lambda j, k, t: (j, 0), memory_space=vmem),  # Z (m)
            pl.BlockSpec((bm, Q), lambda j, k, t: (k, 0), memory_space=vmem),  # Z (n)
        ],
        out_specs=pl.BlockSpec((bm, bm), lambda j, k, t: (j, k), memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((Mp, Mp), jnp.float32),
        interpret=interpret,
    )(base[:, None], E, E, D1, w, Z, Z)
    return out[:M, :M]


def _psi2_bwd_kernel(
    base_ref, e_m_ref, e_n_ref, d1_ref, w_ref, zm_ref, zn_ref, gs_ref,
    dbase_ref, de_ref, dw_ref, dzc_ref, s_scr,
):
    """Fused backward: recompute the per-tile probabilities P = exp(logp)
    (same decomposition as the forward) and contract them against the
    symmetrized cotangent Gs = G + G^T in-tile. P is symmetric in (m, n), so

      dbase[t] = 1/2 sum_{mn} PGs,   dE[t,m] = sum_n PGs[t,m,n],
      S[t,m,q] = sum_n PGs[t,m,n] z[n,q]   (MXU)
      dw[t,q]  = -1/4 sum_m z[m,q] S[t,m,q]
      dzC[m,q] = -1/2 sum_t w[t,q] S[t,m,q]  (the C-term's direct dZ)

    Grid (T-tiles, M-tiles, N-tiles) with t outermost: every output block's
    index map is constant along the grid dims it accumulates over, so the
    block stays resident in VMEM across those (legal revisiting). The
    (T, M, M) tensor is never materialized.
    """
    pl, pltpu = _pl()
    j = pl.program_id(1)
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(jnp.logical_and(j == 0, k == 0))
    def _():
        dbase_ref[:] = jnp.zeros_like(dbase_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)

    @pl.when(k == 0)
    def _():
        de_ref[:] = jnp.zeros_like(de_ref)
        s_scr[:] = jnp.zeros_like(s_scr)

    base = base_ref[:]  # (BT, 1)
    w = w_ref[:]  # (BT, Q)
    zm = zm_ref[:]  # (BM, Q)
    zn = zn_ref[:]  # (BN, Q)
    BT, Q = w.shape
    BM = zm.shape[0]
    BN = zn.shape[0]

    wzm = w[:, None, :] * zm[None, :, :]  # (BT, BM, Q)
    C = jax.lax.dot_general(
        wzm.reshape(BT * BM, Q),
        zn,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(BT, BM, BN)
    logp = (
        base[:, :, None]
        - d1_ref[:][None, :, :]
        + e_m_ref[:][:, :, None]
        + e_n_ref[:][:, None, :]
        - 0.5 * C
    )
    pgs = jnp.exp(logp) * gs_ref[:][None, :, :]  # (BT, BM, BN)

    # single-axis reductions only: a multi-axis jnp.sum over a 3D value
    # SIGABRTs the Mosaic compiler (layout_rank check) on v5e
    rowsum = jnp.sum(pgs, axis=2)  # (BT, BM)
    dbase_ref[:] += 0.5 * jnp.sum(rowsum, axis=1)[:, None]
    de_ref[:] += rowsum
    # S kept as a 2D (BT*BM, Q) scratch: 3D VMEM refs with a sub-128 lane
    # dim trip a Mosaic implicit-dim layout check on v5e
    s_scr[:] += jax.lax.dot_general(
        pgs.reshape(BT * BM, BN),
        zn,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(k == nk - 1)
    def _():
        S = s_scr[:].reshape(BT, BM, Q)
        dw_ref[:] += -0.25 * jnp.sum(zm[None, :, :] * S, axis=1)  # (BT, Q)
        dzc_ref[:] = -0.5 * jnp.sum(w[:, None, :] * S, axis=0)  # (BM, Q)


@functools.partial(jax.jit, static_argnames=("bt", "bm", "interpret"))
def _psi2_bwd_raw(base, E, D1, w, Z, Gs, *, bt: int = 8, bm: int = 128,
                  interpret: bool = False):
    """-> (dbase (T,), dE (T,M), dw (T,Q), dzC (M,Q)); all f32."""
    pl, pltpu = _pl()
    T, Q = w.shape
    M = Z.shape[0]

    def cdiv(a, b):
        return -(-a // b)

    Tp = cdiv(T, bt) * bt
    Mp = cdiv(M, bm) * bm
    if Tp != T:
        pad = Tp - T
        base = jnp.concatenate([base, jnp.full((pad,), -jnp.inf, base.dtype)])
        E = jnp.concatenate([E, jnp.zeros((pad, M), E.dtype)])
        w = jnp.concatenate([w, jnp.zeros((pad, Q), w.dtype)])
    if Mp != M:
        padm = Mp - M
        E = jnp.concatenate([E, jnp.zeros((Tp, padm), E.dtype)], axis=1)
        D1 = jnp.pad(D1, ((0, padm), (0, padm)))
        Z = jnp.concatenate([Z, jnp.zeros((padm, Q), Z.dtype)], axis=0)
        Gs = jnp.pad(Gs, ((0, padm), (0, padm)))

    n_t, n_m = Tp // bt, Mp // bm
    grid = (n_t, n_m, n_m)
    vmem = pltpu.VMEM
    dbase, dE, dw, dzc = pl.pallas_call(
        _psi2_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, 1), lambda t, j, k: (t, 0), memory_space=vmem),
            pl.BlockSpec((bt, bm), lambda t, j, k: (t, j), memory_space=vmem),
            pl.BlockSpec((bt, bm), lambda t, j, k: (t, k), memory_space=vmem),
            pl.BlockSpec((bm, bm), lambda t, j, k: (j, k), memory_space=vmem),
            pl.BlockSpec((bt, Q), lambda t, j, k: (t, 0), memory_space=vmem),
            pl.BlockSpec((bm, Q), lambda t, j, k: (j, 0), memory_space=vmem),
            pl.BlockSpec((bm, Q), lambda t, j, k: (k, 0), memory_space=vmem),
            pl.BlockSpec((bm, bm), lambda t, j, k: (j, k), memory_space=vmem),
        ],
        out_specs=[
            pl.BlockSpec((bt, 1), lambda t, j, k: (t, 0), memory_space=vmem),
            pl.BlockSpec((bt, bm), lambda t, j, k: (t, j), memory_space=vmem),
            pl.BlockSpec((bt, Q), lambda t, j, k: (t, 0), memory_space=vmem),
            # dzC partial sums: (t, j) tiles stacked along rows (2D blocks —
            # a (1, bm, Q) 3D block trips a Mosaic implicit-dim layout check)
            pl.BlockSpec((bm, Q), lambda t, j, k: (t * (Mp // bm) + j, 0),
                         memory_space=vmem),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Mp), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Q), jnp.float32),
            jax.ShapeDtypeStruct((n_t * Mp, Q), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bt * bm, Q), jnp.float32)],
        interpret=interpret,
    )(base[:, None], E, E, D1, w, Z, Z, Gs)
    return (
        dbase[:T, 0],
        dE[:T, :M],
        dw[:T],
        jnp.sum(dzc.reshape(n_t, Mp, Q), axis=0)[:M],
    )


def _reference_psi2(p, Z, mu, s, block=128):
    from ..psi_stats import _psi2_sum
    from ...kernels import RBF

    kern = RBF(input_dim=Z.shape[1])
    return _psi2_sum(kern, p, Z, mu, s, block=block)


@jax.custom_vjp
def rbf_psi2_sum_pallas(p, Z, mu, s):
    """sum_t Psi2_t for the RBF kernel via the fused Pallas kernel (f32).

    Drop-in replacement for the XLA chunked path; differentiable with a fully
    fused Pallas backward (recompute-in-tile, see :func:`_psi2_bwd_kernel`).
    """
    base, E, D1, w = rbf_psi2_precompute(p, Z, mu, s)
    return _psi2_pallas_raw(
        base.astype(jnp.float32),
        E.astype(jnp.float32),
        D1.astype(jnp.float32),
        w.astype(jnp.float32),
        Z.astype(jnp.float32),
    ).astype(mu.dtype)


def _fwd(p, Z, mu, s):
    out = rbf_psi2_sum_pallas(p, Z, mu, s)
    return out, (p, Z, mu, s, out)


def _bwd(res, g):
    p, Z, mu, s, out = res

    # chain through the XLA-side precompute with the kernel-computed
    # cotangents; C's direct Z-dependence arrives separately as dzC
    def precomp(p_, Z_, mu_, s_):
        return rbf_psi2_precompute(p_, Z_, mu_, s_)

    (base, E, D1, w), vjp_pre = jax.vjp(precomp, p, Z, mu, s)
    Gs = (g + g.T).astype(jnp.float32)
    dbase, dE, dw, dzc = _psi2_bwd_raw(
        base.astype(jnp.float32), E.astype(jnp.float32),
        D1.astype(jnp.float32), w.astype(jnp.float32),
        Z.astype(jnp.float32), Gs,
    )
    dD1 = -(out * g).astype(jnp.float32)
    dp, dZ, dmu, ds = vjp_pre((
        dbase.astype(base.dtype),
        dE.astype(E.dtype),
        dD1.astype(D1.dtype),
        dw.astype(w.dtype),
    ))
    dZ = dZ + dzc.astype(dZ.dtype)
    return dp, dZ, dmu, ds


rbf_psi2_sum_pallas.defvjp(_fwd, _bwd)
