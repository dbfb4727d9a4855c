"""Dense linear algebra for GP inference on TPU.

TPU-native replacement for the reference's BLAS/LAPACK utility layer
(`GPy:GPy/util/linalg.py` [H]: ``jitchol``, ``dpotrs``, ``dtrtrs``, ``pdinv``,
``backsub_both_sides``, ``tdot`` — SURVEY.md S2.2/N1). All ops lower to XLA's
MXU-backed ``lax.linalg`` kernels, batch with ``vmap``, and differentiate with
built-in JVP/VJP rules (replacing `GPy:GPy/util/choleskies_cython.pyx`, N3).

Numerics policy (SURVEY.md S7 hard-part 1): TPU runs f32, the reference ran f64
CPU. Matmuls feeding Cholesky/solves therefore always use ``precision=HIGHEST``
(guide: "Missing preferred_element_type" pitfall) and jitchol retries with an
escalating jitter schedule inside a ``lax.while_loop`` instead of LAPACK's
info-code exception loop.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = [
    "hdot",
    "tdot",
    "default_jitter",
    "jitchol",
    "jitchol_with_jitter",
    "solve_triangular",
    "cho_solve",
    "backsub_both_sides",
    "pdinv",
    "log_det_from_chol",
]

# Highest-precision matmul: on TPU this uses the multi-pass f32 MXU path; GP
# bounds are far too ill-conditioned for the default bf16 single-pass.
_PREC = lax.Precision.HIGHEST


def hdot(a, b):
    """Matmul at HIGHEST precision with f32 accumulation (MXU, multi-pass)."""
    return jnp.matmul(a, b, precision=_PREC)


def tdot(a):
    """A @ A.T at high precision (reference ``tdot``, i.e. dsyrk)."""
    return jnp.matmul(a, jnp.swapaxes(a, -1, -2), precision=_PREC)


def _add_jitter(A, jitter):
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)
    return A + jitter[..., None, None] * eye


def default_jitter(dtype) -> float:
    """Dtype-aware jitter floor: f64 matches the reference's 1e-6; f32 (the TPU
    path) needs a larger floor to keep Kmm factorizable (SURVEY.md S7 hard-part 1)."""
    return 1e-6 if jnp.dtype(dtype).itemsize >= 8 else 1e-4


def jitchol_with_jitter(A, jitter0: float = 1e-6, max_tries: int = 8):
    """Cholesky with escalating-jitter retry (reference ``jitchol`` [H]).

    LAPACK raises on indefinite input; XLA instead returns NaN rows. Phase 1
    (under ``stop_gradient``) tries jitter0 once and on failure escalates to a
    single rescue rung; phase 2 performs ONE differentiable Cholesky at the
    selected level, so gradients flow through XLA's built-in Cholesky JVP/VJP.
    Jitter is scaled by mean(diag(A)) like the reference. ``max_tries`` is
    accepted for API compatibility with the reference's 10x retry loop.

    The straight-line schedule replaces the earlier ``lax.while_loop`` retry:
    on TPU a dynamic while costs ~70us/step in condition sync alone (measured
    on the config-1 train step — ~20% of the whole training iteration), while
    an extra M~100 trial factorization costs ~11us.

    Returns (L, absolute_jitter) with ``L @ L.T ~= A + absolute_jitter * I``.
    The jitter is returned so a *consistent* jitter can enter a second related
    factorization (e.g. log|Kmm + beta Psi2| - log|Kmm|, where the tiny
    eigenvalues must cancel between the two factors).
    """
    A = jnp.asarray(A)
    diag_mean = jnp.mean(jnp.diagonal(A, axis1=-2, axis2=-1), axis=-1)
    scale = jnp.maximum(diag_mean, jnp.asarray(1e-30, A.dtype))
    jitter0 = jnp.asarray(jitter0, A.dtype)

    A_sg = lax.stop_gradient(A)

    def _fails(jit_abs):
        return jnp.isnan(jnp.linalg.cholesky(_add_jitter(A_sg, jit_abs))).any(
            axis=(-2, -1)
        )

    # straight-line 4-rung escalation (x1, x10, x1e3 verified, x1e7 blind):
    # three cheap stop-gradient trial factorizations and pure where-dataflow —
    # no while / cond, whose per-step condition sync costs more than an extra
    # M~100 Cholesky (~70us vs ~11us measured on the config-1 train step).
    # Success-path numerics are identical to the reference schedule
    # (jitter = jitter0). The x10 rung matters beyond robustness: marginal
    # Kmm failures are common for near-duplicate inducing points, and a
    # coarser first jump (x1e3) makes the stop-gradient jitter selection a
    # visible discontinuity under finite-difference checkgrad (~1e-3 rel err
    # observed); x10 keeps the jump below test tolerance, matching the
    # reference's 10x ladder on the first two rungs.
    j0 = jnp.broadcast_to(jitter0 * scale, scale.shape)
    f0 = _fails(j0)
    f1 = jnp.where(f0, _fails(1e3 * j0), f0)
    # only the LADDER CHOICE is stop-gradded; the diag-mean scale stays
    # differentiable (jitter = rel * mean(diag A)) so the analytic gradient
    # keeps the jitter's dependence on e.g. the kernel variance — dropping it
    # shows up as ~1e-3 rel error under finite-difference checkgrad
    rel = lax.stop_gradient(
        jnp.where(f1, 1e7 * jitter0, jnp.where(f0, 1e3 * jitter0, jitter0))
    )
    jitter = rel * scale
    L = jnp.linalg.cholesky(_add_jitter(A, jitter))
    return L, jitter


def jitchol(A, jitter0: float = 1e-6, max_tries: int = 8):
    """Lower Cholesky factor of A + jitter*I (see :func:`jitchol_with_jitter`)."""
    return jitchol_with_jitter(A, jitter0=jitter0, max_tries=max_tries)[0]


def solve_triangular(L, B, *, lower: bool = True, trans: bool = False):
    """Triangular solve (reference ``dtrtrs``): solves op(L) X = B.

    ``trans=True`` solves L^T X = B. Batched over leading dims.
    """
    return lax.linalg.triangular_solve(
        L,
        B,
        left_side=True,
        lower=lower,
        transpose_a=trans,
        conjugate_a=False,
    )


def cho_solve(L, B):
    """Solve A X = B given L = chol(A) (reference ``dpotrs``)."""
    y = solve_triangular(L, B, lower=True, trans=False)
    return solve_triangular(L, y, lower=True, trans=True)


def backsub_both_sides(L, X, transpose: str = "left"):
    """Reference ``backsub_both_sides``: congruence transform by L^{-1}.

    ``transpose='left'``  -> L^{-T} X L^{-1}
    ``transpose='right'`` -> L^{-1} X L^{-T}   (used for Lm^{-1} Psi2 Lm^{-T})
    """
    if transpose == "right":
        tmp = solve_triangular(L, X, lower=True, trans=False)
        tmp = solve_triangular(L, jnp.swapaxes(tmp, -1, -2), lower=True, trans=False)
        return jnp.swapaxes(tmp, -1, -2)
    elif transpose == "left":
        tmp = solve_triangular(L, X, lower=True, trans=True)
        tmp = solve_triangular(L, jnp.swapaxes(tmp, -1, -2), lower=True, trans=True)
        return jnp.swapaxes(tmp, -1, -2)
    raise ValueError(f"transpose must be 'left' or 'right', got {transpose!r}")


def pdinv(A, jitter0: float = 1e-6):
    """Inverse of a PD matrix via jitchol (reference ``pdinv``).

    Returns (Ainv, L, half_logdet).
    """
    L = jitchol(A, jitter0=jitter0)
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    Ainv = cho_solve(L, eye)
    half_logdet = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return Ainv, L, half_logdet


def log_det_from_chol(L):
    """log|A| from L = chol(A)."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
