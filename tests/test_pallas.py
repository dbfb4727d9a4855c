"""Pallas Psi2 kernel correctness (interpret mode on CPU; the compiled kernel
is exercised on real TPU by the bench/verify drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgp_tpu.kernels import RBF
from rgp_tpu.ops.psi_stats import psi_statistics
from rgp_tpu.ops.pallas.psi2 import _psi2_pallas_raw, rbf_psi2_precompute


@pytest.mark.parametrize("T,M,Q", [
    (40, 24, 3),
    pytest.param(65, 130, 5, marks=pytest.mark.slow),  # larger interpret-mode case
])  # non-tile-aligned
def test_pallas_psi2_matches_reference(rng, T, M, Q):
    kern = RBF(input_dim=Q)
    p = kern.init(dtype=jnp.float64)
    mu = jnp.asarray(rng.standard_normal((T, Q)))
    s = jnp.asarray(rng.uniform(0.05, 0.4, (T, Q)))
    Z = jnp.asarray(rng.standard_normal((M, Q)))

    ref = np.asarray(psi_statistics(kern, p, Z, mu, s, block=None).psi2)

    base, E, D1, w = rbf_psi2_precompute(p, Z, mu, s)
    out = _psi2_pallas_raw(
        base.astype(jnp.float32),
        E.astype(jnp.float32),
        D1.astype(jnp.float32),
        w.astype(jnp.float32),
        Z.astype(jnp.float32),
        bt=8,
        bm=64,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("T,M,Q", [
    (40, 24, 3),
    pytest.param(65, 130, 5, marks=pytest.mark.slow),  # larger interpret-mode case
])  # non-tile-aligned
def test_pallas_psi2_fused_backward_matches_autodiff(rng, T, M, Q):
    """The fully-fused Pallas backward (recompute-in-tile, _psi2_bwd_kernel)
    reproduces autodiff-of-the-XLA-reference cotangents for every input."""
    from rgp_tpu.ops.pallas import psi2 as pp

    kern = RBF(input_dim=Q)
    p = kern.init(dtype=jnp.float64)
    mu = jnp.asarray(rng.standard_normal((T, Q)))
    s = jnp.asarray(rng.uniform(0.05, 0.4, (T, Q)))
    Z = jnp.asarray(rng.standard_normal((M, Q)))
    G = jnp.asarray(rng.standard_normal((M, M)))

    def f_ref(p_, Z_, mu_, s_):
        return jnp.sum(psi_statistics(kern, p_, Z_, mu_, s_, block=None).psi2 * G)

    gp_ref, gZ_ref, gmu_ref, gs_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(p, Z, mu, s)

    # replicate pp._bwd with interpret=True (CPU)
    out = psi_statistics(kern, p, Z, mu, s, block=None).psi2
    (base, E, D1, w), vjp_pre = jax.vjp(pp.rbf_psi2_precompute, p, Z, mu, s)
    Gs = (G + G.T).astype(jnp.float32)
    dbase, dE, dw, dzc = pp._psi2_bwd_raw(
        base.astype(jnp.float32), E.astype(jnp.float32), D1.astype(jnp.float32),
        w.astype(jnp.float32), Z.astype(jnp.float32), Gs,
        bt=8, bm=64, interpret=True,
    )
    dD1 = -(out * G).astype(jnp.float32)
    dp, dZ, dmu, ds = vjp_pre((
        dbase.astype(base.dtype), dE.astype(E.dtype),
        dD1.astype(D1.dtype), dw.astype(w.dtype),
    ))
    dZ = dZ + dzc.astype(dZ.dtype)

    # f32 kernel vs f64 autodiff: tolerances at f32 resolution
    np.testing.assert_allclose(np.asarray(dmu), np.asarray(gmu_ref), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(gs_ref), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(dZ), np.asarray(gZ_ref), rtol=3e-4, atol=3e-4)
    for k in gp_ref:
        np.testing.assert_allclose(
            np.asarray(dp[k]), np.asarray(gp_ref[k]), rtol=3e-4, atol=3e-4
        )
