"""Pallas Psi2 kernel correctness (interpret mode on CPU; the compiled kernel
is exercised on real TPU by the bench/verify drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgp_tpu.kernels import RBF
from rgp_tpu.ops.psi_stats import psi_statistics
from rgp_tpu.ops.pallas.psi2 import _psi2_pallas_raw, rbf_psi2_precompute


@pytest.mark.parametrize("T,M,Q", [(40, 24, 3), (65, 130, 5)])  # non-tile-aligned
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


def test_pallas_psi2_grad_path(rng):
    """custom_vjp backward (XLA reference VJP) produces correct gradients."""
    from rgp_tpu.ops.pallas import psi2 as pp

    T, M, Q = 12, 6, 2
    kern = RBF(input_dim=Q)
    p = kern.init(dtype=jnp.float64)
    mu = jnp.asarray(rng.standard_normal((T, Q)))
    s = jnp.asarray(rng.uniform(0.05, 0.4, (T, Q)))
    Z = jnp.asarray(rng.standard_normal((M, Q)))
    W = jnp.asarray(rng.standard_normal((M, M)))

    def f_ref(mu_):
        return jnp.sum(psi_statistics(kern, p, Z, mu_, s, block=None).psi2 * W)

    # backward of the pallas op is defined as the reference VJP; check the
    # _bwd plumbing returns the same cotangents as direct autodiff
    _, vjp = jax.vjp(lambda mu_: pp._reference_psi2(p, Z, mu_, s), mu)
    g_ref = jax.grad(f_ref)(mu)
    (g_via,) = vjp(W)
    np.testing.assert_allclose(np.asarray(g_via), np.asarray(g_ref), rtol=1e-8)
