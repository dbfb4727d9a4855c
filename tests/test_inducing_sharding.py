"""Inducing-point (M-axis) sharding — the TP analog (SURVEY.md S2.4) — on the
8-device virtual CPU mesh: sharded bound == single-device bound, values AND
gradients, for RBF (uncertain + certain inputs) and Linear kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgp_tpu.inference.collapsed_vi import collapsed_bound
from rgp_tpu.kernels import RBF, Linear
from rgp_tpu.models import sparse_gp
from rgp_tpu.ops.psi_stats import psi_statistics
from rgp_tpu.parallel import mesh as pmesh
from rgp_tpu.parallel.inducing import inducing_sharded_collapsed_elbo, psi2_rows


def _problem(rng, kern_cls=RBF, T=48, Q=3, M=16, uncertain=True):
    X_mu = jnp.asarray(rng.standard_normal((T, Q)))
    X_s = jnp.asarray(rng.uniform(0.05, 0.3, (T, Q))) if uncertain else None
    Y = jnp.asarray(rng.standard_normal((T, 2)))
    kern = kern_cls(input_dim=Q)
    cfg = sparse_gp.SparseGPConfig(kern, M)
    params = sparse_gp.init_params(cfg, np.asarray(X_mu), noise=0.3, dtype=jnp.float64)
    return kern, params, X_mu, X_s, Y


def _ref_bound(kern, params, X_mu, X_s, Y):
    stats = psi_statistics(kern, params["kern"], params["Z"], X_mu, X_s, block=None)
    return collapsed_bound(
        kern, params["kern"], params["Z"], params["log_noise"], stats, Y
    )


def test_psi2_rows_matches_full(rng):
    kern, params, X_mu, X_s, _ = _problem(rng)
    full = psi_statistics(kern, params["kern"], params["Z"], X_mu, X_s, block=None).psi2
    rows = psi2_rows(kern, params["kern"], params["Z"][:4], params["Z"], X_mu, X_s)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(full[:4]), rtol=1e-12)
    # chunked time accumulation path
    rows_b = psi2_rows(
        kern, params["kern"], params["Z"][:4], params["Z"], X_mu, X_s, block=13
    )
    np.testing.assert_allclose(np.asarray(rows_b), np.asarray(rows), rtol=1e-12)


@pytest.mark.slow
def test_inducing_sharded_elbo_value_and_grad(rng):
    kern, params, X_mu, X_s, Y = _problem(rng)
    m = pmesh.make_mesh(data=8)

    def ref(p, Xm):
        stats = psi_statistics(kern, p["kern"], p["Z"], Xm, X_s, block=None)
        return collapsed_bound(kern, p["kern"], p["Z"], p["log_noise"], stats, Y)

    def sharded(p, Xm):
        return inducing_sharded_collapsed_elbo(
            kern, p["kern"], p["Z"], p["log_noise"], Xm, X_s, Y, None, m
        )

    v_ref, g_ref = jax.value_and_grad(ref, argnums=(0, 1))(params, X_mu)
    v_sh, g_sh = jax.value_and_grad(sharded, argnums=(0, 1))(params, X_mu)
    np.testing.assert_allclose(float(v_sh), float(v_ref), rtol=1e-10)
    for a, b in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)


def test_inducing_sharded_certain_inputs(rng):
    kern, params, X_mu, _, Y = _problem(rng, uncertain=False)
    # 2-way mesh: the M-axis sharding semantics are device-count-independent
    # and the shard_map compile storm scales with device count (fast-lane
    # budget, r3 #7 / r4 #8); the 8-way case runs in the slow-lane test above
    m = pmesh.make_mesh(data=2)
    ref = float(_ref_bound(kern, params, X_mu, None, Y))
    out = float(
        inducing_sharded_collapsed_elbo(
            kern, params["kern"], params["Z"], params["log_noise"],
            X_mu, None, Y, None, m,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-10)


@pytest.mark.slow
def test_inducing_sharded_linear_kernel(rng):
    kern, params, X_mu, X_s, Y = _problem(rng, kern_cls=Linear)
    m = pmesh.make_mesh(data=8)
    ref = float(_ref_bound(kern, params, X_mu, X_s, Y))
    out = float(
        inducing_sharded_collapsed_elbo(
            kern, params["kern"], params["Z"], params["log_noise"],
            X_mu, X_s, Y, None, m,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-10)


@pytest.mark.slow  # variational-target variant; the certain-inputs gate
# stays in the fast lane (~27 s of shard_map compile cold)
def test_inducing_sharded_with_y_var(rng):
    kern, params, X_mu, X_s, Y = _problem(rng)
    Y_var = jnp.asarray(np.random.default_rng(1).uniform(0.01, 0.1, Y.shape))
    m = pmesh.make_mesh(data=8)
    stats = psi_statistics(kern, params["kern"], params["Z"], X_mu, X_s, block=None)
    ref = float(
        collapsed_bound(
            kern, params["kern"], params["Z"], params["log_noise"], stats, Y,
            Y_var=Y_var,
        )
    )
    out = float(
        inducing_sharded_collapsed_elbo(
            kern, params["kern"], params["Z"], params["log_noise"],
            X_mu, X_s, Y, Y_var, m,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-10)
