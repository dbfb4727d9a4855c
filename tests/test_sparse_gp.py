"""Sparse GP tests: Z=X exactness degeneration (SURVEY.md S4 item 3), checkgrad."""

import jax.numpy as jnp
import numpy as np

from rgp_tpu.kernels import RBF
from rgp_tpu.models import gp, sparse_gp
from rgp_tpu.utils.checkgrad import checkgrad


def _data(rng, T=25, Q=2):
    X = rng.standard_normal((T, Q))
    Y = np.sin(X.sum(-1, keepdims=True)) + 0.05 * rng.standard_normal((T, 1))
    return jnp.asarray(X), jnp.asarray(Y)


def test_z_equals_x_recovers_exact_marginal(rng):
    """M=N, Z=X => collapsed bound == exact GP log marginal (tol 1e-4)."""
    X, Y = _data(rng)
    kern = RBF(input_dim=2)
    scfg = sparse_gp.SparseGPConfig(kern, X.shape[0])
    sparams = sparse_gp.init_params(scfg, X, noise=0.1, dtype=jnp.float64)
    sparams["Z"] = X  # exactly the data
    bound = float(sparse_gp.elbo(scfg, sparams, X, Y))

    gcfg = gp.GPConfig(kern)
    gparams = {"kern": sparams["kern"], "log_noise": sparams["log_noise"]}
    exact = float(gp.log_marginal(gcfg, gparams, X, Y))
    # lower bound, modulo jitchol jitter placement in the near-null
    # eigendirections (the C-form factors Kmm+jitter and C=Kmm+jitter+beta*Psi2
    # consistently; residual mismatch ~2e-4 relative is jitter-induced)
    assert bound <= exact + 5e-4 * abs(exact)
    np.testing.assert_allclose(bound, exact, rtol=5e-4)


def test_bound_below_exact_for_m_less_n(rng):
    X, Y = _data(rng, T=40)
    kern = RBF(input_dim=2)
    scfg = sparse_gp.SparseGPConfig(kern, 10)
    sparams = sparse_gp.init_params(scfg, X, noise=0.1, dtype=jnp.float64)
    bound = float(sparse_gp.elbo(scfg, sparams, X, Y))
    gcfg = gp.GPConfig(kern)
    gparams = {"kern": sparams["kern"], "log_noise": sparams["log_noise"]}
    exact = float(gp.log_marginal(gcfg, gparams, X, Y))
    assert bound < exact


def test_sparse_gp_checkgrad(rng):
    X, Y = _data(rng, T=20)
    kern = RBF(input_dim=2)
    scfg = sparse_gp.SparseGPConfig(kern, 6)
    params = sparse_gp.init_params(scfg, X, noise=0.2, dtype=jnp.float64)

    def f(p):
        return sparse_gp.elbo(scfg, p, X, Y)

    res = checkgrad(f, params, eps=1e-5)
    assert res.max_rel_err < 1e-4, res.max_rel_err


def test_sparse_predict_matches_exact_at_z_eq_x(rng):
    X, Y = _data(rng)
    Xs = jnp.asarray(rng.standard_normal((7, 2)))
    kern = RBF(input_dim=2)
    scfg = sparse_gp.SparseGPConfig(kern, X.shape[0])
    sparams = sparse_gp.init_params(scfg, X, noise=0.1, dtype=jnp.float64)
    sparams["Z"] = X
    sm, sv = sparse_gp.predict(scfg, sparams, X, Y, Xs, include_noise=True)

    gcfg = gp.GPConfig(kern)
    gparams = {"kern": sparams["kern"], "log_noise": sparams["log_noise"]}
    em, ev = gp.predict(gcfg, gparams, X, Y, Xs, include_noise=True)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(em), atol=2e-4)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(ev)[:, None], rtol=1e-3, atol=2e-4)
