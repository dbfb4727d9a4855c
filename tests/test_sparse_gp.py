"""Sparse GP tests: Z=X exactness degeneration (SURVEY.md S4 item 3), checkgrad."""

import jax.numpy as jnp
import numpy as np

from rgp_tpu.kernels import RBF
from rgp_tpu.models import gp, sparse_gp
from rgp_tpu.params import np_positive_inv
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


def test_full_cov_predict_and_samples_match_exact_at_z_eq_x(rng):
    """full_cov sparse predictive == exact GP predictive covariance at Z = X;
    posterior samples reproduce the predictive moments; log predictive density
    matches the direct Gaussian formula (reference GPy API parity)."""
    import jax

    from rgp_tpu.inference.collapsed_vi import log_predictive_density
    from rgp_tpu.models import gp

    X = jnp.asarray(rng.standard_normal((25, 2)))
    Y = jnp.asarray(rng.standard_normal((25, 1)))
    Xs = jnp.asarray(rng.standard_normal((7, 2)))
    kern = RBF(input_dim=2)

    scfg = sparse_gp.SparseGPConfig(kernel=kern, num_inducing=25)
    sp = {"kern": kern.init(dtype=jnp.float64), "Z": X,
          "log_noise": np_positive_inv(0.1, jnp.float64)}
    gcfg = gp.GPConfig(kernel=kern)
    gpar = {"kern": sp["kern"], "log_noise": sp["log_noise"]}

    ms, cov_s = sparse_gp.predict(scfg, sp, X, Y, Xs, full_cov=True, include_noise=False)
    me, cov_e = gp.predict(gcfg, gpar, X, Y, Xs, full_cov=True, include_noise=False)
    # Z = X equivalence holds up to the jitter regularization (same bound as
    # test_sparse_predict_matches_exact_at_z_eq_x)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(me), atol=2e-3)
    np.testing.assert_allclose(np.asarray(cov_s), np.asarray(cov_e), atol=2e-3)

    # diag of full_cov == marginal var path
    _, var_s = sparse_gp.predict(scfg, sp, X, Y, Xs, include_noise=False)
    np.testing.assert_allclose(np.diag(np.asarray(cov_s)), np.asarray(var_s)[:, 0],
                               rtol=1e-5, atol=1e-7)

    # sample moments reproduce (mean, cov)
    samples = sparse_gp.posterior_samples_f(
        scfg, sp, X, Y, Xs, jax.random.PRNGKey(0), n_samples=4000
    )
    samp = np.asarray(samples)[:, :, 0]
    np.testing.assert_allclose(samp.mean(0), np.asarray(ms)[:, 0], atol=0.1)
    emp_cov = np.cov(samp.T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov_s), atol=0.1)

    # log predictive density against the direct formula
    ys = jnp.asarray(rng.standard_normal((7, 1)))
    mm, vv = sparse_gp.predict(scfg, sp, X, Y, Xs, include_noise=True)
    lpd = float(log_predictive_density(ys, mm, vv))
    direct = np.mean(
        -0.5 * np.log(2 * np.pi * np.asarray(vv))
        - 0.5 * (np.asarray(ys) - np.asarray(mm)) ** 2 / np.asarray(vv)
    )
    np.testing.assert_allclose(lpd, direct, rtol=1e-10)
