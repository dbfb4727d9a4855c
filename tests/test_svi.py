"""SVI + natural gradient tests (SURVEY.md S4 item 6, config 4).

Key oracle: the collapsed bound is the optimum of the uncollapsed bound over
q(u); one natural-gradient step with lr=1 on the (conjugate) Gaussian block
jumps exactly to that optimum.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rgp_tpu.inference import natgrad
from rgp_tpu.kernels import RBF
from rgp_tpu.models import sparse_gp, svgp
from rgp_tpu.utils.checkgrad import checkgrad


def _problem(rng, T=40, Q=2, M=8, D=1):
    X = jnp.asarray(rng.standard_normal((T, Q)))
    Y = jnp.asarray(
        np.sin(np.asarray(X).sum(-1, keepdims=True)) + 0.1 * rng.standard_normal((T, 1))
    )
    if D > 1:
        Y = jnp.concatenate([Y] * D, axis=1)
    cfg = svgp.SVGPConfig(RBF(input_dim=Q), M, output_dim=D)
    params = svgp.init_params(cfg, np.asarray(X), noise=0.2, dtype=jnp.float64)
    return cfg, params, X, Y


def test_svi_below_collapsed(rng):
    cfg, params, X, Y = _problem(rng)
    b_svi = float(svgp.elbo(cfg, params, X, Y))
    scfg = sparse_gp.SparseGPConfig(cfg.kernel, cfg.num_inducing)
    b_col = float(
        sparse_gp.elbo(scfg, {k: params[k] for k in ("kern", "Z", "log_noise")}, X, Y)
    )
    assert b_svi < b_col


def test_natgrad_step_reaches_collapsed_optimum(rng):
    """lr=1 natural gradient on the conjugate q(u) block == collapsed bound."""
    cfg, params, X, Y = _problem(rng)

    def elbo_of_qu(qu):
        p = dict(params)
        p["qu"] = qu
        return svgp.elbo(cfg, p, X, Y)

    qu1 = natgrad.natgrad_step(elbo_of_qu, params["qu"], lr=1.0)
    b1 = float(elbo_of_qu(qu1))

    scfg = sparse_gp.SparseGPConfig(cfg.kernel, cfg.num_inducing)
    b_col = float(
        sparse_gp.elbo(scfg, {k: params[k] for k in ("kern", "Z", "log_noise")}, X, Y)
    )
    np.testing.assert_allclose(b1, b_col, rtol=1e-6)

    # second step stays at the optimum (monotonicity / fixed point)
    qu2 = natgrad.natgrad_step(elbo_of_qu, qu1, lr=1.0)
    b2 = float(elbo_of_qu(qu2))
    np.testing.assert_allclose(b2, b1, rtol=1e-8)


def test_natgrad_monotone_small_steps(rng):
    cfg, params, X, Y = _problem(rng)

    def elbo_of_qu(qu):
        p = dict(params)
        p["qu"] = qu
        return svgp.elbo(cfg, p, X, Y)

    qu = params["qu"]
    prev = float(elbo_of_qu(qu))
    for _ in range(5):
        qu = natgrad.natgrad_step(elbo_of_qu, qu, lr=0.5)
        cur = float(elbo_of_qu(qu))
        assert cur > prev - 1e-8
        prev = cur


def test_svi_checkgrad(rng):
    cfg, params, X, Y = _problem(rng, T=15, M=5)

    def f(p):
        return svgp.elbo(cfg, p, X, Y)

    res = checkgrad(f, params, eps=1e-5, max_coords=80)
    assert res.max_rel_err < 3e-4, res.max_rel_err


def test_minibatch_data_term_unbiased(rng):
    """The weighted batch data terms of two disjoint halves sum to the full
    data term (the bound is linear in the additive batch statistics)."""
    cfg, params, X, Y = _problem(rng, T=40)
    full = float(svgp.elbo(cfg, params, X, Y))

    halves = []
    for sl in (slice(0, 20), slice(20, 40)):
        halves.append(float(svgp.elbo(cfg, params, X[sl], Y[sl], T_total=40)))
    # each half bound = w*data_half - KL; sum = 2*(data_full/... ) careful:
    # avg of the two = data_full - KL = full bound
    np.testing.assert_allclose(0.5 * (halves[0] + halves[1]), full, rtol=1e-9)


def test_svi_predict_reasonable(rng):
    cfg, params, X, Y = _problem(rng, T=60, M=20)
    from rgp_tpu import train

    res = train.fit_adam(
        lambda p: -svgp.elbo(cfg, p, X, Y), params, iters=400, learning_rate=1e-2
    )
    m, v = svgp.predict(cfg, res.params, X, include_noise=False)
    rmse = float(jnp.sqrt(jnp.mean((m - Y) ** 2)))
    assert rmse < 0.3, rmse
    assert np.all(np.asarray(v) > 0)


def test_svi_uncertain_inputs_matches_mc(rng):
    """Uncertain-input SVI predictive mean vs Monte-Carlo over q(x*)."""
    cfg, params, X, Y = _problem(rng, T=30, M=10)
    mu_s = jnp.asarray(rng.standard_normal((4, 2)))
    s_s = jnp.asarray(rng.uniform(0.05, 0.2, (4, 2)))
    m_pred, _ = svgp.predict(cfg, params, mu_s, Xs_var=s_s, include_noise=False)

    key = jax.random.PRNGKey(0)
    xs = mu_s[None] + jnp.sqrt(s_s)[None] * jax.random.normal(key, (20000, 4, 2), dtype=mu_s.dtype)
    mc, _ = svgp.predict(cfg, params, xs.reshape(-1, 2), include_noise=False)
    mc = mc.reshape(20000, 4, -1).mean(0)
    np.testing.assert_allclose(np.asarray(m_pred), np.asarray(mc), atol=5e-3)
