"""Moment-matched uncertain-input prediction vs Monte-Carlo (SURVEY.md S4
item 2: 'moment-matched freerun 1-step vs MC rollout')."""

import jax
import jax.numpy as jnp
import numpy as np

from rgp_tpu.inference.collapsed_vi import posterior, predict_uncertain
from rgp_tpu.kernels import RBF
from rgp_tpu.models import sparse_gp
from rgp_tpu.ops.psi_stats import psi_statistics


def test_one_step_moment_match_vs_mc(rng):
    """E[f(x*)] and Var[f(x*)] under x* ~ N(mu*, s*) from the closed forms must
    match Monte-Carlo through the certain-input sparse-GP predictive."""
    T, Q, M = 60, 2, 12
    X = jnp.asarray(rng.standard_normal((T, Q)))
    Y = jnp.asarray(np.sin(2.0 * np.asarray(X)[:, :1]) + 0.05 * rng.standard_normal((T, 1)))
    kern = RBF(input_dim=Q)
    cfg = sparse_gp.SparseGPConfig(kern, M)
    params = sparse_gp.init_params(cfg, np.asarray(X), noise=0.05, dtype=jnp.float64)

    stats = psi_statistics(kern, params["kern"], params["Z"], X, None, block=None)
    post = posterior(kern, params["kern"], params["Z"], params["log_noise"], stats, Y)

    mu_s = jnp.asarray(rng.standard_normal((5, Q)) * 0.8)
    s_s = jnp.asarray(rng.uniform(0.02, 0.15, (5, Q)))

    mm_mean, mm_var = predict_uncertain(
        kern, params["kern"], params["Z"], params["log_noise"], post,
        mu_s, s_s, include_noise=False,
    )

    # MC: sample x* ~ N(mu*, s*), evaluate the CERTAIN-input predictive
    # (mean AND epistemic variance), combine by the law of total variance.
    # 15k samples keep the MC error ~2.5x under the tolerances below.
    n_mc = 15_000
    key = jax.random.PRNGKey(0)
    xs = mu_s[None] + jnp.sqrt(s_s)[None] * jax.random.normal(key, (n_mc, 5, Q), dtype=mu_s.dtype)
    m_c, v_c = predict_uncertain(
        kern, params["kern"], params["Z"], params["log_noise"], post,
        xs.reshape(-1, Q), None, include_noise=False,
    )
    m_c = m_c.reshape(n_mc, 5, 1)
    v_c = v_c.reshape(n_mc, 5, 1)
    mc_mean = m_c.mean(0)
    mc_var = v_c.mean(0) + m_c.var(0)  # E[Var] + Var[E]

    np.testing.assert_allclose(np.asarray(mm_mean), np.asarray(mc_mean), atol=1.2e-2)
    np.testing.assert_allclose(
        np.asarray(mm_var), np.asarray(mc_var), rtol=1e-1, atol=5e-3
    )


def test_freerun_one_step_consistency(rng):
    """First freerun step equals the direct moment-matched prediction at the
    seeded window state (RGP path)."""
    from rgp_tpu.data import datasets
    from rgp_tpu.data.windows import Standardizer
    from rgp_tpu.models import rgp

    d = datasets.narendra(T=80, seed=0)
    sy, su = Standardizer.fit(d.y_train), Standardizer.fit(d.u_train)
    Y = jnp.asarray(sy.transform(d.y_train), jnp.float64)
    U = jnp.asarray(su.transform(d.u_train), jnp.float64)
    Ut = jnp.asarray(su.transform(d.u_test), jnp.float64)
    cfg = rgp.deep_rgp_config(wins=[0, 3], u_win=2, y_dim=1, u_dim=1, num_inducing=10)
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)

    means, vars_ = rgp.freerun(cfg, params, Y, U, Ut)

    # manual first step
    posts, _ = rgp._posteriors(cfg, params, Y, U)
    mus, lams = rgp._hidden_moments(cfg, params, Y, U)
    lp = params["layers"][0]
    spec = cfg.layers[0]
    L = spec.win
    lam_t = lams[0]
    own_mu = mus[0][-L:][::-1].reshape(1, -1)
    own_s = lam_t[-L:][::-1].reshape(1, -1)
    u0 = jnp.concatenate([Ut[0], U[-1]])[None, :]  # [u_t, u_{t-1}] window
    x_mu = jnp.concatenate([own_mu, u0], axis=-1)
    x_s = jnp.concatenate([own_s, jnp.zeros_like(u0)], axis=-1)
    m1, v1 = predict_uncertain(
        spec.kernel, lp["kern"], lp["Z"], rgp._fln(cfg, lp["log_noise"]), posts[0],
        x_mu, x_s, include_noise=True,
    )
    op = params["out"]
    ym, yv = predict_uncertain(
        cfg.out_kernel, op["kern"], op["Z"], rgp._fln(cfg, op["log_noise"]), posts[-1],
        m1, v1, include_noise=True,
    )
    # rtol 1e-6/1e-4 (was 1e-9): the whitened posterior's eigh is not
    # bit-stable across jit/eager contexts, and with cond(Kmm) ~ 1e11 on this
    # instance the near-null eigenvector rotation perturbs woodbury_inv at the
    # ~1e-6-absolute level (a cancellation both GPy's and our formulas share);
    # 1e-4 still catches any real windowing/indexing logic error (O(1) effects)
    np.testing.assert_allclose(float(means[0, 0]), float(ym[0, 0]), rtol=1e-6)
    np.testing.assert_allclose(float(vars_[0, 0]), float(yv[0, 0]), rtol=1e-4)
