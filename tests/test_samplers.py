"""Sampler tests: HMC/NUTS on analytic targets, NUTS on GP hyperparameters,
SMC vs exact Kalman filter, sharded == single-device (SURVEY.md S4 items 5-6)."""

import jax
import jax.numpy as jnp
import numpy as np

from rgp_tpu.parallel import mesh as pmesh
from rgp_tpu.sample import smc as smc_mod
from rgp_tpu.sample.hmc import hmc_sample
from rgp_tpu.sample.nuts import nuts_sample


# ----------------------------------------------------------------- targets


def _gauss_potential(cov):
    prec = jnp.asarray(np.linalg.inv(cov))

    def U(z):
        return 0.5 * z @ prec @ z

    return U


def test_hmc_gaussian_moments():
    cov = np.array([[1.0, 0.6], [0.6, 2.0]])
    U = _gauss_potential(cov)
    res = hmc_sample(
        U, jnp.zeros(2), jax.random.PRNGKey(0),
        n_samples=1200, n_warmup=150, step_size=0.4, n_leapfrog=12, n_chains=4,
    )
    s = np.asarray(res.samples).reshape(-1, 2)
    assert np.asarray(res.accept_prob).mean() > 0.6
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.3)


def test_nuts_gaussian_moments():
    cov = np.array([[1.0, 0.8, 0.0], [0.8, 1.5, 0.3], [0.0, 0.3, 0.5]])
    U = _gauss_potential(cov)
    res = nuts_sample(
        U, jnp.zeros(3), jax.random.PRNGKey(1),
        n_samples=800, n_warmup=400, n_chains=4, max_depth=7,
    )
    s = np.asarray(res.samples).reshape(-1, 3)
    assert not np.asarray(res.diverging).any()
    assert np.asarray(res.accept_prob).mean() > 0.6
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.35)


def test_nuts_mass_adaptation_scales():
    """Badly scaled Gaussian: adapted inverse mass should track the variances."""
    var = np.array([100.0, 0.01])
    U = _gauss_potential(np.diag(var))
    res = nuts_sample(
        U, jnp.zeros(2), jax.random.PRNGKey(2),
        n_samples=500, n_warmup=600, n_chains=2, max_depth=8,
    )
    mi = np.asarray(res.mass_inv)
    # ratio of adapted scales should approximate the variance ratio within 10x
    assert mi[0] / mi[1] > 100.0, mi
    s = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(s.var(0), var, rtol=0.5)


def test_nuts_on_gp_hyperparameters(rng):
    """NUTS over exact-GP hyperparameters: finite, mixing, plausible region."""
    from rgp_tpu.kernels import RBF
    from rgp_tpu.models import gp
    from rgp_tpu.params import ravel

    X = jnp.asarray(rng.standard_normal((30, 2)))
    Y = jnp.asarray(np.sin(np.asarray(X).sum(-1, keepdims=True)) + 0.1 * rng.standard_normal((30, 1)))
    cfg = gp.GPConfig(RBF(input_dim=2))
    params = gp.init_params(cfg, noise=0.2, dtype=jnp.float64)
    flat0, unravel = ravel(params)

    def potential(v):
        return -(gp.log_marginal(cfg, unravel(v), X, Y) - 0.5 * jnp.sum((v / 3.0) ** 2))

    res = nuts_sample(
        potential, flat0, jax.random.PRNGKey(3),
        n_samples=200, n_warmup=200, n_chains=2, max_depth=6,
    )
    assert np.isfinite(np.asarray(res.samples)).all()
    assert np.asarray(res.accept_prob).mean() > 0.5
    assert np.asarray(res.diverging).mean() < 0.2


# --------------------------------------------------------------------- SMC


def _lgssm(T=40, a=0.9, q=0.3, r=0.4, seed=0):
    rng = np.random.default_rng(seed)
    x = np.zeros(T)
    y = np.zeros(T)
    x_prev = 0.0
    for t in range(T):
        x[t] = a * x_prev + q * rng.standard_normal()
        y[t] = x[t] + r * rng.standard_normal()
        x_prev = x[t]
    return x, y


def _kalman_loglik(y, a, q, r):
    """Exact log p(y) for the scalar LGSSM x_t = a x_{t-1} + N(0,q^2), y = x + N(0,r^2)."""
    m, P = 0.0, q**2 / (1 - a**2) if a < 1 else q**2
    m, P = 0.0, q**2  # prior x_1 ~ N(0, q^2) to match the generator
    ll = 0.0
    for t in range(len(y)):
        if t > 0:
            m, P = a * m, a**2 * P + q**2
        S = P + r**2
        ll += -0.5 * np.log(2 * np.pi * S) - 0.5 * (y[t] - m) ** 2 / S
        K = P / S
        m = m + K * (y[t] - m)
        P = (1 - K) * P
    return ll


def _make_lgssm_closures(y, a, q, r):
    y = jnp.asarray(y)

    def transition_sample(keys, parts, t):
        def one(k, x):
            return a * x + q * jax.random.normal(k, x.shape, x.dtype)

        prev = jnp.where(t == 0, jnp.zeros_like(parts), parts)
        return jax.vmap(one)(keys, prev)

    def emission_logpdf(parts, t):
        return (
            -0.5 * jnp.log(2 * jnp.pi * r**2)
            - 0.5 * (y[t] - parts[:, 0]) ** 2 / r**2
        )

    def init_sample(key, n):
        return jnp.zeros((n, 1))

    return transition_sample, emission_logpdf, init_sample


def test_smc_matches_kalman():
    a, q, r = 0.9, 0.3, 0.4
    x, y = _lgssm(T=40, a=a, q=q, r=r)
    exact = _kalman_loglik(y, a, q, r)
    tr, em, init = _make_lgssm_closures(y, a, q, r)
    res = smc_mod.smc_filter(tr, em, init, 40, jax.random.PRNGKey(0), 2048)
    est = float(res.log_marginal)
    assert abs(est - exact) < 0.5, (est, exact)


def test_smc_sharded_matches_single_device():
    a, q, r = 0.9, 0.3, 0.4
    _, y = _lgssm(T=30, a=a, q=q, r=r)
    tr, em, init = _make_lgssm_closures(y, a, q, r)
    key = jax.random.PRNGKey(7)
    single = smc_mod.smc_filter(tr, em, init, 30, key, 512)
    m = pmesh.make_mesh(particle=8)
    sharded = smc_mod.smc_filter_sharded(tr, em, init, 30, key, 512, m)
    np.testing.assert_allclose(
        float(sharded.log_marginal), float(single.log_marginal), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(sharded.particles), np.asarray(single.particles), rtol=1e-8
    )


def test_systematic_resample_properties():
    key = jax.random.PRNGKey(0)
    log_w = jnp.log(jnp.asarray([0.5, 0.25, 0.125, 0.125]))
    idx = smc_mod.systematic_resample(key, log_w)
    counts = np.bincount(np.asarray(idx), minlength=4)
    # systematic resampling: counts within 1 of N*w
    expected = 4 * np.exp(np.asarray(log_w) - 0)
    assert np.all(np.abs(counts - expected) <= 1)


# ---------------------------------------------------------- tempered SMC


def test_tempered_smc_conjugate_gaussian_evidence(rng):
    """Adaptive-tempering SMC (SURVEY.md A.5 'optional tempering'): on a
    conjugate Gaussian model the log-marginal estimate must match the
    analytic evidence and the particles the analytic posterior moments."""
    import scipy.stats

    from rgp_tpu.sample.tempered import smc_tempered

    D, n_obs, sigma = 2, 10, 0.7
    y = rng.standard_normal((n_obs, D)) * 0.9 + 0.4  # arbitrary data

    yj = jnp.asarray(y)

    def log_prior(th):
        return -0.5 * jnp.sum(th * th) - 0.5 * D * jnp.log(2 * jnp.pi)

    def log_lik(th):
        return jnp.sum(
            -0.5 * ((yj - th) / sigma) ** 2 - 0.5 * jnp.log(2 * jnp.pi * sigma**2)
        )

    def init_sample(key, N):
        return jax.random.normal(key, (N, D), jnp.float64)

    res = smc_tempered(
        log_prior, log_lik, init_sample, jax.random.PRNGKey(0), 4096,
        ess_target=0.6, n_moves=4, step_scale=0.6,
    )

    # analytic: per dim, y_vec ~ N(0, sigma^2 I + 1 1^T)
    cov = sigma**2 * np.eye(n_obs) + np.ones((n_obs, n_obs))
    logZ_true = sum(
        scipy.stats.multivariate_normal(mean=np.zeros(n_obs), cov=cov).logpdf(y[:, d])
        for d in range(D)
    )
    assert np.isfinite(float(res.log_Z))
    np.testing.assert_allclose(float(res.log_Z), logZ_true, atol=0.15)

    tau2 = 1.0 / (1.0 + n_obs / sigma**2)
    mu_post = tau2 * y.sum(0) / sigma**2
    parts = np.asarray(res.particles)
    np.testing.assert_allclose(parts.mean(0), mu_post, atol=0.02)
    np.testing.assert_allclose(parts.var(0), tau2, rtol=0.25)

    ns = int(res.n_stages)
    assert 1 <= ns <= 50
    betas = np.asarray(res.betas)[:ns]
    assert betas[-1] == 1.0 and np.all(np.diff(np.concatenate([[0.0], betas])) > 0)
    assert 0.1 < float(res.accept_rate) <= 1.0


def test_tempered_smc_reports_truncation():
    from rgp_tpu.sample.tempered import smc_tempered

    def log_prior(th):
        return -0.5 * jnp.sum(th * th)

    def log_lik(th):
        return -5000.0 * jnp.sum((th - 3.0) ** 2)  # extremely peaked: slow anneal

    res = smc_tempered(
        log_prior, log_lik,
        lambda k, N: jax.random.normal(k, (N, 2), jnp.float64),
        jax.random.PRNGKey(0), 128, max_stages=3,
    )
    assert int(res.n_stages) == 3 and float(res.beta_final) < 1.0


# --------------------------------------------------------------- diagnostics


def test_diagnostics_iid_and_correlated():
    """split_rhat ~ 1 and ESS ~ N for iid chains; AR(1) shrinks ESS by
    ~(1-rho)/(1+rho); a shifted chain inflates rhat (Vehtari et al. 2021)."""
    import numpy as np

    from rgp_tpu.sample.diagnostics import ess, split_rhat, summarize

    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 1000))
    assert abs(float(split_rhat(x)) - 1.0) < 0.01
    assert 0.8 * 4000 < float(ess(x)) <= 4400

    rho = 0.9
    z = np.zeros((4, 4000))
    e = rng.standard_normal((4, 4000))
    for t in range(1, 4000):
        z[:, t] = rho * z[:, t - 1] + np.sqrt(1 - rho**2) * e[:, t]
    ratio = float(ess(z)) / 16000.0
    assert 0.02 < ratio < 0.12  # theory: (1-rho)/(1+rho) = 0.053

    y = x.copy()
    y[0] += 5.0
    assert float(split_rhat(y)) > 1.5

    s = summarize(rng.standard_normal((4, 500, 3)))
    assert s["max_rhat"] < 1.02 and s["min_ess"] > 1000
