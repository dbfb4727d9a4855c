"""Posterior-moment agreement (BASELINE.md row: 'within MC error of a long-run
reference chain'): two independent samplers — vanilla HMC (reference-parity)
and NUTS — must agree on the GP hyperparameter posterior moments."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgp_tpu.kernels import RBF
from rgp_tpu.models import gp
from rgp_tpu.params import ravel
from rgp_tpu.sample.hmc import hmc_sample
from rgp_tpu.sample.nuts import nuts_sample


@pytest.mark.slow
def test_hmc_and_nuts_agree_on_gp_posterior(rng):
    X = jnp.asarray(rng.standard_normal((25, 2)))
    Y = jnp.asarray(
        np.sin(np.asarray(X).sum(-1, keepdims=True)) + 0.15 * rng.standard_normal((25, 1))
    )
    cfg = gp.GPConfig(RBF(input_dim=2))
    params = gp.init_params(cfg, noise=0.2, dtype=jnp.float64)
    flat0, unravel = ravel(params)

    def potential(v):
        return -(gp.log_marginal(cfg, unravel(v), X, Y) - 0.5 * jnp.sum((v / 2.0) ** 2))

    hmc = hmc_sample(
        potential, flat0, jax.random.PRNGKey(0),
        n_samples=3000, n_warmup=500, step_size=0.05, n_leapfrog=15, n_chains=2,
    )
    nuts = nuts_sample(
        potential, flat0, jax.random.PRNGKey(1),
        n_samples=1000, n_warmup=400, n_chains=2, max_depth=7,
    )
    assert np.asarray(hmc.accept_prob).mean() > 0.5
    assert np.asarray(nuts.accept_prob).mean() > 0.5

    s_h = np.asarray(hmc.samples).reshape(-1, flat0.shape[0])
    s_n = np.asarray(nuts.samples).reshape(-1, flat0.shape[0])

    # agreement within a few MC standard errors (generous tau for autocorrelation)
    def se(s):
        return s.std(0) / np.sqrt(s.shape[0] / 20.0)

    tol = 4.0 * np.maximum(se(s_h), se(s_n)) + 1e-3
    np.testing.assert_array_less(np.abs(s_h.mean(0) - s_n.mean(0)), tol)
    # second moments within 30%
    np.testing.assert_allclose(s_h.std(0), s_n.std(0), rtol=0.3)


@pytest.mark.slow
def test_rgp_hyperparameter_posterior_agreement(rng):
    """Flagship-model posterior agreement (VERDICT r1 #10; BASELINE.md
    'posterior agreement' row): HMC (the reference-parity sampler,
    `GPy:GPy/inference/mcmc/hmc.py` [M]) and NUTS must agree on the
    hyperparameter posterior of an actual 1-layer RGP — the VI bound standing
    in for the marginal likelihood exactly as in the reference (SURVEY.md
    S3.5) — not just on a toy exact-GP stand-in."""
    from rgp_tpu import train
    from rgp_tpu.data import datasets
    from rgp_tpu.data.windows import Standardizer
    from rgp_tpu.models import rgp
    from rgp_tpu.sample.api import make_rgp_potential

    d = datasets.actuator(T=96, seed=3)
    sy, su = Standardizer.fit(d.y_train), Standardizer.fit(d.u_train)
    Y = jnp.asarray(sy.transform(d.y_train), jnp.float64)
    U = jnp.asarray(su.transform(d.u_train), jnp.float64)
    cfg = rgp.deep_rgp_config(wins=[0, 2], u_win=2, y_dim=1, u_dim=1, num_inducing=8)
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)
    # short optimize so q(X) is sensible; hypers then sampled around the mode
    res = train.fit_adam(
        lambda p: -rgp.elbo(cfg, p, Y, U, block=None), params,
        iters=300, learning_rate=2e-2,
    )

    potential, flat0, _ = make_rgp_potential(cfg, res.params, Y, U, block=None)
    hmc = hmc_sample(
        potential, flat0, jax.random.PRNGKey(0),
        n_samples=1200, n_warmup=300, step_size=0.02, n_leapfrog=20, n_chains=2,
    )
    nuts = nuts_sample(
        potential, flat0, jax.random.PRNGKey(1),
        n_samples=600, n_warmup=300, n_chains=2, max_depth=6,
    )
    assert np.asarray(hmc.accept_prob).mean() > 0.5
    assert np.asarray(nuts.accept_prob).mean() > 0.5

    s_h = np.asarray(hmc.samples).reshape(-1, flat0.shape[0])
    s_n = np.asarray(nuts.samples).reshape(-1, flat0.shape[0])

    def se(s):
        return s.std(0) / np.sqrt(s.shape[0] / 20.0)

    tol = 4.0 * np.maximum(se(s_h), se(s_n)) + 1e-3
    np.testing.assert_array_less(np.abs(s_h.mean(0) - s_n.mean(0)), tol)
    np.testing.assert_allclose(s_h.std(0), s_n.std(0), rtol=0.3)
