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
