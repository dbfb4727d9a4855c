"""Model-level sampling APIs: NUTS over RGP hyperparameters, SMC over latent
trajectories, chain-sharded NUTS (config 5, BASELINE.json:11)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgp_tpu.data import datasets
from rgp_tpu.data.windows import Standardizer
from rgp_tpu.models import rgp
from rgp_tpu.parallel import mesh as pmesh
from rgp_tpu.sample import api
from rgp_tpu import train


import functools


@functools.lru_cache(maxsize=1)
def _trained_model_cached():
    return _trained_model()


def _trained_model(T=40, iters=50):
    d = datasets.narendra(T=2 * T, seed=0)
    sy, su = Standardizer.fit(d.y_train), Standardizer.fit(d.u_train)
    Y = jnp.asarray(sy.transform(d.y_train), jnp.float64)
    U = jnp.asarray(su.transform(d.u_train), jnp.float64)
    Ut = jnp.asarray(su.transform(d.u_test), jnp.float64)
    Yt = jnp.asarray(sy.transform(d.y_test), jnp.float64)
    cfg = rgp.deep_rgp_config(wins=[0, 2], u_win=2, y_dim=1, u_dim=1, num_inducing=8)
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)
    res = train.fit_adam(
        lambda p: -rgp.elbo(cfg, p, Y, U, block=None), params, iters=iters,
        learning_rate=1e-2,
    )
    return cfg, res.params, Y, U, Ut, Yt


def test_sample_nuts_on_rgp():
    cfg, params, Y, U, _, _ = _trained_model_cached()
    res = api.sample_nuts(
        cfg, params, Y, U, jax.random.PRNGKey(0),
        n_samples=10, n_warmup=40, n_chains=2, max_depth=4, step_size=0.02,
    )
    assert np.isfinite(np.asarray(res.samples)).all()
    assert np.asarray(res.accept_prob).mean() > 0.4
    # posterior should move: samples not all identical
    assert np.asarray(res.samples).std(axis=(0, 1)).max() > 1e-3


@pytest.mark.slow
def test_sample_nuts_hessian_precondition():
    """Hessian-diagonal mass preconditioning (the stiffness fix measured on
    the flagship potential) must produce a healthy, moving sampler.

    slow: compiles its own warmup graph (~80 s cold); the capability is also
    exercised on the real chip by ``rgp_tpu.bench.sampling``."""
    cfg, params, Y, U, _, _ = _trained_model_cached()
    res = api.sample_nuts(
        cfg, params, Y, U, jax.random.PRNGKey(1),
        n_samples=30, n_warmup=100, n_chains=2, max_depth=5,
        hessian_precondition=True,
    )
    assert np.isfinite(np.asarray(res.samples)).all()
    assert np.asarray(res.accept_prob).mean() > 0.4
    assert np.asarray(res.samples).std(axis=(0, 1)).max() > 1e-3


def test_fixed_whitening_potential_matches():
    """The frozen-basis NUTS potential (bench/sampling.py protocol) equals the
    fresh-eigh potential EXACTLY at the anchor params; away from the anchor it
    is the documented nearby clamp-regularized target (the frozen spectral-
    floor topup no longer matches the drifted spectrum — measured ~0.2%
    relative at 0.05 perturbation), with a gradient field that stays aligned
    with the exact one."""
    cfg, params, Y, U, _, _ = _trained_model_cached()
    pot_ref_, flat0, _ = api.make_rgp_potential(cfg, params, Y, U)
    pot_fix_, _, _ = api.make_rgp_potential(
        cfg, params, Y, U, fixed_whitening=True, psi_prefer="scan", block=8
    )
    pot_ref, pot_fix = jax.jit(pot_ref_), jax.jit(pot_fix_)
    np.testing.assert_allclose(
        float(pot_fix(flat0)), float(pot_ref(flat0)), rtol=1e-9
    )
    v = flat0 + 0.05 * jax.random.normal(jax.random.PRNGKey(3), flat0.shape,
                                         flat0.dtype)
    np.testing.assert_allclose(float(pot_fix(v)), float(pot_ref(v)), rtol=1e-2)
    g_ref = np.asarray(jax.jit(jax.grad(pot_ref_))(v))
    g_fix = np.asarray(jax.jit(jax.grad(pot_fix_))(v))
    cos = float(g_ref @ g_fix / (np.linalg.norm(g_ref) * np.linalg.norm(g_fix)))
    assert cos > 0.99, cos


@pytest.mark.slow  # reference-parity HMC; the NUTS fast-lane test covers
# the sampling path, and this one compiles its own leapfrog graph (~26 s cold)
def test_sample_hmc_on_rgp():
    cfg, params, Y, U, _, _ = _trained_model_cached()
    res = api.sample_hmc(
        cfg, params, Y, U, jax.random.PRNGKey(0),
        n_samples=30, n_warmup=10, step_size=0.005, n_leapfrog=5, n_chains=2,
    )
    assert np.isfinite(np.asarray(res.samples)).all()


def test_smc_on_rgp():
    cfg, params, Y, U, Ut, Yt = _trained_model_cached()
    res = api.smc(
        cfg, params, Y, U, Ut, Yt, jax.random.PRNGKey(0), n_particles=128
    )
    assert np.isfinite(float(res.log_marginal))
    assert np.isfinite(np.asarray(res.particles)).all()
    # a trained model should beat a white-noise log-likelihood per step badly?
    # keep it structural: ESS history bounded by particle count
    assert np.all(np.asarray(res.ess_history) <= 128 + 1e-6)


@pytest.mark.slow  # model-level duplicate of the bitwise sharded-SMC gate
# in test_samplers.py (which stays fast); ~11 s of shard_map compile cold
def test_smc_on_rgp_sharded_matches():
    cfg, params, Y, U, Ut, Yt = _trained_model_cached()
    key = jax.random.PRNGKey(3)
    single = api.smc(cfg, params, Y, U, Ut, Yt, key, n_particles=64)
    m = pmesh.make_mesh(particle=8)
    sharded = api.smc(cfg, params, Y, U, Ut, Yt, key, n_particles=64, mesh=m)
    np.testing.assert_allclose(
        float(sharded.log_marginal), float(single.log_marginal), rtol=1e-7
    )


def test_nuts_sharded_chains():
    """Chain-sharded NUTS over a Gaussian: moments match, shared step size."""
    cov = np.array([[1.0, 0.5], [0.5, 1.2]])
    prec = jnp.asarray(np.linalg.inv(cov))

    def U(z):
        return 0.5 * z @ prec @ z

    m = pmesh.make_mesh(chain=8)
    res = api.nuts_sharded(
        U, jnp.zeros(2), jax.random.PRNGKey(0), m, n_chains=8,
        n_samples=400, n_warmup=250, max_depth=6,
    )
    s = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.2)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.4)
    # step size is shared (replicated scalar)
    assert np.asarray(res.step_size).ndim == 0 or np.asarray(res.step_size).size == 1


@pytest.mark.slow
def test_sample_tempered_on_rgp():
    """Tempered SMC over RGP hyperparameters: finite evidence, particles
    concentrate near (and improve on) the fitted hypers' ELBO region.
    Slow lane: the adaptive-tempering compile is heavy and the tempered path
    is also smoke-covered by examples/evidence_tempered_smc.py."""
    from rgp_tpu.sample.api import sample_tempered

    cfg, params, Y, U, _, _ = _trained_model_cached()
    res, unravel = sample_tempered(
        cfg, params, Y, U, jax.random.PRNGKey(0),
        n_particles=64, prior_std=0.5, n_moves=2, max_stages=20,
    )
    assert np.isfinite(float(res.log_Z))
    assert 1 <= int(res.n_stages) <= 20
    parts = np.asarray(res.particles)
    assert np.all(np.isfinite(parts))
    # posterior particle ELBO should not collapse below the prior-mean ELBO
    from rgp_tpu.models import rgp as rgp_mod
    from rgp_tpu.sample.api import merge_hypers

    e_fit = float(rgp_mod.elbo(cfg, params, Y, U, block=None))
    e_mean = float(
        rgp_mod.elbo(
            cfg, merge_hypers(params, unravel(jnp.asarray(parts.mean(0)))), Y, U, block=None
        )
    )
    assert e_mean > e_fit - 50.0, (e_mean, e_fit)
