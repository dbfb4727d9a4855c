import jax.numpy as jnp
import numpy as np

from rgp_tpu.kernels import RBF
from rgp_tpu.models import gp
from rgp_tpu.params import positive
from rgp_tpu.utils.checkgrad import checkgrad


def _data(rng, T=30, Q=2, D=2):
    X = rng.standard_normal((T, Q))
    Y = np.sin(X.sum(-1, keepdims=True)) + 0.1 * rng.standard_normal((T, 1))
    Y = np.concatenate([Y, np.cos(X[:, :1])], axis=1)[:, :D]
    return jnp.asarray(X), jnp.asarray(Y)


def test_log_marginal_matches_naive(rng):
    X, Y = _data(rng)
    cfg = gp.GPConfig(RBF(input_dim=2))
    params = gp.init_params(cfg, noise=0.1, dtype=jnp.float64)
    lm = float(gp.log_marginal(cfg, params, X, Y))

    var = float(positive(params["kern"]["log_var"]))
    ls = np.asarray(positive(params["kern"]["log_ls"]))
    noise = float(positive(params["log_noise"]))
    Xn = np.asarray(X)
    r2 = (((Xn[:, None] - Xn[None, :]) / ls) ** 2).sum(-1)
    K = var * np.exp(-0.5 * r2) + noise * np.eye(len(Xn))
    # jitchol adds jitter0*mean(diag)*I; replicate for an exact comparison
    K = K + 1e-6 * np.mean(np.diag(K)) * np.eye(len(Xn))
    sign, logdet = np.linalg.slogdet(K)
    Yn = np.asarray(Y)
    quad = np.trace(Yn.T @ np.linalg.solve(K, Yn))
    naive = -0.5 * Yn.size * np.log(2 * np.pi) - 0.5 * Yn.shape[1] * logdet - 0.5 * quad
    np.testing.assert_allclose(lm, naive, rtol=1e-9)


def test_gp_checkgrad(rng):
    X, Y = _data(rng, T=15)
    cfg = gp.GPConfig(RBF(input_dim=2))
    params = gp.init_params(cfg, noise=0.5, dtype=jnp.float64)

    def f(p):
        return gp.log_marginal(cfg, p, X, Y)

    res = checkgrad(f, params, eps=1e-6)
    assert res.max_rel_err < 1e-5, res.max_rel_err


def test_predict_interpolates(rng):
    Xn = rng.standard_normal((40, 2))
    Yn = np.sin(Xn.sum(-1, keepdims=True))  # noise-free target
    X, Y = jnp.asarray(Xn), jnp.asarray(Yn)
    cfg = gp.GPConfig(RBF(input_dim=2))
    params = gp.init_params(cfg, noise=1e-4, dtype=jnp.float64)
    mean, var = gp.predict(cfg, params, X, Y, X, include_noise=False)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(Y), atol=2e-2)
    assert np.all(np.asarray(var) >= -1e-9)
    # full covariance PSD
    _, cov = gp.predict(cfg, params, X, Y, X[:10], full_cov=True)
    w = np.linalg.eigvalsh(np.asarray(cov))
    assert w.min() > -1e-8
