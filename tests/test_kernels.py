import jax.numpy as jnp
import numpy as np

from rgp_tpu.kernels import RBF, Bias, Linear, Sum, White
from rgp_tpu.params import positive
from rgp_tpu.utils.checkgrad import checkgrad


def _naive_rbf(X, X2, var, ls):
    r2 = ((X[:, None, :] - X2[None, :, :]) / ls) ** 2
    return var * np.exp(-0.5 * r2.sum(-1))


def test_rbf_matches_naive(rng):
    X = rng.standard_normal((20, 3))
    X2 = rng.standard_normal((15, 3))
    k = RBF(input_dim=3)
    p = k.init(variance=2.0, lengthscale=[0.5, 1.0, 2.0], dtype=jnp.float64)
    var = float(positive(p["log_var"]))
    ls = np.asarray(positive(p["log_ls"]))
    np.testing.assert_allclose(var, 2.0, rtol=1e-12)
    K = np.asarray(k.K(p, jnp.asarray(X), jnp.asarray(X2)))
    np.testing.assert_allclose(K, _naive_rbf(X, X2, var, ls), rtol=1e-8, atol=1e-10)
    Kd = np.asarray(k.Kdiag(p, jnp.asarray(X)))
    np.testing.assert_allclose(Kd, var, rtol=1e-12)


def test_linear_white_bias_sum(rng):
    X = rng.standard_normal((10, 2))
    ks = Sum(
        input_dim=2,
        parts=(RBF(input_dim=2), Linear(input_dim=2), White(input_dim=2), Bias(input_dim=2)),
    )
    p = ks.init(dtype=jnp.float64)
    K = np.asarray(ks.K(p, jnp.asarray(X)))
    # manual sum
    manual = sum(np.asarray(k.K(pk, jnp.asarray(X))) for k, pk in zip(ks.parts, p))
    np.testing.assert_allclose(K, manual, rtol=1e-12)
    # diag consistency
    np.testing.assert_allclose(np.diag(K), np.asarray(ks.Kdiag(p, jnp.asarray(X))), rtol=1e-10)


def test_active_dims(rng):
    X = rng.standard_normal((8, 4))
    k = RBF(input_dim=2, active_dims=(1, 3))
    p = k.init(dtype=jnp.float64)
    K = np.asarray(k.K(p, jnp.asarray(X)))
    K2 = np.asarray(RBF(input_dim=2).K(p, jnp.asarray(X[:, [1, 3]])))
    np.testing.assert_allclose(K, K2, rtol=1e-12)


def test_kernel_grads(rng):
    X = jnp.asarray(rng.standard_normal((12, 3)))
    W = jnp.asarray(rng.standard_normal((12, 12)))
    for k in [RBF(input_dim=3), Linear(input_dim=3)]:
        p = k.init(dtype=jnp.float64)

        def f(p_):
            return jnp.sum(k.K(p_, X) * W)

        res = checkgrad(f, p, eps=1e-6)
        assert res.max_rel_err < 1e-5, (type(k).__name__, res.max_rel_err)
