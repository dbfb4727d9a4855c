import jax
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


# ------------------------------------------------- extended kernel library


def _naive_dist(X, X2, ls):
    return np.sqrt((((X[:, None, :] - X2[None, :, :]) / ls) ** 2).sum(-1))


def test_matern_ratquad_exponential_match_naive(rng):
    from rgp_tpu.kernels import Exponential, Matern32, Matern52, RatQuad

    X = rng.standard_normal((15, 3))
    X2 = rng.standard_normal((12, 3))
    ls = np.array([0.6, 1.2, 2.0])
    for k, fn in [
        (Exponential(input_dim=3), lambda r: np.exp(-r)),
        (Matern32(input_dim=3), lambda r: (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)),
        (
            Matern52(input_dim=3),
            lambda r: (1 + np.sqrt(5) * r + 5 * r**2 / 3) * np.exp(-np.sqrt(5) * r),
        ),
    ]:
        p = k.init(variance=1.7, lengthscale=ls, dtype=jnp.float64)
        K = np.asarray(k.K(p, jnp.asarray(X), jnp.asarray(X2)))
        r = _naive_dist(X, X2, ls)
        np.testing.assert_allclose(K, 1.7 * fn(r), rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(k.Kdiag(p, jnp.asarray(X))), 1.7, rtol=1e-12)

    k = RatQuad(input_dim=3)
    p = k.init(variance=1.7, lengthscale=ls, power=1.5, dtype=jnp.float64)
    K = np.asarray(k.K(p, jnp.asarray(X), jnp.asarray(X2)))
    r2 = _naive_dist(X, X2, ls) ** 2
    np.testing.assert_allclose(K, 1.7 * (1 + r2 / 3.0) ** (-1.5), rtol=1e-8)


def test_std_periodic_and_mlp_match_naive(rng):
    from rgp_tpu.kernels import MLP, StdPeriodic

    X = rng.standard_normal((10, 2))
    X2 = rng.standard_normal((8, 2))
    per, ls = np.array([1.3, 0.7]), np.array([0.9, 1.4])
    k = StdPeriodic(input_dim=2)
    p = k.init(variance=2.0, period=per, lengthscale=ls, dtype=jnp.float64)
    K = np.asarray(k.K(p, jnp.asarray(X), jnp.asarray(X2)))
    s2 = np.sin(np.pi * (X[:, None, :] - X2[None, :, :]) / per) ** 2
    np.testing.assert_allclose(K, 2.0 * np.exp(-2 * (s2 / ls**2).sum(-1)), rtol=1e-8)

    k = MLP(input_dim=2)
    p = k.init(variance=1.5, weight_variance=2.0, bias_variance=0.5, dtype=jnp.float64)
    K = np.asarray(k.K(p, jnp.asarray(X), jnp.asarray(X2)))
    num = 2.0 * X @ X2.T + 0.5
    dx = 2.0 * (X * X).sum(-1) + 1.5
    dx2 = 2.0 * (X2 * X2).sum(-1) + 1.5
    naive = 1.5 * (2 / np.pi) * np.arcsin(num / np.sqrt(dx[:, None] * dx2[None, :]))
    np.testing.assert_allclose(K, naive, rtol=1e-8)
    # Kdiag must equal diag(K(X, X))
    np.testing.assert_allclose(
        np.asarray(k.Kdiag(p, jnp.asarray(X))),
        np.diag(np.asarray(k.K(p, jnp.asarray(X)))),
        rtol=1e-10,
    )


def test_extended_kernels_psd_and_grads(rng):
    from rgp_tpu.kernels import MLP, Exponential, Matern32, Matern52, RatQuad, StdPeriodic

    X = jnp.asarray(rng.standard_normal((12, 2)))
    W = jnp.asarray(rng.standard_normal((12, 12)))
    for k in [
        Exponential(input_dim=2),
        Matern32(input_dim=2),
        Matern52(input_dim=2),
        RatQuad(input_dim=2),
        StdPeriodic(input_dim=2),
        MLP(input_dim=2),
    ]:
        p = k.init(dtype=jnp.float64)
        K = np.asarray(k.K(p, X))
        np.testing.assert_allclose(K, K.T, rtol=1e-12)
        evals = np.linalg.eigvalsh(K + 1e-10 * np.eye(12))
        assert evals.min() > -1e-8, (type(k).__name__, evals.min())
        np.testing.assert_allclose(np.diag(K), np.asarray(k.Kdiag(p, X)), rtol=1e-6)

        def f(p_, k=k):
            return jnp.sum(k.K(p_, X) * W)

        res = checkgrad(f, p, eps=1e-6)
        assert res.max_rel_err < 1e-5, (type(k).__name__, res.max_rel_err)
        # grads finite including the r=0 diagonal path
        g = jax.grad(f)(p)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf))), type(k).__name__


def test_generic_kernel_sparse_gp_narx(rng):
    """Any kernel works end-to-end on certain inputs: GP-NARX with Matern52
    (generic K-based psi path; capability beyond GPy's psi_comp whitelist)."""
    from rgp_tpu.kernels import Matern52
    from rgp_tpu.models import gp_narx
    from rgp_tpu.ops.psi_stats import has_closed_psi, psi_statistics

    k = Matern52(input_dim=4)
    assert not has_closed_psi(k)
    p = k.init(dtype=jnp.float64)
    mu = jnp.asarray(rng.standard_normal((30, 4)))
    Z = jnp.asarray(rng.standard_normal((7, 4)))
    st = psi_statistics(k, p, Z, mu, None, block=None)
    K = k.K(p, mu, Z)
    np.testing.assert_allclose(np.asarray(st.psi1), np.asarray(K), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st.psi2), np.asarray(K.T @ K), rtol=1e-10)

    T = 120
    u = np.sin(0.3 * np.arange(T))[:, None]
    y = np.zeros((T, 1))
    for t in range(1, T):
        y[t] = 0.8 * y[t - 1] + 0.4 * u[t - 1] + 0.05 * rng.standard_normal()
    cfg = gp_narx.NARXConfig(kernel=Matern52(input_dim=3), num_inducing=10, y_win=2, u_win=1)
    params = gp_narx.init_params(cfg, jnp.asarray(y), jnp.asarray(u), dtype=jnp.float64)
    e0 = gp_narx.elbo(cfg, params, jnp.asarray(y), jnp.asarray(u))
    assert np.isfinite(float(e0))
    g = jax.grad(lambda q: -gp_narx.elbo(cfg, q, jnp.asarray(y), jnp.asarray(u)))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
    means, vs = gp_narx.freerun(
        cfg, params, jnp.asarray(y), jnp.asarray(u), jnp.asarray(u),
        y_init=jnp.asarray(y[-2:]), moment_match=False,
    )
    assert np.all(np.isfinite(np.asarray(means))) and np.all(np.asarray(vs) > 0)
