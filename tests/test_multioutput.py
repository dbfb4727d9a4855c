"""Multi-output (Dy > 1) and multi-dim-latent (Q_h > 1) RGP coverage."""

import jax.numpy as jnp
import numpy as np

from rgp_tpu import train
from rgp_tpu.models import rgp


def _data(T=50, Dy=2, Du=1, seed=0):
    rng = np.random.default_rng(seed)
    U = rng.standard_normal((T, Du))
    Y = np.zeros((T, Dy))
    for t in range(2, T):
        Y[t, 0] = 0.6 * Y[t - 1, 0] + np.tanh(U[t - 1, 0]) + 0.05 * rng.standard_normal()
        if Dy > 1:
            Y[t, 1] = 0.4 * Y[t - 1, 1] - 0.5 * Y[t - 1, 0] + 0.05 * rng.standard_normal()
    return jnp.asarray(Y), jnp.asarray(U)


def test_multioutput_rgp_trains_and_freeruns():
    Y, U = _data(Dy=2)
    cfg = rgp.deep_rgp_config(wins=[0, 3], u_win=2, y_dim=2, u_dim=1, num_inducing=10)
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)
    res = train.fit_adam(
        lambda p: -rgp.elbo(cfg, p, Y, U, block=None), params, iters=60,
        learning_rate=1e-2,
    )
    assert float(res.losses[-1]) < float(res.losses[0])
    m, v = rgp.freerun(cfg, res.params, Y, U, U[:20])
    assert m.shape == (20, 2)
    assert np.isfinite(np.asarray(m)).all() and np.all(np.asarray(v) > 0)


def test_multidim_latent_rgp():
    Y, U = _data(Dy=1)
    cfg = rgp.deep_rgp_config(
        wins=[0, 2], u_win=2, y_dim=1, u_dim=1, num_inducing=10, q_dims=[2]
    )
    assert cfg.layers[0].q_dim == 2
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)
    e = float(rgp.elbo(cfg, params, Y, U, block=None))
    assert np.isfinite(e)
    m, v = rgp.freerun(cfg, params, Y, U, U[:10])
    assert m.shape == (10, 1)
    assert np.isfinite(np.asarray(m)).all()


def test_heterogeneous_wins_and_qdims_ordering():
    """wins/q_dims given output-side-first must pair correctly (regression for
    the reversed-zip bug)."""
    Y, U = _data(Dy=1)
    cfg = rgp.deep_rgp_config(
        wins=[0, 4, 2], u_win=3, y_dim=1, u_dim=1, num_inducing=8, q_dims=[3, 1]
    )
    # deepest-first internally: layer 0 is the U-driven one with win=2, q=1
    assert cfg.layers[0].win == 2 and cfg.layers[0].q_dim == 1
    assert cfg.layers[1].win == 4 and cfg.layers[1].q_dim == 3
    # layer 0 input dim: 2*1 + u_win*1 = 5; layer 1: 4*3 + 4*1 = 16
    assert cfg.layers[0].kernel.input_dim == 5
    assert cfg.layers[1].kernel.input_dim == 16
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)
    assert np.isfinite(float(rgp.elbo(cfg, params, Y, U, block=None)))


def test_lbfgs_driver_reference_parity():
    """fit_scipy_lbfgs (the reference's m.optimize('lbfgsb')) improves the bound."""
    Y, U = _data(Dy=1)
    cfg = rgp.deep_rgp_config(wins=[0, 2], u_win=2, y_dim=1, u_dim=1, num_inducing=6)
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)
    e0 = float(rgp.elbo(cfg, params, Y, U, block=None))
    res = train.fit_scipy_lbfgs(
        lambda p: -rgp.elbo(cfg, p, Y, U, block=None), params, max_iters=30
    )
    e1 = float(rgp.elbo(cfg, res.params, Y, U, block=None))
    assert e1 > e0 + 1.0, (e0, e1)


def test_scg_driver_reference_parity(rng):
    """fit_scg (the reference's m.optimize('scg'), Moller 1993) — monotone
    non-increasing loss trajectory, quadratic solved to high accuracy, and
    bound improvement on the RGP ELBO."""
    # exact quadratic: SCG must reach the optimum fast
    A = rng.standard_normal((8, 8))
    Q = jnp.asarray(A @ A.T + 8 * np.eye(8))
    b = jnp.asarray(rng.standard_normal(8))
    w_star = jnp.linalg.solve(Q, b)

    res = train.fit_scg(
        lambda w: 0.5 * w @ Q @ w - b @ w, jnp.zeros(8), iters=60, jit=True
    )
    np.testing.assert_allclose(np.asarray(res.params), np.asarray(w_star), atol=1e-8)
    losses = np.asarray(res.losses)
    assert np.all(np.diff(losses) <= 1e-12), "SCG loss must be monotone"

    # RGP ELBO improvement (same harness as the L-BFGS parity test)
    Y, U = _data(Dy=1)
    cfg = rgp.deep_rgp_config(wins=[0, 2], u_win=2, y_dim=1, u_dim=1, num_inducing=6)
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)
    e0 = float(rgp.elbo(cfg, params, Y, U, block=None))
    res = train.fit_scg(
        lambda p: -rgp.elbo(cfg, p, Y, U, block=None), params, iters=60
    )
    e1 = float(rgp.elbo(cfg, res.params, Y, U, block=None))
    assert e1 > e0 + 1.0, (e0, e1)
    assert np.all(np.diff(np.asarray(res.losses)) <= 1e-9)
