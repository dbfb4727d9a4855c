"""Psi-statistic tests: MC oracle, s->0 degeneration, checkgrad (SURVEY.md S4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgp_tpu.kernels import RBF, Bias, Linear, Sum, White
from rgp_tpu.ops.psi_stats import psi2_per_t, psi_statistics
from rgp_tpu.utils.checkgrad import checkgrad


def _setup(rng, T=5, M=4, Q=3):
    mu = jnp.asarray(rng.standard_normal((T, Q)))
    s = jnp.asarray(rng.uniform(0.05, 0.5, (T, Q)))
    Z = jnp.asarray(rng.standard_normal((M, Q)))
    return mu, s, Z


def _mc_psi(kern, p, Z, mu, s, n_samples=150_000, seed=0):
    """Monte-Carlo estimates of Psi0/Psi1/Psi2 per t."""
    key = jax.random.PRNGKey(seed)
    T, Q = mu.shape
    x = mu[None] + jnp.sqrt(s)[None] * jax.random.normal(key, (n_samples, T, Q), dtype=mu.dtype)
    xf = x.reshape(-1, Q)
    Kxz = kern.K(p, xf, Z).reshape(n_samples, T, -1)
    Kdiag = kern.Kdiag(p, xf).reshape(n_samples, T)
    psi0 = Kdiag.mean(0)
    psi1 = Kxz.mean(0)
    psi2 = jnp.einsum("stm,stn->tmn", Kxz, Kxz) / n_samples
    return np.asarray(psi0), np.asarray(psi1), np.asarray(psi2)


@pytest.mark.parametrize(
    "kern_fn",
    [
        lambda: RBF(input_dim=3),
        lambda: Linear(input_dim=3),
        lambda: Sum(input_dim=3, parts=(RBF(input_dim=3), White(input_dim=3), Bias(input_dim=3))),
        lambda: Sum(input_dim=3, parts=(Linear(input_dim=3), Bias(input_dim=3))),
    ],
)
def test_psi_vs_monte_carlo(rng, kern_fn):
    kern = kern_fn()
    p = kern.init(dtype=jnp.float64)
    mu, s, Z = _setup(rng)
    stats = psi_statistics(kern, p, Z, mu, s, block=None)
    p2t = psi2_per_t(kern, p, Z, mu, s)
    mc0, mc1, mc2 = _mc_psi(kern, p, Z, mu, s)
    # White kernel: psi0 includes the white variance but MC through K(x,Z) does not
    # see it off-diagonal; Kdiag does include it, so all three comparisons hold.
    np.testing.assert_allclose(np.asarray(stats.psi0), mc0, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(stats.psi1), mc1, rtol=3e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(p2t), mc2, rtol=8e-2, atol=4e-2)
    np.testing.assert_allclose(
        np.asarray(stats.psi2), np.asarray(p2t).sum(0), rtol=1e-10, atol=1e-12
    )


@pytest.mark.parametrize("kern_fn", [lambda: RBF(input_dim=3), lambda: Linear(input_dim=3)])
def test_s_zero_degeneration(rng, kern_fn):
    """s->0 => Psi1 = K(mu,Z), Psi2 = K^T K (SURVEY.md A.2)."""
    kern = kern_fn()
    p = kern.init(dtype=jnp.float64)
    mu, _, Z = _setup(rng, T=30)
    stats = psi_statistics(kern, p, Z, mu, None, block=None)
    K = kern.K(p, mu, Z)
    np.testing.assert_allclose(np.asarray(stats.psi1), np.asarray(K), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(stats.psi2), np.asarray(K.T @ K), rtol=1e-8, atol=1e-10
    )


def test_chunked_psi2_matches_dense(rng):
    kern = RBF(input_dim=3)
    p = kern.init(dtype=jnp.float64)
    mu, s, Z = _setup(rng, T=100)
    dense = psi_statistics(kern, p, Z, mu, s, block=None).psi2
    chunked = psi_statistics(kern, p, Z, mu, s, block=32).psi2
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense), rtol=1e-10)
    # prefer="scan" (the vmap-safe escape from the measured dense-dispatch
    # policy, used by the 1024-chain NUTS potential) must agree exactly
    forced = psi_statistics(kern, p, Z, mu, s, block=32, prefer="scan").psi2
    np.testing.assert_allclose(np.asarray(forced), np.asarray(dense), rtol=1e-10)


def test_psi_grads(rng):
    """Gradients w.r.t. hyperparams, Z, mu, s via checkgrad (reference oracle)."""
    kern = RBF(input_dim=2)
    mu, s, Z = _setup(rng, T=6, M=3, Q=2)
    W1 = jnp.asarray(rng.standard_normal((6, 3)))
    W2 = jnp.asarray(rng.standard_normal((3, 3)))
    params = {"kern": kern.init(dtype=jnp.float64), "Z": Z, "mu": mu, "log_s": jnp.log(s)}

    def f(q):
        st = psi_statistics(kern, q["kern"], q["Z"], q["mu"], jnp.exp(q["log_s"]), block=None)
        return jnp.sum(st.psi0) + jnp.sum(st.psi1 * W1) + jnp.sum(st.psi2 * W2)

    res = checkgrad(f, params, eps=1e-6)
    assert res.max_rel_err < 1e-5, res.max_rel_err


# ------------------------------------------------------- additive cross terms


def _perturb(rng, p):
    """Randomize hyperparameters away from init defaults (stronger oracle)."""
    return jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(rng.uniform(-0.4, 0.4, np.shape(a))), p
    )


@pytest.mark.parametrize(
    "kern_fn",
    [
        lambda: Sum(input_dim=3, parts=(RBF(input_dim=3), Linear(input_dim=3))),
        lambda: Sum(
            input_dim=3,
            parts=(RBF(input_dim=2, active_dims=(0, 1)), Linear(input_dim=2, active_dims=(1, 2))),
        ),
        lambda: Sum(
            input_dim=3,
            parts=(RBF(input_dim=2, active_dims=(0, 1)), RBF(input_dim=3, ard=False)),
        ),
        lambda: Sum(
            input_dim=3,
            parts=(Linear(input_dim=2, active_dims=(1, 2)), Linear(input_dim=3)),
        ),
        lambda: Sum(
            input_dim=3,
            parts=(RBF(input_dim=3), Linear(input_dim=3), Bias(input_dim=3)),
        ),
    ],
)
def test_cross_psi2_vs_monte_carlo(rng, kern_fn):
    """Additive-kernel psi2 cross terms (RBFxLinear, RBFxRBF, LinearxLinear)
    vs MC — capability the reference raises NotImplementedError for
    (`GPy:GPy/kern/src/add.py` [M])."""
    kern = kern_fn()
    p = _perturb(rng, kern.init(dtype=jnp.float64))
    mu, s, Z = _setup(rng)
    stats = psi_statistics(kern, p, Z, mu, s, block=None)
    p2t = psi2_per_t(kern, p, Z, mu, s)
    mc0, mc1, mc2 = _mc_psi(kern, p, Z, mu, s, n_samples=250_000)
    np.testing.assert_allclose(np.asarray(stats.psi0), mc0, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(stats.psi1), mc1, rtol=3e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(p2t), mc2, rtol=8e-2, atol=6e-2)
    np.testing.assert_allclose(
        np.asarray(stats.psi2), np.asarray(p2t).sum(0), rtol=1e-10, atol=1e-12
    )


def test_cross_psi2_grads(rng):
    kern = Sum(input_dim=2, parts=(RBF(input_dim=2), Linear(input_dim=2)))
    mu, s, Z = _setup(rng, T=6, M=3, Q=2)
    W2 = jnp.asarray(rng.standard_normal((3, 3)))
    params = {"kern": kern.init(dtype=jnp.float64), "Z": Z, "mu": mu, "log_s": jnp.log(s)}

    def f(q):
        st = psi_statistics(kern, q["kern"], q["Z"], q["mu"], jnp.exp(q["log_s"]), block=None)
        return jnp.sum(st.psi2 * W2)

    res = checkgrad(f, params, eps=1e-6)
    assert res.max_rel_err < 1e-5, res.max_rel_err


def test_cross_psi2_s_zero_degeneration(rng):
    """s->0: Sum-kernel psi2 must equal K(mu,Z)^T K(mu,Z) including crosses."""
    for kern in [
        Sum(input_dim=3, parts=(RBF(input_dim=3), Linear(input_dim=3))),
        Sum(input_dim=3, parts=(RBF(input_dim=3, ard=False), RBF(input_dim=3))),
    ]:
        p = _perturb(rng, kern.init(dtype=jnp.float64))
        mu, _, Z = _setup(rng, T=30)
        stats = psi_statistics(kern, p, Z, mu, None, block=None)
        K = kern.K(p, mu, Z)
        np.testing.assert_allclose(np.asarray(stats.psi1), np.asarray(K), rtol=1e-9)
        np.testing.assert_allclose(
            np.asarray(stats.psi2), np.asarray(K.T @ K), rtol=1e-8, atol=1e-10
        )


# ------------------------------------------------ product kernels (disjoint)


def test_prod_disjoint_psi_vs_monte_carlo(rng):
    """Uncertain-input psi stats for Prod kernels over disjoint active dims
    (factorized expectations) — GPy has no Prod psi statistics at all."""
    from rgp_tpu.kernels import Prod
    from rgp_tpu.ops.psi_stats import has_closed_psi

    kern = Prod(
        input_dim=3,
        parts=(RBF(input_dim=2, active_dims=(0, 1)), Linear(input_dim=1, active_dims=(2,))),
    )
    assert has_closed_psi(kern)
    p = kern.init(dtype=jnp.float64)
    mu, s, Z = _setup(rng)
    stats = psi_statistics(kern, p, Z, mu, s, block=None)
    p2t = psi2_per_t(kern, p, Z, mu, s)
    mc0, mc1, mc2 = _mc_psi(kern, p, Z, mu, s, n_samples=250_000)
    np.testing.assert_allclose(np.asarray(stats.psi0), mc0, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(stats.psi1), mc1, rtol=3e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(p2t), mc2, rtol=8e-2, atol=6e-2)
    np.testing.assert_allclose(
        np.asarray(stats.psi2), np.asarray(p2t).sum(0), rtol=1e-10, atol=1e-12
    )
    # chunked == dense
    mu2, s2, _ = _setup(rng, T=100)
    dense = psi_statistics(kern, p, Z, mu2, s2, block=None).psi2
    chunked = psi_statistics(kern, p, Z, mu2, s2, block=32).psi2
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense), rtol=1e-10)


def test_prod_overlapping_dims_not_closed(rng):
    from rgp_tpu.kernels import Prod
    from rgp_tpu.ops.psi_stats import has_closed_psi

    kern = Prod(input_dim=3, parts=(RBF(input_dim=3), Linear(input_dim=3)))
    assert not has_closed_psi(kern)
    p = kern.init(dtype=jnp.float64)
    mu, s, Z = _setup(rng)
    with pytest.raises(NotImplementedError):
        psi_statistics(kern, p, Z, mu, s, block=None)
    # but certain inputs fall back to the K path
    st = psi_statistics(kern, p, Z, mu, None, block=None)
    K = kern.K(p, mu, Z)
    np.testing.assert_allclose(np.asarray(st.psi1), np.asarray(K), rtol=1e-12)


def test_kernel_operators(rng):
    """GPy-style `k1 + k2`, `k1 * k2` construction."""
    from rgp_tpu.kernels import Prod

    ka = RBF(input_dim=2, active_dims=(0, 1))
    kb = Linear(input_dim=1, active_dims=(2,))
    ks = ka + kb
    kp = ka * kb
    assert isinstance(ks, Sum) and ks.parts == (ka, kb) and ks.input_dim == 3
    assert isinstance(kp, Prod) and kp.parts == (ka, kb) and kp.input_dim == 3
    # nested flattening
    kc = Bias(input_dim=3)
    assert len((ks + kc).parts) == 3
    assert len((kp * kc).parts) == 3
    X = jnp.asarray(rng.standard_normal((6, 3)))
    ps = ks.init(dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(ks.K(ps, X)),
        np.asarray(ka.K(ps[0], X) + kb.K(ps[1], X)),
        rtol=1e-12,
    )
