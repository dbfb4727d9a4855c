import jax.numpy as jnp
import numpy as np
import scipy.linalg

from rgp_tpu import linalg


def _rand_pd(rng, n, cond=1e3):
    A = rng.standard_normal((n, n))
    Q, _ = np.linalg.qr(A)
    eig = np.logspace(0, -np.log10(cond), n)
    return (Q * eig) @ Q.T


def test_jitchol_pd(rng):
    A = _rand_pd(rng, 32)
    L = np.asarray(linalg.jitchol(jnp.asarray(A)))
    jitter = 1e-6 * np.mean(np.diag(A))
    np.testing.assert_allclose(L @ L.T, A + jitter * np.eye(32), rtol=1e-9, atol=1e-12)


def test_jitchol_rescues_indefinite(rng):
    A = _rand_pd(rng, 16)
    A = A - 5e-3 * np.eye(16)  # push smallest eigenvalues negative
    w = np.linalg.eigvalsh(A)
    assert w.min() < 0
    L = np.asarray(linalg.jitchol(jnp.asarray(A)))
    assert np.isfinite(L).all()
    # factor corresponds to A + jitter*I for some jitter >= needed
    diff = L @ L.T - A
    offdiag = diff - np.diag(np.diag(diff))
    np.testing.assert_allclose(offdiag, 0, atol=1e-6)


def test_jitchol_batched(rng):
    A = np.stack([_rand_pd(rng, 8) for _ in range(4)])
    L = np.asarray(linalg.jitchol(jnp.asarray(A)))
    for i in range(4):
        jitter = 1e-6 * np.mean(np.diag(A[i]))
        np.testing.assert_allclose(
            L[i] @ L[i].T, A[i] + jitter * np.eye(8), rtol=1e-9, atol=1e-12
        )


def test_solves(rng):
    A = _rand_pd(rng, 24)
    B = rng.standard_normal((24, 3))
    L = np.linalg.cholesky(A)
    x = np.asarray(linalg.cho_solve(jnp.asarray(L), jnp.asarray(B)))
    np.testing.assert_allclose(A @ x, B, rtol=1e-6, atol=1e-8)

    y = np.asarray(linalg.solve_triangular(jnp.asarray(L), jnp.asarray(B)))
    np.testing.assert_allclose(
        y, scipy.linalg.solve_triangular(L, B, lower=True), rtol=1e-8
    )
    yt = np.asarray(linalg.solve_triangular(jnp.asarray(L), jnp.asarray(B), trans=True))
    np.testing.assert_allclose(
        yt, scipy.linalg.solve_triangular(L.T, B, lower=False), rtol=1e-8
    )


def test_backsub_both_sides(rng):
    A = _rand_pd(rng, 12)
    X = rng.standard_normal((12, 12))
    X = X + X.T
    L = np.linalg.cholesky(A)
    Li = np.linalg.inv(L)
    out_r = np.asarray(linalg.backsub_both_sides(jnp.asarray(L), jnp.asarray(X), "right"))
    np.testing.assert_allclose(out_r, Li @ X @ Li.T, rtol=1e-6, atol=1e-9)
    out_l = np.asarray(linalg.backsub_both_sides(jnp.asarray(L), jnp.asarray(X), "left"))
    np.testing.assert_allclose(out_l, Li.T @ X @ Li, rtol=1e-6, atol=1e-9)


def test_pdinv(rng):
    A = _rand_pd(rng, 16)
    Ainv, L, half_logdet = linalg.pdinv(jnp.asarray(A), jitter0=1e-12)
    np.testing.assert_allclose(np.asarray(Ainv), np.linalg.inv(A), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        2 * float(half_logdet), np.linalg.slogdet(A)[1], rtol=1e-6
    )
