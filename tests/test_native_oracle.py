"""Cross-check the JAX implementations against the independent C++ f64 oracle
(native/rgp_oracle.cpp) — the framework's analog of GPy's trusted Cython/BLAS
inner loops (SURVEY.md S2.3)."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_NATIVE = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="module")
def oracle():
    spec = importlib.util.spec_from_file_location(
        "rgp_native_oracle", os.path.join(_NATIVE, "oracle.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_psi_stats_vs_cpp(oracle, rng):
    from rgp_tpu.kernels import RBF
    from rgp_tpu.ops.psi_stats import psi_statistics
    from rgp_tpu.params import positive

    T, M, Q = 23, 11, 4
    kern = RBF(input_dim=Q)
    p = kern.init(variance=1.7, lengthscale=[0.8, 1.1, 1.4, 0.6], dtype=jnp.float64)
    mu = jnp.asarray(rng.standard_normal((T, Q)))
    s = jnp.asarray(rng.uniform(0.05, 0.5, (T, Q)))
    Z = jnp.asarray(rng.standard_normal((M, Q)))

    st = psi_statistics(kern, p, Z, mu, s, block=None)
    c0, c1, c2 = oracle.rbf_psi_stats(
        np.asarray(mu), np.asarray(s), np.asarray(Z),
        np.asarray(positive(p["log_ls"])), float(positive(p["log_var"])),
    )
    np.testing.assert_allclose(np.asarray(st.psi0), c0, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st.psi1), c1, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(st.psi2), c2, rtol=1e-9)


def test_collapsed_bound_vs_cpp(oracle, rng):
    from rgp_tpu.inference.collapsed_vi import collapsed_bound
    from rgp_tpu.kernels import RBF
    from rgp_tpu.ops.psi_stats import psi_statistics
    from rgp_tpu.params import positive, positive_inv

    T, M, Q, D = 30, 8, 3, 2
    kern = RBF(input_dim=Q)
    p = kern.init(dtype=jnp.float64)
    mu = jnp.asarray(rng.standard_normal((T, Q)))
    s = jnp.asarray(rng.uniform(0.05, 0.4, (T, Q)))
    Z = jnp.asarray(rng.standard_normal((M, Q)))
    Y = jnp.asarray(rng.standard_normal((T, D)))
    Yv = jnp.asarray(rng.uniform(0.01, 0.1, (T, D)))
    noise = 0.25
    log_noise = positive_inv(jnp.asarray(noise))

    st = psi_statistics(kern, p, Z, mu, s, block=None)
    Kmm = np.asarray(kern.K(p, Z))
    jitter = 1e-6 * np.mean(np.diag(Kmm))

    # no jitter override: since round 4 the ``jitter`` arg is live (it sets
    # the whitened base Cholesky rung for smooth MCMC potentials); the
    # production training bound uses the dtype default (1e-12 in f64), which
    # is what the oracle's formulation matches at rtol 1e-9
    ours = float(collapsed_bound(kern, p, Z, log_noise, st, Y, Yv))
    # independent C++ implementation of the SAME whitened formulation (its own
    # Jacobi eigensolver, no LAPACK) — exact cross-check of the production math
    cpp_w = oracle.collapsed_bound_whitened(
        Kmm, float(np.sum(np.asarray(st.psi0))), np.asarray(st.psi1),
        np.asarray(st.psi2), np.asarray(Y), np.asarray(Yv),
        float(positive(log_noise)), floor_rel=1e-6,
    )
    np.testing.assert_allclose(ours, cpp_w, rtol=1e-9)
    # the classic jittered C-form (Kmm + beta Psi2) agrees with the whitened
    # bound up to the regularization difference (clamp vs additive jitter),
    # which is bounded by floor-level effects on a well-conditioned instance
    cpp_c = oracle.collapsed_bound(
        Kmm, float(np.sum(np.asarray(st.psi0))), np.asarray(st.psi1),
        np.asarray(st.psi2), np.asarray(Y), np.asarray(Yv),
        float(positive(log_noise)), jitter,
    )
    np.testing.assert_allclose(ours, cpp_c, rtol=1e-5)


def test_systematic_resample_vs_cpp(oracle, rng):
    from rgp_tpu.sample.smc import systematic_resample

    log_w = rng.standard_normal(64)
    key = jax.random.PRNGKey(5)
    idx_jax = np.asarray(systematic_resample(key, jnp.asarray(log_w)))
    u0 = float(jax.random.uniform(key, ()))
    idx_cpp = oracle.systematic_resample(log_w, u0)
    np.testing.assert_array_equal(idx_jax, idx_cpp)
