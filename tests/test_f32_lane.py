"""The f32 production-numerics lane (VERDICT round-1 item 2; SURVEY.md S4
items 1, 5 and S7 hard-part 1).

The TPU production path runs f32 while the rest of the suite runs f64. These
tests bound the |f32 - f64| relative ELBO error (< 1e-3) across the five
BASELINE config *shapes* and re-assert the sharded-equality gates at f32.
Since :func:`rgp_tpu.inference.collapsed_vi.default_spectral_floor` is
dtype-independent, both dtypes evaluate the SAME regularized model and the
comparison measures pure rounding of the whitened-basis bound.

All tests are marked ``f32`` (run only them with ``pytest -m f32``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgp_tpu.data import datasets
from rgp_tpu.data.windows import Standardizer, np_current_window
from rgp_tpu.models import gp_narx, rgp, svgp
from rgp_tpu.kernels import RBF

pytestmark = pytest.mark.f32

REL_TOL = 1e-3


def _std(a, dtype):
    s = Standardizer.fit(a)
    return jnp.asarray(s.transform(a), dtype)


def _to64(tree):
    return jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float64)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        tree,
    )


def _rel(a, b):
    return abs(a - b) / (1.0 + abs(b))


def _actuator_rgp(T=128, M=32, dtype=jnp.float32):
    """Config-1 shape: 1-layer RGP, RBF-ARD (BASELINE.json:7)."""
    d = datasets.actuator()
    Y = _std(d.y_train[:T], dtype)
    U = _std(d.u_train[:T], dtype)
    cfg = rgp.deep_rgp_config(wins=[0, 10], u_win=10, y_dim=1, u_dim=1, num_inducing=M)
    params = rgp.init_params(cfg, Y, U, dtype=dtype, seed=0)
    return cfg, params, Y, U, d


def _drives_deep(T=64, M=16, dtype=jnp.float32):
    """Config-2 shape: 2-layer deep RGP (BASELINE.json:8)."""
    d = datasets.drives(T=2 * T, seed=7)
    Y = _std(d.y_train, dtype)
    U = _std(d.u_train, dtype)
    cfg = rgp.deep_rgp_config(wins=[0, 2, 2], u_win=2, y_dim=1, u_dim=1, num_inducing=M)
    params = rgp.init_params(cfg, Y, U, dtype=dtype)
    return cfg, params, Y, U


def test_rgp_elbo_f32_tracks_f64_config1():
    cfg, p32, Y32, U32, _ = _actuator_rgp()
    e32 = float(rgp.elbo(cfg, p32, Y32, U32, block=None))
    e64 = float(rgp.elbo(cfg, _to64(p32), _to64(Y32), _to64(U32), block=None))
    assert _rel(e32, e64) < REL_TOL, (e32, e64)


def test_rgp_elbo_f32_tracks_f64_config2_flagship():
    cfg, p32, Y32, U32 = _drives_deep()
    e32 = float(rgp.elbo(cfg, p32, Y32, U32, block=None))
    e64 = float(rgp.elbo(cfg, _to64(p32), _to64(Y32), _to64(U32), block=None))
    assert _rel(e32, e64) < REL_TOL, (e32, e64)


def test_rgp_elbo_f32_tracks_f64_after_training():
    """The hard case: after Adam steps the kernel/Z drift makes Kmm spectra
    decay further — the round-1 C-form failed HERE by ~68 nats."""
    import optax

    cfg, p32, Y32, U32 = _drives_deep()
    opt = optax.adam(1e-2)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(lambda q: -rgp.elbo(cfg, q, Y32, U32, block=None))(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    s = opt.init(p32)
    p = p32
    for _ in range(20):
        p, s, loss = step(p, s)
    assert np.isfinite(float(loss))
    e32 = float(rgp.elbo(cfg, p, Y32, U32, block=None))
    e64 = float(rgp.elbo(cfg, _to64(p), _to64(Y32), _to64(U32), block=None))
    assert _rel(e32, e64) < REL_TOL, (e32, e64)


def test_narx_elbo_f32_tracks_f64_config3():
    d = datasets.actuator()
    Y32 = _std(d.y_train[:128], jnp.float32)
    U32 = _std(d.u_train[:128], jnp.float32)
    cfg = gp_narx.NARXConfig(RBF(input_dim=10), num_inducing=32, y_win=5, u_win=5)
    p32 = gp_narx.init_params(cfg, Y32, U32, dtype=jnp.float32)
    e32 = float(gp_narx.elbo(cfg, p32, Y32, U32, block=None))
    e64 = float(gp_narx.elbo(cfg, _to64(p32), _to64(Y32), _to64(U32), block=None))
    assert _rel(e32, e64) < REL_TOL, (e32, e64)


def test_svgp_minibatch_f32_tracks_f64_config4():
    d = datasets.long_corpus(T=512)
    Y32 = _std(d.y_train, jnp.float32)
    U32 = _std(d.u_train, jnp.float32)
    X32 = jnp.asarray(np_current_window(np.asarray(U32), 4), jnp.float32)
    cfg = svgp.SVGPConfig(RBF(input_dim=4), num_inducing=32)
    p32 = svgp.init_params(cfg, X32, dtype=jnp.float32)
    batch = slice(0, 64)
    e32 = float(svgp.elbo(cfg, p32, X32[batch], Y32[batch], T_total=Y32.shape[0]))
    e64 = float(
        svgp.elbo(cfg, _to64(p32), _to64(X32)[batch], _to64(Y32)[batch],
                  T_total=Y32.shape[0])
    )
    assert _rel(e32, e64) < REL_TOL, (e32, e64)


def test_nuts_potential_f32_tracks_f64_config5():
    from rgp_tpu.sample.api import make_rgp_potential

    cfg, p32, Y32, U32, _ = _actuator_rgp(T=64, M=16)
    pot32, flat32, _ = make_rgp_potential(cfg, p32, Y32, U32)
    pot64, flat64, _ = make_rgp_potential(
        cfg, _to64(p32), _to64(Y32), _to64(U32)
    )
    v32 = float(pot32(flat32))
    v64 = float(pot64(flat64))
    assert _rel(v32, v64) < REL_TOL, (v32, v64)


def test_narx_posterior_f32_uses_psd_factor_path():
    """Round-2 verdict weak #5: ``posterior()`` must assemble Ct from the PSD
    factor Psi1 on certain inputs, matching the bound's factorization — the
    normal-equations form (K^T K before whitening) loses ~1 nat of f32
    logdet/solve accuracy on ill-conditioned NARX designs. Gate: the f32
    posterior's alpha / woodbury_inv track the f64 oracle tightly."""
    from rgp_tpu.data.windows import narx_design
    from rgp_tpu.inference.collapsed_vi import posterior
    from rgp_tpu.ops.psi_stats import psi_statistics

    d = datasets.actuator()
    # long lag windows of a smooth signal => near-duplicate design rows =>
    # ill-conditioned Kmm (the classic NARX failure mode)
    Y32 = _std(d.y_train[:256], jnp.float32)
    U32 = _std(d.u_train[:256], jnp.float32)
    cfg = gp_narx.NARXConfig(RBF(input_dim=24), num_inducing=48, y_win=16, u_win=8)
    p32 = gp_narx.init_params(cfg, Y32, U32, dtype=jnp.float32, noise=0.01)

    def post_of(p, Y, U, certain):
        X, Yt = narx_design(Y, U, cfg.y_win, cfg.u_win)
        stats = psi_statistics(cfg.kernel, p["kern"], p["Z"], X, None, block=None)
        post = posterior(
            cfg.kernel, p["kern"], p["Z"], p["log_noise"], stats, Yt,
            certain=certain,
        )
        return post, X

    post32, X32 = post_of(p32, Y32, U32, True)
    bad32, _ = post_of(p32, Y32, U32, False)  # normal-equations comparison
    p64, Y64, U64 = _to64(p32), _to64(Y32), _to64(U32)
    post64, X64 = post_of(p64, Y64, U64, True)

    def relerr(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b)
        return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)

    # absolute tracking of the f64 oracle (measured: 0.015 / 0.0025 here,
    # vs 0.84 / 1.14 for the normal-equations path on this instance)
    assert relerr(post32.alpha, post64.alpha) < 0.05
    assert relerr(post32.woodbury_inv, post64.woodbury_inv) < 0.02
    # and the factored path must beat the normal-equations one decisively
    assert relerr(post32.alpha, post64.alpha) < 0.2 * relerr(bad32.alpha, post64.alpha)

    # what predictions actually consume: Kxz alpha and the woodbury quad form
    Kxz32 = cfg.kernel.K(p32["kern"], X32[:64], p32["Z"])
    Kxz64 = cfg.kernel.K(p64["kern"], X64[:64], p64["Z"])
    assert relerr(Kxz32 @ post32.alpha, Kxz64 @ post64.alpha) < 1e-3
    q32 = np.einsum("tm,mn,tn->t", Kxz32, post32.woodbury_inv, Kxz32)
    q64 = np.einsum("tm,mn,tn->t", Kxz64, post64.woodbury_inv, Kxz64)
    assert relerr(q32, q64) < 2e-3


# --------------------------------------------------------------- sharded @ f32


def _mesh(axis="data"):
    from rgp_tpu.parallel.mesh import make_mesh

    return make_mesh(**{axis: 8})


def test_sequence_sharded_elbo_f32():
    from rgp_tpu.parallel.sequence import sequence_sharded_rgp_elbo

    cfg, p32, Y32, U32 = _drives_deep(T=64)
    mesh = _mesh()
    ref = float(rgp.elbo(cfg, p32, Y32, U32, block=None))
    seq = float(sequence_sharded_rgp_elbo(cfg, p32, Y32, U32, mesh))
    assert _rel(seq, ref) < REL_TOL, (seq, ref)


def test_data_parallel_elbo_f32():
    from rgp_tpu.inference.collapsed_vi import collapsed_bound
    from rgp_tpu.ops.psi_stats import psi_statistics
    from rgp_tpu.parallel.mesh import data_parallel_collapsed_elbo

    rng = np.random.default_rng(3)
    T, M, Q = 64, 16, 3
    kern = RBF(input_dim=Q)
    kp = kern.init(dtype=jnp.float32)
    Z = jnp.asarray(rng.standard_normal((M, Q)), jnp.float32)
    Xm = jnp.asarray(rng.standard_normal((T, Q)), jnp.float32)
    Xs = jnp.asarray(0.05 * rng.random((T, Q)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((T, 1)), jnp.float32)
    ln = jnp.asarray(-2.0, jnp.float32)
    stats = psi_statistics(kern, kp, Z, Xm, Xs, block=None)
    ref = float(collapsed_bound(kern, kp, Z, ln, stats, Y))
    sh = float(
        data_parallel_collapsed_elbo(kern, kp, Z, ln, Xm, Xs, Y, None, _mesh())
    )
    assert _rel(sh, ref) < REL_TOL, (sh, ref)


def test_inducing_sharded_elbo_f32():
    from rgp_tpu.inference.collapsed_vi import collapsed_bound
    from rgp_tpu.ops.psi_stats import psi_statistics
    from rgp_tpu.parallel.inducing import inducing_sharded_collapsed_elbo

    rng = np.random.default_rng(4)
    T, M, Q = 48, 16, 3
    kern = RBF(input_dim=Q)
    kp = kern.init(dtype=jnp.float32)
    Z = jnp.asarray(rng.standard_normal((M, Q)), jnp.float32)
    Xm = jnp.asarray(rng.standard_normal((T, Q)), jnp.float32)
    Xs = jnp.asarray(0.05 * rng.random((T, Q)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((T, 1)), jnp.float32)
    ln = jnp.asarray(-2.0, jnp.float32)
    stats = psi_statistics(kern, kp, Z, Xm, Xs, block=None)
    ref = float(collapsed_bound(kern, kp, Z, ln, stats, Y))
    sh = float(
        inducing_sharded_collapsed_elbo(kern, kp, Z, ln, Xm, Xs, Y, None, _mesh())
    )
    assert _rel(sh, ref) < REL_TOL, (sh, ref)


def test_freerun_f32_finite_and_tracks_f64():
    cfg, p32, Y32, U32, d = _actuator_rgp(T=128, M=16)
    su = Standardizer.fit(d.u_train[:128])
    Ut32 = jnp.asarray(su.transform(d.u_test[:64]), jnp.float32)
    m32, v32 = rgp.freerun(cfg, p32, Y32, U32, Ut32)
    assert np.isfinite(np.asarray(m32)).all() and np.isfinite(np.asarray(v32)).all()
    assert (np.asarray(v32) > 0).all()
    m64, v64 = rgp.freerun(
        cfg, _to64(p32), _to64(Y32), _to64(U32), _to64(Ut32)
    )
    # closed-loop rollouts compound rounding; demand trajectory-level, not
    # pointwise, agreement
    rms = float(jnp.sqrt(jnp.mean((m32.astype(jnp.float64) - m64) ** 2)))
    scale = float(jnp.sqrt(jnp.mean(m64**2)) + 1e-9)
    assert rms / scale < 5e-2, (rms, scale)
