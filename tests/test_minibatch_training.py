"""Config 4 end-to-end: minibatch SVI + interleaved natural gradients on a
long sequence (SURVEY.md S3.4, BASELINE.json:10)."""

import jax
import jax.numpy as jnp
import numpy as np

from rgp_tpu import train
from rgp_tpu.data import datasets
from rgp_tpu.data.windows import Standardizer, narx_design
from rgp_tpu.kernels import RBF
from rgp_tpu.models import svgp


def _problem(T=800):
    d = datasets.long_corpus(T=T, seed=1)
    sy, su = Standardizer.fit(d.y_train), Standardizer.fit(d.u_train)
    Y = jnp.asarray(sy.transform(d.y_train), jnp.float64)
    U = jnp.asarray(su.transform(d.u_train), jnp.float64)
    X, Yt = narx_design(Y, U, y_win=3, u_win=2)
    return X, Yt


def test_minibatch_svi_with_natgrad_improves():
    X, Y = _problem()
    T = X.shape[0]
    cfg = svgp.SVGPConfig(RBF(input_dim=X.shape[1]), num_inducing=20)
    params = svgp.init_params(cfg, np.asarray(X), noise=0.3, dtype=jnp.float64)

    def loss(p, batch):
        Xb, Yb = batch
        return -svgp.elbo(cfg, p, Xb, Yb, T_total=T)

    res = train.fit_minibatch(
        loss, params, (X, Y),
        iters=300, batch_size=64, key=jax.random.PRNGKey(0),
        learning_rate=5e-3, natgrad_block="qu", natgrad_lr=0.3,
    )
    assert np.isfinite(np.asarray(res.losses)).all()
    # full-data ELBO must improve substantially
    e0 = float(svgp.elbo(cfg, params, X, Y))
    e1 = float(svgp.elbo(cfg, res.params, X, Y))
    assert e1 > e0 + 10.0, (e0, e1)

    m, v = svgp.predict(cfg, res.params, X, include_noise=False)
    rmse = float(jnp.sqrt(jnp.mean((m - Y) ** 2)))
    assert rmse < 0.5, rmse


def test_minibatch_without_natgrad():
    X, Y = _problem(T=400)
    T = X.shape[0]
    cfg = svgp.SVGPConfig(RBF(input_dim=X.shape[1]), num_inducing=15)
    params = svgp.init_params(cfg, np.asarray(X), noise=0.3, dtype=jnp.float64)

    def loss(p, batch):
        Xb, Yb = batch
        return -svgp.elbo(cfg, p, Xb, Yb, T_total=T)

    res = train.fit_minibatch(
        loss, params, (X, Y),
        iters=200, batch_size=32, key=jax.random.PRNGKey(1), learning_rate=1e-2,
    )
    e0 = float(svgp.elbo(cfg, params, X, Y))
    e1 = float(svgp.elbo(cfg, res.params, X, Y))
    assert e1 > e0


def test_minibatch_aux_trailing_chunk_exact_iters():
    """ADVICE r4: with ``iters % aux_every != 0`` exactly ``iters`` updates
    run (the old padding scheme applied extra updates with duplicated PRNG
    keys). The trailing partial chunk must also produce identical params to
    an equivalent run whose aux_every divides iters evenly — both decompose
    into the same per-step (key, aux-refresh) sequence when aux is
    params-independent."""
    X, Y = _problem(T=300)
    T = X.shape[0]
    cfg = svgp.SVGPConfig(RBF(input_dim=X.shape[1]), num_inducing=8)
    params = svgp.init_params(cfg, np.asarray(X), noise=0.3, dtype=jnp.float64)

    def loss(p, batch, aux=None):
        Xb, Yb = batch
        return -svgp.elbo(cfg, p, Xb, Yb, T_total=T)

    kw = dict(batch_size=16, key=jax.random.PRNGKey(2), learning_rate=1e-2,
              aux_fn=lambda p: 0.0)
    res = train.fit_minibatch(loss, params, (X, Y), iters=25, aux_every=10, **kw)
    assert res.losses.shape == (25,)
    assert np.isfinite(np.asarray(res.losses)).all()
    # aux is constant, so chunking must not change the update sequence
    res_even = train.fit_minibatch(loss, params, (X, Y), iters=25, aux_every=5,
                                   **kw)
    for a, b in zip(jax.tree.leaves(res.params), jax.tree.leaves(res_even.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_minibatch_collapsed_suffstats_route():
    """Config 4, collapsed route (VERDICT r3 #1): the T/B-scaled batch
    sufficient statistics give (a) an estimator of the full collapsed bound
    whose batch-average is close to the exact bound, and (b) a minibatch
    optimizer whose optimum's EXACT full-data bound improves substantially
    (the freerun-quality gate runs on TPU via the harness; this is the
    correctness gate for the estimator + training loop)."""
    from rgp_tpu.inference.collapsed_vi import (
        collapsed_bound_from_suffstats,
    )
    from rgp_tpu.linalg import hdot
    from rgp_tpu.models import sparse_gp
    from rgp_tpu.ops.psi_stats import psi01

    X, Y = _problem(T=600)
    T, D = Y.shape
    kern = RBF(input_dim=X.shape[1])
    cfg = sparse_gp.SparseGPConfig(kern, 16)
    params = sparse_gp.init_params(cfg, np.asarray(X), noise=0.2, dtype=jnp.float64)

    def stoch_bound(p, idx):
        B = idx.shape[0]
        w = T / B
        Xb, Yb = X[idx], Y[idx]
        psi0_b, psi1_b = psi01(kern, p["kern"], p["Z"], Xb, None)
        return collapsed_bound_from_suffstats(
            kern, p["kern"], p["Z"], p["log_noise"],
            w * jnp.sum(psi0_b), w * hdot(psi1_b.T, Yb), None,
            w * jnp.sum(Yb**2), T, D,
            psi1_factor=jnp.sqrt(jnp.asarray(w, psi1_b.dtype)) * psi1_b,
        )

    exact = float(sparse_gp.elbo(cfg, params, X, Y))
    key = jax.random.PRNGKey(0)
    vals = []
    for i in range(24):
        idx = jax.random.randint(jax.random.fold_in(key, i), (128,), 0, T)
        vals.append(float(stoch_bound(params, idx)))
    # biased (nonlinear assembly) but concentrated: batch-mean within a few
    # percent of the exact bound at B=128 of T=600
    rel = abs(np.mean(vals) - exact) / abs(exact)
    assert rel < 0.05, (np.mean(vals), exact)

    def loss(p, batch):
        psi0_b, psi1_b = psi01(kern, p["kern"], p["Z"], batch["X"], None)
        B = batch["X"].shape[0]
        w = T / B
        return -collapsed_bound_from_suffstats(
            kern, p["kern"], p["Z"], p["log_noise"],
            w * jnp.sum(psi0_b), w * hdot(psi1_b.T, batch["Y"]), None,
            w * jnp.sum(batch["Y"] ** 2), T, D,
            psi1_factor=jnp.sqrt(jnp.asarray(w, psi1_b.dtype)) * psi1_b,
        )

    res = train.fit_minibatch(
        loss, params, {"X": X, "Y": Y},
        iters=200, batch_size=96, key=jax.random.PRNGKey(2), learning_rate=1e-2,
    )
    e0 = exact
    e1 = float(sparse_gp.elbo(cfg, res.params, X, Y))
    assert np.isfinite(np.asarray(res.losses)).all()
    assert e1 > e0 + 10.0, (e0, e1)
