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
