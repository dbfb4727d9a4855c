"""Config 4 (BASELINE.json:10): stochastic minibatch VI + natural gradients on
a long sequence corpus, data-parallel-ready.

    python examples/minibatch_svgp.py --iters 2000 --batch 256
"""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from rgp_tpu import train
from rgp_tpu.data import datasets
from rgp_tpu.data.windows import Standardizer, narx_design
from rgp_tpu.kernels import RBF
from rgp_tpu.models import svgp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--num-inducing", type=int, default=128)
    ap.add_argument("--natgrad-lr", type=float, default=0.3)
    args = ap.parse_args()

    d = datasets.long_corpus()
    sy, su = Standardizer.fit(d.y_train), Standardizer.fit(d.u_train)
    Y = jnp.asarray(sy.transform(d.y_train), jnp.float32)
    U = jnp.asarray(su.transform(d.u_train), jnp.float32)
    X, Yt = narx_design(Y, U, y_win=5, u_win=3)
    T = X.shape[0]

    cfg = svgp.SVGPConfig(RBF(input_dim=X.shape[1]), args.num_inducing)
    params = svgp.init_params(cfg, np.asarray(X), noise=0.2)

    def loss(p, batch):
        Xb, Yb = batch
        return -svgp.elbo(cfg, p, Xb, Yb, T_total=T)

    res = train.fit_minibatch(
        loss, params, (X, Yt),
        iters=args.iters, batch_size=args.batch, key=jax.random.PRNGKey(0),
        learning_rate=5e-3, natgrad_block="qu", natgrad_lr=args.natgrad_lr,
    )
    # held-out one-step prediction
    Yte = jnp.asarray(sy.transform(d.y_test), jnp.float32)
    Ute = jnp.asarray(su.transform(d.u_test), jnp.float32)
    Xte, Yte_t = narx_design(Yte, Ute, y_win=5, u_win=3)
    m, v = svgp.predict(cfg, res.params, Xte, include_noise=True)
    rmse = float(jnp.sqrt(jnp.mean((m - Yte_t) ** 2)))
    print(json.dumps({
        "T_train": T,
        "batch": args.batch,
        "elbo_minibatch": [round(float(-res.losses[0]), 1), round(float(-res.losses[-1]), 1)],
        "one_step_rmse_test": round(rmse, 4),
    }))


if __name__ == "__main__":
    main()
