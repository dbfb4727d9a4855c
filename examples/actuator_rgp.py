"""Config 1 (BASELINE.json:7): 1-layer RGP, RBF-ARD, M=100 on the actuator
dataset — train with Adam, free-simulate, report RMSE.

Replaces the reference's system-identification demo notebook (SURVEY.md S2.1):
    python examples/actuator_rgp.py --iters 3000
"""

import argparse
import json

import jax.numpy as jnp
import numpy as np

import rgp_tpu as rgp
from rgp_tpu.data import datasets
from rgp_tpu.data.windows import Standardizer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10000)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--num-inducing", type=int, default=100)
    args = ap.parse_args()

    d = datasets.actuator()
    sy, su = Standardizer.fit(d.y_train), Standardizer.fit(d.u_train)
    Y = jnp.asarray(sy.transform(d.y_train), jnp.float32)
    U = jnp.asarray(su.transform(d.u_train), jnp.float32)
    Ut = jnp.asarray(su.transform(d.u_test), jnp.float32)

    cfg = rgp.DeepRGP(wins=[0, 10], u_win=10, y_dim=1, u_dim=1,
                      num_inducing=args.num_inducing)
    params = rgp.init(cfg, Y, U)
    import optax

    res = rgp.fit(
        lambda p: -rgp.elbo(cfg, p, Y, U), params, iters=args.iters,
        optimizer=optax.adam(optax.cosine_decay_schedule(args.lr, args.iters, 0.01)),
    )

    means, vars_ = rgp.freerun(cfg, res.params, Y, U, Ut)
    m = sy.inverse(np.asarray(means))
    rmse = float(np.sqrt(np.mean((m - d.y_test) ** 2)))
    print(json.dumps({
        "elbo": [round(float(-res.losses[0]), 2), round(float(-res.losses[-1]), 2)],
        "freerun_rmse": round(rmse, 4),
        "zero_rmse": round(float(np.sqrt(np.mean(d.y_test ** 2))), 4),
    }))


if __name__ == "__main__":
    main()
