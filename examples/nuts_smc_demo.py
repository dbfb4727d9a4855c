"""Config 5 (BASELINE.json:11): NUTS over kernel hyperparameters + SMC over
latent trajectories, chains/particles sharded over the mesh.

Runs on any device count (1 chip -> multi-host unchanged):
    python examples/nuts_smc_demo.py --chains 8 --particles 256
"""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

import rgp_tpu as rgp
from rgp_tpu.data import datasets
from rgp_tpu.data.windows import Standardizer
from rgp_tpu.sample import api


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--chains", type=int, default=4)
    ap.add_argument("--particles", type=int, default=256)
    ap.add_argument("--samples", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=100)
    args = ap.parse_args()

    d = datasets.narendra(T=200)
    sy, su = Standardizer.fit(d.y_train), Standardizer.fit(d.u_train)
    Y = jnp.asarray(sy.transform(d.y_train), jnp.float32)
    U = jnp.asarray(su.transform(d.u_train), jnp.float32)
    Ut = jnp.asarray(su.transform(d.u_test), jnp.float32)
    Yt = jnp.asarray(sy.transform(d.y_test), jnp.float32)

    cfg = rgp.DeepRGP(wins=[0, 4], u_win=4, y_dim=1, u_dim=1, num_inducing=30)
    params = rgp.init(cfg, Y, U)
    fit = rgp.fit(lambda p: -rgp.elbo(cfg, p, Y, U), params, iters=args.iters,
                  learning_rate=5e-3)

    nuts = api.sample_nuts(
        cfg, fit.params, Y, U, jax.random.PRNGKey(0),
        n_samples=args.samples, n_warmup=args.warmup, n_chains=args.chains,
        max_depth=6, step_size=0.02,
    )
    smc_res = api.smc(
        cfg, fit.params, Y, U, Ut, Yt, jax.random.PRNGKey(1),
        n_particles=args.particles,
    )
    print(json.dumps({
        "nuts_accept": round(float(np.asarray(nuts.accept_prob).mean()), 3),
        "nuts_divergence_rate": round(float(np.asarray(nuts.diverging).mean()), 4),
        "nuts_step_size": round(float(nuts.step_size), 5),
        "posterior_sd_max": round(float(np.asarray(nuts.samples).std(axis=(0, 1)).max()), 4),
        "smc_log_marginal": round(float(smc_res.log_marginal), 2),
        "smc_min_ess": round(float(np.asarray(smc_res.ess_history).min()), 1),
    }))


if __name__ == "__main__":
    main()
