"""Model comparison by tempered-SMC log-evidence (SURVEY.md A.5 "optional
tempering for the marginal-likelihood estimate").

Fits two RGP variants on the actuator data and compares their evidence
estimates log Z = log E_prior[exp(ELBO)] from adaptive-tempering SMC over the
unconstrained kernel hyperparameters.

Run: python examples/evidence_tempered_smc.py [--iters 2000] [--particles 256]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from rgp_tpu import train
from rgp_tpu.data import datasets
from rgp_tpu.data.windows import Standardizer
from rgp_tpu.kernels import RBF, Linear, Sum
from rgp_tpu.models import rgp
from rgp_tpu.sample.api import sample_tempered


def fit_and_evidence(cfg, Y, U, iters, particles, key):
    params = rgp.init_params(cfg, Y, U)
    res = train.fit_adam(
        lambda p: -rgp.elbo(cfg, p, Y, U, block=None), params, iters=iters,
        learning_rate=1e-2,
    )
    tres, _ = sample_tempered(
        cfg, res.params, Y, U, key, n_particles=particles, prior_std=1.0,
        n_moves=3,
    )
    return (float(rgp.elbo(cfg, res.params, Y, U, block=None)), float(tres.log_Z),
            int(tres.n_stages), float(tres.beta_final))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--particles", type=int, default=256)
    args = ap.parse_args()

    d = datasets.load("actuator")
    sy, su = Standardizer.fit(d.y_train), Standardizer.fit(d.u_train)
    Y = jnp.asarray(sy.transform(d.y_train), jnp.float32)
    U = jnp.asarray(su.transform(d.u_train), jnp.float32)

    din = 10 + 10
    variants = {
        "rgp1_rbf": rgp.deep_rgp_config(wins=[0, 10], u_win=10, y_dim=1, u_dim=1,
                                        num_inducing=50),
        "rgp1_rbf_plus_linear": rgp.deep_rgp_config(
            wins=[0, 10], u_win=10, y_dim=1, u_dim=1, num_inducing=50,
            kernels=[Sum(input_dim=din, parts=(RBF(input_dim=din), Linear(input_dim=din)))],
        ),
    }
    key = jax.random.PRNGKey(0)
    for name, cfg in variants.items():
        key, sub = jax.random.split(key)
        elbo, logZ, stages, bf = fit_and_evidence(cfg, Y, U, args.iters, args.particles, sub)
        note = "" if bf >= 1.0 else f"  [TRUNCATED at beta={bf:.3f} — raise max_stages]"
        print(f"{name:>24}: fitted ELBO {elbo:10.1f}   log-evidence {logZ:10.1f} "
              f"({stages} tempering stages){note}")


if __name__ == "__main__":
    main()
