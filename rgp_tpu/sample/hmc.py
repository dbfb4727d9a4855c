"""Hamiltonian Monte Carlo over unconstrained hyperparameters.

Rebuilds `GPy:GPy/inference/mcmc/hmc.py` (``HMC``, ``HMC_shortcut`` [M];
SURVEY.md S2.2, S3.5): vanilla leapfrog HMC whose potential is the negative
model ELBO (the VI bound stands in for the marginal likelihood) plus prior
and softplus-Jacobian terms, in the flat unconstrained space (SURVEY.md A.5).

TPU-native differences: the whole sampler is a ``lax.scan`` under ``jit``;
chains vectorize with ``vmap`` and shard over the mesh 'chain' axis
(SURVEY.md S2.4 "Chain parallel").
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["hmc_sample", "HMCResult"]


class HMCResult(NamedTuple):
    samples: jnp.ndarray  # (n_chains, n_samples, dim)
    accept_prob: jnp.ndarray  # (n_chains, n_samples)
    potential: jnp.ndarray  # (n_chains, n_samples)


def _leapfrog(potential_fn, z, r, step_size, n_steps, mass_inv):
    """Standard leapfrog: opening half-kick, full drift+kick steps, closing
    half-kick — ONE gradient evaluation per step (adjacent half-kicks fused;
    the naive kick-drift-kick loop costs two grads per step)."""
    grad = jax.grad(potential_fn)

    r = r - 0.5 * step_size * grad(z)
    z = z + step_size * mass_inv * r

    def body(_, carry):
        z, r = carry
        r = r - step_size * grad(z)
        z = z + step_size * mass_inv * r
        return z, r

    z, r = jax.lax.fori_loop(0, n_steps - 1, body, (z, r))
    r = r - 0.5 * step_size * grad(z)
    return z, r


def hmc_sample(
    potential_fn: Callable,
    z0,
    key,
    *,
    n_samples: int = 500,
    n_warmup: int = 0,
    step_size: float = 0.01,
    n_leapfrog: int = 20,
    mass: Optional[jnp.ndarray] = None,
    n_chains: int = 1,
) -> HMCResult:
    """Run HMC chains. ``z0``: (dim,) or (n_chains, dim) initial states.

    ``mass``: diagonal mass matrix (dim,). Returns post-warmup samples.
    """
    z0 = jnp.atleast_2d(z0)
    if z0.shape[0] != n_chains:
        z0 = jnp.broadcast_to(z0, (n_chains, z0.shape[-1]))
    dim = z0.shape[-1]
    mass = jnp.ones(dim, z0.dtype) if mass is None else mass
    mass_inv = 1.0 / mass

    def one_step(carry, key):
        z, U = carry
        k1, k2, k3 = jax.random.split(key, 3)
        r = jnp.sqrt(mass) * jax.random.normal(k1, (dim,), z.dtype)
        H0 = U + 0.5 * jnp.sum(mass_inv * r * r)
        # jittered trajectory length (uniform in [1, n_leapfrog]) breaks the
        # periodic-resonance pathology of fixed-length HMC on near-Gaussian
        # targets (standard practice; Neal 2011 S3.2)
        n_steps = jax.random.randint(k3, (), 1, n_leapfrog + 1)
        z_new, r_new = _leapfrog(potential_fn, z, r, step_size, n_steps, mass_inv)
        U_new = potential_fn(z_new)
        H_new = U_new + 0.5 * jnp.sum(mass_inv * r_new * r_new)
        log_accept = jnp.minimum(0.0, H0 - H_new)
        log_accept = jnp.where(jnp.isnan(log_accept), -jnp.inf, log_accept)
        accept = jnp.log(jax.random.uniform(k2)) < log_accept
        z = jnp.where(accept, z_new, z)
        U = jnp.where(accept, U_new, U)
        return (z, U), (z, jnp.exp(log_accept), U)

    def run_chain(z_init, chain_key):
        U0 = potential_fn(z_init)
        keys = jax.random.split(chain_key, n_warmup + n_samples)
        (_, _), (zs, accs, Us) = jax.lax.scan(one_step, (z_init, U0), keys)
        return zs[n_warmup:], accs[n_warmup:], Us[n_warmup:]

    chain_keys = jax.random.split(key, n_chains)
    zs, accs, Us = jax.vmap(run_chain)(z0, chain_keys)
    return HMCResult(samples=zs, accept_prob=accs, potential=Us)
