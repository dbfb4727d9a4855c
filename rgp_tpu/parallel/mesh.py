"""Device mesh construction and mesh-polymorphic helpers.

The single communication-backend module of the framework (SURVEY.md S2.5,
S5.8): the TPU-native replacement for the reference's optional MPI backend
(N5). Axes:

  'data'     — time-shard / minibatch-shard for data-parallel ELBO (psum of
               additive psi-statistic partial sums, S3.4)
  'chain'    — MCMC chain parallelism (NUTS, S2.4)
  'particle' — SMC particle parallelism (S2.4)

Every entry point takes an optional mesh and behaves identically from one chip
to a multi-host slice: collectives compile onto ICI/DCN by XLA. Multi-host
rendezvous is ``jax.distributed.initialize`` (call :func:`init_distributed`
once per process before creating the mesh).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..inference.collapsed_vi import collapsed_bound_from_suffstats
from ..kernels import Kernel
from ..linalg import hdot
from ..ops.psi_stats import psi_statistics

__all__ = [
    "init_distributed",
    "make_mesh",
    "data_parallel_collapsed_elbo",
    "shard_time",
]


def init_distributed(**kw):
    """Multi-host rendezvous over DCN. No-op if already initialized."""
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError:
        pass  # already initialized


def make_mesh(
    data: int = 1,
    chain: int = 1,
    particle: int = 1,
    *,
    devices=None,
) -> Mesh:
    """Build a named mesh over the available devices.

    Total device count must equal data*chain*particle. 1-sized axes are still
    created so every entry point is mesh-polymorphic.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = data * chain * particle
    if devices.size < n:
        raise ValueError(f"need {n} devices, have {devices.size}")
    devs = devices[:n].reshape(data, chain, particle)
    return Mesh(devs, ("data", "chain", "particle"))


def shard_time(mesh: Mesh, x):
    """Place an array with its leading (time/batch) axis sharded over 'data'."""
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def data_parallel_collapsed_elbo(
    kern: Kernel,
    kp,
    Z,
    log_noise,
    X_mu,
    X_s,
    Y,
    Y_var,
    mesh: Mesh,
    *,
    T_total: Optional[int] = None,
    block: Optional[int] = None,
):
    """Collapsed bound with time-sharded inputs: each device computes the
    additive sufficient statistics (sum psi0, Psi1^T Y, sum Psi2, E||Y||^2) on
    its shard, psums them over the 'data' axis, and assembles F0 replicated —
    the TPU-native analog of the reference's MPI sufficient-statistic
    Allreduce (S3.4, N5).

    ``X_mu/X_s/Y[/Y_var]`` must have leading dim divisible by the 'data' axis
    size. Returns a replicated scalar identical (up to reduction order) to
    ``collapsed_bound`` on the gathered arrays.
    """
    T, D = Y.shape
    if T_total is None:
        T_total = T
    has_var = Y_var is not None
    if not has_var:
        Y_var = jnp.zeros_like(Y)
    has_s = X_s is not None
    if not has_s:
        X_s = jnp.zeros_like(X_mu)

    # hyperparameters enter as explicit replicated operands (P()) so that
    # gradients flow through shard_map rather than being closed-over constants
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("data"), P("data"), P("data"), P("data")),
        out_specs=P(),
    )
    def _elbo(kp_, Z_, ln_, Xm, Xs, Yl, Yv):
        stats = psi_statistics(kern, kp_, Z_, Xm, Xs if has_s else None, block=block)
        psi0_sum = jax.lax.psum(jnp.sum(stats.psi0), "data")
        psi1Y = jax.lax.psum(hdot(stats.psi1.T, Yl), "data")
        psi2 = jax.lax.psum(stats.psi2, "data")
        trYY = jax.lax.psum(jnp.sum(Yl * Yl) + jnp.sum(Yv), "data")
        return collapsed_bound_from_suffstats(
            kern, kp_, Z_, ln_, psi0_sum, psi1Y, psi2, trYY, T_total, D
        )

    return _elbo(kp, Z, log_noise, X_mu, X_s, Y, Y_var)
