"""High-level sampling entry points over RGP models (SURVEY.md Appendix B).

``sample_nuts(cfg, params, Y, U, ...)`` — NUTS over the *kernel hyperparameters*
(kernel params + noises) in unconstrained space, holding the variational state
q(X) and inducing inputs fixed, with potential

    U(theta) = -[ ELBO(theta; q fixed) + log p(theta) ]

where the prior is N(0, prior_std^2) placed directly on the unconstrained
parameters (so no separate Jacobian term; SURVEY.md A.5 / S3.5 — the VI bound
stands in for the marginal likelihood exactly as in the reference's HMC).

``smc(cfg, params, ...)`` — particle filter over latent trajectories of the
trained model (see rgp_smc.make_ssm).

Chain parallelism: ``nuts_sharded`` shard_maps chains over the mesh 'chain'
axis; dual-averaging statistics psum-average across every chain on every
device so adaptation is globally shared (BASELINE.json:5,11).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import rgp, rgp_smc
from ..params import ravel
from .hmc import hmc_sample
from .nuts import NUTSResult, nuts_sample
from .smc import smc_filter, smc_filter_sharded

__all__ = [
    "split_hypers",
    "merge_hypers",
    "make_rgp_potential",
    "sample_nuts",
    "sample_hmc",
    "sample_tempered",
    "nuts_sharded",
    "smc",
]


# chain count above which sample_nuts auto-selects the many-chain potential
# dispatch (scan psi + small block + frozen whitening) — see sample_nuts
_MANY_CHAINS = 64


def split_hypers(params):
    """Extract the hyperparameter subtree (kernel params + noises)."""
    return {
        "layers": tuple(
            {"kern": l["kern"], "log_noise": l["log_noise"]} for l in params["layers"]
        ),
        "out": {"kern": params["out"]["kern"], "log_noise": params["out"]["log_noise"]},
    }


def merge_hypers(params, hyper):
    """Rebuild a full parameter pytree with the hyper subtree replaced."""
    layers = tuple(
        {**l, "kern": h["kern"], "log_noise": h["log_noise"]}
        for l, h in zip(params["layers"], hyper["layers"])
    )
    out = {**params["out"], "kern": hyper["out"]["kern"], "log_noise": hyper["out"]["log_noise"]}
    return {**params, "layers": layers, "out": out}


def make_rgp_potential(cfg, params, Y, U, *, prior_std: float = 3.0, block=None,
                       psi_prefer: str = "auto", fixed_whitening: bool = False,
                       chol_jitter: Optional[float] = 1e-3,
                       fresh_ladder: bool = True):
    """-> (potential_fn over flat unconstrained vector, initial vector, unravel).

    ``psi_prefer="scan"`` + small ``block``: REQUIRED when the potential will
    be vmapped over many chains (the dense-psi2 dispatch would materialize a
    (chains, T, M, M) intermediate; measured: the remote compiler dies at
    1024 chains on v5e).

    ``chol_jitter`` (default 1e-3): base jitter of the whitened Cholesky
    factorizations inside the potential — large enough that the jitchol
    escalation ladder's FIRST rung succeeds across the sampled region, so the
    ladder's discrete rung flips (±hundreds-of-nats cliffs at infinitesimal
    moves; measured as the config-5 divergence storm + dual-averaging death
    spiral, BASELINE.md r4) never trigger. Costs a uniform ~O(0.1-1 nat)
    shift of the surrogate ELBO — the potential stays a smooth, consistent
    surrogate. Pass None for the training-time dtype-resolved default.

    ``fixed_whitening``: close over the spectral-whitening bases computed ONCE
    at the anchor ``params`` instead of running a fresh ``eigh`` per layer per
    potential evaluation. The bound is W-invariant for any full-rank basis
    (``whitening_basis`` docstring), so the potential surface is unchanged
    wherever the frozen spectral floor stays inactive. Measured effect:
    batched eigh dominates the many-chain leapfrog on TPU (eigh is
    sequential-iterative; M=100 x 1024 chains per gradient eval), so fixing
    the basis is the difference between the sampler being eigh-bound and
    exp-bound.

    ``fresh_ladder`` (only meaningful with ``fixed_whitening=False``): keep
    the spectral-floor escalation ladder in the per-evaluation whitening.
    Pass False for REFERENCE chains that recompute the basis every potential
    evaluation — the ladder's f32 trial-Cholesky pass/fail decision flips
    discretely with position, putting ~1-nat cliffs into the potential
    (measured round 5: leapfrog energy error 0.001-0.9 nats at eps=0.002
    under the laddered fresh basis vs 1e-8 frozen; dual averaging then
    crushed eps to 4e-3 and the f64 reference could not mix). With
    ``fresh_ladder=False`` the basis is deterministic-floor
    (:func:`whitening_basis` without the psi2 trial) and the potential is
    smooth; in f64 the ladder's f32-rounding rationale does not apply.

    VALIDITY CONDITION (measured, round 5): the anchor must be a CONVERGED
    optimum. With a premature anchor (300-iter fit) the true posterior mass
    sits ~300 nats below the anchor's neighborhood, where the frozen floor is
    ACTIVE and the surrogate is off by 400-600 nats — the sampler then
    faithfully samples a surrogate posterior that materially differs from the
    true one (``posterior_check --mode surrogate-check`` regenerates the
    table; dtype contributes <1 nat, the frozen basis all the rest)."""
    hyper0 = split_hypers(params)
    flat0, unravel = ravel(hyper0)
    Y = jnp.asarray(Y)
    U = jnp.asarray(U)
    wh = (
        rgp.compute_whitenings(cfg, params, Y, U, block=block)
        if fixed_whitening
        else None
    )

    def potential(v):
        p = merge_hypers(params, unravel(v))
        wh_eval = wh
        if wh_eval is None and not fresh_ladder:
            wh_eval = rgp.compute_whitenings(cfg, p, Y, U, block=block,
                                             ladder=False)
        lp = rgp.elbo(cfg, p, Y, U, block=block, psi_prefer=psi_prefer,
                      whitening=wh_eval, chol_jitter=chol_jitter)
        log_prior = -0.5 * jnp.sum((v / prior_std) ** 2)
        return -(lp + log_prior)

    return potential, flat0, unravel


def sample_nuts(
    cfg,
    params,
    Y,
    U,
    key,
    *,
    n_samples: int = 200,
    n_warmup: int = 200,
    n_chains: int = 4,
    max_depth: int = 6,
    prior_std: float = 3.0,
    jitter_init: float = 0.1,
    hessian_precondition: bool = False,
    psi_prefer: Optional[str] = None,
    block: Optional[int] = None,
    fixed_whitening: Optional[bool] = None,
    **nuts_kw,
) -> NUTSResult:
    """NUTS over RGP hyperparameters (Appendix B ``rgp.sample_nuts``).

    ``hessian_precondition``: initialize the diagonal inverse mass (and scale
    the initial jitter) from the potential's Hessian diagonal at ``params`` —
    the standard stiffness fix for GP hyperparameter posteriors, whose
    curvature spans many orders of magnitude across noise vs lengthscale
    directions (see :func:`rgp_tpu.sample.nuts.nuts_init`). Costs dim
    forward-over-reverse passes once.

    ``psi_prefer``/``block``/``fixed_whitening`` configure the potential (see
    :func:`make_rgp_potential`). Defaults AUTO-SELECT by chain count: above
    ``_MANY_CHAINS`` chains the dense-psi2 dispatch under the chain vmap would
    materialize a (chains, T, M, M) intermediate (measured: the remote
    compiler dies at 1024 chains on v5e) and a fresh per-evaluation eigh makes
    the leapfrog eigh-bound — so many-chain runs default to the scan psi path
    with a small block and a frozen whitening basis, exactly the dispatch the
    config-5 benchmark uses (ADVICE r3 medium)."""
    many = n_chains >= _MANY_CHAINS
    if psi_prefer is None:
        psi_prefer = "scan" if many else "auto"
    if block is None and many:
        block = 32
    if fixed_whitening is None:
        fixed_whitening = many
    potential, flat0, _ = make_rgp_potential(
        cfg, params, Y, U, prior_std=prior_std,
        psi_prefer=psi_prefer, block=block, fixed_whitening=fixed_whitening,
    )
    k_init, k_run = jax.random.split(jnp.asarray(key))
    scale = jnp.ones_like(flat0)
    if hessian_precondition:
        Hd = jnp.diag(jax.hessian(potential)(flat0))
        mass_inv0 = 1.0 / jnp.clip(jnp.abs(Hd), 1e-4, 1e14)
        nuts_kw.setdefault("mass_inv0", mass_inv0)
        # cap: near-flat directions have mass_inv up to 1e4; an uncapped
        # jitter flings chains into NaN regions of the f32 potential and the
        # shared dual averaging death-spirals (bench/posterior_check._jit_scale)
        scale = jnp.minimum(jnp.sqrt(mass_inv0), 0.5 / max(jitter_init, 1e-6))
    z0 = flat0[None, :] + jitter_init * scale[None, :] * jax.random.normal(
        k_init, (n_chains, flat0.shape[0]), flat0.dtype
    )
    return nuts_sample(
        potential, z0, k_run,
        n_samples=n_samples, n_warmup=n_warmup, n_chains=n_chains,
        max_depth=max_depth, **nuts_kw,
    )


def sample_hmc(cfg, params, Y, U, key, *, prior_std: float = 3.0,
               psi_prefer: str = "auto", block=None, fixed_whitening: bool = False,
               **hmc_kw):
    """Reference-parity vanilla HMC over RGP hyperparameters (S3.5).
    ``psi_prefer``/``block``/``fixed_whitening`` pass through to
    :func:`make_rgp_potential` (many-chain vmap dispatch, ADVICE r3)."""
    potential, flat0, _ = make_rgp_potential(
        cfg, params, Y, U, prior_std=prior_std,
        psi_prefer=psi_prefer, block=block, fixed_whitening=fixed_whitening,
    )
    return hmc_sample(potential, flat0, jnp.asarray(key), **hmc_kw)


def sample_tempered(
    cfg,
    params,
    Y,
    U,
    key,
    *,
    n_particles: int = 512,
    prior_std: float = 3.0,
    center_on_fit: bool = True,
    **tsmc_kw,
):
    """Adaptive-tempering SMC from the hyperparameter prior to the (ELBO-
    surrogate) posterior, returning posterior particles AND a log-evidence
    estimate log Z = log E_prior[exp(ELBO)] for model comparison (SURVEY.md
    A.5 "optional tempering for the marginal-likelihood estimate").

    ``center_on_fit``: center the N(., prior_std^2) prior on the fitted
    unconstrained hyperparameters (recommended — the pure zero-centered prior
    wastes most particles in regions where the ELBO is astronomically low).
    """
    from .tempered import smc_tempered

    hyper0 = split_hypers(params)
    flat0, unravel = ravel(hyper0)
    Y = jnp.asarray(Y)
    U = jnp.asarray(U)
    mu0 = flat0 if center_on_fit else jnp.zeros_like(flat0)
    dim = flat0.shape[0]

    def log_prior(v):
        return -0.5 * jnp.sum(((v - mu0) / prior_std) ** 2) - 0.5 * dim * jnp.log(
            2.0 * jnp.pi * prior_std**2
        )

    def log_lik(v):
        p = merge_hypers(params, unravel(v))
        return rgp.elbo(cfg, p, Y, U, block=None)

    def init_sample(k, N):
        return mu0[None, :] + prior_std * jax.random.normal(k, (N, dim), flat0.dtype)

    res = smc_tempered(
        log_prior, log_lik, init_sample, jnp.asarray(key), n_particles, **tsmc_kw
    )
    return res, unravel


def nuts_sharded(
    potential_fn,
    z0,
    key,
    mesh: Mesh,
    *,
    n_chains: int,
    axis: str = "chain",
    **nuts_kw,
) -> NUTSResult:
    """Chain-sharded NUTS: chains split over the mesh axis; dual-averaging and
    mass adaptation statistics pmean over ALL chains (globally shared
    step size, BASELINE.json:5)."""
    n_dev = mesh.shape[axis]
    assert n_chains % n_dev == 0, "n_chains must divide the chain axis size"
    per_dev = n_chains // n_dev
    z0 = jnp.atleast_2d(z0)
    if z0.shape[0] != n_chains:
        z0 = jnp.broadcast_to(z0, (n_chains, z0.shape[-1]))

    def _run(z0_local, keys_local):
        return nuts_sample(
            potential_fn,
            z0_local,
            keys_local[0],
            n_chains=per_dev,
            chain_axis=axis,
            **nuts_kw,
        )

    # one independent key per device
    keys = jax.random.split(jnp.asarray(key), n_dev)
    run = jax.shard_map(
        _run,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=NUTSResult(
            samples=P(axis), potential=P(axis), accept_prob=P(axis),
            diverging=P(axis), step_size=P(), mass_inv=P(),
        ),
        # VMA checker stays ON: the tree-doubling while_loop carries are
        # pvary'd to the chain axis at init (nuts._match_vma), so per-chain
        # state types as varying and the pmean-shared adaptation as invariant
    )
    return run(z0, keys)


def smc(
    cfg,
    params,
    Y_train,
    U_train,
    U_test,
    Y_test,
    key,
    *,
    n_particles: int = 1024,
    mesh: Optional[Mesh] = None,
    axis: str = "particle",
    ess_threshold: float = 0.5,
):
    """Particle filter over latent trajectories of the trained model
    (Appendix B ``rgp.smc``). With a mesh, particles shard over ``axis``."""
    ssm = rgp_smc.make_ssm(cfg, params, Y_train, U_train, U_test, Y_test)
    if mesh is None:
        return smc_filter(
            ssm.transition_sample, ssm.emission_logpdf, ssm.init_sample,
            ssm.n_steps, jnp.asarray(key), n_particles,
            ess_threshold=ess_threshold,
        )
    return smc_filter_sharded(
        ssm.transition_sample, ssm.emission_logpdf, ssm.init_sample,
        ssm.n_steps, jnp.asarray(key), n_particles, mesh,
        axis=axis, ess_threshold=ess_threshold,
    )
