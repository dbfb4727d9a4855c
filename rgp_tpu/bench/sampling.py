"""Sampling-throughput benchmark — config 5 (BASELINE.json:11).

Measures, on ONE chip, the two sampler headline numbers the BASELINE protocol
asks for (multi-host scaling itself is unmeasurable in this environment — one
real chip; the virtual-mesh correctness gates in tests/ stand in for the
semantics):

  * NUTS samples/s at ``--chains`` chains over the flagship hyperparameter
    potential (1-layer RGP on actuator, M=100 — the same potential
    ``sample_nuts`` uses, SURVEY.md S3.5/A.5), warmup and draw phases timed
    separately (draw steady-state is the headline).
  * SMC particle-filter steps/s at ``--particles`` particles over latent
    trajectories of the trained flagship model (rgp_smc.make_ssm).

Usage (the driver-runnable config-5 entry point):
    python -m rgp_tpu.bench.sampling --what nuts --chains 1024
    python -m rgp_tpu.bench.sampling --what smc --particles 1024

Prints exactly ONE JSON line on the last line of stdout. Timing is delimited
by HOST READS of result elements — on the tunneled axon backend
``block_until_ready`` can return before remote execution finishes (the
BASELINE.md environment gotcha), so a scalar device->host transfer is the only
reliable barrier.

Dispatch structure (measured constraints of the tunneled backend, round 3):

  1. The potential is built with ``psi_prefer="scan"`` + a small block and
     ``fixed_whitening=True``: the dense-psi2 dispatch under a 1024-chain vmap
     would materialize a (chains, T, M, M) intermediate and crash the remote
     compiler, and a fresh per-evaluation ``eigh`` makes the leapfrog
     eigh-bound instead of exp-bound (measured 855 vs 1900 grad-evals/s at
     256 chains).
  2. Any single device program running over ~60 s is killed by the tunnel
     watchdog ("TPU device error / kernel fault") — a 64-step warmup scan in
     ONE jit call is minutes of device time. So warmup is SEGMENTED
     (``nuts_warmup`` is segmentation-invariant: the adaptation schedule keys
     off the carry's step counter) and draws run ONE transition per call.
  3. Chains are processed in groups of ``--group-size`` so the worst-case
     (max-depth) transition stays a few seconds per call. As of round 4 every
     group warms up INDEPENDENTLY by default (own jitter, own adaptation, own
     PRNG stream) so the pooled statistics are honest N-chain diagnostics;
     ``--shared-warmup`` restores the round-3 throughput-only shortcut, with
     the duplication recorded in ``independent_warmup_chains`` (ADVICE r3).
"""

from __future__ import annotations

import argparse
import json
import time


def _flagship(fit_iters: int, dtype, params_npz: str | None = None,
              noise_floor: float | None = None):
    """Config-1 flagship: 1-layer RGP on actuator, briefly fitted so the
    potential's geometry (step sizes, tree depths) is the realistic one.

    ``params_npz``: load the fitted parameter pytree from a flat npz written
    by :mod:`rgp_tpu.bench.posterior_check` instead of fitting — the TPU f32
    sampler and the CPU f64 reference chain must share ONE potential (same
    anchor params) for the moment-agreement validation to mean anything."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..data import datasets
    from ..data.windows import Standardizer
    from ..models import rgp

    d = datasets.load("actuator")
    sy, su = Standardizer.fit(d.y_train), Standardizer.fit(d.u_train)
    Y = jnp.asarray(sy.transform(d.y_train), dtype)
    U = jnp.asarray(su.transform(d.u_train), dtype)
    Ut = jnp.asarray(su.transform(d.u_test), dtype)
    Yt = jnp.asarray(sy.transform(d.y_test), dtype)
    kw = {} if noise_floor is None else {"noise_floor": noise_floor}
    cfg = rgp.deep_rgp_config(wins=[0, 10], u_win=10, y_dim=1, u_dim=1,
                              num_inducing=100, **kw)
    params = rgp.init_params(cfg, Y, U, dtype=dtype)
    if params_npz is not None:
        import numpy as np

        with np.load(params_npz) as z:
            flat = [jnp.asarray(z[f"p{i}"], dtype) for i in range(len(z.files))]
        params = jax.tree.unflatten(jax.tree.structure(params), flat)
        return cfg, params, Y, U, Ut, Yt
    if fit_iters > 0:
        opt = optax.adam(optax.cosine_decay_schedule(1e-2, fit_iters, 0.01))

        def run(p0):
            s0 = opt.init(p0)

            def step(carry, _):
                p, s = carry
                loss, g = jax.value_and_grad(
                    lambda q: -rgp.elbo(cfg, q, Y, U, block=None)
                )(p)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s), loss

            (p, _), losses = jax.lax.scan(step, (p0, s0), None, length=fit_iters)
            return p, losses

        params, losses = jax.jit(run)(params)
        float(losses[-1])  # host-read sync
    return cfg, params, Y, U, Ut, Yt


def bench_nuts(chains: int, warmup: int, samples: int, max_depth: int,
               fit_iters: int, seed: int = 0, group_size: int = 128,
               block: int = 32, target_accept: float = 0.6, seg: int = 3,
               shared_warmup: bool = False, params_npz: str | None = None,
               warmup_depth: int | None = None,
               init_eps: float = 0.1) -> dict:
    """Chains are processed in groups of ``group_size`` (``chains`` must be a
    multiple — asserted; ADVICE r3). Default protocol (VERDICT r3 #3): every
    group warms up INDEPENDENTLY — own initial jitter, own dual-averaging /
    Welford adaptation, own PRNG stream via ``chain_offset`` — so all
    ``chains`` draw chains are independently warmed and the pooled
    accept/divergence/R-hat statistics are honest ``chains``-chain
    diagnostics. ``shared_warmup=True`` restores the round-3 throughput-only
    shortcut (one warmed group copied across groups); the record then carries
    ``independent_warmup_chains = group_size`` so readers can't mistake the
    pooled stats for independent-chain diagnostics.

    ``seg``: warmup steps per device call. The tunnel watchdog kills any
    single device program over ~60 s; one depth-6 step of a 128-chain group
    is ~5 s of device time (compute-bound: 63 leapfrog gradient evaluations
    per saturated tree — warmup is NOT dispatch-bound, so larger segments
    only trim the ~50 ms/call dispatch overhead), hence seg=3 keeps calls
    ~15 s with ~1% dispatch overhead. ``warmup % seg == 0`` is asserted
    (ADVICE r3: a trailing partial segment would silently run extra steps).

    Warmup-cost levers (VERDICT r4 next #7 — the group loop is already
    pipelined by async dispatch; what makes warmup slow is EARLY transitions
    saturating the depth cap at 2^depth-1 leapfrogs while eps is still tiny):

    * ``init_eps``: dual-averaging starting step size. Starting near the
      adapted optimum (~0.9 on this potential, round-4 record) instead of
      0.1 skips the expensive small-eps phase — a too-LARGE eps is cheap
      (divergent trees terminate after a few leaves) while a too-small one
      runs full saturated trees.
    * ``warmup_depth``: depth cap during warmup only (draws keep
      ``max_depth``). Caps the worst-case warmup tree at 2^d-1 leapfrogs;
      once eps adapts to its healthy value, trees U-turn below the cap
      anyway, so the binding phase is exactly the wasteful one. Warmup is
      adaptation, not inference — draw-phase semantics are unchanged, and
      the draw-phase diagnostics (accept/divergence/R-hat/ESS) certify the
      adaptation was sound.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..sample.api import make_rgp_potential
    from ..sample.diagnostics import ess, split_rhat
    from ..sample.nuts import nuts_draw, nuts_init, nuts_warmup

    assert chains % group_size == 0, "chains must be a multiple of --group-size"
    assert warmup % seg == 0, "warmup must be a multiple of --seg"
    cfg, params, Y, U, _, _ = _flagship(fit_iters, jnp.float32, params_npz)
    potential, flat0, _ = make_rgp_potential(
        cfg, params, Y, U, block=block, psi_prefer="scan", fixed_whitening=True
    )
    key = jax.random.PRNGKey(seed)
    k_init, k_warm, k_draw = jax.random.split(key, 3)
    wc = min(group_size, chains)
    n_groups = chains // wc

    # Hessian-diagonal mass preconditioning: without it the dual averaging
    # collapses eps to ~1e-5 on this stiff posterior (measured; see
    # nuts_init docstring) and every tree saturates max_depth
    Hd = jnp.diag(jax.jit(jax.hessian(potential))(flat0))
    mass_inv0 = 1.0 / jnp.clip(jnp.abs(Hd), 1e-4, 1e14)

    from .posterior_check import _jit_scale

    def group_z0(g):
        kg = jax.random.fold_in(k_init, g)
        return flat0[None, :] + _jit_scale(mass_inv0)[None, :] * jax.random.normal(
            kg, (wc, flat0.shape[0]), flat0.dtype
        )

    w_depth = max_depth if warmup_depth is None else warmup_depth
    warm = jax.jit(
        lambda c, off: nuts_warmup(
            potential, c, k_warm, seg, n_warmup=warmup, max_depth=w_depth,
            target_accept=target_accept, chain_offset=off,
        )
    )
    # compile both executables before timing
    carry = warm(nuts_init(group_z0(0), n_chains=wc, mass_inv=mass_inv0,
                           step_size=init_eps), 0)
    float(carry.zs[0, 0])

    n_warm_groups = 1 if shared_warmup else n_groups
    group_carries = []
    t0 = time.perf_counter()
    for g in range(n_warm_groups):
        c = nuts_init(group_z0(g), n_chains=wc, mass_inv=mass_inv0,
                      step_size=init_eps)
        for _ in range(0, warmup, seg):
            c = warm(c, g * wc)
        group_carries.append(c)
    for c in group_carries:
        float(c.zs[0, 0])  # host-read barrier
    t_warm = time.perf_counter() - t0
    if shared_warmup:
        group_carries = [group_carries[0] for _ in range(n_groups)]

    draw1 = jax.jit(
        lambda c, off: nuts_draw(potential, c, k_draw, 1,
                                 max_depth=max_depth, chain_offset=off)
    )
    _ = draw1(group_carries[0], 0)
    float(_[0].zs[0, 0])  # compile + sync
    results = []
    t0 = time.perf_counter()
    for g in range(n_groups):
        c = group_carries[g]
        for _ in range(samples):
            c, r = draw1(c, g * wc)
            results.append(r)
        group_carries[g] = c
    for c in group_carries:
        float(c.zs[0, 0])  # host-read barrier on every group's tail
    t_draw = time.perf_counter() - t0

    accs = jnp.concatenate([r.accept_prob.ravel() for r in results])
    divs = jnp.concatenate([r.diverging.ravel() for r in results])
    total_draws = n_groups * wc * samples
    eps_per_group = [round(float(jnp.exp(c.da.log_eps_avg)), 5) for c in group_carries]

    details = {
        "backend": jax.default_backend(),
        "chains": chains,
        "chain_group_size": wc,
        "independent_warmup_chains": wc * n_warm_groups,
        "n_samples": samples,
        "n_warmup": warmup,
        "warmup_seg": seg,
        "max_depth": max_depth,
        "warmup_depth": w_depth,
        "init_eps": init_eps,
        "target_accept": target_accept,
        "draw_seconds": round(t_draw, 2),
        "warmup_seconds": round(t_warm, 2),
        # chain-steps/s over every independently-warmed chain (first-class,
        # VERDICT r3 #8: real runs are warmup-dominated, so the warmup rate
        # belongs next to the draw rate)
        "warmup_samples_per_sec": round(n_warm_groups * wc * warmup / t_warm, 1),
        "mean_accept": round(float(accs.mean()), 3),
        "divergence_rate": round(float(divs.mean()), 4),
        "step_size_per_group": eps_per_group,
        "potential_dim": int(flat0.shape[0]),
    }
    # cross-chain convergence diagnostics on the potential-energy trace
    # (draws, per group in dispatch order) — needs >= 4 draws per chain
    if samples >= 4:
        # (n_groups, samples) blocks of (wc, 1) -> (chains, samples)
        U_draws = np.concatenate(
            [
                np.concatenate(
                    [np.asarray(r.potential) for r in results[g * samples:(g + 1) * samples]],
                    axis=1,
                )
                for g in range(n_groups)
            ],
            axis=0,
        )
        details["potential_split_rhat"] = round(float(split_rhat(U_draws)), 4)
        details["potential_ess"] = round(float(ess(U_draws)), 1)
    return {
        "metric": f"nuts_samples_per_sec[rgp1L_actuator_M100_chains{chains}]",
        "value": round(total_draws / t_draw, 1),
        "unit": "samples/s",
        "vs_baseline": None,
        "details": details,
    }


def bench_smc(particles: int, fit_iters: int, seed: int = 0) -> dict:
    import jax
    import jax.numpy as jnp

    from ..sample.api import smc

    cfg, params, Y, U, Ut, Yt = _flagship(fit_iters, jnp.float32)

    key = jax.random.PRNGKey(seed)
    run = jax.jit(lambda k: smc(cfg, params, Y, U, Ut, Yt, k,
                                n_particles=particles))
    res = run(key)
    float(res.log_marginal)
    t0 = time.perf_counter()
    res = run(key)
    float(res.log_marginal)
    dt = time.perf_counter() - t0

    n_steps = int(res.ess_history.shape[0])
    return {
        "metric": f"smc_filter_steps_per_sec[rgp1L_actuator_N{particles}]",
        "value": round(n_steps / dt, 1),
        "unit": "steps/s",
        "vs_baseline": None,
        "details": {
            "backend": jax.default_backend(),
            "particles": particles,
            "n_steps": n_steps,
            "wall_seconds": round(dt, 3),
            "particle_steps_per_sec": round(particles * n_steps / dt, 1),
            "log_marginal": round(float(res.log_marginal), 2),
            "mean_ess_frac": round(float(res.ess_history.mean()) / particles, 3),
        },
    }


def main(argv=None):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rgp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--what", "--sampler", dest="what", choices=("nuts", "smc"),
                    default="nuts")
    ap.add_argument("--chains", type=int, default=256,
                    help="must be a multiple of --group-size")
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--particles", type=int, default=1024)
    ap.add_argument("--warmup", type=int, default=96,
                    help="total warmup steps (multiple of --seg)")
    ap.add_argument("--samples", "--draws", dest="samples", type=int, default=16)
    ap.add_argument("--max-depth", type=int, default=6)
    ap.add_argument("--target-accept", type=float, default=0.6,
                    help="keep BELOW the f32 evaluation-noise acceptance "
                         "ceiling (~0.72 on the flagship; BASELINE.md r4)")
    ap.add_argument("--seg", type=int, default=3,
                    help="warmup steps per device call (watchdog bound)")
    ap.add_argument("--warmup-depth", type=int, default=None,
                    help="NUTS depth cap during warmup only (draws keep "
                         "--max-depth); caps the wasteful small-eps phase")
    ap.add_argument("--init-eps", type=float, default=0.1,
                    help="dual-averaging starting step size")
    ap.add_argument("--shared-warmup", action="store_true",
                    help="round-3 shortcut: one warmed group copied to all")
    ap.add_argument("--params-npz", default=None,
                    help="load anchor params from posterior_check fit")
    ap.add_argument("--fit-iters", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.what == "nuts":
        out = bench_nuts(args.chains, args.warmup, args.samples,
                         args.max_depth, args.fit_iters, args.seed,
                         group_size=args.group_size,
                         target_accept=args.target_accept, seg=args.seg,
                         shared_warmup=args.shared_warmup,
                         params_npz=args.params_npz,
                         warmup_depth=args.warmup_depth,
                         init_eps=args.init_eps)
    else:
        out = bench_smc(args.particles, args.fit_iters, args.seed)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
