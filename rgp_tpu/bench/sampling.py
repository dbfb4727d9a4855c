"""Sampling-throughput benchmark — config 5 (BASELINE.json:11).

Measures, on ONE chip, the two sampler headline numbers the BASELINE protocol
asks for (multi-host scaling itself is unmeasurable in this environment — one
real chip; the virtual-mesh correctness gates in tests/ stand in for the
semantics):

  * NUTS samples/s at ``--chains`` vmapped chains over the flagship
    hyperparameter potential (1-layer RGP on actuator, M=100 — the same
    potential ``sample_nuts`` uses, SURVEY.md S3.5/A.5), warmup and draw
    phases timed separately (draw steady-state is the headline).
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
"""

from __future__ import annotations

import argparse
import json
import time


def _flagship(fit_iters: int, dtype):
    """Config-1 flagship: 1-layer RGP on actuator, briefly fitted so the
    potential's geometry (step sizes, tree depths) is the realistic one."""
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
    cfg = rgp.deep_rgp_config(wins=[0, 10], u_win=10, y_dim=1, u_dim=1,
                              num_inducing=100)
    params = rgp.init_params(cfg, Y, U, dtype=dtype)
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
               fit_iters: int, seed: int = 0) -> dict:
    import jax
    import jax.numpy as jnp

    from ..sample.api import make_rgp_potential
    from ..sample.nuts import nuts_draw, nuts_init, nuts_warmup

    cfg, params, Y, U, _, _ = _flagship(fit_iters, jnp.float32)
    potential, flat0, _ = make_rgp_potential(cfg, params, Y, U)
    key = jax.random.PRNGKey(seed)
    k_init, k_warm, k_draw = jax.random.split(key, 3)
    z0 = flat0[None, :] + 0.1 * jax.random.normal(
        k_init, (chains, flat0.shape[0]), flat0.dtype
    )

    warm = jax.jit(
        lambda c, k: nuts_warmup(
            potential, c, k, warmup, n_warmup=warmup, max_depth=max_depth
        )
    )
    draw = jax.jit(
        lambda c, k: nuts_draw(potential, c, k, samples, max_depth=max_depth)
    )

    carry0 = nuts_init(z0, n_chains=chains)
    # compile both phases (cached), then time each once
    carry = warm(carry0, k_warm)
    float(carry.zs[0, 0])
    t0 = time.perf_counter()
    carry = warm(carry0, k_warm)
    float(carry.zs[0, 0])
    t_warm = time.perf_counter() - t0

    _, res = draw(carry, k_draw)
    float(res.samples[0, -1, 0])
    t0 = time.perf_counter()
    _, res = draw(carry, k_draw)
    float(res.samples[0, -1, 0])
    t_draw = time.perf_counter() - t0

    total_draws = chains * samples
    return {
        "metric": f"nuts_samples_per_sec[rgp1L_actuator_M100_chains{chains}]",
        "value": round(total_draws / t_draw, 1),
        "unit": "samples/s",
        "vs_baseline": None,
        "details": {
            "backend": jax.default_backend(),
            "chains": chains,
            "n_samples": samples,
            "n_warmup": warmup,
            "max_depth": max_depth,
            "draw_seconds": round(t_draw, 2),
            "warmup_seconds": round(t_warm, 2),
            "warmup_samples_per_sec": round(chains * warmup / t_warm, 1),
            "mean_accept": round(float(res.accept_prob.mean()), 3),
            "divergence_rate": round(float(res.diverging.mean()), 4),
            "step_size": round(float(res.step_size), 5),
            "potential_dim": int(res.samples.shape[-1]),
        },
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
    ap.add_argument("--what", choices=("nuts", "smc"), default="nuts")
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--particles", type=int, default=1024)
    ap.add_argument("--warmup", type=int, default=50)
    ap.add_argument("--samples", type=int, default=50)
    ap.add_argument("--max-depth", type=int, default=6)
    ap.add_argument("--fit-iters", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.what == "nuts":
        out = bench_nuts(args.chains, args.warmup, args.samples,
                         args.max_depth, args.fit_iters, args.seed)
    else:
        out = bench_smc(args.particles, args.fit_iters, args.seed)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
