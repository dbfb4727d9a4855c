"""Config-5 posterior validation at benchmark scale (VERDICT r3 #3).

Validates that the *benchmarked* TPU sampler — f32, frozen whitening basis,
scan-psi2 dispatch, grouped dispatch, Hessian-preconditioned mass — samples
the same posterior as an exact f64 CPU NUTS reference on the SAME potential
(same anchor params, same prior, same data). Four modes share one anchor:

  fit      fit the flagship briefly and save the anchor params (flat npz)
  tpu      run the benchmarked f32 sampler config, KEEP the draws, save npz
  cpu-ref  run f64 CPU NUTS (exact per-eval whitening, x64) on the same
           potential, save draws npz
  compare  per-dimension moment deltas in combined MC-error units
           (|mean_tpu - mean_cpu| / sqrt(se_tpu^2 + se_cpu^2), se from the
           per-dim bulk ESS), std ratios, split-R-hat/ESS for both runs —
           ONE JSON line, written to --out

The TPU and CPU samplers both run NUTS with the same max_depth and
target_accept; they differ exactly by the things being validated (dtype,
frozen vs fresh whitening, psi dispatch, grouped dispatch). Agreement within
MC error therefore certifies the whole benchmarked configuration, not just
the abstract algorithm (which tests/test_posterior_agreement.py already
covers on small instances).

Usage (TPU steps must run solo — one TPU process at a time):
    python -m rgp_tpu.bench.posterior_check --mode fit --out /tmp/pc_params.npz
    python -m rgp_tpu.bench.posterior_check --mode tpu --params /tmp/pc_params.npz \
        --chains 256 --warmup 96 --samples 64 --out /tmp/pc_tpu.npz
    JAX_PLATFORMS=cpu python -m rgp_tpu.bench.posterior_check --mode cpu-ref \
        --params /tmp/pc_params.npz --chains 2 --warmup 200 --samples 200 \
        --out /tmp/pc_cpu.npz
    python -m rgp_tpu.bench.posterior_check --mode compare \
        --tpu /tmp/pc_tpu.npz --cpu /tmp/pc_cpu.npz
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _jit_scale(mass_inv, base: float = 0.1, cap: float = 0.5):
    """Per-dim init-jitter std: base * sqrt(mass_inv), CAPPED at ``cap``.

    The Hessian-diagonal mass clips |H| at 1e-4, so near-flat directions get
    mass_inv up to 1e4 and an uncapped 0.1*sqrt(mass_inv) jitter flings
    chains ~10 units from the anchor — into regions where the f32 potential
    is NaN/inf, acceptance pins at ~0, and the shared dual averaging
    death-spirals the step size to 0 (measured round 4: group 0 of the
    256-chain run adapted eps = 0.0 exactly and froze, R-hat 6858)."""
    import jax.numpy as jnp

    return jnp.minimum(base * jnp.sqrt(mass_inv), cap)


def _save_params(path: str, params) -> None:
    import jax

    leaves = jax.tree.leaves(params)
    np.savez(path, **{f"p{i}": np.asarray(x) for i, x in enumerate(leaves)})


def mode_fit(out: str, fit_iters: int) -> dict:
    import jax.numpy as jnp

    from .sampling import _flagship

    cfg, params, *_ = _flagship(fit_iters, jnp.float32)
    _save_params(out, params)
    return {"mode": "fit", "out": out, "fit_iters": fit_iters}


def mode_tpu(params_npz: str, out: str, chains: int, warmup: int, samples: int,
             max_depth: int, target_accept: float, group_size: int, seg: int,
             seed: int, noise_floor: float | None = None,
             adapt_mass: bool = False) -> dict:
    """The benchmarked configuration, retaining draws (positions).

    ``adapt_mass`` defaults OFF: the MAP-Hessian diagonal mass is kept
    through warmup — the pooled-Welford switch replaces it with between-chain
    spread estimated from barely-warmed chains (measured round 4: the switch
    multiplies mass_inv_max ~10x and the reset dual averaging has too few
    steps left to recover)."""
    import jax
    import jax.numpy as jnp

    from ..sample.api import make_rgp_potential
    from ..sample.nuts import nuts_draw, nuts_init, nuts_warmup
    from .sampling import _flagship

    cfg, params, Y, U, _, _ = _flagship(0, jnp.float32, params_npz,
                                        noise_floor=noise_floor)
    potential, flat0, _ = make_rgp_potential(
        cfg, params, Y, U, block=32, psi_prefer="scan", fixed_whitening=True
    )
    key = jax.random.PRNGKey(seed)
    k_init, k_warm, k_draw = jax.random.split(key, 3)
    wc = min(group_size, chains)
    n_groups = chains // wc
    assert chains % wc == 0 and warmup % seg == 0

    Hd = jnp.diag(jax.jit(jax.hessian(potential))(flat0))
    mass_inv0 = 1.0 / jnp.clip(jnp.abs(Hd), 1e-4, 1e14)

    warm = jax.jit(
        lambda c, off: nuts_warmup(
            potential, c, k_warm, seg, n_warmup=warmup, max_depth=max_depth,
            target_accept=target_accept, chain_offset=off,
            adapt_mass=adapt_mass,
        )
    )
    draw1 = jax.jit(
        lambda c, off: nuts_draw(potential, c, k_draw, 1,
                                 max_depth=max_depth, chain_offset=off)
    )
    # compile both executables before timing
    c0 = nuts_init(
        flat0[None, :] + _jit_scale(mass_inv0)[None, :] * jax.random.normal(
            jax.random.fold_in(k_init, 0), (wc, flat0.shape[0]), flat0.dtype
        ),
        n_chains=wc, mass_inv=mass_inv0,
    )
    c0 = warm(c0, 0)
    _ = draw1(c0, 0)
    float(_[0].zs[0, 0])

    t0 = time.perf_counter()
    t_warm = 0.0
    all_draws = []  # per group: (wc, samples, dim)
    all_div = []
    all_acc = []
    eps_groups = []
    for g in range(n_groups):
        kg = jax.random.fold_in(k_init, g)
        z0 = flat0[None, :] + _jit_scale(mass_inv0)[None, :] * jax.random.normal(
            kg, (wc, flat0.shape[0]), flat0.dtype
        )
        tw = time.perf_counter()
        c = nuts_init(z0, n_chains=wc, mass_inv=mass_inv0)
        for _ in range(0, warmup, seg):
            c = warm(c, g * wc)
        float(c.zs[0, 0])
        t_warm += time.perf_counter() - tw
        zs, divs, accs = [], [], []
        for _ in range(samples):
            c, r = draw1(c, g * wc)
            zs.append(np.asarray(r.samples))  # (wc, 1, dim)
            divs.append(np.asarray(r.diverging))
            accs.append(np.asarray(r.accept_prob))
        all_draws.append(np.concatenate(zs, axis=1))
        all_div.append(np.concatenate(divs, axis=1))
        all_acc.append(np.concatenate(accs, axis=1))
        eps_groups.append(round(float(jnp.exp(c.da.log_eps_avg)), 6))
        print(f"group {g + 1}/{n_groups} done "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    draws = np.concatenate(all_draws, axis=0)  # (chains, samples, dim)
    div = np.concatenate(all_div, axis=0)
    acc = np.concatenate(all_acc, axis=0)
    wall = time.perf_counter() - t0
    t_draw = wall - t_warm
    np.savez(out, draws=draws, diverging=div, wall_seconds=wall,
             max_depth=max_depth, target_accept=target_accept, warmup=warmup)

    from ..sample.diagnostics import ess, split_rhat

    r_pos = np.atleast_1d(split_rhat(draws))
    e_pos = np.atleast_1d(ess(draws))
    return {
        "mode": "tpu", "out": out, "chains": chains, "samples": samples,
        "warmup": warmup, "wall_seconds": round(wall, 1),
        "warmup_seconds": round(t_warm, 1),
        "draw_seconds": round(t_draw, 1),
        "samples_per_sec_draw_phase": round(chains * samples / t_draw, 2),
        "warmup_chain_steps_per_sec": round(chains * warmup / t_warm, 2),
        "independent_warmup_chains": chains,
        "mean_accept": round(float(acc.mean()), 3),
        "divergence_rate": round(float(div.mean()), 4),
        "step_size_per_group": eps_groups,
        "max_rhat_positions": round(float(np.nanmax(r_pos)), 4),
        "min_ess_positions": round(float(np.nanmin(e_pos)), 1),
        "median_ess_positions": round(float(np.nanmedian(e_pos)), 1),
        "target_accept": target_accept, "max_depth": max_depth,
    }


def mode_cpu_ref(params_npz: str, out: str, chains: int, warmup: int,
                 samples: int, max_depth: int, target_accept: float,
                 seed: int, noise_floor: float | None = None) -> dict:
    """Exact f64 reference: fresh whitening every evaluation, scan psi (same
    math as dense, f64 accumulation), one jit — no watchdog on CPU."""
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ..sample.api import make_rgp_potential
    from ..sample.nuts import nuts_sample
    from .sampling import _flagship

    cfg, params, Y, U, _, _ = _flagship(0, jnp.float64, params_npz,
                                        noise_floor=noise_floor)
    potential, flat0, _ = make_rgp_potential(
        cfg, params, Y, U, block=64, psi_prefer="scan", fixed_whitening=False
    )
    Hd = jnp.diag(jax.jit(jax.hessian(potential))(flat0))
    mass_inv0 = 1.0 / jnp.clip(jnp.abs(Hd), 1e-4, 1e14)
    key = jax.random.PRNGKey(seed + 1000)
    k_init, k_run = jax.random.split(key)
    z0 = flat0[None, :] + _jit_scale(mass_inv0)[None, :] * jax.random.normal(
        k_init, (chains, flat0.shape[0]), flat0.dtype
    )
    t0 = time.perf_counter()
    res = nuts_sample(
        potential, z0, k_run, n_samples=samples, n_warmup=warmup,
        n_chains=chains, max_depth=max_depth, target_accept=target_accept,
        mass_inv0=mass_inv0,
    )
    draws = np.asarray(res.samples)
    wall = time.perf_counter() - t0
    np.savez(out, draws=draws, diverging=np.asarray(res.diverging),
             wall_seconds=wall, max_depth=max_depth,
             target_accept=target_accept, warmup=warmup)
    return {
        "mode": "cpu-ref", "out": out, "chains": chains, "samples": samples,
        "warmup": warmup, "wall_seconds": round(wall, 1),
        "divergence_rate": round(float(np.asarray(res.diverging).mean()), 4),
        "x64": True,
    }


def mode_compare(tpu_npz: str, cpu_npz: str) -> dict:
    from ..sample.diagnostics import ess, split_rhat

    with np.load(tpu_npz) as z:
        d_t, div_t = z["draws"], z["diverging"]
    with np.load(cpu_npz) as z:
        d_c, div_c = z["draws"], z["diverging"]

    def _stats(d):
        flat = d.reshape(-1, d.shape[-1])
        e = np.atleast_1d(ess(d))
        se = flat.std(axis=0, ddof=1) / np.sqrt(np.maximum(e, 1.0))
        return flat.mean(axis=0), flat.std(axis=0, ddof=1), e, se

    m_t, s_t, e_t, se_t = _stats(d_t)
    m_c, s_c, e_c, se_c = _stats(d_c)
    z_scores = np.abs(m_t - m_c) / np.sqrt(se_t**2 + se_c**2)
    std_ratio = s_t / np.maximum(s_c, 1e-30)
    r_t = np.atleast_1d(split_rhat(d_t))
    r_c = np.atleast_1d(split_rhat(d_c))
    # condition the moment check on REFERENCE quality: dims where the f64
    # chain itself has not mixed (ess < 20 or rhat > 1.2) cannot arbitrate
    # a discrepancy — report the well-mixed subset separately
    ok = (e_c >= 20.0) & (r_c <= 1.2)
    well = {
        "n_dims": int(ok.sum()),
        "moment_z_max": round(float(np.nanmax(z_scores[ok])), 3) if ok.any() else None,
        "moment_z_median": round(float(np.nanmedian(z_scores[ok])), 3) if ok.any() else None,
        "n_z_above_3": int(np.sum(z_scores[ok] > 3.0)) if ok.any() else None,
        "std_ratio_range": [round(float(std_ratio[ok].min()), 3),
                            round(float(std_ratio[ok].max()), 3)] if ok.any() else None,
    }
    return {
        "well_mixed_reference_dims": well,
        "mode": "compare",
        "dim": int(d_t.shape[-1]),
        "tpu": {"chains": int(d_t.shape[0]), "draws": int(d_t.shape[1]),
                "divergence_rate": round(float(div_t.mean()), 4),
                "max_rhat": round(float(np.nanmax(r_t)), 4),
                "min_ess": round(float(np.nanmin(e_t)), 1),
                "median_ess": round(float(np.nanmedian(e_t)), 1)},
        "cpu_ref": {"chains": int(d_c.shape[0]), "draws": int(d_c.shape[1]),
                    "divergence_rate": round(float(div_c.mean()), 4),
                    "max_rhat": round(float(np.nanmax(r_c)), 4),
                    "min_ess": round(float(np.nanmin(e_c)), 1)},
        "moment_z_max": round(float(np.nanmax(z_scores)), 3),
        "moment_z_median": round(float(np.nanmedian(z_scores)), 3),
        "n_dims_z_above_3": int(np.sum(z_scores > 3.0)),
        "std_ratio_range": [round(float(std_ratio.min()), 3),
                            round(float(std_ratio.max()), 3)],
    }


def main(argv=None):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rgp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=("fit", "tpu", "cpu-ref", "compare"),
                    required=True)
    ap.add_argument("--params", default="/tmp/pc_params.npz")
    ap.add_argument("--out", default=None)
    ap.add_argument("--tpu", default="/tmp/pc_tpu.npz")
    ap.add_argument("--cpu", default="/tmp/pc_cpu.npz")
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--warmup", type=int, default=96)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--max-depth", type=int, default=6)
    ap.add_argument("--target-accept", type=float, default=0.6,
                    help="must sit BELOW the f32 potential's evaluation-noise "
                         "acceptance ceiling (~0.72 measured on the flagship); "
                         "higher targets death-spiral the dual averaging")
    ap.add_argument("--adapt-mass", action="store_true")
    ap.add_argument("--seg", type=int, default=3)
    ap.add_argument("--noise-floor", type=float, default=None,
                    help="override RGPConfig.noise_floor (pass 0.0 to match a "
                         "reference chain run on pre-floor code)")
    ap.add_argument("--fit-iters", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.mode == "fit":
        out = mode_fit(args.out or "/tmp/pc_params.npz", args.fit_iters)
    elif args.mode == "tpu":
        out = mode_tpu(args.params, args.out or "/tmp/pc_tpu.npz", args.chains,
                       args.warmup, args.samples, args.max_depth,
                       args.target_accept, args.group_size, args.seg, args.seed,
                       noise_floor=args.noise_floor, adapt_mass=args.adapt_mass)
    elif args.mode == "cpu-ref":
        out = mode_cpu_ref(args.params, args.out or "/tmp/pc_cpu.npz",
                           args.chains, args.warmup, args.samples,
                           args.max_depth, args.target_accept, args.seed,
                           noise_floor=args.noise_floor)
    else:
        out = mode_compare(args.tpu, args.cpu)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
