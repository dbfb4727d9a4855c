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
             adapt_mass: bool = False, init_from: str | None = None,
             mass_from: str | None = None) -> dict:
    """The benchmarked configuration, retaining draws (positions).

    ``adapt_mass`` defaults OFF: the MAP-Hessian diagonal mass is kept
    through warmup — the pooled-Welford switch replaces it with between-chain
    spread estimated from barely-warmed chains (measured round 4: the switch
    multiplies mass_inv_max ~10x and the reset dual averaging has too few
    steps left to recover).

    ``init_from``/``mass_from`` (round 5): initialize chains from draws in an
    npz / take the diagonal mass from their empirical variance — the
    overdispersed-initialization protocol. Measured necessity: anchor-local
    jittered inits leave the WHOLE 256-chain ensemble metastable in a shell
    ~270 nats above the posterior bulk of its own target (the matched-policy
    f64 reference, initialized from this run's draws, migrates there within
    ~190 NUTS steps), and split-R-hat across identically-initialized chains
    cannot detect it."""
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
    if mass_from is not None:
        with np.load(mass_from) as z:
            mdraws = z["draws"].reshape(-1, flat0.shape[0])
        mass_inv0 = jnp.maximum(
            jnp.asarray(mdraws.var(axis=0, ddof=1), flat0.dtype), 1e-6
        )
    init_pool = None
    if init_from is not None:
        with np.load(init_from) as z:
            init_pool = z["draws"].reshape(-1, flat0.shape[0])

    def _group_init(kg, wc_):
        if init_pool is None:
            return flat0[None, :] + _jit_scale(mass_inv0)[None, :] * \
                jax.random.normal(kg, (wc_, flat0.shape[0]), flat0.dtype)
        idx = np.asarray(jax.random.choice(
            kg, init_pool.shape[0], (wc_,), replace=init_pool.shape[0] < wc_))
        return jnp.asarray(init_pool[idx], flat0.dtype)

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
        _group_init(jax.random.fold_in(k_init, 0), wc),
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
        z0 = _group_init(jax.random.fold_in(k_init, g), wc)
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
        "init": "anchor+jitter" if init_from is None else f"draws:{init_from}",
        "mass": "hessian" if mass_from is None else f"emp_var:{mass_from}",
    }


def _save_carry(path: str, carry, draws, divs, wall: float, meta: dict) -> None:
    import jax

    leaves = jax.tree.leaves(carry)
    np.savez(path, n_carry=len(leaves),
             **{f"c{i}": np.asarray(x) for i, x in enumerate(leaves)},
             draws=draws, diverging=divs, wall_seconds=wall,
             **{k: v for k, v in meta.items()})


def _load_carry(path: str, carry_template):
    import jax
    import jax.numpy as jnp

    with np.load(path) as z:
        n = int(z["n_carry"])
        tmpl_leaves = jax.tree.leaves(carry_template)
        leaves = [jnp.asarray(z[f"c{i}"], tmpl_leaves[i].dtype)
                  for i in range(n)]
        carry = jax.tree.unflatten(jax.tree.structure(carry_template), leaves)
        return carry, z["draws"], z["diverging"], float(z["wall_seconds"])


def mode_cpu_ref(params_npz: str, out: str, chains: int, warmup: int,
                 samples: int, max_depth: int, target_accept: float,
                 seed: int, noise_floor: float | None = None,
                 mass_from: str | None = None, init_from: str | None = None,
                 seg: int = 8, draw_seg: int = 4,
                 frozen_basis: bool = False) -> dict:
    """Exact f64 reference: fresh whitening every evaluation, scan psi (same
    math as dense, f64 accumulation), no watchdog on CPU.

    Round-5 rework (VERDICT r4 missing #1 / next #1) — the round-4 matched run
    produced R-hat 23 with ZERO divergences: each chain mixed locally
    (lag-1 |delta|/std 0.25) but sat 9-46 within-stds from the other, because
    (a) the MAP-Hessian mass underestimates the broad posterior directions
    (TPU marginal std ~1.5 vs within-chain std ~0.25) and (b) ``nuts_sample``'s
    default ``adapt_mass=True`` replaced that mass mid-warmup with pooled
    Welford variance from 2 barely-warmed chains. Neither choice changes the
    stationary distribution — only mixing — so this mode now:

    * takes the diagonal mass from the EMPIRICAL VARIANCE of the benchmarked
      TPU run's draws (``--mass-from pcheck_tpu.npz``), elementwise-maxed with
      the Hessian mass so every dim gets at least the larger of the two
      scales, and keeps it through warmup (``adapt_mass=False``);
    * initializes chain 0 at the anchor and the rest at random TPU draws
      (``--init-from``) — overdispersed across the broad region the TPU
      ensemble covers, which is exactly what split-R-hat needs to certify;
    * runs SEGMENTED with a resumable checkpoint (``<out>.ckpt.npz``) written
      after every segment — ``nuts_warmup``/``nuts_draw`` key randomness off
      the carry's step counter (fold_in), so a killed run resumes bitwise.
      Partial draws are also flushed to ``out`` each segment.
    """
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ..sample.api import make_rgp_potential
    from ..sample.nuts import nuts_draw, nuts_init, nuts_warmup
    from .sampling import _flagship

    cfg, params, Y, U, _, _ = _flagship(0, jnp.float64, params_npz,
                                        noise_floor=noise_floor)
    # Two reference targets (round 5 — the choice IS the sampled model):
    #
    # * frozen_basis=True — MATCHED-POLICY reference: the same frozen-anchor
    #   whitened bound the TPU sampler uses, evaluated in f64 with fresh
    #   per-eval everything else. Smooth (leapfrog dH ~1e-8 at eps 2e-3,
    #   measured) and the same regularization policy training optimized, so
    #   the compare validates dtype + psi dispatch + grouped dispatch +
    #   warmup protocol on ONE well-defined model.
    # * frozen_basis=False — fresh basis at the PINNED base floor
    #   (fresh_ladder=False: the production ladder's discrete trial makes the
    #   fresh potential cliffy and unsampleable, measured). This REMOVES
    #   regularization the production policy applies: measured on the 10k
    #   anchor, it unwalls a low-noise funnel ~275 nats deeper than the
    #   anchor optimum (reference chains migrate there with zero
    #   divergences; the frozen surrogate reads +300-900 nats at those
    #   positions) — i.e. it samples a DIFFERENT, collapse-prone model, the
    #   posterior-space face of the noise-collapse basins the round-5
    #   noise-floor work characterized in training space.
    potential, flat0, _ = make_rgp_potential(
        cfg, params, Y, U, block=64, psi_prefer="scan",
        fixed_whitening=frozen_basis, fresh_ladder=False,
    )
    Hd = jnp.diag(jax.jit(jax.hessian(potential))(flat0))
    mass_inv0 = 1.0 / jnp.clip(jnp.abs(Hd), 1e-4, 1e14)
    mass_src = "hessian"
    if mass_from is not None:
        with np.load(mass_from) as z:
            tdraws = z["draws"].reshape(-1, flat0.shape[0])
        emp_var = jnp.asarray(tdraws.var(axis=0, ddof=1), flat0.dtype)
        # empirical variance ALONE (round-5 fix, measured): the earlier
        # max(emp_var, hessian) kept the f64 Hessian's near-flat dims at
        # mass_inv ~500-1e4 while the posterior's true marginal variances are
        # <=2.7 — momenta along those dims overshoot, the energy error pins
        # acceptance below target, and dual averaging crushed eps to 4e-3 by
        # warmup step 24 (vs the TPU's 0.5 on the same anchor). The TPU
        # ensemble is well-mixed (R-hat 1.06, ESS>=2840), so its per-dim
        # variance IS the textbook diagonal mass; floor it only against
        # degenerate zero-variance dims.
        mass_inv0 = jnp.maximum(emp_var, 1e-6)
        mass_src = "tpu_draw_var"
    key = jax.random.PRNGKey(seed + 1000)
    k_init, k_run = jax.random.split(key)
    if init_from is not None:
        with np.load(init_from) as z:
            tdraws = z["draws"].reshape(-1, flat0.shape[0])
        idx = np.asarray(
            jax.random.choice(k_init, tdraws.shape[0], (chains,), replace=False)
        )
        z0 = jnp.asarray(tdraws[idx], flat0.dtype)
        z0 = z0.at[0].set(flat0)  # chain 0 from the anchor
        init_src = "anchor+tpu_draws"
    else:
        z0 = flat0[None, :] + _jit_scale(mass_inv0)[None, :] * jax.random.normal(
            k_init, (chains, flat0.shape[0]), flat0.dtype
        )
        init_src = "anchor+jitter"

    assert warmup % seg == 0 and samples % draw_seg == 0
    warm = jax.jit(lambda c: nuts_warmup(
        potential, c, k_run, seg, n_warmup=warmup, max_depth=max_depth,
        target_accept=target_accept, adapt_mass=False))
    draw = jax.jit(lambda c: nuts_draw(potential, c, k_run, draw_seg,
                                       max_depth=max_depth))

    ckpt = out + ".ckpt.npz"
    carry = nuts_init(z0, n_chains=chains, mass_inv=mass_inv0)
    draws = np.zeros((chains, 0, flat0.shape[0]))
    divs = np.zeros((chains, 0), bool)
    wall_prev = 0.0
    if os.path.exists(ckpt):
        carry, draws, divs, wall_prev = _load_carry(ckpt, carry)
        print(f"resumed from {ckpt}: step {int(carry.step)}, "
              f"{draws.shape[1]} draws banked", flush=True)

    meta = {"max_depth": max_depth, "target_accept": target_accept,
            "warmup": warmup, "frozen_basis": frozen_basis}
    t0 = time.perf_counter()

    def _flush():
        wall = wall_prev + time.perf_counter() - t0
        _save_carry(ckpt, carry, draws, divs, wall, meta)
        np.savez(out, draws=draws, diverging=divs, wall_seconds=wall, **meta)
        return wall

    while int(carry.step) < warmup:
        carry = warm(carry)
        float(carry.zs[0, 0])
        wall = _flush()
        print(f"warmup {int(carry.step)}/{warmup} ({wall:.0f}s, "
              f"eps {float(jnp.exp(carry.da.log_eps)):.4g})", flush=True)
    while draws.shape[1] < samples:
        carry, res = draw(carry)
        draws = np.concatenate([draws, np.asarray(res.samples)], axis=1)
        divs = np.concatenate([divs, np.asarray(res.diverging)], axis=1)
        wall = _flush()
        print(f"draws {draws.shape[1]}/{samples} ({wall:.0f}s)", flush=True)

    wall = wall_prev + time.perf_counter() - t0
    from ..sample.diagnostics import ess, split_rhat

    r = np.atleast_1d(split_rhat(draws))
    e = np.atleast_1d(ess(draws))
    return {
        "mode": "cpu-ref", "out": out, "chains": chains,
        "samples": int(draws.shape[1]),
        "warmup": warmup, "wall_seconds": round(wall, 1),
        "divergence_rate": round(float(divs.mean()), 4),
        "max_rhat": round(float(np.nanmax(r)), 4),
        "min_ess": round(float(np.nanmin(e)), 1),
        "median_ess": round(float(np.nanmedian(e)), 1),
        "mass": mass_src, "init": init_src,
        "step_size": round(float(np.exp(carry.da.log_eps_avg)), 6),
        "x64": True, "frozen_basis": frozen_basis,
    }


def mode_surrogate_check(params_npz: str, tpu_npz: str,
                         ref_npz: str | None = None, n_points: int = 4) -> dict:
    """Round-5 diagnostic (the round-4 compare failure's root cause): evaluate
    the TRUE bound (f64, fresh per-eval whitening) and the benchmarked
    SURROGATE (frozen whitening basis at the anchor; f32 and f64 variants) at
    the anchor, at TPU draws, and at reference-chain positions.

    Measured on the round-4 artifacts (premature 300-iter anchor): f32-frozen
    == f64-frozen to ~0.3 nats everywhere (dtype is NOT the discrepancy), and
    frozen == fresh at the anchor — but the f64-fresh potential favors a
    deep-noise region ~300 nats BELOW the TPU-sampled region, where the
    frozen surrogate is off by ~400-600 nats (the frozen spectral floor goes
    active away from the anchor). The sampler faithfully samples its
    surrogate; the surrogate is only the true posterior near the anchor —
    so the anchor must be a CONVERGED optimum for the benchmarked
    configuration to be valid."""
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ..sample.api import make_rgp_potential
    from .sampling import _flagship

    cfg, p64, Y, U, _, _ = _flagship(0, jnp.float64, params_npz)
    fresh, flat64, _ = make_rgp_potential(
        cfg, p64, Y, U, block=64, psi_prefer="scan", fixed_whitening=False)
    frozen64, _, _ = make_rgp_potential(
        cfg, p64, Y, U, block=64, psi_prefer="scan", fixed_whitening=True)
    cfg32, p32, Y32, U32, _, _ = _flagship(0, jnp.float32, params_npz)
    frozen32, _, _ = make_rgp_potential(
        cfg32, p32, Y32, U32, block=32, psi_prefer="scan", fixed_whitening=True)
    fresh, frozen64, frozen32 = map(jax.jit, (fresh, frozen64, frozen32))

    pts = {"anchor": np.asarray(flat64)}
    with np.load(tpu_npz) as z:
        d = z["draws"].reshape(-1, flat64.shape[0])
    rng = np.random.default_rng(7)
    for j, i in enumerate(rng.choice(d.shape[0], n_points, replace=False)):
        pts[f"tpu_draw_{i}"] = d[i]
    if ref_npz is not None:
        with np.load(ref_npz) as z:
            dr = z["draws"]
        for c in range(min(4, dr.shape[0])):
            pts[f"ref_chain{c}_last"] = dr[c, -1]
    rows = []
    for k, v in pts.items():
        u_fresh = float(fresh(jnp.asarray(v, jnp.float64)))
        u_fr64 = float(frozen64(jnp.asarray(v, jnp.float64)))
        u_fr32 = float(frozen32(jnp.asarray(v, jnp.float32)))
        rows.append({"point": k, "U_f64_fresh": round(u_fresh, 2),
                     "U_f64_frozen": round(u_fr64, 2),
                     "U_f32_frozen": round(u_fr32, 2),
                     "surrogate_gap": round(u_fr64 - u_fresh, 2),
                     "dtype_gap": round(u_fr32 - u_fr64, 2)})
    gaps = [abs(r["surrogate_gap"]) for r in rows]
    return {"mode": "surrogate-check", "points": rows,
            "max_abs_surrogate_gap": round(max(gaps), 2),
            "max_abs_dtype_gap": round(max(abs(r["dtype_gap"]) for r in rows), 2)}


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
    ap.add_argument("--mode", choices=("fit", "tpu", "cpu-ref", "compare",
                                       "surrogate-check"),
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
    ap.add_argument("--mass-from", default=None,
                    help="cpu-ref: npz of draws whose empirical variance sets "
                         "the diagonal mass (maxed with the Hessian mass)")
    ap.add_argument("--init-from", default=None,
                    help="cpu-ref: npz of draws to initialize chains from "
                         "(chain 0 stays at the anchor)")
    ap.add_argument("--draw-seg", type=int, default=4,
                    help="cpu-ref: draws per checkpointed segment")
    ap.add_argument("--frozen-basis", action="store_true",
                    help="cpu-ref: matched-policy reference on the frozen-"
                         "anchor whitened bound (see mode_cpu_ref comments)")
    ap.add_argument("--fit-iters", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.mode == "fit":
        out = mode_fit(args.out or "/tmp/pc_params.npz", args.fit_iters)
    elif args.mode == "tpu":
        out = mode_tpu(args.params, args.out or "/tmp/pc_tpu.npz", args.chains,
                       args.warmup, args.samples, args.max_depth,
                       args.target_accept, args.group_size, args.seg, args.seed,
                       noise_floor=args.noise_floor, adapt_mass=args.adapt_mass,
                       init_from=args.init_from, mass_from=args.mass_from)
    elif args.mode == "cpu-ref":
        out = mode_cpu_ref(args.params, args.out or "/tmp/pc_cpu.npz",
                           args.chains, args.warmup, args.samples,
                           args.max_depth, args.target_accept, args.seed,
                           noise_floor=args.noise_floor,
                           mass_from=args.mass_from, init_from=args.init_from,
                           seg=args.seg, draw_seg=args.draw_seg,
                           frozen_basis=args.frozen_basis)
    elif args.mode == "surrogate-check":
        out = mode_surrogate_check(args.params, args.tpu, ref_npz=args.cpu)
    else:
        out = mode_compare(args.tpu, args.cpu)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
