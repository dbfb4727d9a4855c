"""Headline benchmark: config 1 (BASELINE.json:7) — 1-layer RGP, RBF-ARD,
M=100 inducing, actuator dataset.

Measures ELBO optimization throughput (iterations/sec/chip, the BASELINE.json:2
metric) on the default backend (TPU under the driver) and the free-simulation
RMSE of the trained model. ``vs_baseline`` is the throughput ratio against this
repo's own CPU f64 run of the identical configuration — the declared
GPy-equivalent reference per BASELINE.md (the true GPy reference is not
runnable here: empty mount, no network).

Prints exactly ONE JSON line on the last line of stdout.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _setup(dtype):
    import jax.numpy as jnp

    from rgp_tpu.data import datasets
    from rgp_tpu.data.windows import Standardizer
    from rgp_tpu.models import rgp

    d = datasets.load("actuator")
    sy, su = Standardizer.fit(d.y_train), Standardizer.fit(d.u_train)
    Y = jnp.asarray(sy.transform(d.y_train), dtype)
    U = jnp.asarray(su.transform(d.u_train), dtype)
    Ut = jnp.asarray(su.transform(d.u_test), dtype)
    cfg = rgp.deep_rgp_config(wins=[0, 10], u_win=10, y_dim=1, u_dim=1, num_inducing=100)
    params = rgp.init_params(cfg, Y, U, dtype=dtype)
    return cfg, params, Y, U, Ut, sy, d


# whitening-refresh interval: the spectral whitening eigh (~680us/refresh at
# M=100 incl. the floor-ladder trials, vs the ~600us bound step) is amortized
# over this many Adam steps; a stale basis yields the exact bound of the
# current hyperparameters when no spectral-floor topup is active
# (collapsed_vi._common recomputes Kt = W^T Kmm W from the live Kmm), and
# otherwise a valid ELBO of a nearby clamp-regularized model frozen at the
# stale linearization point; hyperparameters move slowly at lr 1e-2, so 100
# steps costs ~7us/step of eigh instead of ~27
_WHITEN_EVERY = 100


def _timed_fit(cfg, params, Y, U, iters, lr, device=None):
    import jax
    import optax

    from rgp_tpu.models import rgp

    # cosine decay to 1% of peak: the schedule that reaches reference-quality
    # RMSE on config 1 (see BASELINE.md)
    opt = optax.adam(optax.cosine_decay_schedule(lr, iters, 0.01))

    def run(p0, n):
        state0 = opt.init(p0)

        def inner(carry, _):
            p, s, wh = carry
            loss, g = jax.value_and_grad(
                lambda q: -rgp.elbo(cfg, q, Y, U, block=None, whitening=wh)
            )(p)
            updates, s = opt.update(g, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s, wh), loss

        def outer(carry, _):
            p, s = carry
            wh = rgp.compute_whitenings(cfg, p, Y, U, block=None)
            (p, s, _), losses = jax.lax.scan(
                inner, (p, s, wh), None, length=_WHITEN_EVERY
            )
            return (p, s), losses

        (p, _), losses = jax.lax.scan(
            outer, (p0, state0), None, length=n // _WHITEN_EVERY
        )
        return p, losses.reshape(-1)

    run_jit = jax.jit(run, static_argnums=1, device=device)
    # compile at the measured scan length first (a different length would
    # recompile and pollute the timing), then time the cached executable.
    # Sync by HOST READ of one loss element: on the tunneled axon backend
    # ``block_until_ready`` can return before the remote execution finishes
    # (measured: 0.03 ms for a 2.7 ms kernel), so it cannot delimit a timing
    # region; a scalar device->host transfer is the only reliable barrier.
    p, losses = run_jit(params, iters)
    float(losses[-1])
    t0 = time.perf_counter()
    p, losses = run_jit(params, iters)
    float(losses[-1])
    dt = time.perf_counter() - t0
    return p, losses, iters / dt


def _fit_restarts(cfg, Y, U, iters, lr, seeds, dtype):
    """vmapped multi-restart: batch the whole Adam scan over independent init
    seeds on-chip and keep the best final ELBO (stabilizes the multimodal
    REVARB objective's run-to-run RMSE spread; see BASELINE.md note)."""
    import jax
    import optax

    from rgp_tpu.models import rgp

    stacked = jax.tree.map(
        lambda *xs: jax.numpy.stack(xs),
        *[rgp.init_params(cfg, Y, U, seed=s, dtype=dtype) for s in seeds],
    )
    opt = optax.adam(optax.cosine_decay_schedule(lr, iters, 0.01))

    def run_one(p0):
        state0 = opt.init(p0)

        def inner(carry, _):
            p, s, wh = carry
            loss, g = jax.value_and_grad(
                lambda q: -rgp.elbo(cfg, q, Y, U, block=None, whitening=wh)
            )(p)
            updates, s = opt.update(g, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s, wh), loss

        def outer(carry, _):
            p, s = carry
            wh = rgp.compute_whitenings(cfg, p, Y, U, block=None)
            (p, s, _), losses = jax.lax.scan(
                inner, (p, s, wh), None, length=_WHITEN_EVERY
            )
            return (p, s), losses

        (p, _), losses = jax.lax.scan(
            outer, (p0, state0), None, length=iters // _WHITEN_EVERY
        )
        return p, losses[-1, -1]

    params_b, final_b = jax.jit(jax.vmap(run_one))(stacked)
    # degeneracy guard: a collapsed hidden-layer noise / q(X) variance channel
    # (the classic REVARB failure mode) inflates the f32 ELBO to absurd values
    # while wrecking closed-loop rollout; exclude such restarts from selection
    from rgp_tpu.params import positive

    jnp_ = jax.numpy
    elbos = -final_b
    ok = jnp_.ones_like(elbos, dtype=bool)
    for h in range(len(cfg.layers)):
        lp = jax.tree.map(lambda a: a, params_b["layers"][h])
        # effective noise (the model floors at cfg.noise_floor since round 4):
        # a collapsed channel sits AT the floor, a healthy one above it
        ok &= (positive(lp["log_noise"]).reshape(-1) + cfg.noise_floor) > 1.5 * max(cfg.noise_floor, 1e-4)
        ok &= jnp_.exp(lp["log_lam"]).mean(axis=(1, 2)) > 1e-4
    # MAD outlier screen (round-1 verdict weak #5: the thresholds above let a
    # +2384-nat collapsed run win): a final ELBO far ABOVE its cohort's median
    # signals a partially collapsed variance channel the thresholds missed
    e_np = np.asarray(elbos)
    med = np.median(e_np)
    mad = np.median(np.abs(e_np - med))
    ok &= jnp_.asarray(e_np <= med + 10.0 * (mad + 1.0))
    score = jnp_.where(ok, elbos, -jnp_.inf)
    best = int(jnp_.argmax(jnp_.where(jnp_.any(ok), score, elbos)))
    p_best = jax.tree.map(lambda a: a[best], params_b)
    return p_best, [float(x) for x in elbos]


def _device_responsive(timeouts=(240, 300, 360, 480, 600),
                       backoffs=(30, 60, 120, 240)):
    """Probe the default backend from a SUBPROCESS with a hard timeout.

    The axon TPU tunnel can wedge (a lost client's grant blocks new claims for
    a while, e.g. right after another process exits); a hung device would
    otherwise hang the whole benchmark. The probe RETRIES with exponential
    backoff — total budget ~25-30 min before surrender (round-2 verdict #1:
    a 13.5-min budget gave up on a wedge that cleared later, and the official
    record became a misleading 300-iter CPU number). Returns (ok, diag) where
    ``diag`` records every attempt for the benchmark's ``details``.
    """
    import subprocess
    import sys
    import time as _time

    diag = {"probe_attempts": 0, "probe_timeouts_s": list(timeouts),
            "probe_elapsed_s": 0.0, "probe_failures": []}
    t_start = _time.perf_counter()
    for attempt, timeout in enumerate(timeouts):
        diag["probe_attempts"] = attempt + 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; print(float(jnp.ones(2).sum()))"],
                timeout=timeout, capture_output=True,
            )
            if r.returncode == 0:
                diag["probe_elapsed_s"] = round(_time.perf_counter() - t_start, 1)
                return True, diag
            diag["probe_failures"].append(f"rc={r.returncode}")
        except subprocess.TimeoutExpired:
            diag["probe_failures"].append(f"timeout@{timeout}s")
        if attempt < len(timeouts) - 1:
            _time.sleep(backoffs[min(attempt, len(backoffs) - 1)])
    diag["probe_elapsed_s"] = round(_time.perf_counter() - t_start, 1)
    return False, diag


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10000)
    ap.add_argument("--cpu-iters", type=int, default=300)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--cpu-solo", action="store_true",
                    help="internal: run the CPU reference solo and print iters/s")
    ap.add_argument("--restarts", type=int, default=8,
                    help="vmapped init seeds; best final ELBO selected for RMSE")
    ap.add_argument("--skip-cpu-baseline", action="store_true")
    ap.add_argument("--no-probe", action="store_true")
    ap.add_argument("--profile", type=int, default=0, help="trace N iters to /tmp/rgp_trace")
    args = ap.parse_args()

    import jax

    # persistent compile cache: the 10k-iter scan body compiles once per shape;
    # reruns (driver, restarts) hit the cache instead of a multi-minute compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/rgp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.cpu_solo:
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp

        cfg, params, Y, U, _, _, _ = _setup(jnp.float32)
        _, _, cpu_ips = _timed_fit(cfg, params, Y, U, args.iters, args.lr)
        print(cpu_ips)
        return

    fallback = False
    probe_diag = None
    if not args.no_probe:
        ok, probe_diag = _device_responsive()
        if not ok:
            jax.config.update("jax_platforms", "cpu")
            fallback = True
            args.iters = min(args.iters, 300)  # CPU fallback budget
            args.skip_cpu_baseline = True

    import jax.numpy as jnp

    from rgp_tpu.models import rgp

    backend = jax.default_backend()
    cfg, params, Y, U, Ut, sy, d = _setup(jnp.float32)

    if args.profile:
        with jax.profiler.trace("/tmp/rgp_trace"):
            _timed_fit(cfg, params, Y, U, args.profile, args.lr)

    p_fit, losses, ips = _timed_fit(cfg, params, Y, U, args.iters, args.lr)

    # multimodality control: pick the best of `restarts` vmapped seeds by final
    # ELBO (the timed run above stays the throughput measurement)
    finals = None
    if args.restarts > 1 and not fallback:
        p_fit, finals = _fit_restarts(
            cfg, Y, U, args.iters, args.lr, range(args.restarts), jnp.float32
        )

    means, _ = rgp.freerun(cfg, p_fit, Y, U, Ut)
    m = sy.inverse(np.asarray(means))
    rmse = float(np.sqrt(np.mean((m - d.y_test) ** 2)))
    zero_rmse = float(np.sqrt(np.mean(d.y_test**2)))

    vs = float("nan")
    if not args.skip_cpu_baseline:
        # SOLO subprocess CPU f64-capable baseline (BASELINE.md methodology;
        # an in-process jit(device=cpu) run is contended with the TPU client
        # threads and was measured ~7% slow, inflating the ratio)
        try:
            import subprocess
            import sys

            r = subprocess.run(
                [sys.executable, __file__, "--cpu-solo",
                 "--iters", str(args.cpu_iters), "--lr", str(args.lr)],
                capture_output=True, timeout=3600,
                env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
            )
            cpu_ips = float(r.stdout.decode().strip().splitlines()[-1])
            vs = ips / cpu_ips
        except Exception:
            pass

    def _num(x):
        x = float(x)
        return round(x, 4) if np.isfinite(x) else None

    result = {
        "metric": "elbo_iters_per_sec_per_chip[rgp1L_actuator_M100]",
        "value": round(ips, 2),
        "unit": "iter/s",
        "vs_baseline": _num(vs),
        "details": {
            "backend": backend,
            "device_fallback": fallback,
            "elbo_first": _num(-losses[0]),
            "elbo_last": _num(-losses[-1]),
            "freerun_rmse_actuator": _num(rmse),
            "zero_predictor_rmse": _num(zero_rmse),
            "iters": args.iters,
            "restart_final_elbos": None if finals is None else [round(x, 1) for x in finals],
        },
    }
    if probe_diag is not None:
        result["details"].update(probe_diag)

    if fallback:
        # Emit the provisional CPU record IMMEDIATELY: the recovery path below
        # can run for tens of minutes (re-probe + full TPU rerun), and if the
        # caller's outer timeout kills us mid-recovery, the run must still
        # have produced SOME last-line JSON (measured failure, round 3: a
        # 50-min wedge + timeout 3000 yielded an empty record). A successful
        # recovery prints the real measurement afterwards, and the driver
        # reads the LAST line.
        result["details"]["provisional"] = True
        print(json.dumps(result), flush=True)
        result["details"].pop("provisional")
        # The wedge may have cleared while the (~1 min) CPU fallback ran —
        # re-probe, and if the TPU is back, the REAL measurement replaces the
        # fallback record entirely (round-2 verdict #1: the fallback number
        # must never stand as the official metric when the TPU is reachable).
        ok2, diag2 = _device_responsive(timeouts=(240, 300, 480),
                                        backoffs=(30, 120))
        if ok2:
            import os
            import subprocess
            import sys

            env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
            r = subprocess.run(
                [sys.executable, __file__, "--no-probe"],
                capture_output=True, timeout=7200, env=env,
            )
            try:
                retry = json.loads(r.stdout.decode().strip().splitlines()[-1])
                retry["details"]["recovered_after_fallback"] = True
                retry["details"].update(probe_diag or {})
                print(json.dumps(retry))
                return
            except Exception:
                result["details"]["fallback_reason"] = (
                    "tpu probe exhausted; recovery rerun failed "
                    f"(rc={r.returncode})"
                )
        else:
            result["details"]["fallback_reason"] = (
                "tpu probe exhausted twice (pre- and post-fallback); "
                "device unreachable this round"
            )
            result["details"]["post_fallback_probe"] = diag2
    print(json.dumps(result))


if __name__ == "__main__":
    main()
