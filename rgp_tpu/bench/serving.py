"""Serving-path benchmark: closed-loop simulation and one-step prediction.

The reference's deployment story is `m.freerun` (closed-loop simulation of
the fitted model over test inputs, SURVEY.md S3.3) and `m.predict` (one-step-
ahead, teacher-forced). This measures both on the flagship config-1 model:

  * freerun steps/s — the whole moment-matched rollout is ONE jitted
    `lax.scan` (posterior sufficient statistics precomputed once), so this is
    the steady-state closed-loop serving rate;
  * freerun end-to-end latency for a T*-step horizon (the "simulate this
    input sequence" request latency, compile excluded);
  * one-step-ahead predict_train latency over the training span.

Timing is delimited by host reads (``block_until_ready`` returns early on the
tunneled axon backend — BASELINE.md gotcha).

Usage:
    python -m rgp_tpu.bench.serving [--fit-iters 300] [--repeat 20]
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rgp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from ..models import rgp
    from .sampling import _flagship

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fit-iters", type=int, default=300)
    ap.add_argument("--repeat", type=int, default=20)
    ap.add_argument("--batch", type=int, default=64,
                    help="batched-serving width (vmapped closed-loop sims)")
    args = ap.parse_args(argv)

    cfg, params, Y, U, Ut, _ = _flagship(args.fit_iters, jnp.float32)
    T_star = int(Ut.shape[0])

    def run_freerun():
        m, v = rgp.freerun(cfg, params, Y, U, Ut)
        return float(m[-1, 0]) + float(v[-1, 0])  # host-read barrier

    run_freerun()  # compile
    t0 = time.perf_counter()
    for _ in range(args.repeat):
        run_freerun()
    dt_free = (time.perf_counter() - t0) / args.repeat

    def run_onestep():
        m, v = rgp.predict_train(cfg, params, Y, U)
        return float(m[-1, 0]) + float(v[-1, 0])

    run_onestep()  # compile
    t0 = time.perf_counter()
    for _ in range(args.repeat):
        run_onestep()
    dt_one = (time.perf_counter() - t0) / args.repeat

    # batched serving: B independent input sequences simulated closed-loop in
    # one vmapped scan — per-step latency is shared across the batch, so the
    # aggregate steps/s is the chip's true serving throughput (each sequence
    # perturbs the test inputs so XLA cannot CSE them away)
    B = args.batch
    k = jax.random.PRNGKey(0)
    Us = Ut[None, :, :] + 0.01 * jax.random.normal(
        k, (B, *Ut.shape), Ut.dtype
    )
    batched = jax.jit(jax.vmap(lambda u: rgp.freerun(cfg, params, Y, U, u)))

    def run_batched():
        m, v = batched(Us)
        return float(m[-1, -1, 0]) + float(v[-1, -1, 0])

    run_batched()  # compile
    n_rep = max(1, args.repeat // 4)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        run_batched()
    dt_batch = (time.perf_counter() - t0) / n_rep

    print(json.dumps({
        "metric": f"freerun_steps_per_sec[rgp1L_actuator_M100_T{T_star}]",
        "value": round(T_star / dt_free, 1),
        "unit": "steps/s",
        "vs_baseline": None,
        "details": {
            "backend": jax.default_backend(),
            "horizon_steps": T_star,
            "freerun_latency_ms": round(dt_free * 1e3, 2),
            "onestep_predict_latency_ms": round(dt_one * 1e3, 2),
            "batched_serving_width": B,
            "batched_serving_steps_per_sec": round(B * T_star / dt_batch, 1),
            "batched_serving_latency_ms": round(dt_batch * 1e3, 2),
            "repeat": args.repeat,
            "moment_matched": True,
        },
    }))


if __name__ == "__main__":
    main()
