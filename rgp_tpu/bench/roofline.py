"""Roofline / MFU attribution for the hot ops (SURVEY.md S5.1, S6).

The north star (`BASELINE.json:5`) requires "kernel/Cholesky ops at >=60% of
roofline per chip" to be *measured*, not asserted. The reference has no
analog (GPy relies on whatever BLAS achieves); this module is the TPU-native
equivalent of profiling a BLAS-bound code with `perf`:

1. **Calibrate the machine ceilings empirically** (not from spec sheets):
   - MXU f32/bf16 matmul FLOP/s on a large square matmul,
   - HBM stream bandwidth (elementwise triad on a ~1 GiB array),
   - VPU transcendental throughput (elementwise ``exp``).
2. **Time each hot op** of the RGP training step at production shapes
   (jitted, steady-state, ``block_until_ready``).
3. **Attribute**: for each op, compute its analytic work (matmul FLOPs, exp
   count, minimum HBM traffic) and report utilization against each measured
   ceiling. The op's *roofline fraction* is the MAX utilization across the
   three resources — i.e. how close it runs to the binding resource's
   speed of light.
4. Optionally capture a ``jax.profiler`` trace and (when
   ``tensorboard_plugin_profile`` can parse it) a per-XLA-op time table, so
   the attribution is cross-checkable against the real trace.

Usage (on the TPU):
    python -m rgp_tpu.bench.roofline --out artifacts/roofline.json
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["calibrate", "measure_ops", "report", "main"]

_PREC = lax.Precision.HIGHEST


def _host_sync(out) -> float:
    """Force device->host materialization of one scalar derived from out.

    On this tunneled backend ``block_until_ready`` returns immediately
    (measured: 0.03 ms for a 2.7 ms kernel), so the ONLY reliable sync is a
    host transfer. Returns a junk float to keep the dependency alive.
    """
    leaves = jax.tree.leaves(out)
    return float(jnp.sum(leaves[0].ravel()[0]))


def _timeit(fn, *args, iters: int = 50, warmup: int = 2) -> float:
    """Amortized wall seconds per call: N pipelined dispatches + ONE host
    read at the end, divided by N. Per-call host syncs would add the ~60 ms
    tunnel round-trip to every call and swamp ms-scale kernels."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _host_sync(out)
    # adapt the repeat count so slow ops don't stall the report
    t0 = time.perf_counter()
    _host_sync(fn(*args))
    t1 = time.perf_counter() - t0
    iters = max(5, min(iters, int(5.0 / max(t1, 1e-4))))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _host_sync(out)
    return (time.perf_counter() - t0) / iters


# ----------------------------------------------------------------- ceilings


def calibrate(n: int = 4096) -> dict:
    """Measured speed-of-light ceilings for this chip."""
    print("  [roofline] calibrating ceilings...", flush=True)
    key = jax.random.PRNGKey(0)
    a32 = jax.random.normal(key, (n, n), jnp.float32)
    b32 = jax.random.normal(key, (n, n), jnp.float32)
    a16 = a32.astype(jnp.bfloat16)
    b16 = b32.astype(jnp.bfloat16)

    mm32 = jax.jit(lambda a, b: a @ b)  # default precision on f32 inputs
    mm32h = jax.jit(lambda a, b: jnp.matmul(a, b, precision=_PREC))
    mm16 = jax.jit(
        lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32)
    )
    flops = 2.0 * n * n * n
    t32 = _timeit(mm32, a32, b32)
    print(f"  [roofline] matmul f32 default: {flops / t32 / 1e12:.1f} TFLOP/s", flush=True)
    t32h = _timeit(mm32h, a32, b32)
    print(f"  [roofline] matmul f32 HIGHEST: {flops / t32h / 1e12:.1f} TFLOP/s", flush=True)
    t16 = _timeit(mm16, a16, b16)
    print(f"  [roofline] matmul bf16: {flops / t16 / 1e12:.1f} TFLOP/s", flush=True)

    # HBM stream: out = x * 1.0001 + y  (2 reads + 1 write per element)
    m = 128 * 1024 * 1024 // 4  # 128M f32 elements = 512 MiB/array
    x = jnp.ones((m,), jnp.float32)
    y = jnp.ones((m,), jnp.float32)
    triad = jax.jit(lambda x, y: x * 1.0001 + y)
    t_bw = _timeit(triad, x, y, iters=10)
    bytes_moved = 3.0 * 4.0 * m

    # VPU transcendental: K CHAINED exps fused into one kernel, so HBM traffic
    # (2 passes over the array) is amortized over K exps and the measurement
    # is VPU-bound, not bandwidth-bound. (A single exp over a big array is
    # pure HBM stream — the round-2 artifact calibrated THAT, yielding a 16x
    # understated ceiling and >1000% "utilizations" for the exp-dominated
    # psi2 ops.) The tiny multiplier keeps values ~1 so nothing overflows.
    K = 64
    me = 8 * 1024 * 1024

    def exp_chain(x):
        for _ in range(K):
            x = jnp.exp(x * 1e-6)
        return x

    expf = jax.jit(exp_chain)
    t_exp = _timeit(expf, x[:me], iters=10)

    dev = jax.devices()[0]
    return {
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "backend": jax.default_backend(),
        "matmul_f32_default_flops": flops / t32,
        "matmul_f32_highest_flops": flops / t32h,
        "matmul_bf16_flops": flops / t16,
        "hbm_bandwidth_bytes": bytes_moved / t_bw,
        "exp_per_sec": me * K / t_exp,
    }


# ------------------------------------------------------------------ hot ops


def _rbf_params(Q, dtype=jnp.float32):
    from ..params import np_positive_inv

    return {
        "log_var": np_positive_inv(1.0, dtype),
        "log_ls": jnp.full((Q,), np_positive_inv(1.2, dtype)),
    }


def measure_ops(T: int = 2048, M: int = 256, Q: int = 32) -> list[dict]:
    """Time each hot op class at production shape and attribute its work.

    Work models (per call):
    - psi1: 3 matmuls (T,Q)x(Q,M) = 6*T*M*Q flops, T*M exps; traffic =
      read mu,s (2*T*Q*4 B) + Z (M*Q*4) + write (T*M*4).
    - psi2_sum: the q-contraction einsum 2*T*M*M*Q flops + T*M*M exps;
      minimum traffic = read mu,s + Z + write (M,M) — intermediates should
      stay on-chip (that is what the Pallas kernel enforces).
    - cholesky(M): M^3/3 flops, not MXU-shaped — reported vs matmul ceiling
      for honesty about the sequential-panel structure.
    - triangular_solve (M,M) x (M,T): T*M^2 flops.
    - eigh(M): ~9*M^3 (tridiag + QR iterations), latency-bound at M=256.
    - bound_fwd_bwd: full collapsed REVARB bound value+grad; work model =
      psi-stat fwd+bwd (~3x fwd) as the dominant term.
    """
    from ..inference.collapsed_vi import collapsed_bound
    from ..kernels import RBF
    from ..ops import psi_stats as ps

    key = jax.random.PRNGKey(1)
    kmu, ks, kz, ky = jax.random.split(key, 4)
    mu = jax.random.normal(kmu, (T, Q), jnp.float32)
    s = 0.05 * jax.random.uniform(ks, (T, Q), jnp.float32) + 0.01
    Z = jax.random.normal(kz, (M, Q), jnp.float32)
    Y = jax.random.normal(ky, (T, 1), jnp.float32)
    kern = RBF(input_dim=Q)
    p = _rbf_params(Q)
    log_noise = jnp.asarray(0.0, jnp.float32)

    B = 4.0  # f32 bytes
    ops: list[dict] = []

    def add(name, seconds, mxu_flops=0.0, exps=0.0, bytes_min=0.0, note=""):
        print(f"  [roofline] {name}: {seconds * 1e3:.3f} ms", flush=True)
        ops.append(
            {
                "op": name,
                "ms": seconds * 1e3,
                "mxu_flops": mxu_flops,
                "exps": exps,
                "bytes_min": bytes_min,
                "note": note,
            }
        )

    # Psi1
    f = jax.jit(lambda p, Z, mu, s: ps._rbf_psi1(p, Z, mu, s))
    t = _timeit(f, p, Z, mu, s)
    add(
        "psi1",
        t,
        mxu_flops=6.0 * T * M * Q,
        exps=1.0 * T * M,
        bytes_min=B * (2 * T * Q + M * Q + T * M),
    )

    # Psi2 sum — XLA chunked scan
    f = jax.jit(lambda p, Z, mu, s: ps._rbf_psi2_chunk(p, Z, mu, s))
    t = _timeit(f, p, Z, mu, s)
    add(
        "psi2_sum_xla",
        t,
        mxu_flops=2.0 * T * M * M * Q,
        exps=1.0 * T * M * M,
        bytes_min=B * (2 * T * Q + M * Q + M * M),
        note="single chunk (T,M,M) materialized",
    )

    # Psi2 sum — fused Pallas kernel (TPU only)
    if jax.default_backend() == "tpu":
        from ..ops.pallas.psi2 import rbf_psi2_sum_pallas

        f = jax.jit(lambda p, Z, mu, s: rbf_psi2_sum_pallas(p, Z, mu, s))
        t = _timeit(f, p, Z, mu, s)
        add(
            "psi2_sum_pallas",
            t,
            mxu_flops=2.0 * T * M * M * Q,
            exps=1.0 * T * M * M,
            bytes_min=B * (2 * T * Q + M * Q + M * M),
            note="fused tile kernel, VMEM-resident (T,M,M)",
        )

        # Psi2 fwd+bwd — Pallas custom-vjp vs pure-XLA chunked
        def loss_pallas(p, Z, mu, s):
            return jnp.sum(rbf_psi2_sum_pallas(p, Z, mu, s))

        f = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2, 3)))
        t = _timeit(f, p, Z, mu, s)
        add(
            "psi2_fwd_bwd_pallas",
            t,
            mxu_flops=3.0 * 2.0 * T * M * M * Q,
            exps=2.0 * T * M * M,
            bytes_min=B * (2 * (2 * T * Q + M * Q) + M * M),
            note="recompute-in-tile backward",
        )

    def loss_xla(p, Z, mu, s):
        return jnp.sum(ps._rbf_psi2_chunk(p, Z, mu, s))

    f = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3)))
    t = _timeit(f, p, Z, mu, s)
    add(
        "psi2_fwd_bwd_xla",
        t,
        mxu_flops=3.0 * 2.0 * T * M * M * Q,
        exps=2.0 * T * M * M,
        bytes_min=B * (2 * (2 * T * Q + M * Q) + M * M),
        note="single-chunk expression; XLA fuses/remats the (T,M,M) chain "
             "(measured traffic is nowhere near a materialized residual)",
    )

    def loss_xla_scan(p, Z, mu, s):
        return jnp.sum(ps._rbf_psi2_sum_xla(p, Z, mu, s, 128))

    f = jax.jit(jax.grad(loss_xla_scan, argnums=(0, 1, 2, 3)))
    t = _timeit(f, p, Z, mu, s)
    add(
        "psi2_fwd_bwd_xla_scan128",
        t,
        mxu_flops=3.0 * 2.0 * T * M * M * Q,
        exps=2.0 * T * M * M,
        bytes_min=B * (2 * (2 * T * Q + M * Q) + M * M),
        note="chunked lax.scan accumulation (block=128)",
    )

    # Cholesky + triangular solve + eigh at (M, M)
    Kmm = (
        kern.K(p, Z, Z)
        + 1e-4 * jnp.eye(M, dtype=jnp.float32)
    )
    f = jax.jit(lambda K: lax.linalg.cholesky(K))
    t = _timeit(f, Kmm)
    add("cholesky_M", t, mxu_flops=M**3 / 3.0, bytes_min=B * 2 * M * M,
        note="sequential panel factorization; latency-bound at M=256")

    L = f(Kmm)
    rhs = jax.random.normal(key, (M, T), jnp.float32)
    f = jax.jit(
        lambda L, r: lax.linalg.triangular_solve(L, r, left_side=True, lower=True)
    )
    t = _timeit(f, L, rhs)
    add("triangular_solve_M_T", t, mxu_flops=1.0 * T * M * M,
        bytes_min=B * (M * M + 2 * M * T))

    f = jax.jit(lambda K: jnp.linalg.eigh(K))
    t = _timeit(f, Kmm)
    add("eigh_M", t, mxu_flops=9.0 * M**3, bytes_min=B * 3 * M * M,
        note="whitening basis; amortized over train steps (aux_fn)")

    # Full collapsed bound value+grad (the production training step core)
    def bound(p, Z, log_noise, mu, s):
        stats = ps.psi_statistics(kern, p, Z, mu, s, block=None)
        return collapsed_bound(kern, p, Z, log_noise, stats, Y)

    f = jax.jit(jax.value_and_grad(bound, argnums=(0, 1, 2, 3, 4)))
    t = _timeit(f, p, Z, log_noise, mu, s)
    add(
        "collapsed_bound_fwd_bwd",
        t,
        mxu_flops=3.0 * 2.0 * T * M * M * Q + 2.0 * T * M * M + 12.0 * M**3,
        exps=2.0 * T * M * M + 3.0 * T * M,
        bytes_min=B * (2 * (2 * T * Q + M * Q + T * M) + 4 * M * M),
        note="psi stats + whitening + solves + assembly, fwd+bwd; includes a "
             "PER-CALL eigh + floor-ladder that production amortizes",
    )

    # The PRODUCTION configuration (VERDICT r3 #5): training amortizes the
    # whitening eigh over _WHITEN_EVERY=100 steps (bench.py / fit_adam
    # aux_fn), so the per-step cost excludes the eigh + ladder trials. This
    # row is the honest per-step utilization of the as-benchmarked step.
    from ..inference.collapsed_vi import whitening_basis
    from ..params import positive as _pos

    def _wh(p, Z, log_noise, mu, s):
        stats = ps.psi_statistics(kern, p, Z, mu, s, block=None)
        Kmm = kern.K(p, Z, Z)
        return whitening_basis(Kmm, stats.psi2, 1.0 / _pos(log_noise))

    wh = jax.jit(_wh)(p, Z, log_noise, mu, s)

    def bound_amort(p, Z, log_noise, mu, s):
        stats = ps.psi_statistics(kern, p, Z, mu, s, block=None)
        return collapsed_bound(kern, p, Z, log_noise, stats, Y, W=wh)

    f = jax.jit(jax.value_and_grad(bound_amort, argnums=(0, 1, 2, 3, 4)))
    t = _timeit(f, p, Z, log_noise, mu, s)
    add(
        "collapsed_bound_fwd_bwd_amortized_whitening",
        t,
        mxu_flops=3.0 * 2.0 * T * M * M * Q + 2.0 * T * M * M + 3.0 * M**3,
        exps=2.0 * T * M * M + 3.0 * T * M,
        bytes_min=B * (2 * (2 * T * Q + M * Q + T * M) + 4 * M * M),
        note="production step (whitening basis precomputed, refreshed every "
             "100 train steps): psi stats + solves + assembly fwd+bwd only",
    )
    return ops


def report(ceilings: dict, ops: list[dict]) -> dict:
    """Attach per-resource utilizations and the binding-resource fraction."""
    mxu = ceilings["matmul_f32_highest_flops"]
    bw = ceilings["hbm_bandwidth_bytes"]
    eps = ceilings["exp_per_sec"]
    rows = []
    for o in ops:
        sec = o["ms"] / 1e3
        u_mxu = (o["mxu_flops"] / sec) / mxu if o["mxu_flops"] else 0.0
        u_exp = (o["exps"] / sec) / eps if o["exps"] else 0.0
        u_bw = (o["bytes_min"] / sec) / bw if o["bytes_min"] else 0.0
        binding = max(
            ("mxu", u_mxu), ("vpu_exp", u_exp), ("hbm", u_bw), key=lambda kv: kv[1]
        )
        rows.append(
            {
                **o,
                "util_mxu": round(u_mxu, 4),
                "util_vpu_exp": round(u_exp, 4),
                "util_hbm": round(u_bw, 4),
                "binding_resource": binding[0],
                "roofline_fraction": round(binding[1], 4),
            }
        )
    return {"ceilings": ceilings, "ops": rows}


def capture_trace(log_dir: str, T: int = 2048, M: int = 256, Q: int = 32):
    """Capture a profiler trace of the bound fwd+bwd; try to extract the
    per-XLA-op table via tensorboard_plugin_profile (best-effort)."""
    from ..inference.collapsed_vi import collapsed_bound
    from ..kernels import RBF
    from ..ops import psi_stats as ps

    key = jax.random.PRNGKey(1)
    mu = jax.random.normal(key, (T, Q), jnp.float32)
    s = 0.05 * jnp.ones((T, Q), jnp.float32)
    Z = jax.random.normal(key, (M, Q), jnp.float32)
    Y = jax.random.normal(key, (T, 1), jnp.float32)
    kern = RBF(input_dim=Q)
    p = _rbf_params(Q)

    # trace the PRODUCTION step: amortized whitening basis (see measure_ops),
    # so the per-op table answers where the non-psi2 time of the production
    # fwd+bwd goes (VERDICT r3 #5) rather than re-measuring the per-call eigh
    from ..inference.collapsed_vi import whitening_basis
    from ..params import positive as _pos

    ln = jnp.asarray(0.0, jnp.float32)

    def _wh(p, Z, mu, s):
        stats = ps.psi_statistics(kern, p, Z, mu, s, block=None)
        return whitening_basis(kern.K(p, Z, Z), stats.psi2, 1.0 / _pos(ln))

    wh = jax.jit(_wh)(p, Z, mu, s)

    def bound(p, Z, mu, s):
        stats = ps.psi_statistics(kern, p, Z, mu, s, block=None)
        return collapsed_bound(kern, p, Z, ln, stats, Y, W=wh)

    f = jax.jit(jax.value_and_grad(bound, argnums=(0, 1, 2, 3)))
    # _host_sync, not block_until_ready: on the tunneled backend the latter
    # returns before remote execution completes (see _host_sync docstring),
    # which would let the trace context exit with iterations still in flight
    _host_sync(f(p, Z, mu, s))
    with jax.profiler.trace(log_dir):
        for _ in range(10):
            out = f(p, Z, mu, s)
        _host_sync(out)
    return _parse_op_stats(log_dir)


_PARSE_SNIPPET = r"""
import collections, glob, json, sys
paths = sorted(glob.glob(sys.argv[1] + "/**/*.xplane.pb", recursive=True))
if not paths:
    print(json.dumps(None)); raise SystemExit
# Parse the XSpace proto DIRECTLY (the tensorboard_plugin_profile converter
# needs a pywrap symbol absent from the baked tensorflow) and aggregate the
# device plane's "XLA Ops" line by op name.
from tensorflow.tsl.profiler.protobuf import xplane_pb2
xs = xplane_pb2.XSpace()
with open(paths[-1], "rb") as fh:
    xs.ParseFromString(fh.read())
out = []
for pl in xs.planes:
    if not pl.name.startswith("/device:"):
        continue
    for line in pl.lines:
        if line.name != "XLA Ops":
            continue
        agg = collections.Counter(); cnt = collections.Counter()
        for e in line.events:
            name = pl.event_metadata[e.metadata_id].name
            agg[name] += e.duration_ps / 1e9
            cnt[name] += 1
        total = sum(agg.values())
        rows = [
            {"op": n[:120], "ms": round(ms, 4), "count": cnt[n],
             "frac": round(ms / total, 4)}
            for n, ms in agg.most_common(int(sys.argv[2]))
        ]
        out.append({"plane": pl.name, "total_ms": round(total, 3),
                    "n_events": len(line.events), "top_ops": rows})
print(json.dumps(out))
"""


def _parse_op_stats(log_dir: str, top: int = 20):
    """Per-op device-time table aggregated straight from the xplane proto.

    Runs in a SUBPROCESS with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python:
    the generated protos predate the installed protobuf's C++ fastpath
    (Descriptor error), and the env var only takes effect before
    google.protobuf is first imported — too late in a process where jax and
    friends are already up.
    """
    try:
        import os
        import subprocess
        import sys

        env = {**os.environ, "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION": "python",
               "JAX_PLATFORMS": "cpu"}
        r = subprocess.run(
            [sys.executable, "-c", _PARSE_SNIPPET, log_dir, str(top)],
            capture_output=True, timeout=600, env=env, text=True,
        )
        if r.returncode != 0:
            return f"op-stats extraction failed: {r.stderr[-500:]}"
        return json.loads(r.stdout.strip().splitlines()[-1])
    except Exception as e:  # plugin/version drift must not sink the report
        return f"op-stats extraction unavailable: {type(e).__name__}: {e}"


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None, help="write JSON report here")
    ap.add_argument("--T", type=int, default=2048)
    ap.add_argument("--M", type=int, default=256)
    ap.add_argument("--Q", type=int, default=32)
    ap.add_argument("--trace-dir", default=None, help="also capture a profiler trace")
    args = ap.parse_args(argv)

    # reruns hit the persistent cache instead of recompiling ~10 jits
    jax.config.update("jax_compilation_cache_dir", "/tmp/rgp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ceilings = calibrate()
    ops = measure_ops(args.T, args.M, args.Q)
    rep = report(ceilings, ops)
    rep["shape"] = {"T": args.T, "M": args.M, "Q": args.Q}
    if args.trace_dir:
        rep["trace_op_stats"] = capture_trace(args.trace_dir, args.T, args.M, args.Q)
        rep["trace_dir"] = args.trace_dir

    print(json.dumps({"ceilings": rep["ceilings"], "shape": rep["shape"]}, indent=2))
    hdr = f"{'op':<26}{'ms':>9}{'mxu':>8}{'vpu':>8}{'hbm':>8}  binding"
    print(hdr)
    for r in rep["ops"]:
        print(
            f"{r['op']:<26}{r['ms']:>9.3f}{r['util_mxu']:>8.2%}{r['util_vpu_exp']:>8.2%}"
            f"{r['util_hbm']:>8.2%}  {r['binding_resource']}"
            f" ({r['roofline_fraction']:.0%} of roofline)"
        )
    if args.out:
        import os

        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(rep, fh, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
