"""Fused-layer-step benchmark: windowed gather -> psi-statistics -> bound.

Closes the "psi-statistics fused with the per-timestep recurrence" question
(BASELINE.json:5, SURVEY.md S7 P6) by MEASUREMENT at the two canonical shapes
(VERDICT r2 item 4): times the FULL REVARB layer step — lag-window gather from
q(X) moments, Psi1/Psi2, whitened collapsed bound, entropy/KL terms — forward
+ backward, scan-amortized (200 steps inside one jit, so per-call dispatch
latency is excluded, matching how training actually runs), and compares it
against the collapsed bound alone on PRE-materialized windows. The difference
IS the cost of the unfused gather; if it is within noise, there is nothing
left for a fused Pallas gather->psi kernel to win, because XLA already fuses
the (T, L*Q) window assembly (pure gathers/concats) into the psi-stat
consumers — gathers are free relative to the exp chain.

Usage:
    python -m rgp_tpu.bench.layer_step            # both shapes
    python -m rgp_tpu.bench.layer_step --iters 200
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..inference.collapsed_vi import collapsed_bound
from ..models import rgp
from ..ops.psi_stats import psi_statistics

__all__ = ["run_shape", "main"]


def _scan_time(fn, args, iters: int) -> float:
    """Per-iteration ms of ``fn(*args)`` fwd+bwd, amortized under lax.scan."""

    def body(c, _):
        # perturb one input by a carry-derived epsilon so the body is
        # iteration-DEPENDENT: a loop-invariant fn(*args) could otherwise be
        # hoisted out of the while-loop by XLA's licm and the timing would
        # silently measure one iteration (ADVICE r3)
        eps = 1e-30 * c
        leaves, treedef = jax.tree.flatten(args)
        leaves = [leaves[0] + jnp.asarray(eps, leaves[0].dtype).astype(leaves[0].dtype)] + leaves[1:]
        out = fn(*jax.tree.unflatten(treedef, leaves))
        tot = sum(jnp.sum(x) for x in jax.tree.leaves(out))
        return c + tot, None

    @jax.jit
    def run():
        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=iters)
        return out

    jax.block_until_ready(run())  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(run())
    return (time.perf_counter() - t0) / iters * 1e3


def run_shape(T: int, M: int, win: int, u_win: int, iters: int = 200,
              seed: int = 0) -> dict:
    """One-hidden-layer RGP at (T, M) with windowed input dim win + u_win."""
    rng = np.random.default_rng(seed)
    Y = jnp.asarray(rng.standard_normal((T, 1)), jnp.float32)
    U = jnp.asarray(rng.standard_normal((T, 1)), jnp.float32)
    cfg = rgp.deep_rgp_config(
        wins=[0, win], u_win=u_win, y_dim=1, u_dim=1, num_inducing=M,
    )
    params = rgp.init_params(cfg, Y, U, seed=seed)

    # (a) full model step: gather -> psi -> bound, all REVARB terms
    full_loss = lambda p: -rgp.elbo(cfg, p, Y, U)
    full_ms = _scan_time(jax.grad(full_loss), (params,), iters)

    # (b) the same TWO collapsed bounds (hidden + emission) on
    # PRE-materialized windows of the SAME shapes (psi + bound only; every
    # gather is done once outside the timed region, and q(X)/Y enter as
    # constants so the backward covers hyperparameters + Z, the part the
    # gather cannot touch)
    from ..data.windows import current_window

    spec = cfg.layers[0]
    lp = params["layers"][0]
    mus, lams = rgp._hidden_moments(cfg, params, Y, U)
    X_mu, X_s = rgp._layer_inputs(cfg, 0, mus[0], lams[0], None, None, U)
    X_mu = jax.lax.stop_gradient(X_mu)
    X_s = jax.lax.stop_gradient(X_s)
    tgt_mu = jax.lax.stop_gradient(mus[0][spec.win:])
    tgt_lam = jax.lax.stop_gradient(lams[0][spec.win:])
    Xo_mu = jax.lax.stop_gradient(current_window(tgt_mu, cfg.out_win))
    Xo_s = jax.lax.stop_gradient(current_window(tgt_lam, cfg.out_win))

    def bound_loss(both):
        kp, op = both
        stats = psi_statistics(spec.kernel, kp["kern"], kp["Z"], X_mu, X_s,
                               block=128)
        t = collapsed_bound(spec.kernel, kp["kern"], kp["Z"],
                            kp["log_noise"], stats, tgt_mu, tgt_lam)
        so = psi_statistics(cfg.out_kernel, op["kern"], op["Z"], Xo_mu, Xo_s,
                            block=128)
        t = t + collapsed_bound(cfg.out_kernel, op["kern"], op["Z"],
                                op["log_noise"], so, Y)
        return -t

    opar = params["out"]
    kp = {"kern": lp["kern"], "Z": lp["Z"], "log_noise": lp["log_noise"]}
    op = {"kern": opar["kern"], "Z": opar["Z"], "log_noise": opar["log_noise"]}
    bound_ms = _scan_time(jax.grad(bound_loss), ((kp, op),), iters)

    gather_ms = full_ms - bound_ms
    return {
        "T": T, "M": M, "Q": spec.kernel.input_dim,
        "full_layer_step_ms": round(full_ms, 4),
        "premat_bound_ms": round(bound_ms, 4),
        "gather_and_revarb_terms_ms": round(gather_ms, 4),
        "gather_overhead_pct": round(100.0 * gather_ms / full_ms, 1),
        "iters": iters,
        "backend": jax.default_backend(),
    }


def main(argv=None):
    import argparse

    jax.config.update("jax_compilation_cache_dir", "/tmp/rgp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args(argv)
    rows = [
        run_shape(512, 100, win=10, u_win=10, iters=args.iters),   # flagship
        run_shape(2048, 256, win=16, u_win=16, iters=args.iters),  # production
    ]
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
