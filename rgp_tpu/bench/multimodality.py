"""Config-1 RMSE multimodality diagnostic (VERDICT r3 #9).

Trains ~32 vmapped restarts of the flagship (1-layer RGP, actuator, M=100),
then correlates each restart's final state — trained noises, q(X) variance
profile, lengthscale profile, final ELBO — with its closed-loop freerun RMSE,
to replace the recorded "spread 0.068-0.14" with a mechanism.

Dispatch: the 10k-iter Adam scan is segmented into host-dispatched chunks
(the tunnel watchdog kills single device programs > ~60 s; 32 restarts x
1000 iters x ~0.6 ms is ~19 s per call). Freeruns are vmapped in one call.

Usage:
    python -m rgp_tpu.bench.multimodality --restarts 32 --iters 10000
Prints one JSON line (summary + per-restart table path).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

_WHITEN_EVERY = 100


def run(restarts: int, iters: int, lr: float, seed0: int, chunk: int,
        out_csv: str) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from ..data import datasets
    from ..data.windows import Standardizer
    from ..models import rgp
    from ..params import positive

    d = datasets.load("actuator")
    sy, su = Standardizer.fit(d.y_train), Standardizer.fit(d.u_train)
    Y = jnp.asarray(sy.transform(d.y_train), jnp.float32)
    U = jnp.asarray(su.transform(d.u_train), jnp.float32)
    Ut = jnp.asarray(su.transform(d.u_test), jnp.float32)
    cfg = rgp.deep_rgp_config(wins=[0, 10], u_win=10, y_dim=1, u_dim=1,
                              num_inducing=100)
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[rgp.init_params(cfg, Y, U, seed=seed0 + s) for s in range(restarts)],
    )
    opt = optax.adam(optax.cosine_decay_schedule(lr, iters, 0.01))

    assert chunk % _WHITEN_EVERY == 0 and iters % chunk == 0

    def run_chunk(p0, s0):
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
            (p, s, _), losses = jax.lax.scan(inner, (p, s, wh), None,
                                             length=_WHITEN_EVERY)
            return (p, s), losses

        (p, s), losses = jax.lax.scan(outer, (p0, s0), None,
                                      length=chunk // _WHITEN_EVERY)
        return p, s, losses.reshape(-1)

    step_v = jax.jit(jax.vmap(run_chunk))
    state = jax.vmap(opt.init)(stacked)
    p = stacked
    t0 = time.perf_counter()
    finals = None
    for _ in range(iters // chunk):
        p, state, losses = step_v(p, state)
        finals = losses[:, -1]
    float(finals[0])  # host-read barrier
    t_fit = time.perf_counter() - t0

    means_v, _ = jax.jit(jax.vmap(lambda q: rgp.freerun(cfg, q, Y, U, Ut)))(p)
    m_raw = np.asarray(means_v) * sy.std + sy.mean  # (R, T*, 1)
    rmse = np.sqrt(np.mean((m_raw - d.y_test[None]) ** 2, axis=(1, 2)))

    # per-restart state diagnostics
    lp = p["layers"][0]
    op = p["out"]
    # effective (floored) noise — what the bound/freerun actually see
    noise_h = np.asarray(positive(lp["log_noise"])).reshape(restarts, -1).mean(1) + cfg.noise_floor
    noise_o = np.asarray(positive(op["log_noise"])).reshape(restarts, -1).mean(1) + cfg.noise_floor
    qvar = np.exp(np.asarray(lp["log_lam"]))  # (R, T, D)
    qvar_mean = qvar.mean(axis=(1, 2))
    qvar_min = qvar.min(axis=(1, 2))
    ls_h = np.asarray(positive(lp["kern"]["log_ls"]))  # (R, Q)
    ls_o = np.asarray(positive(op["kern"]["log_ls"]))
    elbo = -np.asarray(finals)

    rows = []
    for r in range(restarts):
        rows.append({
            "seed": seed0 + r,
            "rmse": float(rmse[r]),
            "elbo": float(elbo[r]),
            "noise_hidden": float(noise_h[r]),
            "noise_out": float(noise_o[r]),
            "qvar_mean": float(qvar_mean[r]),
            "qvar_min": float(qvar_min[r]),
            "ls_hidden_min": float(ls_h[r].min()),
            "ls_hidden_med": float(np.median(ls_h[r])),
            "ls_out_min": float(ls_o[r].min()),
            "ls_out_med": float(np.median(ls_o[r])),
        })
    with open(out_csv, "w") as f:
        keys = list(rows[0].keys())
        f.write(",".join(keys) + "\n")
        for row in rows:
            f.write(",".join(f"{row[k]:.6g}" if isinstance(row[k], float)
                             else str(row[k]) for k in keys) + "\n")

    def corr(x):
        x = np.asarray(x)
        if x.std() == 0:
            return 0.0
        return float(np.corrcoef(np.log(np.maximum(x, 1e-12)), rmse)[0, 1])

    good = rmse <= np.median(rmse)
    summary = {
        "metric": "config1_multimodality_diagnostic",
        "restarts": restarts,
        "iters": iters,
        "fit_seconds": round(t_fit, 1),
        "rmse_min": round(float(rmse.min()), 4),
        "rmse_median": round(float(np.median(rmse)), 4),
        "rmse_max": round(float(rmse.max()), 4),
        "corr_rmse": {
            "elbo": round(float(np.corrcoef(elbo, rmse)[0, 1]), 3),
            "log_noise_hidden": round(corr(noise_h), 3),
            "log_noise_out": round(corr(noise_o), 3),
            "log_qvar_mean": round(corr(qvar_mean), 3),
            "log_ls_hidden_min": round(corr(ls_h.min(1)), 3),
            "log_ls_out_min": round(corr(ls_o.min(1)), 3),
        },
        "good_vs_bad_medians": {
            "noise_hidden": [round(float(np.median(noise_h[good])), 5),
                             round(float(np.median(noise_h[~good])), 5)],
            "qvar_mean": [round(float(np.median(qvar_mean[good])), 5),
                          round(float(np.median(qvar_mean[~good])), 5)],
            "ls_hidden_min": [round(float(np.median(ls_h.min(1)[good])), 4),
                              round(float(np.median(ls_h.min(1)[~good])), 4)],
        },
        "table": out_csv,
        "backend": jax.default_backend(),
    }
    return summary


def main(argv=None):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rgp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--restarts", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10000)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=1000)
    ap.add_argument("--out-csv", default="artifacts/multimodality_config1.csv")
    args = ap.parse_args(argv)
    print(json.dumps(run(args.restarts, args.iters, args.lr, args.seed,
                         args.chunk, args.out_csv)))


if __name__ == "__main__":
    main()
