"""Benchmark harness: task x method registries + free-simulation evaluation.

Rebuilds the reference's benchmark subpackage (SURVEY.md S2.1 "Benchmark
harness" [L]: task / method / evaluation / output registries over the DaISy
system-identification sets): every method trains on the task's train split and
is scored by closed-loop free-simulation RMSE on the held-out split in the
ORIGINAL data scale (BASELINE.md protocol; SURVEY.md S3.3).

Usage:
    python -m rgp_tpu.bench --task actuator --method rgp1 --iters 2000
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import train
from ..data import datasets
from ..data.windows import Standardizer
from ..kernels import RBF
from ..kernels import Matern52 as _matern52
from ..models import gp_narx, rgp

__all__ = ["TASKS", "METHODS", "run", "main"]

TASKS: Dict[str, Callable] = {
    "actuator": datasets.actuator,
    "drives": datasets.drives,
    "narendra": datasets.narendra,
    "ballbeam": datasets.ballbeam,
    "dryer": datasets.dryer,
    "gas_furnace": datasets.gas_furnace,
    "tanks": datasets.tanks,
    "long_corpus": datasets.long_corpus,
}


@dataclasses.dataclass
class _Prepared:
    Y: jnp.ndarray
    U: jnp.ndarray
    U_test: jnp.ndarray
    y_test_raw: np.ndarray
    sy: Standardizer


def _prepare(task: str, dtype=jnp.float32, **task_kw) -> _Prepared:
    d = TASKS[task](**task_kw)
    sy, su = Standardizer.fit(d.y_train), Standardizer.fit(d.u_train)
    return _Prepared(
        Y=jnp.asarray(sy.transform(d.y_train), dtype),
        U=jnp.asarray(su.transform(d.u_train), dtype),
        U_test=jnp.asarray(su.transform(d.u_test), dtype),
        y_test_raw=np.asarray(d.y_test),
        sy=sy,
    )


# ------------------------------------------------------------------ methods
#
# Every method returns (res, test_means, test_vars, val_fn) where val_fn() is
# a CHEAP closed-loop rollout over the last ``_val_horizon`` steps of the
# TRAINING split (standardized scale) — the rollout-aware restart score
# (VERDICT r4 next #6): the teacher-forced ELBO cannot see rollout
# inconsistency (measured: on tanks at 10k iters best-of-N by ELBO selects
# free-form optima that roll out at the zero predictor while their 2k-iter
# models score 2x better), so ``run(select="rollout")`` vetoes restarts by a
# held-back-tail simulation instead.


def _val_horizon(T: int) -> int:
    return min(128, T // 4)


def _std_rmse(m, target) -> float:
    return float(jnp.sqrt(jnp.mean((m - target) ** 2)))


def _method_gp_narx(prep: _Prepared, iters: int, lr: float, seed: int, M: int,
                    kernel_cls=RBF, moment_match: bool = True,
                    ls_prior_std: float | None = None,
                    noise_floor: float = 1e-4):
    """``ls_prior_std``: optional mild N(0, std^2) prior on log-lengthscales —
    a config-3 RBF rollout-basin lever (VERDICT r4 next #5). Measured round 5
    at M=100/4k: it does NOT fix the basin (test freerun 0.626 by ELBO
    selection) because the mechanism is NOISE collapse, not lengthscale
    scale per se: every M=100/4k restart drives the raw noise to ~1e-6
    (machine-flagged by the ``noise_collapsed_to_floor`` degeneracy flag) and
    the moment-matched closed loop amplifies the resulting interpolator.
    ``noise_floor`` raises the floor itself — the mechanistically-targeted
    lever."""
    cfg = gp_narx.NARXConfig(kernel=kernel_cls(input_dim=15), num_inducing=M,
                             y_win=10, u_win=5, noise_floor=noise_floor)
    params = gp_narx.init_params(cfg, prep.Y, prep.U, noise=0.1, seed=seed)
    import optax

    def loss(p):
        f = -gp_narx.elbo(cfg, p, prep.Y, prep.U)
        if ls_prior_std is not None:
            f = f + 0.5 * jnp.sum((p["kern"]["log_ls"] / ls_prior_std) ** 2)
        return f

    res = train.fit_adam(
        loss, params,
        iters=iters, optimizer=optax.adam(optax.cosine_decay_schedule(lr, iters, 0.01)),
    )
    m, v = gp_narx.freerun(cfg, res.params, prep.Y, prep.U, prep.U_test,
                           y_init=prep.Y[-10:], moment_match=moment_match)

    def val_fn():
        T = prep.Y.shape[0]
        K = _val_horizon(T)
        mv, _ = gp_narx.freerun(
            cfg, res.params, prep.Y[: T - K], prep.U[: T - K], prep.U[T - K:],
            y_init=prep.Y[T - K - cfg.y_win: T - K], moment_match=moment_match,
        )
        return _std_rmse(mv, prep.Y[T - K:])

    return res, m, v, val_fn


def _truncate_rgp_params(params, K: int):
    """Drop the last ``K`` steps of every per-layer q(X) sequence so
    ``rgp.freerun`` rolls out from time T-K of the training span."""
    p = dict(params)
    p["layers"] = [
        {k: (v[:-K] if k in ("mu", "log_lam") else v) for k, v in lp.items()}
        for lp in params["layers"]
    ]
    return p


def _method_rgp(prep, iters, lr, seed, M, wins, back_cstr=False, mlp=()):
    cfg = rgp.deep_rgp_config(
        wins=wins, u_win=10, y_dim=prep.Y.shape[1], u_dim=prep.U.shape[1],
        num_inducing=M, back_cstr=back_cstr, mlp_hidden=mlp,
    )
    params = rgp.init_params(cfg, prep.Y, prep.U, seed=seed)
    import optax

    res = train.fit_adam(
        lambda p: -rgp.elbo(cfg, p, prep.Y, prep.U), params,
        iters=iters, optimizer=optax.adam(optax.cosine_decay_schedule(lr, iters, 0.01)),
    )
    m, v = rgp.freerun(cfg, res.params, prep.Y, prep.U, prep.U_test)

    def val_fn():
        T = prep.Y.shape[0]
        K = _val_horizon(T)
        # slice the free q(X) sequences to T-K; with back-constraints the
        # encoder re-derives means from the sliced Y/U automatically, and the
        # free log_lam sequence still needs the slice to stay aligned
        pv = _truncate_rgp_params(res.params, K)
        mv, _ = rgp.freerun(cfg, pv, prep.Y[: T - K], prep.U[: T - K],
                            prep.U[T - K:])
        return _std_rmse(mv, prep.Y[T - K:])

    return res, m, v, val_fn


def _method_svgp_natgrad(prep: _Prepared, iters: int, lr: float, seed: int, M: int,
                         batch_size: int = 512, noise_floor: float = 1e-4,
                         collapse_eval: bool = False):
    """Config 4 (BASELINE.json:10): minibatch SVI on NARX windows with
    interleaved natural-gradient q(u) updates; scored by the same
    free-simulation protocol. The whole minibatch loop (index sampling
    included) runs in one jit/scan — iters/s here IS the config-4 headline.

    Round-5: the loss applies the same explicit noise floor as the collapsed
    routes (and the scored params bake it in) — the round-4 run's recorded
    pathology (ELBO diverging to -2.25e6, noise at whatever floor you set,
    freerun worse than the zero predictor) is the unguarded-noise collapse
    under the stochastic bound, the identical mechanism the minibatch
    collapsed route floors against (VERDICT r4 next #2c)."""
    import jax
    import optax

    from ..data.windows import narx_design
    from ..models import svgp
    from ..params import positive

    y_win, u_win = 10, 5
    X, Yt = narx_design(prep.Y, prep.U, y_win, u_win)
    cfg = svgp.SVGPConfig(RBF(input_dim=X.shape[1]), num_inducing=M,
                          output_dim=Yt.shape[1])
    params = svgp.init_params(cfg, X, noise=0.1, seed=seed)
    T_total = X.shape[0]
    bs = min(batch_size, T_total)

    def _floored(p):
        ln = jnp.log(jnp.expm1(positive(p["log_noise"]) + noise_floor))
        return {**p, "log_noise": ln}

    def loss(p, batch):
        return -svgp.elbo(cfg, _floored(p), batch["X"], batch["Y"],
                          T_total=T_total)

    res = train.fit_minibatch(
        loss, params, {"X": X, "Y": Yt},
        iters=iters, batch_size=bs, key=jax.random.PRNGKey(seed),
        # clip: as the noise shrinks the problem stiffens (beta = 1/sigma^2)
        # and occasional large minibatch gradients meeting Adam's stale
        # second-moment estimates produce unrecoverable overshoots (measured:
        # loss jumps -1.7e4 -> +2e5 around iter ~2200 of a 6000-iter run
        # without the clip; a fresh-Adam restart at 2100 is stable)
        # schedule horizon PINNED at 10k steps regardless of the budget:
        # stretching the decay with `iters` keeps both rates high for
        # proportionally longer, and the run destabilizes (measured at 30k:
        # final ELBO -18201 vs +18498 at 10k, freerun diverged). With the
        # pinned horizon the first 10k steps reproduce the healthy run
        # exactly and any extra budget refines at the decayed floor.
        optimizer=optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.adam(optax.cosine_decay_schedule(lr, min(iters, 10000), 0.01)),
        ),
        natgrad_block="qu",
        # decaying natural step (Hoffman et al. 2013): the fixed 0.1 step
        # overshoots once the likelihood noise is small and the batch-local
        # q(u) optimum varies strongly between batches
        natgrad_lr=optax.cosine_decay_schedule(0.1, min(iters, 10000), 0.05),
    )
    p = _floored(res.params)  # freerun sees the same model the loss trained
    if collapse_eval:
        # Collapse-at-eval (VERDICT r4 next #2c): score the SVGP-learned
        # hyperparameters through the EXACT full-data collapsed posterior —
        # one cheap exact solve replaces the learned q(u), isolating whether
        # the recorded freerun failure is a q(u)-lag artifact (the minibatch
        # natural-gradient q(u) trails the moving hyperparameters) or bad
        # hyperparameters. Standard practice for SVI-trained sparse GPs at
        # deployment: q(u) is an optimization device, the model IS
        # (kern, Z, noise), and the collapsed posterior is their optimum.
        ncfg = gp_narx.NARXConfig(kernel=cfg.kernel, num_inducing=M,
                                  y_win=y_win, u_win=u_win, noise_floor=0.0)
        pc = {"kern": p["kern"], "Z": p["Z"], "log_noise": p["log_noise"]}
        m, v = gp_narx.freerun(ncfg, pc, prep.Y, prep.U, prep.U_test,
                               y_init=prep.Y[-y_win:])

        def val_fn():
            T = prep.Y.shape[0]
            K = _val_horizon(T)
            mv, _ = gp_narx.freerun(ncfg, pc, prep.Y[: T - K], prep.U[: T - K],
                                    prep.U[T - K:],
                                    y_init=prep.Y[T - K - y_win: T - K])
            return _std_rmse(mv, prep.Y[T - K:])

        return res, m, v, val_fn
    m, v = svgp.freerun_narx(
        cfg, p, y_win, u_win, prep.Y, prep.U, prep.U_test
    )

    def val_fn():
        T = prep.Y.shape[0]
        K = _val_horizon(T)
        mv, _ = svgp.freerun_narx(cfg, p, y_win, u_win,
                                  prep.Y[: T - K], prep.U[: T - K],
                                  prep.U[T - K:])
        return _std_rmse(mv, prep.Y[T - K:])

    return res, m, v, val_fn


def _method_narx_collapsed_full(prep: _Prepared, iters: int, lr: float,
                                seed: int, M: int, noise_floor: float = 1e-4):
    """Config 4, EXACT route (VERDICT r3 #1): full-corpus collapsed GP-NARX
    bound every step. Viable at T ~ 12k because the certain-input psi path is
    one MXU matmul (Psi2 = Psi1^T Psi1; `ops/psi_stats.py` round-4 dispatch) —
    the bound is assembled from the same additive sufficient statistics the
    data-parallel psum path reduces, so on a mesh this IS the accumulated-
    psi-statistics minibatch VI of SURVEY.md S3.4 with the 'minibatch' equal
    to each device's time shard. No estimator bias, so the optimum is the
    free-runnable full-batch optimum.

    ``noise_floor``: additive lower bound on the noise variance (data is
    standardized, so 1e-4 = -40 dB). Measured necessity: in f32, once beta
    grows past ~1e6 late in a long cosine schedule, rounding in the
    beta^2 ||c||^2 vs beta ||Y||^2 cancellation lets the 'bound' climb to
    ~1e15 nonsense and the noise collapses (run recorded in BASELINE.md);
    the floor caps beta at 1e4 where the whitened f32 assembly is accurate
    to well under a nat. The reference ecosystem's equivalent is paramz's
    constrain_bounded on Gaussian noise [H].

    Whitening amortized over 100-step chunks (fit_adam aux_fn), matching the
    config-1 protocol."""
    import jax
    import optax

    from ..data.windows import narx_design
    from ..inference.collapsed_vi import collapsed_bound, whitening_basis

    y_win, u_win = 10, 5
    X, Yt = narx_design(prep.Y, prep.U, y_win, u_win)
    # noise_floor=0 on the config: this method applies its own explicit floor
    # in the loss AND bakes the floored value into the freerun params — the
    # config-level floor (round-4 NARXConfig default) would double it
    cfg = gp_narx.NARXConfig(kernel=RBF(input_dim=X.shape[1]), num_inducing=M,
                             y_win=y_win, u_win=u_win, noise_floor=0.0)
    from ..models import sparse_gp
    from ..ops.psi_stats import psi_statistics
    from ..params import positive

    params = sparse_gp.init_params(cfg.sparse, X, noise=0.1, seed=seed)
    kern = cfg.kernel

    def floored_log_noise(p):
        return jnp.log(jnp.expm1(positive(p["log_noise"]) + noise_floor))

    def loss(p, wh):
        stats = psi_statistics(kern, p["kern"], p["Z"], X, None)
        return -collapsed_bound(
            kern, p["kern"], p["Z"], floored_log_noise(p), stats, Yt,
            certain=True, W=wh,
        )

    res = train.fit_adam(
        loss, params, iters=iters,
        optimizer=optax.adam(optax.cosine_decay_schedule(lr, iters, 0.01)),
        aux_fn=lambda p: whitening_basis(kern.K(p["kern"], p["Z"])),
        aux_every=100,
    )
    p = dict(res.params)
    p["log_noise"] = floored_log_noise(res.params)  # freerun sees the same model
    m, v = gp_narx.freerun(cfg, p, prep.Y, prep.U, prep.U_test,
                           y_init=prep.Y[-y_win:])

    def val_fn():
        T = prep.Y.shape[0]
        K = _val_horizon(T)
        mv, _ = gp_narx.freerun(cfg, p, prep.Y[: T - K], prep.U[: T - K],
                                prep.U[T - K:],
                                y_init=prep.Y[T - K - y_win: T - K])
        return _std_rmse(mv, prep.Y[T - K:])

    return res, m, v, val_fn


def _method_narx_minibatch(prep: _Prepared, iters: int, lr: float, seed: int,
                           M: int, batch_size: int = 512,
                           noise_floor: float = 1e-4,
                           ema: float | None = None):
    """Config 4, collapsed route (VERDICT r3 #1): minibatch the COLLAPSED
    GP-NARX bound through its additive sufficient statistics. Each step
    computes the batch's psi statistics and scales them by T/B — an unbiased
    estimator of the full-data sufficient statistics (psi0 sum, Psi1^T Y,
    Psi2 = Psi1^T Psi1, ||Y||^2), assembled by the exact same
    ``collapsed_bound_from_suffstats`` the data-parallel psum path uses
    (SURVEY.md S3.4: partial psi-stats are additive over t). q(u) never
    appears as an optimization variable — it is collapsed out per step, so the
    minibatch optimum cannot drift away from a free-runnable collapsed model
    the way the explicit-q(u) SVI optimum did (measured round 3: SVI+natgrad
    free-ran at RMSE 8.9 while the full-batch collapsed optimum of the same
    corpus free-runs at 0.258). The assembly is nonlinear in the statistics,
    so the stochastic bound is a biased (O(1/B)) estimate of the full bound —
    the measured cost on long_corpus is ~nil (BASELINE.md config-4 row).

    Scoring: the returned freerun uses the EXACT full-data collapsed posterior
    at the learned hyperparameters (gp_narx.freerun recomputes it once).

    Round-5 fix (ADVICE r4 medium): the minibatch loss now applies the SAME
    explicit noise floor as ``_method_narx_collapsed_full`` and bakes the
    floored value into the scored params — round 4 trained on raw un-floored
    log_noise while the freerun evaluated the floored model (train/eval
    mismatch), and the stochastic bound's measured noise-collapse pathology
    (log|B| concave in the statistics under-counts the complexity penalty)
    ran unguarded, recording a blown elbo_last 4.27e8 next to a decent
    freerun."""
    import jax
    import optax

    from ..data.windows import narx_design
    from ..inference.collapsed_vi import collapsed_bound_from_suffstats
    from ..linalg import hdot
    from ..ops.psi_stats import psi01
    from ..params import positive

    y_win, u_win = 10, 5
    X, Yt = narx_design(prep.Y, prep.U, y_win, u_win)
    # noise_floor=0 on the config: the floor is applied explicitly in-loss and
    # baked into the scored params (the config-level default would double it)
    cfg = gp_narx.NARXConfig(kernel=RBF(input_dim=X.shape[1]), num_inducing=M,
                             y_win=y_win, u_win=u_win, noise_floor=0.0)
    from ..models import sparse_gp

    params = sparse_gp.init_params(cfg.sparse, X, noise=0.1, seed=seed)
    T_total, D = Yt.shape
    bs = min(batch_size, T_total)
    w = T_total / bs
    kern = cfg.kernel

    def floored_log_noise(p):
        return jnp.log(jnp.expm1(positive(p["log_noise"]) + noise_floor))

    def loss(p, batch):
        psi0_b, psi1_b = psi01(kern, p["kern"], p["Z"], batch["X"], None)
        # certain inputs: Psi2 == Psi1^T Psi1, so the scaled statistic keeps
        # its PSD factor sqrt(w) Psi1 (the f32-accurate assembly path)
        return -collapsed_bound_from_suffstats(
            kern, p["kern"], p["Z"], floored_log_noise(p),
            w * jnp.sum(psi0_b),
            w * hdot(psi1_b.T, batch["Y"]),
            None,
            w * jnp.sum(batch["Y"] ** 2),
            T_total, D,
            psi1_factor=jnp.sqrt(jnp.asarray(w, psi1_b.dtype)) * psi1_b,
        )

    opt = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adam(optax.cosine_decay_schedule(lr, min(iters, 10000), 0.01)),
    )
    if ema is None:
        res = train.fit_minibatch(
            loss, params, {"X": X, "Y": Yt},
            iters=iters, batch_size=bs, key=jax.random.PRNGKey(seed),
            optimizer=opt,
        )
    else:
        # EMA-SMOOTHED sufficient statistics (round 5, VERDICT r4 next #2c):
        # the stochastic bound's measured pathology is that log|B| is CONCAVE
        # in the statistics, so the batch estimator under-counts the
        # complexity penalty and drives the noise to the floor at EVERY
        # batch size (measured B in {256,512,1024,2048}: raw noise 4e-6).
        # The bias scales with the VARIANCE of the statistics, so assemble
        # the bound at an exponential moving average of the T/B-scaled batch
        # statistics (effective batch ~ B/(1-ema); EMA'd Psi2 stays PSD as a
        # convex combination of PSD terms, initialized EXACT with one
        # full-data pass), with a straight-through estimator so the gradient
        # still flows through the current batch at full weight:
        #   used = batch + stop_grad(ema_stats - batch).
        # Statistics from earlier steps are computed at stale params — the
        # same stochastic-approximation tradeoff as Hoffman et al. 2013 SVI's
        # natural-parameter averaging, vanishing as the learning rate decays.
        def batch_stats(q, Xb, Yb):
            psi0_b, psi1_b = psi01(kern, q["kern"], q["Z"], Xb, None)
            return {
                "psi0": w * jnp.sum(psi0_b),
                "p1y": w * hdot(psi1_b.T, Yb),
                "psi2": w * hdot(psi1_b.T, psi1_b),
                "ysq": w * jnp.sum(Yb ** 2),
            }

        def run(p0, key0):
            s0 = opt.init(p0)
            psi0_f, psi1_f = psi01(kern, p0["kern"], p0["Z"], X, None)
            es0 = {
                "psi0": jnp.sum(psi0_f),
                "p1y": hdot(psi1_f.T, Yt),
                "psi2": hdot(psi1_f.T, psi1_f),
                "ysq": jnp.sum(Yt ** 2),
            }

            def step(carry, k):
                q, s, es = carry
                idx = jax.random.randint(k, (bs,), 0, T_total)
                Xb = X[idx]
                Yb = Yt[idx]

                def loss_fn(qq):
                    b = batch_stats(qq, Xb, Yb)
                    new_es = jax.tree.map(
                        lambda e, bb: ema * e + (1.0 - ema) * bb, es, b
                    )
                    used = jax.tree.map(
                        lambda bb, ne: bb + jax.lax.stop_gradient(ne - bb),
                        b, new_es,
                    )
                    f = -collapsed_bound_from_suffstats(
                        kern, qq["kern"], qq["Z"], floored_log_noise(qq),
                        used["psi0"], used["p1y"], used["psi2"], used["ysq"],
                        T_total, D,
                    )
                    return f, jax.tree.map(jax.lax.stop_gradient, new_es)

                (f, new_es), g = jax.value_and_grad(loss_fn, has_aux=True)(q)
                u, s = opt.update(g, s, q)
                return (optax.apply_updates(q, u), s, new_es), f

            keys = jax.random.split(key0, iters)
            (q, _, _), losses = jax.lax.scan(step, (p0, s0, es0), keys)
            return q, losses

        p_fit, losses = jax.jit(run)(params, jax.random.PRNGKey(seed))
        res = train.FitResult(params=p_fit, losses=losses)
    p = dict(res.params)
    p["log_noise"] = floored_log_noise(res.params)  # freerun sees the same model
    m, v = gp_narx.freerun(cfg, p, prep.Y, prep.U, prep.U_test,
                           y_init=prep.Y[-y_win:])

    def val_fn():
        T = prep.Y.shape[0]
        K = _val_horizon(T)
        mv, _ = gp_narx.freerun(cfg, p, prep.Y[: T - K], prep.U[: T - K],
                                prep.U[T - K:],
                                y_init=prep.Y[T - K - y_win: T - K])
        return _std_rmse(mv, prep.Y[T - K:])

    return res, m, v, val_fn


METHODS: Dict[str, Callable] = {
    # **kw carries optional per-run knobs (batch_size for the config-4
    # minibatch routes, ls_prior_std for the config-3 regularized variant) —
    # forwarded from run()'s method_kw, ignored by methods that lack them
    "svgp_natgrad": lambda prep, iters, lr, seed, M, **kw: _method_svgp_natgrad(
        prep, iters, lr, seed, M, **kw
    ),
    # same training run, scored by the exact full-data collapsed posterior at
    # the learned hyperparameters instead of the learned q(u) (see docstring)
    "svgp_natgrad_collapsed": lambda prep, iters, lr, seed, M, **kw:
        _method_svgp_natgrad(prep, iters, lr, seed, M, collapse_eval=True, **kw),
    "gp_narx_minibatch": lambda prep, iters, lr, seed, M, **kw: _method_narx_minibatch(
        prep, iters, lr, seed, M, **kw
    ),
    # EMA-smoothed-statistics variant (round 5): the stochastic collapsed
    # bound with its small-sample log|B| bias suppressed — see the ema branch
    "gp_narx_minibatch_ema": lambda prep, iters, lr, seed, M, **kw: _method_narx_minibatch(
        prep, iters, lr, seed, M, ema=kw.pop("ema", 0.99), **kw
    ),
    "gp_narx_collapsed": lambda prep, iters, lr, seed, M, **kw: _method_narx_collapsed_full(
        prep, iters, lr, seed, M
    ),
    "gp_narx": lambda prep, iters, lr, seed, M, **kw: _method_gp_narx(
        prep, iters, lr, seed, M, **kw
    ),
    "rgp1": lambda prep, iters, lr, seed, M, **kw: _method_rgp(prep, iters, lr, seed, M, [0, 10]),
    "rgp2": lambda prep, iters, lr, seed, M, **kw: _method_rgp(prep, iters, lr, seed, M, [0, 6, 6]),
    "rgp2_mlp": lambda prep, iters, lr, seed, M, **kw: _method_rgp(
        prep, iters, lr, seed, M, [0, 6, 6], back_cstr=True, mlp=(32,)
    ),
    # 1-layer back-constrained control for the depth table: holds the
    # amortization (which is what keeps long-schedule rollouts healthy —
    # BASELINE.md round-4 depth study) fixed while varying ONLY depth
    "rgp1_mlp": lambda prep, iters, lr, seed, M, **kw: _method_rgp(
        prep, iters, lr, seed, M, [0, 10], back_cstr=True, mlp=(32,)
    ),
    # Matern-5/2 GP-NARX (generic certain-input psi path; freerun plugs in
    # means only — no closed-form moment matching for Matern)
    "gp_narx_matern": lambda prep, iters, lr, seed, M, **kw: _method_gp_narx(
        prep, iters, lr, seed, M, kernel_cls=_matern52, moment_match=False
    ),
}


def _git_sha() -> str:
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, timeout=10, cwd=__file__.rsplit("/rgp_tpu/", 1)[0],
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _final_noise_min(params) -> float | None:
    """Min effective raw noise variance over every *log_noise leaf (the
    degeneracy probe: a raw value collapsed to ~0 means the optimizer pinned
    the model at whatever floor the method applies)."""
    import jax.tree_util as jtu

    from ..params import positive

    vals = [
        float(positive(leaf))
        for path, leaf in jtu.tree_flatten_with_path(params)[0]
        if "log_noise" in jtu.keystr(path)
    ]
    return min(vals) if vals else None


def run(
    task: str,
    method: str,
    *,
    iters: int = 10000,
    lr: float = 1e-2,
    seed: int = 0,
    num_inducing: int = 100,
    restarts: int = 1,
    dtype=jnp.float32,
    steady: bool = False,
    select: str = "elbo",
    **method_kw,
) -> dict:
    """``restarts > 1`` runs multiple seeds and keeps the best restart.

    ``select``: restart-selection criterion — "elbo" (final training bound;
    the reference-ecosystem convention) or "rollout" (short closed-loop
    free-simulation RMSE on the tail of the TRAINING split, VERDICT r4 next
    #6: the bound cannot see rollout inconsistency, so on long schedules
    best-ELBO selects free-form optima that roll out at the zero predictor).
    Both scores are recorded per restart either way.

    ``steady``: run the method once untimed (claims the device, fills the
    persistent compile cache), then time a second identical run — the same
    steady-state protocol bench.py uses for the config-1 headline ("compile
    excluded"). Without it, wall time on this backend is dominated by the
    one-time device claim (~25-60 s) and scan compiles, not by training."""
    assert select in ("elbo", "rollout")
    prep = _prepare(task, dtype=dtype)
    if steady:
        out = METHODS[method](prep, iters, lr, seed, num_inducing, **method_kw)
        float(out[0].losses[-1])  # host-read barrier before restarting the clock
    t0 = time.perf_counter()
    best, table = None, []
    for r in range(restarts):
        out = METHODS[method](prep, iters, lr, seed + r, num_inducing,
                              **method_kw)
        final_elbo = -float(out[0].losses[-1])
        val_rmse = float(out[3]()) if (select == "rollout" or restarts > 1) \
            else None
        score = val_rmse if select == "rollout" else -final_elbo
        table.append({"seed": seed + r, "elbo": round(final_elbo, 2),
                      "val_rollout_rmse":
                      round(val_rmse, 5) if val_rmse is not None else None})
        if best is None or score < best[0]:
            best = (score, out)
    res, means, vars_, _ = best[1]
    # host-read sync (block_until_ready returns early on the tunneled backend)
    float(np.asarray(means[0, 0]))
    wall = time.perf_counter() - t0
    m_raw = prep.sy.inverse(np.asarray(means))
    rmse = float(np.sqrt(np.mean((m_raw - prep.y_test_raw) ** 2)))
    zero = float(np.sqrt(np.mean(prep.y_test_raw**2)))
    losses = np.asarray(res.losses)
    elbo_last = float(-losses[-1])

    # degeneracy flags (VERDICT r4 next #4): machine-readable insanity markers
    # so blown runs can never sit in the record schema-indistinguishable from
    # healthy ones. ELBO ceiling: standardized data under a >=1e-4 noise floor
    # caps the per-point log-density at ~3.8 nats; 10*T*D is generously sane.
    T_D = float(np.prod(prep.Y.shape))
    noise_min = _final_noise_min(res.params)
    reasons = []
    if not np.isfinite(elbo_last) or elbo_last > 10.0 * T_D:
        reasons.append("elbo_insane")
    if rmse >= zero:
        reasons.append("freerun_not_better_than_zero")
    if noise_min is not None and noise_min < 1e-5:
        reasons.append("noise_collapsed_to_floor")

    return {
        "task": task,
        "method": method,
        "iters": iters,
        "freerun_rmse": round(rmse, 5),
        "zero_predictor_rmse": round(zero, 5),
        "elbo_first": round(float(-losses[0]), 2),
        "elbo_last": round(elbo_last, 2),
        "wall_seconds": round(wall, 2),
        "iters_per_sec": round(iters / wall, 2),
        "restarts": restarts,
        "select": select,
        "restart_table": table,
        "steady": steady,
        "backend": jax.default_backend(),
        "git_sha": _git_sha(),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "final_noise_min": None if noise_min is None else float(f"{noise_min:.3g}"),
        "degenerate": bool(reasons),
        "degenerate_reasons": reasons,
        **({"method_kw": method_kw} if method_kw else {}),
    }


def main(argv=None):
    import argparse

    import jax as _jax

    # reruns hit the persistent compile cache instead of recompiling the scan
    _jax.config.update("jax_compilation_cache_dir", "/tmp/rgp_tpu_jax_cache")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--task", default="actuator", choices=sorted(TASKS))
    ap.add_argument("--method", default="rgp1", choices=sorted(METHODS))
    ap.add_argument("--iters", type=int, default=10000)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--num-inducing", type=int, default=100)
    ap.add_argument("--restarts", type=int, default=1)
    ap.add_argument("--steady", action="store_true",
                    help="time a second warm run (claim+compiles excluded), "
                         "the bench.py steady-state protocol")
    ap.add_argument("--select", default="elbo", choices=("elbo", "rollout"),
                    help="restart selection: final training bound, or "
                         "closed-loop rollout RMSE on the training tail")
    ap.add_argument("--batch-size", type=int, default=None,
                    help="minibatch size for the config-4 methods")
    ap.add_argument("--ls-prior-std", type=float, default=None,
                    help="mild N(0,std^2) prior on log-lengthscales (gp_narx)")
    ap.add_argument("--noise-floor", type=float, default=None,
                    help="noise-variance floor override (gp_narx)")
    args = ap.parse_args(argv)
    kw = {}
    if args.batch_size is not None:
        kw["batch_size"] = args.batch_size
    if args.ls_prior_std is not None:
        kw["ls_prior_std"] = args.ls_prior_std
    if args.noise_floor is not None:
        kw["noise_floor"] = args.noise_floor
    out = run(
        args.task, args.method, iters=args.iters, lr=args.lr, seed=args.seed,
        num_inducing=args.num_inducing, restarts=args.restarts,
        steady=args.steady, select=args.select, **kw,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
