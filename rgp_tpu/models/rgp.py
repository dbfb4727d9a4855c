"""Deep Recurrent Gaussian Process with REVARB variational inference.

THE flagship model — the reference proper: `RGP:autoreg/model.py` (DeepAutoreg)
+ `RGP:autoreg/layers.py` [M] (SURVEY.md S2.1, S3.1-S3.3, Appendix A). Instead
of the reference's mutable paramz layer objects with hand-routed inter-layer
gradients (stack 3.2 steps 9-12), the whole model is:

  * a hashable config (:class:`RGPConfig`) describing structure, and
  * a parameter pytree (kernel hyperparameters, inducing inputs Z^h, noises,
    variational means/log-variances of every q(x^h_t), optional encoder weights),

with ONE pure ELBO function (A.4) differentiated end-to-end by autodiff — the
gradient coupling of q(x_t) across its three roles (target of layer h, lagged
input to layer h, input to layer h+1) is automatic.

Model structure (A.1), layers indexed deepest-first (layer 0 driven by U):

  layer 0:  xbar^0_t = [x^0_{t-1..t-L0}, u_t..u_{t-Lu+1}]
  layer h:  xbar^h_t = [x^h_{t-1..t-Lh}, x^{h-1}_t..x^{h-1}_{t-Lh+1}]
  output :  y_t      = f_out(x^{H-1}_t .. x^{H-1}_{t-Lout+1}) + eps_y

Each hidden layer keeps L_h extra "initial window" latents with N(0,1) priors
(KL term); targets x^h_{1..T} enter their layer's collapsed bound as
variational targets (mean + variance, A.3/A.4).

Free simulation (:func:`freerun`) is the reference's headline-metric path
(S3.3): a `lax.scan` over test steps, each layer predicting with full
moment matching (Girard 2003) through the psi-statistics, propagating both
means and variances closed-loop.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.windows import current_window, lagged, np_current_window, np_lagged
from ..inference.collapsed_vi import (
    collapsed_bound,
    posterior,
    predict_uncertain,
)
from ..kernels import RBF, Kernel
from ..ops.psi_stats import psi_statistics
from ..params import np_positive_inv
from .encoder import init_mlp, mlp_apply
from .sparse_gp import kmeans_init

__all__ = ["LayerSpec", "RGPConfig", "init_params", "elbo", "freerun",
           "deep_rgp_config", "compute_whitenings"]

_LOG2PI = float(np.log(2.0 * np.pi))


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    kernel: Kernel
    win: int  # autoregressive window L_h (> 0)
    q_dim: int  # latent dimension Q_h
    num_inducing: int


@dataclasses.dataclass(frozen=True)
class RGPConfig:
    layers: Tuple[LayerSpec, ...]  # hidden layers, deepest (U-driven) first
    out_kernel: Kernel
    out_num_inducing: int
    out_win: int  # emission window over top latents (>= 1)
    u_win: int  # exogenous window L_u on layer 0
    y_dim: int
    u_dim: int
    back_cstr: bool = False
    mlp_hidden: Tuple[int, ...] = ()  # reference MLP_dims
    amortize_var: bool = False  # encoder also outputs q(X) log-variances
    # additive lower bound on every layer's noise VARIANCE (0 disables).
    # Measured necessity (round 4, BASELINE.md): on long f32 cosine schedules
    # the REVARB noise channels collapse (the f32 beta^2 cancellation lets
    # the bound keep climbing as beta -> inf), after which the closed-loop
    # rollout breaks — tanks rgp1/rgp2 at 10k iters free-ran WORSE than at
    # 2k, and config-1's multimodal RMSE spread traces to the same basin.
    # The reference ecosystem's equivalent is paramz constrain_bounded on
    # Gaussian noise [H]. Data is standardized, so 1e-4 = -40 dB.
    noise_floor: float = 0.0

    @property
    def n_hidden(self) -> int:
        return len(self.layers)


def deep_rgp_config(
    wins,
    u_win: int,
    y_dim: int,
    u_dim: int,
    num_inducing: int = 100,
    q_dims=None,
    kernels=None,
    out_kernel: Optional[Kernel] = None,
    back_cstr: bool = False,
    mlp_hidden: Tuple[int, ...] = (),
    amortize_var: bool = False,
    noise_floor: float = 1e-4,
) -> RGPConfig:
    """Reference-API-shaped constructor (`DeepAutoreg(wins, Y, U=, U_win=, ...)`,
    SURVEY.md Appendix B): ``wins=[w_out, w_1, ..., w_H]`` with wins[0] the
    emission window over the top latent (0 -> current latent only) and wins[1:]
    ordered from the layer *below the output* down to the U-driven layer.
    Internally layers are stored deepest-first."""
    w_out = wins[0]
    # wins[1:], q_dims and kernels are all given output-side-first (matching the
    # reference's ordering); reverse ALL of them together to deepest-first
    hidden_wins = list(wins[1:])[::-1]
    H = len(hidden_wins)
    if q_dims is None:
        q_dims = [1] * H
    else:
        q_dims = list(q_dims)[::-1]
    kernels_d = None if kernels is None else list(kernels)[::-1]
    layer_specs = []
    for h, (w, q) in enumerate(zip(hidden_wins, q_dims)):
        din = w * q + (u_win * u_dim if h == 0 else w * q_dims[h - 1])
        k = kernels_d[h] if kernels_d is not None else RBF(input_dim=din)
        if k.input_dim != din:
            raise ValueError(
                f"kernel for hidden layer {h} (deepest-first) has input_dim "
                f"{k.input_dim}, but the layer's windowed input dim is {din}"
            )
        layer_specs.append(LayerSpec(kernel=k, win=w, q_dim=q, num_inducing=num_inducing))
    out_win = max(1, w_out)
    dout_in = out_win * q_dims[-1]
    ok = out_kernel if out_kernel is not None else RBF(input_dim=dout_in)
    return RGPConfig(
        layers=tuple(layer_specs),
        out_kernel=ok,
        out_num_inducing=num_inducing,
        out_win=out_win,
        u_win=u_win,
        y_dim=y_dim,
        u_dim=u_dim,
        back_cstr=back_cstr,
        mlp_hidden=tuple(mlp_hidden),
        amortize_var=amortize_var,
        noise_floor=noise_floor,
    )


# ----------------------------------------------------------------- init


def _smooth(y, width: int = 5):
    if width <= 1:
        return y
    k = np.ones(width) / width
    return np.stack([np.convolve(y[:, d], k, mode="same") for d in range(y.shape[1])], -1)


def init_params(
    cfg: RGPConfig,
    Y,
    U,
    *,
    noise: float = 0.01,
    lam_init: float = 0.01,
    seed: int = 0,
    dtype=jnp.float32,
):
    """Reference-matching initialization (SURVEY.md S3.1, S7 hard-part 3):
    hidden q(X) means from (smoothed, standardized) data projections, variances
    ~0.01, Z a perturbed subset of the initial windowed inputs."""
    Y = np.asarray(Y, np.float64)
    U = np.asarray(U, np.float64)
    T = Y.shape[0]
    rng = np.random.default_rng(seed)

    # data-driven latent init: broadcast standardized smoothed y to q_dim
    y_sm = _smooth(Y)
    y_std = (y_sm - y_sm.mean(0)) / (y_sm.std(0) + 1e-9)

    layers = []
    mu_prev_full = None
    for h, spec in enumerate(cfg.layers):
        L = spec.win
        base = np.tile(y_std[:, : 1], (1, spec.q_dim))
        mu_full = np.concatenate(
            [0.1 * rng.standard_normal((L, spec.q_dim)), base], axis=0
        )  # (T + L, Q)
        mu_full = mu_full + 0.01 * rng.standard_normal(mu_full.shape)
        lam_full = np.full(mu_full.shape, lam_init)
        # the initial-window latents (N(0,1) prior, length L) are stored
        # separately from the T per-timestep latents so the time axis of the
        # variational state is exactly shardable over the 'data' mesh axis

        # windowed input means for Z init (host-side numpy: init code must not
        # touch the device — each un-jitted op is a remote-compile round trip)
        own = np_lagged(mu_full, L)[L:]
        if h == 0:
            low = np_current_window(U, cfg.u_win)
        else:
            low = np_current_window(mu_prev_full[cfg.layers[h - 1].win:], L)
        Xw = np.concatenate([own, low], axis=-1)
        Z = kmeans_init(Xw, spec.num_inducing, seed=seed + h)

        layers.append(
            {
                "kern": spec.kernel.init(dtype=dtype),
                "Z": jnp.asarray(Z, dtype),
                "log_noise": np_positive_inv(noise, dtype),
                "mu0": jnp.asarray(mu_full[:L], dtype),
                "log_lam0": jnp.asarray(np.log(lam_full[:L]), dtype),
                "mu": jnp.asarray(mu_full[L:], dtype),
                "log_lam": jnp.asarray(np.log(lam_full[L:]), dtype),
            }
        )
        mu_prev_full = mu_full

    # output layer: inputs = window of top latents
    top = mu_prev_full[cfg.layers[-1].win:]
    Xout = np_current_window(top, cfg.out_win)
    Zout = kmeans_init(Xout, cfg.out_num_inducing, seed=seed + 1000)
    out = {
        "kern": cfg.out_kernel.init(dtype=dtype),
        "Z": jnp.asarray(Zout, dtype),
        "log_noise": np_positive_inv(noise, dtype),
    }

    params = {"layers": tuple(layers), "out": out}

    if cfg.back_cstr:
        key = jax.random.PRNGKey(seed)
        encs = []
        for spec in cfg.layers:
            key, sub = jax.random.split(key)
            din = spec.win * cfg.y_dim + cfg.u_win * cfg.u_dim
            dout = spec.q_dim * (2 if cfg.amortize_var else 1)
            dims = (din, *cfg.mlp_hidden, dout)
            encs.append(init_mlp(sub, dims, dtype=dtype))
        params["encoder"] = tuple(encs)
    return params


# ----------------------------------------------------------------- ELBO


def _fln(cfg: RGPConfig, log_noise):
    """Effective (floored) unconstrained noise: softplus^{-1}(softplus(raw) +
    noise_floor). Applied at EVERY consumption site (bound, whitening,
    posterior, freerun, SMC) so training, evaluation and simulation all see
    the identical floored model. No-op when cfg.noise_floor == 0."""
    if cfg.noise_floor <= 0.0:
        return log_noise
    from ..params import positive

    return jnp.log(jnp.expm1(positive(log_noise) + cfg.noise_floor))


_LOG_LAM_BIAS = -4.605170185988091  # ln(0.01): amortized variances start ~ the
# reference's 0.01 init when the encoder's raw output is near zero


def _hidden_moments(cfg: RGPConfig, params, Y, U):
    """Full latent (means, variances) per layer, each (T+L_h, Q_h).

    With back-constraints the target-section means are amortized:
    MLP(window of Y, U) (S2.1 encoder); with ``amortize_var`` the encoder's
    output doubles to (mu, log-variance) per latent dim (the reference's
    "possibly vars" variant [M]). Initial-window moments stay free parameters.
    """
    mus, lams = [], []
    for h, spec in enumerate(cfg.layers):
        lp = params["layers"][h]
        lam_t = jnp.exp(lp["log_lam"])
        if cfg.back_cstr:
            feats = []
            if spec.win > 0:
                feats.append(lagged(Y, spec.win))
            if cfg.u_win > 0:
                feats.append(current_window(U, cfg.u_win))
            enc_in = jnp.concatenate(feats, axis=-1)  # (T, win*Dy + u_win*Du)
            out = mlp_apply(params["encoder"][h], enc_in)  # (T, Q or 2Q)
            if cfg.amortize_var:
                mu_t = out[:, : spec.q_dim]
                lam_t = jnp.exp(out[:, spec.q_dim:] + _LOG_LAM_BIAS)
            else:
                mu_t = out
        else:
            mu_t = lp["mu"]
        mus.append(jnp.concatenate([lp["mu0"], mu_t], axis=0))
        lams.append(jnp.concatenate([jnp.exp(lp["log_lam0"]), lam_t], axis=0))
    return mus, lams


def _layer_inputs(cfg: RGPConfig, h: int, mu_full, lam_full, mu_lower_t, lam_lower_t, U):
    """Windowed uncertain inputs (means, vars) for hidden layer h, (T, Din)."""
    spec = cfg.layers[h]
    L = spec.win
    own_mu = lagged(mu_full, L)[L:]
    own_s = lagged(lam_full, L)[L:]
    if h == 0:
        low_mu = current_window(U, cfg.u_win)
        low_s = jnp.zeros_like(low_mu)
    else:
        low_mu = current_window(mu_lower_t, L)
        low_s = current_window(lam_lower_t, L)
    X_mu = jnp.concatenate([own_mu, low_mu], axis=-1)
    X_s = jnp.concatenate([own_s, low_s], axis=-1)
    return X_mu, X_s


def elbo(cfg: RGPConfig, params, Y, U, *, block: Optional[int] = 128,
         whitening=None, psi_prefer: str = "auto",
         chol_jitter: Optional[float] = None):
    """REVARB evidence lower bound (Appendix A.4) — one pure scalar function.

    ``whitening``: optional tuple of H+1 precomputed (possibly stale)
    :class:`~rgp_tpu.inference.collapsed_vi.Whitening` bases, one per hidden
    layer plus the output layer — amortizes the per-layer eigh across training
    steps (see :func:`compute_whitenings` and ``train.fit_adam(aux_fn=...)``).

    ``psi_prefer``: forwarded to :func:`~rgp_tpu.ops.psi_stats.psi_statistics`
    — pass ``"scan"`` (with a small ``block``) when this ELBO is vmapped over
    many instances (e.g. 1024 NUTS chains), where the per-instance dense-psi2
    dispatch heuristic would blow up batched memory.

    ``chol_jitter``: override the whitened-factorization base jitter — MCMC
    potentials pass ~1e-3 so the jitchol escalation ladder's discrete rung
    flips (±hundreds-of-nats cliffs) never trigger (see collapsed_vi._common).
    """
    Y = jnp.asarray(Y)
    U = jnp.asarray(U)
    total = 0.0
    mus, lams = _hidden_moments(cfg, params, Y, U)

    mu_lower_t = None
    lam_lower_t = None
    for h, spec in enumerate(cfg.layers):
        lp = params["layers"][h]
        L = spec.win
        mu_full = mus[h]
        lam_full = lams[h]

        X_mu, X_s = _layer_inputs(cfg, h, mu_full, lam_full, mu_lower_t, lam_lower_t, U)
        tgt_mu = mu_full[L:]
        tgt_lam = lam_full[L:]

        stats = psi_statistics(spec.kernel, lp["kern"], lp["Z"], X_mu, X_s, block=block, prefer=psi_prefer)
        total = total + collapsed_bound(
            spec.kernel, lp["kern"], lp["Z"], _fln(cfg, lp["log_noise"]), stats, tgt_mu, tgt_lam,
            W=None if whitening is None else whitening[h],
            jitter=chol_jitter,
        )
        # entropy of q over targets + KL(init window || N(0,1))  (A.4)
        total = total + 0.5 * jnp.sum(jnp.log(2.0 * jnp.pi * jnp.e * tgt_lam))
        mu0, lam0 = mu_full[:L], lam_full[:L]
        total = total - 0.5 * jnp.sum(mu0 * mu0 + lam0 - jnp.log(lam0) - 1.0)

        mu_lower_t, lam_lower_t = tgt_mu, tgt_lam

    # output layer: emission on window of top latents
    op = params["out"]
    Xo_mu = current_window(mu_lower_t, cfg.out_win)
    Xo_s = current_window(lam_lower_t, cfg.out_win)
    stats = psi_statistics(cfg.out_kernel, op["kern"], op["Z"], Xo_mu, Xo_s, block=block, prefer=psi_prefer)
    total = total + collapsed_bound(
        cfg.out_kernel, op["kern"], op["Z"], _fln(cfg, op["log_noise"]), stats, Y,
        W=None if whitening is None else whitening[-1],
        jitter=chol_jitter,
    )
    return total


def compute_whitenings(cfg: RGPConfig, params, Y, U, *, block: Optional[int] = 128,
                       ladder: bool = True):
    """Fresh per-layer spectral whitening bases (H+1 tuple; see
    :func:`~rgp_tpu.inference.collapsed_vi.whitening_basis`).

    Used to amortize the eigh across training steps: recompute every k steps
    (``train.fit_adam(aux_fn=..., aux_every=k)``) and pass into :func:`elbo`.
    A stale basis still yields a valid ELBO of a nearby clamp-regularized
    model — only the conditioning of the whitened matrices degrades as the
    hyperparameters drift, which the next refresh restores.

    ``ladder=False`` pins the spectral floor at its deterministic base value
    (no f32 trial-Cholesky escalation; the psi pass is skipped entirely).
    Required when the basis is recomputed INSIDE a sampler potential each
    evaluation: the escalation's pass/fail trial flips discretely with
    position, which puts ~1-nat cliffs into an otherwise smooth potential
    (measured round 5: fresh-basis f64 leapfrog energy error 0.001-0.9 nats
    at eps=0.002 vs 1e-8 for a fixed basis — the dual averaging then crushes
    eps to ~4e-3 and the reference chain cannot mix). In f64 the ladder is
    also unnecessary: it guards against f32 Psi2 rounding making the whitened
    Ct indefinite."""
    from ..inference.collapsed_vi import whitening_basis
    from ..params import positive as _positive

    Y = jnp.asarray(Y)
    U = jnp.asarray(U)
    mus, lams = _hidden_moments(cfg, params, Y, U)
    out = []
    mu_lower_t = lam_lower_t = None
    for h, spec in enumerate(cfg.layers):
        lp = params["layers"][h]
        L = spec.win
        Kmm = spec.kernel.K(lp["kern"], lp["Z"])
        if ladder:
            X_mu, X_s = _layer_inputs(cfg, h, mus[h], lams[h], mu_lower_t, lam_lower_t, U)
            stats = psi_statistics(spec.kernel, lp["kern"], lp["Z"], X_mu, X_s, block=block)
            out.append(
                whitening_basis(Kmm, stats.psi2, 1.0 / _positive(_fln(cfg, lp["log_noise"])))
            )
        else:
            out.append(whitening_basis(Kmm))
        mu_lower_t, lam_lower_t = mus[h][L:], lams[h][L:]
    op = params["out"]
    Kmm = cfg.out_kernel.K(op["kern"], op["Z"])
    if ladder:
        Xo_mu = current_window(mu_lower_t, cfg.out_win)
        Xo_s = current_window(lam_lower_t, cfg.out_win)
        stats = psi_statistics(cfg.out_kernel, op["kern"], op["Z"], Xo_mu, Xo_s, block=block)
        out.append(whitening_basis(Kmm, stats.psi2, 1.0 / _positive(_fln(cfg, op["log_noise"]))))
    else:
        out.append(whitening_basis(Kmm))
    return tuple(out)


def neg_elbo(cfg: RGPConfig, params, Y, U, *, block: Optional[int] = 128):
    return -elbo(cfg, params, Y, U, block=block)


# ----------------------------------------------------------------- freerun


def _posteriors(cfg: RGPConfig, params, Y, U, *, block=None):
    """Per-layer sparse posteriors from the trained variational state —
    computed once, reused across all freerun steps (S3.3 step 2)."""
    Y = jnp.asarray(Y)
    U = jnp.asarray(U)
    mus, lams = _hidden_moments(cfg, params, Y, U)
    posts = []
    mu_lower_t = lam_lower_t = None
    for h, spec in enumerate(cfg.layers):
        lp = params["layers"][h]
        L = spec.win
        mu_full = mus[h]
        lam_full = lams[h]
        X_mu, X_s = _layer_inputs(cfg, h, mu_full, lam_full, mu_lower_t, lam_lower_t, U)
        stats = psi_statistics(spec.kernel, lp["kern"], lp["Z"], X_mu, X_s, block=block)
        posts.append(
            posterior(spec.kernel, lp["kern"], lp["Z"], _fln(cfg, lp["log_noise"]), stats, mu_full[L:])
        )
        mu_lower_t, lam_lower_t = mu_full[L:], lam_full[L:]
    op = params["out"]
    Xo_mu = current_window(mu_lower_t, cfg.out_win)
    Xo_s = current_window(lam_lower_t, cfg.out_win)
    stats = psi_statistics(cfg.out_kernel, op["kern"], op["Z"], Xo_mu, Xo_s, block=block)
    posts.append(posterior(cfg.out_kernel, op["kern"], op["Z"], _fln(cfg, op["log_noise"]), stats, Y))
    return posts, (mu_lower_t, lam_lower_t)


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("include_noise",))
def predict_train(cfg: RGPConfig, params, Y, U, *, include_noise: bool = True):
    """One-step-ahead (teacher-forced) prediction over the training span
    (reference ``m.predict`` semantics [M]): the output GP evaluated at the
    trained variational latent windows. Returns (mean (T, Dy), var (T, Dy))."""
    posts, (mu_top, lam_top) = _posteriors(cfg, params, Y, U)
    op = params["out"]
    Xo_mu = current_window(mu_top, cfg.out_win)
    Xo_s = current_window(lam_top, cfg.out_win)
    return predict_uncertain(
        cfg.out_kernel, op["kern"], op["Z"], _fln(cfg, op["log_noise"]), posts[-1],
        Xo_mu, Xo_s, include_noise=include_noise,
    )


@functools.partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=("moment_match", "init_from_train_tail"),
)
def freerun(
    cfg: RGPConfig,
    params,
    Y_train,
    U_train,
    U_test,
    *,
    moment_match: bool = True,
    init_from_train_tail: bool = True,
):
    """Closed-loop free simulation over test inputs (S3.3; the benchmark path).

    Jitted with ``cfg`` static: the whole rollout (posterior precompute +
    scan) compiles to one executable — un-jitted, each of the hundreds of host
    jnp calls in the posterior assembly pays a device round trip (the
    environment gotcha recorded in BASELINE.md).

    Each hidden layer's feedback window starts from the tail of its trained
    variational means; every per-step prediction is moment-matched through the
    psi-statistics with the accumulated state uncertainty. Returns
    (y_means (T*, Dy), y_vars (T*, Dy))."""
    posts, _ = _posteriors(cfg, params, Y_train, U_train)
    U_test = jnp.asarray(U_test)
    H = cfg.n_hidden

    mus, lams = _hidden_moments(cfg, params, jnp.asarray(Y_train), jnp.asarray(U_train))

    # per-layer state buffer length: own window or consumer window, whichever larger
    buf_lens = []
    for h, spec in enumerate(cfg.layers):
        need_above = cfg.layers[h + 1].win if h + 1 < H else cfg.out_win
        buf_lens.append(max(spec.win, need_above))

    # initial buffers from trained latent tails (most-recent-first)
    bufs_mu, bufs_s = [], []
    for h, spec in enumerate(cfg.layers):
        B = buf_lens[h]
        if init_from_train_tail:
            tail_mu = mus[h][-B:][::-1]
            tail_s = lams[h][-B:][::-1]
        else:
            tail_mu = jnp.zeros((B, spec.q_dim), dtype=U_test.dtype)
            tail_s = jnp.ones((B, spec.q_dim), dtype=U_test.dtype)
        bufs_mu.append(tail_mu)
        bufs_s.append(tail_s)

    # exogenous windows: seed u history from the training tail so the first
    # test steps see valid lags
    Lu = cfg.u_win
    U_cat = jnp.concatenate([jnp.asarray(U_train)[-max(Lu - 1, 0):], U_test], axis=0) \
        if Lu > 1 else U_test
    Uw = current_window(U_cat, Lu)[max(Lu - 1, 0):] if Lu > 0 else \
        jnp.zeros((U_test.shape[0], 0), dtype=U_test.dtype)

    specs = cfg.layers

    def step(carry, uw):
        bufs_mu, bufs_s = carry
        new_mu, new_s = [], []
        for h, spec in enumerate(specs):
            lp = params["layers"][h]
            L = spec.win
            own_mu = bufs_mu[h][:L].reshape(1, -1)
            own_s = bufs_s[h][:L].reshape(1, -1)
            if h == 0:
                low_mu = uw.reshape(1, -1)
                low_s = jnp.zeros_like(low_mu)
            else:
                # lower layer's window INCLUDING its just-computed current step
                low_mu = jnp.concatenate([new_mu[h - 1][None, :], bufs_mu[h - 1][: L - 1].reshape(-1, specs[h - 1].q_dim)], axis=0).reshape(1, -1) if L > 1 else new_mu[h - 1].reshape(1, -1)
                low_s = jnp.concatenate([new_s[h - 1][None, :], bufs_s[h - 1][: L - 1].reshape(-1, specs[h - 1].q_dim)], axis=0).reshape(1, -1) if L > 1 else new_s[h - 1].reshape(1, -1)
            x_mu = jnp.concatenate([own_mu, low_mu], axis=-1)
            x_s = jnp.concatenate([own_s, low_s], axis=-1)
            m, v = predict_uncertain(
                spec.kernel, lp["kern"], lp["Z"], _fln(cfg, lp["log_noise"]), posts[h],
                x_mu, x_s if moment_match else None,
                include_noise=True,  # process noise propagates into the state
            )
            new_mu.append(m[0])
            new_s.append(v[0])

        # emission from window over top latents (current + previous)
        op = params["out"]
        W = cfg.out_win
        top_mu = jnp.concatenate([new_mu[-1][None, :], bufs_mu[-1][: W - 1]], axis=0).reshape(1, -1) if W > 1 else new_mu[-1].reshape(1, -1)
        top_s = jnp.concatenate([new_s[-1][None, :], bufs_s[-1][: W - 1]], axis=0).reshape(1, -1) if W > 1 else new_s[-1].reshape(1, -1)
        ym, yv = predict_uncertain(
            cfg.out_kernel, op["kern"], op["Z"], _fln(cfg, op["log_noise"]), posts[-1],
            top_mu, top_s if moment_match else None,
            include_noise=True,
        )

        bufs_mu = [
            jnp.concatenate([new_mu[h][None, :], bufs_mu[h][:-1]], axis=0)
            for h in range(H)
        ]
        bufs_s = [
            jnp.concatenate([new_s[h][None, :], bufs_s[h][:-1]], axis=0)
            for h in range(H)
        ]
        return (bufs_mu, bufs_s), (ym[0], yv[0])

    (_, _), (y_means, y_vars) = jax.lax.scan(step, (bufs_mu, bufs_s), Uw)
    return y_means, y_vars
