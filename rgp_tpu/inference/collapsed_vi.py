"""Collapsed sparse variational inference (VarDTC) with uncertain inputs.

TPU-native rebuild of `GPy:GPy/inference/latent_function_inference/var_dtc.py`
[H] specialized as in the reference's `RGP:autoreg/inference.py` [M] for targets
that may themselves be variational (mean + variance) — SURVEY.md S2.1/S2.2 and
Appendix A.3. One pure function computes the bound; *all* gradients (the
reference's hand-built ``grad_dict``: dL_dpsi0/1/2, dL_dKmm, dL_dthetaL) come
from autodiff through it.

Bound (A.3), with beta = 1/sigma^2, Lm = chol(Kmm + jitter), A = beta Lm^{-1}
Psi2 Lm^{-T}, B = I + A, Lb = chol(B), c = Lb^{-1} Lm^{-1} Psi1^T Y:

  F0 = -TD/2 log(2 pi sigma^2) - D/2 log|B| - E||Y||^2_F/(2 sigma^2)
       + ||c||^2_F/(2 sigma^4) - D/(2 sigma^2) (Psi0 - tr(Kmm^{-1} Psi2))

where E||Y||^2 = ||Y_mean||^2 + sum(Y_var) absorbs the hidden-layer
"-tr(S)/(2 sigma^2)" REVARB correction (A.4) when targets are variational.

f32/TPU formulation: the bound is assembled in a stop-gradient *spectral
whitening basis* of Kmm (see :func:`whitening_basis`) so every factorized
matrix is ~identity-conditioned regardless of cond(Kmm). GPy's congruence
(and round-1's C = Kmm + beta Psi2 variant) both amplify Psi2's f32 rounding
error by 1/lambda_min(Kmm) — measured ~68-nat ELBO error on the drives
flagship at cond(Kmm) ~ 1e17, vs ~0.1 nats for the whitened form.

Moment-matched prediction at uncertain inputs (Girard et al. 2003; the
reference's ``freerun`` path, SURVEY.md S3.3): with W = (Kmm + beta Psi2)^{-1}
and alpha = beta W Psi1^T Y,

  mu*    = Psi1* alpha
  var*_d = alpha_d^T (Psi2* - Psi1*^T Psi1*) alpha_d
           + Psi0* - tr((Kmm^{-1} - W) Psi2*)  [+ sigma^2]
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax import lax

from ..kernels import Kernel
from ..linalg import (
    cho_solve,
    default_jitter,
    hdot,
    jitchol,
    log_det_from_chol,
    solve_triangular,
)
from ..ops.psi_stats import PsiStats, psi01, psi2_per_t
from ..params import positive

__all__ = [
    "collapsed_bound",
    "SparsePosterior",
    "posterior",
    "predict_uncertain",
    "predict_certain",
    "posterior_f_samples",
    "log_predictive_density",
    "predict_quantiles",
    "whitening_basis",
    "Whitening",
    "default_spectral_floor",
]

_LOG2PI = 1.8378770664093453  # log(2*pi), host constant (no import-time device op)


class Whitening(NamedTuple):
    """Stop-gradient spectral whitening of Kmm (see :func:`whitening_basis`).

    W: (M, M) ``V diag(lambda_eff^{-1/2})``.
    topup: (M,) ``1 - lambda/lambda_eff`` — diagonal correction s.t.
        ``W^T Kmm W + diag(topup) = I`` at the linearization point.
    half_logdet: scalar ``0.5 * sum(log lambda_eff)`` = half log-det of the
        clamp-regularized Kmm (used by the explicit-q(u) SVI KL).
    """

    W: jnp.ndarray
    topup: jnp.ndarray
    half_logdet: jnp.ndarray


def default_spectral_floor(dtype) -> float:
    """Relative spectral floor for the whitened bound: eigendirections of Kmm
    below ``floor * lambda_max`` are lifted to the floor (soft clamp), capping
    the pseudo-inverse scale of the bound and posterior at 1/floor (SURVEY.md
    S7 hard-part 1). Deliberately dtype-INDEPENDENT (1e-6, the spectral analog
    of the reference's universal relative jitter, `GPy:GPy/util/linalg.py`
    jitchol [H]) so f32 (TPU production) and f64 (CPU test oracle) evaluate
    the SAME regularized model and differ only by rounding — the f32-vs-f64
    consistency gate then measures numerics, not regularization policy."""
    del dtype
    return 1e-6


def whitening_basis(Kmm, psi2=None, beta=None, spectral_floor: Optional[float] = None):
    """Stop-gradient spectral whitening basis for the collapsed bound.

    Returns a :class:`Whitening` with ``W = V diag(lambda_eff^{-1/2})``,
    ``lambda_eff = max(lambda, floor * lambda_max)`` the softly-clamped
    spectrum of Kmm, and ``topup = 1 - lambda/lambda_eff`` the diagonal
    correction making ``W^T Kmm W + diag(topup) = I`` at the linearization
    point; both under ``stop_gradient``.

    Rationale (replaces both GPy's B = I + beta Lm^{-1} Psi2 Lm^{-T}
    congruence and round-1's C = Kmm + beta Psi2 factorization): RBF Gram
    matrices over inducing points a few lengthscales apart are numerically
    singular (cond ~ 1e17 even in f64), so ANY Cholesky-of-Kmm route amplifies
    the f32 rounding error of Psi2 by 1/lambda_min and corrupts log|B| and
    tr(Kmm^{-1} Psi2) by hundreds of nats (measured on the drives flagship).
    Re-expressing the bound for the transformed inducing features u~ = W^T u
    keeps every factorized matrix ~identity-conditioned: the measured f32
    error collapses from ~68 nats to ~0.1 on the worst config.

    Adaptive floor ladder: Psi2's own rounding noise (~eps * ||Psi2||),
    amplified by beta/lambda_kept, can make the whitened beta W^T Psi2 W
    indefinite when the base floor keeps an eigendirection that is too small
    relative to Psi2's error. When ``psi2``/``beta`` are given, a trial
    (stop-grad) Cholesky of Ct = Kt + beta W^T Psi2 W is run at floors
    (f0, 1e3 f0, 1e6 f0) and the first succeeding floor is selected — the
    same straight-line escalate-on-failure pattern (and TPU rationale) as
    :func:`rgp_tpu.linalg.jitchol_with_jitter`, and the moral equivalent of
    the reference's jitchol retry (`GPy:GPy/util/linalg.py` [H]), whose
    Cholesky-failure exception is what adaptively floors GPy's spectrum.

    Exactness of the stop-gradient: for full-rank W with zero topup the
    collapsed bound is invariant to W (same variational family), so the
    gradient contribution through W is exactly zero; the clamp only engages
    for eigendirections below the dtype's resolution, where the (tiny)
    regularizer gradient is discarded — the same class of approximation as
    the stop-gradded jitter selection in jitchol.
    """
    Kmm_sym = lax.stop_gradient(0.5 * (Kmm + Kmm.T))
    if spectral_floor is None:
        spectral_floor = default_spectral_floor(Kmm.dtype)
    lam, V = jnp.linalg.eigh(Kmm_sym)  # ascending
    lam_max = jnp.maximum(lam[-1], jnp.asarray(1e-30, Kmm.dtype))

    # SOFT clamp (not a hard truncation): lam_eff = max(lam, floor*lam_max).
    # A hard kept/dropped mask flips with the last rounding bits of eigenvalues
    # near the floor, jumping the bound by whole nats between evaluation orders
    # (measured 4.8 nats between the sharded and plain f32 ELBO); the clamp is
    # continuous in lam, so different orders agree to rounding. ``topup`` =
    # 1 - lam/lam_eff makes W^T Kmm W + diag(topup) = I at the linearization
    # point, i.e. clamped directions enter the bound with their prior variance
    # lifted to the floor — the spectral analog of GPy's additive jitter.
    def _w_topup(floor):
        lam_eff = jnp.maximum(lam, floor * lam_max)
        W = V / jnp.sqrt(lam_eff)[None, :]
        topup = 1.0 - jnp.maximum(lam, 0.0) / lam_eff
        return W, topup, lam_eff

    floor = jnp.asarray(spectral_floor, Kmm.dtype)
    if psi2 is not None:
        # Escalate the floor until the whitened Ct factorizes (see docstring).
        # The trial runs in f32 FOR EVERY INPUT DTYPE: the regularization
        # policy must be a deterministic function of the model, not of the
        # evaluation dtype, or the f32 (TPU) and f64 (CPU oracle) paths would
        # quietly compute differently-regularized models whenever only f32
        # needs the escalation — which is exactly when they must agree.
        p2 = lax.stop_gradient(0.5 * (psi2 + psi2.T)).astype(jnp.float32)
        K32 = Kmm_sym.astype(jnp.float32)
        lam32 = lam.astype(jnp.float32)
        lmax32 = lam_max.astype(jnp.float32)
        b = lax.stop_gradient(beta).astype(jnp.float32)
        M = Kmm.shape[-1]
        eye = jnp.eye(M, dtype=jnp.float32)

        def _fails(fl):
            lam_eff = jnp.maximum(lam32, jnp.float32(fl) * lmax32)
            W32 = V.astype(jnp.float32) / jnp.sqrt(lam_eff)[None, :]
            topup = 1.0 - jnp.maximum(lam32, 0.0) / lam_eff
            Kt = hdot(W32.T, hdot(K32, W32)) + jnp.diag(topup)
            At = b * hdot(W32.T, hdot(p2, W32))
            Ct = Kt + 0.5 * (At + At.T)
            Ct = Ct + 1e-6 * jnp.mean(jnp.diagonal(Ct)) * eye
            return jnp.isnan(jnp.linalg.cholesky(Ct)).any()

        f0 = _fails(spectral_floor)
        f1 = jnp.where(f0, _fails(1e3 * spectral_floor), False)
        floor = jnp.where(
            f0,
            jnp.where(f1, 1e6 * floor, 1e3 * floor),
            floor,
        )

    W, topup, lam_eff = _w_topup(floor)
    return Whitening(
        lax.stop_gradient(W),
        lax.stop_gradient(topup),
        lax.stop_gradient(0.5 * jnp.sum(jnp.log(lam_eff))),
    )


def _common(kern: Kernel, kp, Z, psi2, noise, jitter: Optional[float],
            need_trace: bool = True, W=None, psi1_factor=None):
    """Shared whitened factorizations for the collapsed bound.

    With W the (stop-grad) whitening basis of Kmm (see
    :func:`whitening_basis`), the bound is assembled for the inducing
    features u~ = W^T u:

      Kt = W^T Kmm W + diag(topup)    (~ I, differentiable through Kmm)
      At = beta W^T Psi2 W            (dropped rows/cols are zero)
      Ct = Kt + At                    (pivots >= ~1: f32-safe Cholesky)
      log|B| = log|Ct| - log|Kt|,  tr(Kmm^{-1} Psi2) = tr(Kt^{-1} At)/beta

    ``jitter`` (live override, ADVICE r4): when not None it REPLACES the base
    rung of the whitened Cholesky's escalation ladder — MCMC potentials pass
    ~1e-3 so the first rung succeeds across the sampled region and the
    ladder's discrete rung flips (±hundreds-of-nats cliffs) never trigger
    (see the inline note at the ``jitchol`` call below). ``None`` keeps the
    dtype-resolved training default. Pass a precomputed :class:`Whitening` as
    ``W`` to amortize the eigh across training steps (any full-rank W gives
    the identical bound, so a slightly stale basis changes nothing but
    conditioning).
    """
    Kmm = kern.K(kp, Z)
    M = Kmm.shape[-1]
    beta = 1.0 / noise
    if W is not None:
        wh = W
    elif psi1_factor is not None:
        # factored At below is PSD by construction — no floor ladder needed
        wh = whitening_basis(Kmm)
    else:
        wh = whitening_basis(Kmm, psi2, beta)
    W, topup = wh.W, wh.topup
    WtKW = hdot(W.T, hdot(Kmm, W))
    Kt = 0.5 * (WtKW + WtKW.T) + jnp.diag(topup)
    if psi1_factor is not None:
        # certain inputs: Psi2 == Psi1^T Psi1 exactly, so project the FACTOR —
        # At = beta (Psi1 W)^T (Psi1 W) is PSD by construction and avoids the
        # "normal equations" precision loss of forming K^T K before whitening
        # (measured: ~1 nat of f32 logdet/trace error on the NARX config at
        # cond(Kmm) ~ 2e5 via the summed path, ~1e-2 nats factored)
        P1W = hdot(psi1_factor, W)  # (T, M)
        At = beta * hdot(P1W.T, P1W)
    else:
        psi2s = 0.5 * (psi2 + psi2.T)
        WtP2W = hdot(W.T, hdot(psi2s, W))
        At = beta * 0.5 * (WtP2W + WtP2W.T)
    Ct = Kt + At
    # the whitened matrices are ~identity-conditioned (pivots >= ~1), so the
    # jitter stays at the dtype's resolution — a f32-sized 1e-4 here costs
    # ~0.5 nats via the trace term at beta ~ 100, and anything above ~1e-12
    # in f64 shows up as ~1e-4 relative error under finite-difference checkgrad.
    # ``jitter`` overrides the base rung: MCMC potentials pass a LARGER value
    # (e.g. 1e-3) so the first rung succeeds everywhere and the escalation
    # ladder's discrete rung flips — ±hundreds-of-nats cliffs at infinitesimal
    # parameter moves, measured as the config-5 divergence storm (BASELINE.md
    # r4) — effectively never trigger inside a sampler's state space.
    j0 = jitter if jitter is not None else (
        1e-12 if jnp.dtype(Kmm.dtype).itemsize >= 8 else 1e-6
    )
    Lk = jitchol(Kt, jitter0=j0)
    Lc = jitchol(Ct, jitter0=j0)
    # tr(Kmm^{-1} Psi2) = tr(Kt^{-1} At) / beta (kept subspace; pseudo-inverse
    # semantics on the truncated directions)
    tr_KiP2 = jnp.trace(cho_solve(Lk, At)) / beta if need_trace else None
    return Kmm, W, Lk, Lc, tr_KiP2, beta


def collapsed_bound_from_suffstats(
    kern: Kernel,
    kp,
    Z,
    log_noise,
    psi0_sum,
    psi1Y,
    psi2,
    trYY,
    T,
    D,
    *,
    jitter: Optional[float] = None,
    W: Optional[Whitening] = None,
    psi1_factor=None,
):
    """Assemble F0 from the additive sufficient statistics
    (sum_t psi0_t, Psi1^T Y, sum_t Psi2_t, E||Y||^2, T).

    This is the reduction point of the data-parallel path: partial sums of
    these four statistics over time shards are ``psum``-reduced across the mesh
    (the TPU-native equivalent of the reference's MPI ``Allreduce`` in
    `GPy:.../var_dtc_parallel.py` [M], SURVEY.md N5/S3.4) and assembled
    identically on every device.
    """
    noise = positive(log_noise)
    _, W, Lk, Lc, tr_KmmInvPsi2, beta = _common(
        kern, kp, Z, psi2, noise, jitter, W=W, psi1_factor=psi1_factor
    )

    # ||Lc^{-1} W^T Psi1^T Y||^2 = Y^T Psi1 C~^{-1} Psi1^T Y in the whitened basis
    c = solve_triangular(Lc, hdot(W.T, psi1Y))
    log_det_B = log_det_from_chol(Lc) - log_det_from_chol(Lk)

    return (
        -0.5 * T * D * (_LOG2PI + jnp.log(noise))
        - 0.5 * D * log_det_B
        - 0.5 * beta * trYY
        + 0.5 * beta * beta * jnp.sum(c * c)
        - 0.5 * D * beta * (psi0_sum - tr_KmmInvPsi2)
    )


def collapsed_bound(
    kern: Kernel,
    kp,
    Z,
    log_noise,
    stats: PsiStats,
    Y,
    Y_var=None,
    *,
    jitter: Optional[float] = None,
    W: Optional[Whitening] = None,
    certain: bool = False,
):
    """The collapsed bound F0 (A.3). ``Y`` are target means (T, D); ``Y_var``
    optional target variances (T, D) for variational (hidden-layer) targets.
    ``W``: optional precomputed (possibly stale) :class:`Whitening` — see
    :func:`whitening_basis` (amortizes the eigh over training steps).
    ``certain``: set when the inputs were certain (s = 0, Psi2 == Psi1^T Psi1)
    — the whitened Psi2 is then assembled from the FACTOR Psi1, which is both
    PSD by construction and far more f32-accurate (see :func:`_common`)."""
    T, D = Y.shape
    psi1Y = hdot(stats.psi1.T, Y)  # (M, D)
    trYY = jnp.sum(Y * Y)
    if Y_var is not None:
        trYY = trYY + jnp.sum(Y_var)
    return collapsed_bound_from_suffstats(
        kern, kp, Z, log_noise,
        jnp.sum(stats.psi0), psi1Y, stats.psi2, trYY, T, D,
        jitter=jitter, W=W, psi1_factor=stats.psi1 if certain else None,
    )


class SparsePosterior(NamedTuple):
    """Sufficient statistics of the collapsed posterior q(u) for prediction.

    alpha: (M, D) predictive weight vector(s), beta W Psi1^T Y.
    woodbury_inv: (M, M) Kmm^{-1} - W (reference posterior.woodbury_inv [H]).
    W: (M, M) (Kmm + beta Psi2)^{-1}.
    """

    alpha: jnp.ndarray
    woodbury_inv: jnp.ndarray
    W: jnp.ndarray


def posterior(
    kern: Kernel,
    kp,
    Z,
    log_noise,
    stats: PsiStats,
    Y,
    *,
    jitter: Optional[float] = None,
    certain: bool = False,
) -> SparsePosterior:
    """``certain``: set when the inputs were certain (s = 0) — Ct is then
    assembled from the PSD factor Psi1 exactly as :func:`collapsed_bound` does
    (the normal-equations form loses ~1 nat of f32 logdet/solve accuracy on
    ill-conditioned NARX instances; predictions must match the bound's
    factorization, not a less accurate one)."""
    noise = positive(log_noise)
    _, Wb, Lk, Lc, _, beta = _common(
        kern, kp, Z, stats.psi2, noise, jitter, need_trace=False,
        psi1_factor=stats.psi1 if certain else None,
    )

    psi1Y = hdot(stats.psi1.T, Y)
    # beta C^{-1} Psi1^T Y through the whitened basis: C^{-1} = Wb Ct^{-1} Wb^T
    alpha = beta * hdot(Wb, cho_solve(Lc, hdot(Wb.T, psi1Y)))

    # C^{-1} = Rc^T Rc and Kmm^{+} = Rk^T Rk with R = L^{-1} Wb^T (pseudo-
    # inverse semantics on truncated directions, matching the bound)
    Rc = solve_triangular(Lc, Wb.T)
    Rk = solve_triangular(Lk, Wb.T)
    C_inv = hdot(Rc.T, Rc)
    Kmm_inv = hdot(Rk.T, Rk)
    return SparsePosterior(alpha=alpha, woodbury_inv=Kmm_inv - C_inv, W=C_inv)


def predict_certain(
    kern: Kernel,
    kp,
    Z,
    log_noise,
    post: SparsePosterior,
    Xs,
    *,
    full_cov: bool = False,
    include_noise: bool = False,
):
    """Sparse-posterior predictive at certain inputs Xs (any kernel).

    Reference: GPy ``predict(Xnew, full_cov=)`` on a VarDTC posterior [H] —
    mean = Kxz alpha, cov = Kxx - Kxz (Kmm^{-1} - W) Kzx. Returns
    (mean (T*, D), var (T*, D)) or, with ``full_cov``, (mean, cov (T*, T*))
    shared across output dims.
    """
    noise = positive(log_noise)
    Kxz = kern.K(kp, Xs, Z)
    mean = hdot(Kxz, post.alpha)
    if full_cov:
        Kxx = kern.K(kp, Xs)
        cov = Kxx - hdot(Kxz, hdot(post.woodbury_inv, Kxz.T))
        if include_noise:
            cov = cov + noise * jnp.eye(Xs.shape[0], dtype=cov.dtype)
        return mean, cov
    kdiag = kern.Kdiag(kp, Xs)
    var = kdiag - jnp.einsum("tm,mn,tn->t", Kxz, post.woodbury_inv, Kxz)
    var = jnp.maximum(var, 1e-12)[:, None] + (noise if include_noise else 0.0)
    return mean, jnp.broadcast_to(var, mean.shape)


def posterior_f_samples(
    kern: Kernel,
    kp,
    Z,
    log_noise,
    post: SparsePosterior,
    Xs,
    key,
    *,
    n_samples: int = 10,
    include_noise: bool = False,
):
    """Joint samples of f* at Xs from the sparse posterior (the reference's
    ``m.posterior_samples_f`` [H]). Returns (n_samples, T*, D)."""
    import jax

    mean, cov = predict_certain(
        kern, kp, Z, log_noise, post, Xs, full_cov=True, include_noise=include_noise
    )
    L = jitchol(cov)
    eps = jax.random.normal(key, (n_samples, Xs.shape[0], mean.shape[1]), dtype=mean.dtype)
    return mean[None] + jnp.einsum("ts,nsd->ntd", L, eps)


def log_predictive_density(y, mean, var):
    """Mean Gaussian log predictive density of held-out targets (reference
    ``m.log_predictive_density`` [H]). All args (T, D); returns a scalar."""
    return jnp.mean(
        -0.5 * (_LOG2PI + jnp.log(var)) - 0.5 * (y - mean) ** 2 / var
    )


def predict_quantiles(mean, var, quantiles=(2.5, 97.5)):
    """Gaussian predictive quantiles in percent (reference
    ``m.predict_quantiles`` [H]). Returns a tuple of arrays shaped like
    ``mean``, one per requested percentile."""
    import scipy.stats

    sd = jnp.sqrt(var)
    return tuple(
        mean + float(scipy.stats.norm.ppf(q / 100.0)) * sd for q in quantiles
    )


def predict_uncertain(
    kern: Kernel,
    kp,
    Z,
    log_noise,
    post: SparsePosterior,
    mu_star,
    s_star=None,
    *,
    include_noise: bool = False,
):
    """Moment-matched predictive at q(x*) = N(mu*, diag(s*)) (batch over rows).

    Returns (mean (T*, D), var (T*, D)). ``s_star=None`` gives the standard
    sparse-GP predictive at certain inputs (same code path, s = 0).
    """
    noise = positive(log_noise)
    psi0, psi1 = psi01(kern, kp, Z, mu_star, s_star)
    p2t = psi2_per_t(kern, kp, Z, mu_star, s_star)  # (T*, M, M)

    mean = hdot(psi1, post.alpha)  # (T*, D)

    # alpha_d^T Psi2*_t alpha_d for each t, d
    quad = jnp.einsum("md,tmn,nd->td", post.alpha, p2t, post.alpha)
    trace_term = jnp.einsum("mn,tnm->t", post.woodbury_inv, p2t)  # (T*,)
    var = quad - mean * mean + (psi0 - trace_term)[:, None]
    if include_noise:
        var = var + noise
    # guard tiny negative values from f32 cancellation
    var = jnp.maximum(var, 1e-12)
    return mean, var
