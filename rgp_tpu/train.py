"""Training drivers (optimizer layer).

Replaces the reference's paramz optimizer stack (`paramz/optimization/` [H]:
scipy L-BFGS-B, SCG — SURVEY.md S2.2 "Optimizer drivers") with two drivers:

* :func:`fit_adam` — the TPU-native path: optax Adam, the entire optimization
  loop a single ``lax.scan`` under ``jit`` (no host round-trips per step),
  returning the ELBO trajectory. This is the driver used on-device and the one
  benchmarked for "ELBO iterations/sec/chip" (BASELINE.json:2).
* :func:`fit_scipy_lbfgs` — reference-parity convenience driver: scipy
  L-BFGS-B over the flat unconstrained vector with jitted value-and-grad
  (exactly the reference's ``m.optimize('lbfgsb')`` semantics, host loop).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .params import ravel

__all__ = [
    "fit_adam",
    "fit_minibatch",
    "fit_scipy_lbfgs",
    "fit_scg",
    "optimize_restarts",
    "freeze_mask",
    "FitResult",
]


class FitResult(NamedTuple):
    params: object
    losses: jnp.ndarray  # per-iteration objective values (negative ELBO)


def freeze_mask(params, predicate: Callable[[str], bool]):
    """Build a frozen-leaf mask from a path predicate — the functional analog
    of paramz ``param.fix()`` (`paramz:paramz/core/constrainable.py` [H]).

    ``predicate`` receives each leaf's '/'-joined key path (e.g.
    ``"layers/0/Z"``, ``"out/log_noise"``) and returns True to FREEZE it.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        parts = []
        for k in kp:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        return "/".join(parts)

    frozen_paths = {path_str(kp) for kp, _ in flat if predicate(path_str(kp))}
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: path_str(kp) in frozen_paths, params
    )


def _apply_frozen(g, frozen):
    if frozen is None:
        return g
    return jax.tree.map(
        lambda grad, f: jnp.where(f, jnp.zeros_like(grad), grad), g, frozen
    )


def fit_adam(
    loss_fn: Callable,
    params,
    *,
    iters: int,
    learning_rate: float = 1e-2,
    optimizer: Optional[optax.GradientTransformation] = None,
    frozen=None,
    jit: bool = True,
    aux_fn: Optional[Callable] = None,
    aux_every: int = 1,
) -> FitResult:
    """Minimize ``loss_fn(params)`` with Adam; whole loop under one jit/scan.

    ``frozen``: optional pytree of booleans matching ``params`` (see
    :func:`freeze_mask`) — True leaves receive zero gradient, i.e. stay fixed
    (the reference's ``param.fix()``).

    ``aux_fn``: optional ``aux_fn(params) -> aux`` recomputed every
    ``aux_every`` iterations; the loss is then called as ``loss_fn(params,
    aux)``. Used to amortize expensive stop-gradient preconditioners across
    steps — e.g. the spectral whitening bases of the collapsed bound
    (``rgp.compute_whitenings``), whose per-layer eigh would otherwise double
    the TPU step time. Structured as a chunked scan (outer: refresh aux;
    inner: ``aux_every`` Adam steps) so the whole loop stays one executable.
    """
    opt = optimizer if optimizer is not None else optax.adam(learning_rate)

    def run(p0):
        state0 = opt.init(p0)

        if aux_fn is None:
            def step(carry, _):
                p, s = carry
                loss, g = jax.value_and_grad(loss_fn)(p)
                g = _apply_frozen(g, frozen)
                updates, s = opt.update(g, s, p)
                p = optax.apply_updates(p, updates)
                return (p, s), loss

            (p, _), losses = jax.lax.scan(step, (p0, state0), None, length=iters)
            return p, losses

        n_outer = -(-iters // aux_every)

        def inner(carry, _):
            p, s, aux = carry
            loss, g = jax.value_and_grad(lambda q: loss_fn(q, aux))(p)
            g = _apply_frozen(g, frozen)
            updates, s = opt.update(g, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s, aux), loss

        def outer(carry, _):
            p, s = carry
            aux = aux_fn(p)
            (p, s, _), losses = jax.lax.scan(
                inner, (p, s, aux), None, length=aux_every
            )
            return (p, s), losses

        (p, _), losses = jax.lax.scan(outer, (p0, state0), None, length=n_outer)
        return p, losses.reshape(-1)[:iters]

    if jit:
        run = jax.jit(run)
    p, losses = run(params)
    return FitResult(params=p, losses=losses)


def optimize_restarts(
    loss_fn: Callable,
    init_fn: Callable,
    seeds,
    *,
    iters: int,
    learning_rate: float = 1e-2,
    optimizer: Optional[optax.GradientTransformation] = None,
    accept_fn: Optional[Callable] = None,
) -> FitResult:
    """Multi-restart optimization, all restarts trained in ONE vmapped scan
    on-chip (the TPU-native analog of paramz ``m.optimize_restarts`` [H],
    which loops seeds on the host).

    ``init_fn(seed) -> params`` builds each restart's initial pytree (host-side
    numpy is fine — called before tracing). The best restart by final loss is
    returned; ``accept_fn(params) -> bool array`` optionally vetoes degenerate
    optima (e.g. collapsed noise channels) before selection.
    """
    opt = optimizer if optimizer is not None else optax.adam(learning_rate)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[init_fn(s) for s in seeds])

    def run_one(p0):
        state0 = opt.init(p0)

        def step(carry, _):
            p, s = carry
            loss, g = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(g, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), loss

        (p, _), losses = jax.lax.scan(step, (p0, state0), None, length=iters)
        return p, losses

    params_b, losses_b = jax.jit(jax.vmap(run_one))(stacked)
    final = losses_b[:, -1]
    if accept_fn is not None:
        ok = jax.vmap(accept_fn)(params_b)
        score = jnp.where(ok, final, jnp.inf)
        final = jnp.where(jnp.any(ok), score, final)
    best = int(jnp.argmin(final))
    return FitResult(
        params=jax.tree.map(lambda a: a[best], params_b), losses=losses_b[best]
    )


def fit_minibatch(
    loss_fn: Callable,
    params,
    data,
    *,
    iters: int,
    batch_size: int,
    key,
    learning_rate: float = 1e-2,
    optimizer: Optional[optax.GradientTransformation] = None,
    natgrad_block: Optional[str] = None,
    natgrad_lr=0.1,  # float or callable(step_index) -> float (decay schedule)
    natgrad_loss: Optional[Callable] = None,
    jit: bool = True,
    aux_fn: Optional[Callable] = None,
    aux_every: int = 1,
) -> FitResult:
    """Stochastic minibatch training (reference S3.4: climin Adam / SVI loop).

    ``loss_fn(params, batch) -> scalar`` where ``batch`` is a pytree of arrays
    gathered from ``data`` (leading axis = time/datapoints) at ``batch_size``
    random indices per step. The whole loop — including index sampling — runs
    inside one ``lax.scan`` under jit.

    ``aux_fn``: optional ``aux_fn(params) -> aux`` recomputed every
    ``aux_every`` steps (chunked scan, same pattern as :func:`fit_adam`); the
    loss is then called as ``loss_fn(params, batch, aux)``. Amortizes
    expensive stop-gradient preconditioners (e.g. the spectral whitening
    basis, whose per-step eigh dominates a small-M minibatch step).

    ``natgrad_block``: optional name of a params sub-key (e.g. ``'qu'``)
    updated by a natural-gradient step (SURVEY.md A.5, config 4) interleaved
    with each Adam step on the remaining parameters; the Adam step sees the
    block's gradient zeroed. ``natgrad_loss(params, batch) -> scalar`` defaults
    to ``loss_fn``'s negation (ELBO ascent). ``natgrad_lr`` may be a float or
    a schedule ``callable(step_index) -> float``: decaying the natural step
    (Hoffman et al. 2013 SVI) controls the overshoot that fixed steps suffer
    once the likelihood noise is small and the problem stiffens.
    """
    from .inference.natgrad import natgrad_step

    opt = optimizer if optimizer is not None else optax.adam(learning_rate)
    n_total = jax.tree.leaves(data)[0].shape[0]
    ng_loss = natgrad_loss if natgrad_loss is not None else (lambda p, b: -loss_fn(p, b))

    def run(p0, key):
        state0 = opt.init(p0)

        def step(carry, ki, aux=None):
            k, i = ki
            p, s = carry
            idx = jax.random.randint(k, (batch_size,), 0, n_total)
            batch = jax.tree.map(lambda a: a[idx], data)
            if aux_fn is None:
                loss, g = jax.value_and_grad(loss_fn)(p, batch)
            else:
                loss, g = jax.value_and_grad(
                    lambda q: loss_fn(q, batch, aux)
                )(p)
            if natgrad_block is not None:
                # zero the block's Adam gradient; natural-gradient it instead
                g = {**g, natgrad_block: jax.tree.map(jnp.zeros_like, g[natgrad_block])}
            updates, s = opt.update(g, s, p)
            p = optax.apply_updates(p, updates)
            if natgrad_block is not None:
                lr_t = natgrad_lr(i) if callable(natgrad_lr) else natgrad_lr
                blk = natgrad_step(
                    lambda q: ng_loss({**p, natgrad_block: q}, batch),
                    p[natgrad_block],
                    lr_t,
                )
                p = {**p, natgrad_block: blk}
            return (p, s), loss

        keys = jax.random.split(key, iters)
        steps_i = jnp.arange(iters)

        if aux_fn is None:
            (p, _), losses = jax.lax.scan(step, (p0, state0), (keys, steps_i))
            return p, losses

        # exactly ``iters`` updates: full aux_every-chunks, then the trailing
        # partial chunk (if any) as its own shorter inner scan — the former
        # padding scheme kept applying the padded updates (only losses were
        # truncated) and reused the first batches' PRNG keys (ADVICE r4)
        n_full = iters // aux_every
        rem = iters - n_full * aux_every

        def outer(carry, kis):
            p, s = carry
            aux = aux_fn(p)
            (p, s), losses = jax.lax.scan(
                lambda c, ki: step(c, ki, aux), (p, s), kis
            )
            return (p, s), losses

        carry, loss_parts = (p0, state0), []
        if n_full:
            n_head = n_full * aux_every
            carry, losses_full = jax.lax.scan(
                outer,
                carry,
                (
                    keys[:n_head].reshape(n_full, aux_every, -1),
                    steps_i[:n_head].reshape(n_full, aux_every),
                ),
            )
            loss_parts.append(losses_full.reshape(-1))
        if rem:
            p, s = carry
            aux = aux_fn(p)
            carry, losses_rem = jax.lax.scan(
                lambda c, ki: step(c, ki, aux), (p, s),
                (keys[-rem:], steps_i[-rem:]),
            )
            loss_parts.append(losses_rem)
        p, _ = carry
        return p, jnp.concatenate(loss_parts)

    if jit:
        run = jax.jit(run)
    p, losses = run(params, key)
    return FitResult(params=p, losses=losses)


def fit_scg(
    loss_fn: Callable,
    params,
    *,
    iters: int,
    sigma0: float = 1e-4,
    lam0: float = 1e-6,
    jit: bool = True,
) -> FitResult:
    """Scaled Conjugate Gradients (Moller 1993) — the reference's second
    optimizer driver (`paramz:paramz/optimization/scg.py` [H]), rebuilt as a
    fixed-iteration ``lax.scan`` under jit (2 value-and-grad evaluations per
    step, no host round-trips, no line search).

    Works on the flat unconstrained vector. Steps that fail the trust
    criterion leave the iterate unchanged and raise the damping ``lam``
    (branch-free via ``jnp.where``), so the loss trajectory is monotone
    non-increasing.
    """
    flat0, unravel = ravel(params)
    vg = jax.value_and_grad(lambda v: loss_fn(unravel(v)))
    n = flat0.shape[0]
    tiny = jnp.asarray(1e-30, flat0.dtype)
    lam_min, lam_max = 1e-15, 1e20

    def run(w0):
        f0, g0 = vg(w0)
        d0 = -g0
        # carry: w, f, g, d, lam (damping), nsuccess
        def step(carry, _):
            w, f, g, d, lam, nsucc = carry
            kappa = jnp.maximum(jnp.vdot(d, d), tiny)
            sigma = sigma0 / jnp.sqrt(kappa)
            _, g_plus = vg(w + sigma * d)
            theta = jnp.vdot(d, g_plus - g) / sigma
            delta = theta + lam * kappa
            # indefinite curvature: shift lam to make delta = lam*kappa > 0
            lam = jnp.where(delta <= 0, lam - theta / kappa, lam)
            delta = jnp.where(delta <= 0, lam * kappa, delta)
            mu = jnp.vdot(d, g)
            alpha = -mu / jnp.maximum(delta, tiny)
            w_new = w + alpha * d
            f_new, g_new = vg(w_new)
            # comparison ratio: actual vs predicted decrease
            Delta = 2.0 * (f_new - f) / jnp.where(alpha * mu == 0, tiny, alpha * mu)
            ok = (Delta >= 0) & jnp.isfinite(f_new)
            w = jnp.where(ok, w_new, w)
            f = jnp.where(ok, f_new, f)
            g_next = jnp.where(ok, g_new, g)
            # direction update: restart every n successes, else Polak-Ribiere-like
            nsucc = jnp.where(ok, nsucc + 1, nsucc)
            restart = ok & (nsucc % n == 0)
            gamma = jnp.vdot(g - g_new, g_new) / jnp.where(mu == 0, tiny, mu)
            d = jnp.where(
                ok,
                jnp.where(restart, -g_next, gamma * d - g_next),
                d,
            )
            lam = jnp.where(Delta < 0.25, jnp.minimum(4.0 * lam, lam_max), lam)
            lam = jnp.where(Delta > 0.75, jnp.maximum(0.5 * lam, lam_min), lam)
            return (w, f, g_next, d, lam, nsucc), f

        carry0 = (w0, f0, g0, d0, jnp.asarray(lam0, flat0.dtype), jnp.asarray(0))
        (w, f, *_), losses = jax.lax.scan(step, carry0, None, length=iters)
        return w, losses

    if jit:
        run = jax.jit(run)
    w, losses = run(flat0)
    return FitResult(params=unravel(w), losses=losses)


def fit_scipy_lbfgs(
    loss_fn: Callable,
    params,
    *,
    max_iters: int = 1000,
    verbose: bool = False,
) -> FitResult:
    """scipy L-BFGS-B on the flat unconstrained vector (reference parity)."""
    import scipy.optimize

    flat0, unravel = ravel(params)
    vg = jax.jit(jax.value_and_grad(lambda v: loss_fn(unravel(v))))
    trace = []

    def f_fp(v):
        val, g = vg(jnp.asarray(v))
        trace.append(float(val))
        return float(val), np.asarray(g, dtype=np.float64)

    res = scipy.optimize.minimize(
        f_fp,
        np.asarray(flat0, dtype=np.float64),
        jac=True,
        method="L-BFGS-B",
        options={"maxiter": max_iters, **({"disp": True} if verbose else {})},
    )
    return FitResult(params=unravel(jnp.asarray(res.x)), losses=jnp.asarray(trace))
