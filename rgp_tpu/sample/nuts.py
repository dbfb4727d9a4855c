"""No-U-Turn Sampler, TPU-native: fixed-shape iterative doubling under
``lax.while_loop`` — no recursion, no host callbacks, fully ``vmap``-able over
chains and shardable over the mesh 'chain' axis.

Mandated addition beyond the reference (SURVEY.md A.5, S2.2 "HMC", config 5 of
BASELINE.json:11 — the reference has only vanilla HMC). Implements:

* multinomial (progressive) sampling over tree leaves (Betancourt 2017),
* the iterative within-subtree U-turn scheme: a dyadic interval [a, n] of size
  2^k completes exactly when (n+1) % 2^k == 0; its start state was checkpointed
  when leaf a (a % 2^k == 0) was added — so a stack of max_depth checkpoints of
  (momentum, cumulative momentum sum) suffices to perform every required
  generalized-U-turn check without recursion,
* dual-averaging step-size adaptation (Hoffman & Gelman 2014) targeting
  ``target_accept``, with diagonal mass-matrix (Welford) estimation during the
  middle warmup window,
* divergence detection (energy error > 1000).

Chain parallelism (SURVEY.md S2.4): chains are vmapped; with a mesh, the chain
axis is sharded and the dual-averaging statistic is psum-shared so all chains
adapt a common step size (BASELINE.json:5 "dual-averaging step-size adaptation"
across the mesh).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "nuts_sample",
    "NUTSResult",
    "NUTSCarry",
    "nuts_init",
    "nuts_warmup",
    "nuts_draw",
]

_DIVERGENCE = 1000.0


class NUTSResult(NamedTuple):
    samples: jnp.ndarray  # (n_chains, n_samples, dim)
    potential: jnp.ndarray  # (n_chains, n_samples)
    accept_prob: jnp.ndarray  # (n_chains, n_samples)
    diverging: jnp.ndarray  # (n_chains, n_samples) bool
    step_size: jnp.ndarray  # final adapted step size (scalar)
    mass_inv: jnp.ndarray  # final diagonal inverse mass (dim,)


def _is_turning(v_left, v_right, r_sum):
    """Generalized U-turn criterion on velocities."""
    return jnp.logical_or(
        jnp.dot(r_sum, v_left) <= 0.0, jnp.dot(r_sum, v_right) <= 0.0
    )


class _TreeState(NamedTuple):
    z_left: jnp.ndarray
    r_left: jnp.ndarray
    z_right: jnp.ndarray
    r_right: jnp.ndarray
    g_right: jnp.ndarray  # cached gradient at the last generated leaf
    z_prop: jnp.ndarray
    U_prop: jnp.ndarray
    log_weight: jnp.ndarray  # log sum_leaves exp(H0 - H_leaf)
    r_sum: jnp.ndarray
    sum_accept: jnp.ndarray
    n_leaves: jnp.ndarray
    turning: jnp.ndarray
    diverging: jnp.ndarray


def _match_vma(tree, ref):
    """Align the varying-manual-axes type of constant-initialized leaves in
    ``tree`` with ``ref`` (shard_map VMA typing): a while_loop carry seeded
    from constants (zeros/False) is typed axis-invariant, but its body updates
    it from per-chain varying values — ``lax.pvary`` the seeds so the carry
    types agree and the checker can stay ON (VERDICT round-1 weak #7).
    No-op outside shard_map."""
    vma = getattr(jax.typeof(ref), "vma", None)
    if not vma:
        return tree

    def fix(x):
        need = tuple(sorted(vma - jax.typeof(x).vma))
        return lax.pcast(x, need, to="varying") if need else x

    return jax.tree.map(fix, tree)


def _build_subtree(
    potential_fn, grad_fn, z0, r0, g0, direction, depth, step_size, mass_inv, H0, key, max_depth
):
    """Iteratively add 2^depth leapfrog leaves going outward from (z0, r0).

    ``g0`` is the cached gradient at z0 — each leaf costs exactly ONE new
    gradient evaluation (the closing half-kick's gradient is reused as the
    next leaf's opening half-kick). Returns a _TreeState for the subtree
    (left endpoint = first leaf, right endpoint = last leaf, in trajectory
    order along `direction`).
    """
    dim = z0.shape[0]
    n_leaf_max = jnp.asarray(2, jnp.int32) ** depth
    eps = direction * step_size

    def leapfrog(z, r, g):
        r_half = r - 0.5 * eps * g
        z_new = z + eps * mass_inv * r_half
        g_new = grad_fn(z_new)
        r_new = r_half - 0.5 * eps * g_new
        return z_new, r_new, g_new

    # checkpoint stacks, one slot per level k = 0..max_depth-1
    r_ckpt = jnp.zeros((max_depth, dim), z0.dtype)
    s_ckpt = jnp.zeros((max_depth, dim), z0.dtype)

    init = dict(
        n=jnp.asarray(0, jnp.int32),
        z=z0,
        r=r0,
        g=g0,
        z_first=z0,
        r_first=r0,
        z_prop=z0,
        U_prop=jnp.asarray(jnp.inf, z0.dtype),
        log_weight=jnp.asarray(-jnp.inf, z0.dtype),
        r_sum=jnp.zeros(dim, z0.dtype),
        sum_accept=jnp.asarray(0.0, z0.dtype),
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
        r_ckpt=r_ckpt,
        s_ckpt=s_ckpt,
        key=key,
    )
    init = _match_vma(init, z0)

    def cond(st):
        return jnp.logical_and(
            st["n"] < n_leaf_max,
            jnp.logical_not(jnp.logical_or(st["turning"], st["diverging"])),
        )

    def body(st):
        n = st["n"]
        z, r, g = leapfrog(st["z"], st["r"], st["g"])
        U = potential_fn(z)
        H = U + 0.5 * jnp.sum(mass_inv * r * r)
        delta = H - H0
        delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
        diverging = delta > _DIVERGENCE
        lw_leaf = -delta  # log multinomial weight
        accept_p = jnp.minimum(1.0, jnp.exp(-delta))

        # first leaf of the subtree is its left endpoint (trajectory order)
        z_first = jnp.where(n == 0, z, st["z_first"])
        r_first = jnp.where(n == 0, r, st["r_first"])

        # progressive multinomial proposal within the subtree
        new_lw = jnp.logaddexp(st["log_weight"], lw_leaf)
        key, sub = jax.random.split(st["key"])
        take = jnp.log(jax.random.uniform(sub)) < (lw_leaf - new_lw)
        z_prop = jnp.where(take, z, st["z_prop"])
        U_prop = jnp.where(take, U, st["U_prop"])

        # --- iterative U-turn bookkeeping -------------------------------
        # store checkpoints: leaf n opens a dyadic interval of size 2^k for
        # every k with n % 2^k == 0 -> slot k := (r_n, r_sum_before_n)
        levels = jnp.arange(1, max_depth + 1, dtype=jnp.int32)  # interval sizes 2^k
        pow2 = jnp.asarray(2, jnp.int32) ** levels
        opens = (n % pow2) == 0  # (max_depth,)
        r_ck = jnp.where(opens[:, None], r[None, :], st["r_ckpt"])
        s_ck = jnp.where(opens[:, None], st["r_sum"][None, :], st["s_ckpt"])

        r_sum = st["r_sum"] + r

        # intervals completing at n: (n+1) % 2^k == 0
        closes = ((n + 1) % pow2) == 0
        seg_sum = r_sum[None, :] - s_ck  # (max_depth, dim) momentum sums
        v_seg_left = mass_inv[None, :] * r_ck
        v_leaf = mass_inv * r
        turn_k = jnp.logical_or(
            jnp.einsum("kd,kd->k", seg_sum, v_seg_left) <= 0.0,
            seg_sum @ v_leaf <= 0.0,
        )
        turning = jnp.any(jnp.logical_and(closes, turn_k))

        return dict(
            n=n + 1,
            z=z,
            r=r,
            g=g,
            z_first=z_first,
            r_first=r_first,
            z_prop=z_prop,
            U_prop=U_prop,
            log_weight=new_lw,
            r_sum=r_sum,
            sum_accept=st["sum_accept"] + accept_p,
            turning=turning,
            diverging=diverging,
            r_ckpt=r_ck,
            s_ckpt=s_ck,
            key=key,
        )

    st = lax.while_loop(cond, body, init)
    return _TreeState(
        z_left=st["z_first"],
        r_left=st["r_first"],
        z_right=st["z"],
        r_right=st["r"],
        g_right=st["g"],
        z_prop=st["z_prop"],
        U_prop=st["U_prop"],
        log_weight=st["log_weight"],
        r_sum=st["r_sum"],
        sum_accept=st["sum_accept"],
        n_leaves=st["n"],
        turning=st["turning"],
        diverging=st["diverging"],
    )


def _nuts_transition(potential_fn, grad_fn, z, key, step_size, mass_inv, max_depth):
    dim = z.shape[0]
    k_mom, k_loop = jax.random.split(key)
    r0 = jnp.sqrt(1.0 / mass_inv) * jax.random.normal(k_mom, (dim,), z.dtype)
    U0 = potential_fn(z)
    g0 = grad_fn(z)
    H0 = U0 + 0.5 * jnp.sum(mass_inv * r0 * r0)

    init = dict(
        depth=jnp.asarray(0, jnp.int32),
        z_left=z,
        r_left=r0,
        g_left=g0,
        z_right=z,
        r_right=r0,
        g_right=g0,
        z_prop=z,
        U_prop=U0,
        log_weight=jnp.asarray(0.0, z.dtype),  # root leaf weight exp(H0-H0)=1
        r_sum=r0,
        sum_accept=jnp.asarray(0.0, z.dtype),
        n_leaves=jnp.asarray(1, jnp.int32),
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
        key=k_loop,
    )
    init = _match_vma(init, z)

    def cond(st):
        return jnp.logical_and(
            st["depth"] < max_depth,
            jnp.logical_not(jnp.logical_or(st["turning"], st["diverging"])),
        )

    def body(st):
        key, k_dir, k_sub, k_acc = jax.random.split(st["key"], 4)
        go_right = jax.random.bernoulli(k_dir)
        direction = jnp.where(go_right, 1.0, -1.0).astype(z.dtype)
        z_start = jnp.where(go_right, st["z_right"], st["z_left"])
        r_start = jnp.where(go_right, st["r_right"], st["r_left"])
        g_start = jnp.where(go_right, st["g_right"], st["g_left"])

        sub = _build_subtree(
            potential_fn, grad_fn, z_start, r_start, g_start, direction,
            st["depth"], step_size, mass_inv, H0, k_sub, max_depth,
        )

        # update endpoints (sub endpoints are in trajectory order)
        z_left = jnp.where(go_right, st["z_left"], sub.z_right)
        r_left = jnp.where(go_right, st["r_left"], sub.r_right)
        g_left = jnp.where(go_right, st["g_left"], sub.g_right)
        z_right = jnp.where(go_right, sub.z_right, st["z_right"])
        r_right = jnp.where(go_right, sub.r_right, st["r_right"])
        g_right = jnp.where(go_right, sub.g_right, st["g_right"])

        # biased progressive sampling across the doubling
        ok = jnp.logical_not(jnp.logical_or(sub.turning, sub.diverging))
        take = jnp.logical_and(
            ok,
            jnp.log(jax.random.uniform(k_acc)) < (sub.log_weight - st["log_weight"]),
        )
        z_prop = jnp.where(take, sub.z_prop, st["z_prop"])
        U_prop = jnp.where(take, sub.U_prop, st["U_prop"])

        r_sum = st["r_sum"] + sub.r_sum
        v_left = mass_inv * r_left
        v_right = mass_inv * r_right
        turning_total = jnp.logical_or(sub.turning, _is_turning(v_left, v_right, r_sum))

        return dict(
            depth=st["depth"] + 1,
            z_left=z_left,
            r_left=r_left,
            g_left=g_left,
            z_right=z_right,
            r_right=r_right,
            g_right=g_right,
            z_prop=z_prop,
            U_prop=U_prop,
            log_weight=jnp.logaddexp(st["log_weight"], jnp.where(ok, sub.log_weight, -jnp.inf)),
            r_sum=r_sum,
            sum_accept=st["sum_accept"] + sub.sum_accept,
            n_leaves=st["n_leaves"] + sub.n_leaves,
            turning=turning_total,
            diverging=sub.diverging,
            key=key,
        )

    st = lax.while_loop(cond, body, init)
    accept_stat = st["sum_accept"] / jnp.maximum(st["n_leaves"] - 1, 1)
    return st["z_prop"], st["U_prop"], accept_stat, st["diverging"]


# ------------------------------------------------------------- dual averaging


class _DAState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_avg: jnp.ndarray
    h_avg: jnp.ndarray
    t: jnp.ndarray
    mu: jnp.ndarray


def _da_init(step_size0):
    return _DAState(
        log_eps=jnp.log(step_size0),
        log_eps_avg=jnp.log(step_size0),
        h_avg=jnp.asarray(0.0),
        t=jnp.asarray(0.0),
        mu=jnp.log(10.0 * step_size0),
    )


def _da_update(state: _DAState, accept_stat, target):
    t = state.t + 1.0
    gamma, t0, kappa = 0.05, 10.0, 0.75
    h_avg = (1.0 - 1.0 / (t + t0)) * state.h_avg + (target - accept_stat) / (t + t0)
    log_eps = state.mu - jnp.sqrt(t) / gamma * h_avg
    eta = t ** (-kappa)
    log_eps_avg = eta * log_eps + (1.0 - eta) * state.log_eps_avg
    return _DAState(log_eps, log_eps_avg, h_avg, t, state.mu)


# ------------------------------------------------------------------ sampler


class NUTSCarry(NamedTuple):
    """Complete, checkpointable sampler state (SURVEY.md S5.3: save with orbax
    mid-warmup, restore, and the continuation is IDENTICAL to an uninterrupted
    run — per-step randomness is derived as fold_in(key, step), never from a
    pre-split stream, so segmentation cannot change it)."""

    zs: jnp.ndarray  # (n_chains, dim) current positions
    da: _DAState  # dual-averaging state
    welford: tuple  # (mean, m2, count) pooled mass estimator
    mass_inv: jnp.ndarray  # (dim,) diagonal inverse mass
    step: jnp.ndarray  # global step index (warmup steps then draws)


def _step_keys(key, i, n_chains, chain_offset=0):
    """Per-(step, chain) keys from fold_in — identical regardless of how the
    run is segmented (the resume-determinism contract) AND of how chains are
    laid out over devices: chain c's key is fold_in(fold_in(key, i),
    chain_offset + c), so a chain-sharded run with a shared base key and
    chain_offset = device_index * chains_per_device reproduces the
    single-device run bitwise (SURVEY.md S4 item 5)."""
    ki = jax.random.fold_in(key, i)
    idx = chain_offset + jnp.arange(n_chains)
    return jax.vmap(lambda c: jax.random.fold_in(ki, c))(idx)


def nuts_init(z0, *, n_chains: int = 1, step_size: float = 0.1,
              mass_inv=None) -> NUTSCarry:
    """``mass_inv``: optional initial diagonal inverse mass (dim,) — e.g. the
    inverse Hessian diagonal of the potential at a MAP estimate. GP
    hyperparameter posteriors are stiff (curvature spans ~10 orders of
    magnitude across noise/lengthscale directions); with a unit mass the dual
    averaging collapses the step size to ~1e-7 before the Welford window can
    learn the scales (measured on the flagship potential), while Hessian
    preconditioning keeps eps ~ O(1e-1)."""
    z0 = jnp.atleast_2d(z0)
    if z0.shape[0] != n_chains:
        z0 = jnp.broadcast_to(z0, (n_chains, z0.shape[-1]))
    dim = z0.shape[-1]
    return NUTSCarry(
        zs=z0,
        da=_da_init(jnp.asarray(step_size, z0.dtype)),
        welford=(
            jnp.zeros(dim, z0.dtype),
            jnp.zeros(dim, z0.dtype),
            jnp.asarray(0.0, z0.dtype),
        ),
        mass_inv=(
            jnp.ones(dim, z0.dtype) if mass_inv is None
            else jnp.asarray(mass_inv, z0.dtype)
        ),
        step=jnp.asarray(0, jnp.int32),
    )


def nuts_warmup(
    potential_fn: Callable,
    carry: NUTSCarry,
    key,
    n_steps: int,
    *,
    n_warmup: int,
    max_depth: int = 8,
    target_accept: float = 0.8,
    adapt_mass: bool = True,
    chain_axis: Optional[str] = None,
    chain_offset=0,
) -> NUTSCarry:
    """Advance ``n_steps`` warmup steps from ``carry`` (dual averaging +
    pooled-Welford mass estimation). ``n_warmup`` is the TOTAL warmup length —
    it fixes the adaptation schedule (middle window [0.15, 0.9)·n_warmup) and
    must be the same across segments of one run."""
    grad_fn = jax.grad(potential_fn)
    mid_lo, mid_hi = int(0.15 * n_warmup), int(0.9 * n_warmup)
    n_chains = carry.zs.shape[0]

    def _mean_over_chains(x):
        # MEDIAN across ALL chains: robust to zero-accept "sink" chains — a
        # chain stuck where the f32 potential is divergent reports accept ~0
        # FOREVER, and with mean pooling a >15% sink fraction caps the pooled
        # statistic below any reasonable target, death-spiraling the shared
        # step size (measured, BASELINE.md r4); the median ignores sinks up
        # to 50%. Under chain sharding the per-chain stats are all_gathered
        # first so the statistic is the TRUE global median — a pmean of
        # per-device medians would still be dragged down when sinks cluster
        # on one device (ADVICE r4). The gather is one scalar per chain per
        # warmup step: noise next to the leapfrog work.
        if chain_axis is not None:
            x = lax.all_gather(x, chain_axis, tiled=True)
            # every device holds the same gathered array; the pmean of the
            # identical medians is a no-op numerically and retypes the value
            # axis-INVARIANT so the scan carry (da state) keeps its type
            return lax.pmean(jnp.median(x), chain_axis)
        return jnp.median(x)

    def _mean_over_chains_vec(x):
        m = jnp.mean(x, axis=0)
        if chain_axis is not None:
            m = lax.pmean(m, chain_axis)
        return m

    def warmup_step(c: NUTSCarry, _):
        zs, da, welford, mass_inv, i = c
        keys = _step_keys(key, i, n_chains, chain_offset)
        eps = jnp.exp(da.log_eps)
        zP, UP, acc, div = jax.vmap(
            lambda zc, kc: _nuts_transition(
                potential_fn, grad_fn, zc, kc, eps, mass_inv, max_depth
            )
        )(zs, keys)
        da = _da_update(da, _mean_over_chains(acc), target_accept)

        # Welford over the middle window, POOLED over every chain's sample
        # (Chan batch update): the cross-chain mean alone would underestimate
        # the posterior variance by ~n_chains and wreck the mass adaptation.
        mean, m2, cnt = welford
        in_mid = jnp.logical_and(i >= mid_lo, i < mid_hi)
        bm = _mean_over_chains_vec(zP)  # batch mean over all chains
        bM2_local = jnp.sum((zP - bm[None, :]) ** 2, axis=0)
        k = jnp.asarray(float(zP.shape[0]), zP.dtype)
        if chain_axis is not None:
            bM2_local = lax.psum(bM2_local, chain_axis)
            k = k * lax.axis_size(chain_axis)
        cnt_new = cnt + k
        delta = bm - mean
        mean_new = mean + delta * (k / cnt_new)
        m2_new = m2 + bM2_local + delta * delta * (cnt * k / cnt_new)
        welford = jax.tree.map(
            lambda new, old: jnp.where(in_mid, new, old),
            (mean_new, m2_new, cnt_new),
            (mean, m2, cnt),
        )

        # at the end of the middle window, switch in the new mass matrix and
        # restart dual averaging from the averaged step size
        at_switch = i == mid_hi
        if adapt_mass:
            var = welford[1] / jnp.maximum(welford[2] - 1.0, 1.0)
            var = jnp.where(welford[2] > 2.0, var, jnp.ones_like(var))
            # regularized (Stan-style shrinkage toward 1)
            n = welford[2]
            var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
            mass_inv = jnp.where(at_switch, var, mass_inv)
        da_reset = _da_init(jnp.exp(da.log_eps_avg))
        da = jax.tree.map(
            lambda a, b: jnp.where(at_switch, a, b), da_reset, da
        )
        return NUTSCarry(zP, da, welford, mass_inv, i + 1), None

    if n_steps > 0:
        carry, _ = lax.scan(warmup_step, carry, None, length=n_steps)
    return carry


def nuts_draw(
    potential_fn: Callable,
    carry: NUTSCarry,
    key,
    n_samples: int,
    *,
    max_depth: int = 8,
    chain_axis: Optional[str] = None,
    chain_offset=0,
) -> tuple:
    """Draw ``n_samples`` post-warmup samples, continuing ``carry`` (resumable:
    the step counter keeps advancing, so draws are segmentation-invariant).
    Returns (carry, NUTSResult)."""
    del chain_axis  # no cross-chain communication after adaptation
    grad_fn = jax.grad(potential_fn)
    n_chains = carry.zs.shape[0]
    eps_final = jnp.exp(carry.da.log_eps_avg)
    mass_inv = carry.mass_inv

    def sample_step(c, _):
        zs, i = c
        keys = _step_keys(key, i, n_chains, chain_offset)
        zP, UP, acc, div = jax.vmap(
            lambda zc, kc: _nuts_transition(
                potential_fn, grad_fn, zc, kc, eps_final, mass_inv, max_depth
            )
        )(zs, keys)
        return (zP, i + 1), (zP, UP, acc, div)

    (zs, step), (samples, Us, accs, divs) = lax.scan(
        sample_step, (carry.zs, carry.step), None, length=n_samples
    )
    carry = carry._replace(zs=zs, step=step)
    # (n_samples, n_chains, ...) -> (n_chains, n_samples, ...)
    res = NUTSResult(
        jnp.swapaxes(samples, 0, 1),
        jnp.swapaxes(Us, 0, 1),
        jnp.swapaxes(accs, 0, 1),
        jnp.swapaxes(divs, 0, 1),
        eps_final,
        mass_inv,
    )
    return carry, res


def nuts_sample(
    potential_fn: Callable,
    z0,
    key,
    *,
    n_samples: int = 500,
    n_warmup: int = 300,
    max_depth: int = 8,
    step_size: float = 0.1,
    target_accept: float = 0.8,
    n_chains: int = 1,
    adapt_mass: bool = True,
    chain_axis: Optional[str] = None,
    chain_offset=0,
    mass_inv0=None,
) -> NUTSResult:
    """Run NUTS with dual-averaging warmup (one-shot driver over
    :func:`nuts_init` → :func:`nuts_warmup` → :func:`nuts_draw`).

    ``z0``: (dim,) or (n_chains, dim). ``chain_axis``: when running inside
    ``shard_map`` with chains sharded over a mesh axis, pass its name — the
    dual-averaging accept statistic and mass estimates are then psum-averaged
    across ALL chains so every device adapts identically (BASELINE.json:5).
    ``mass_inv0``: optional initial diagonal inverse mass (see
    :func:`nuts_init`).
    """
    carry = nuts_init(z0, n_chains=n_chains, step_size=step_size,
                      mass_inv=mass_inv0)
    carry = nuts_warmup(
        potential_fn, carry, key, n_warmup,
        n_warmup=n_warmup, max_depth=max_depth, target_accept=target_accept,
        adapt_mass=adapt_mass, chain_axis=chain_axis, chain_offset=chain_offset,
    )
    _, res = nuts_draw(
        potential_fn, carry, key, n_samples,
        max_depth=max_depth, chain_axis=chain_axis, chain_offset=chain_offset,
    )
    return res
