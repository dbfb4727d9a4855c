"""Checkpoint/resume round-trip (SURVEY.md S4, S5.4): params + opt state +
PRNG key save/load, deterministic continuation."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rgp_tpu.data import datasets
from rgp_tpu.data.windows import Standardizer
from rgp_tpu.models import rgp
from rgp_tpu.utils import checkpoint as ckpt


def test_checkpoint_roundtrip_and_deterministic_resume():
    d = datasets.narendra(T=60, seed=0)
    sy, su = Standardizer.fit(d.y_train), Standardizer.fit(d.u_train)
    Y = jnp.asarray(sy.transform(d.y_train), jnp.float64)
    U = jnp.asarray(su.transform(d.u_train), jnp.float64)
    cfg = rgp.deep_rgp_config(wins=[0, 2], u_win=2, y_dim=1, u_dim=1, num_inducing=6)
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(42)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(lambda q: -rgp.elbo(cfg, q, Y, U, block=None))(p)
        upd, s = opt.update(g, s, p)
        return optax.apply_updates(p, upd), s, loss

    # run 5 steps, checkpoint, run 5 more -> trajectory A
    for _ in range(5):
        params, opt_state, _ = step(params, opt_state)

    state = {"params": params, "opt_state": opt_state, "key": key}
    with tempfile.TemporaryDirectory() as tmp:
        ckpt.save_checkpoint(tmp, state, step=5, config={"model": "rgp", "wins": [0, 2]})
        assert ckpt.latest_step(tmp) == 5

        pA, sA = params, opt_state
        lossesA = []
        for _ in range(5):
            pA, sA, l = step(pA, sA)
            lossesA.append(float(l))

        # restore and continue -> trajectory B must match A exactly
        template = jax.tree.map(jnp.zeros_like, state)
        restored, at = ckpt.load_checkpoint(tmp, template)
        assert at == 5
        pB, sB = restored["params"], restored["opt_state"]
        lossesB = []
        for _ in range(5):
            pB, sB, l = step(pB, sB)
            lossesB.append(float(l))

    np.testing.assert_allclose(lossesA, lossesB, rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(pA), jax.tree.leaves(pB)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # PRNG key survives
    np.testing.assert_array_equal(np.asarray(restored["key"]), np.asarray(key))


def test_nuts_fault_injection_resume_mid_warmup():
    """SURVEY.md S5.3 fault-injection gate: 'kill' NUTS mid-warmup, save the
    carry with orbax, restore into a fresh process-like template, and assert
    the continuation is IDENTICAL (bitwise) to an uninterrupted run — per-step
    keys are fold_in-derived, so segmentation cannot alter the stream."""
    from rgp_tpu.sample import nuts

    # a small correlated-Gaussian potential
    prec = jnp.asarray([[2.0, 0.6, 0.0], [0.6, 1.5, 0.3], [0.0, 0.3, 1.0]])

    def potential(z):
        return 0.5 * z @ prec @ z

    key = jax.random.PRNGKey(7)
    z0 = jnp.zeros((4, 3))
    N_WARM, N_SAMP, CUT = 60, 40, 23

    # uninterrupted reference run
    ref = nuts.nuts_sample(
        potential, z0, key, n_samples=N_SAMP, n_warmup=N_WARM, n_chains=4,
        step_size=0.2,
    )

    # segmented run with a checkpoint "crash" at CUT warmup steps
    carry = nuts.nuts_init(z0, n_chains=4, step_size=0.2)
    carry = nuts.nuts_warmup(potential, carry, key, CUT, n_warmup=N_WARM)
    with tempfile.TemporaryDirectory() as tmp:
        ckpt.save_checkpoint(tmp, carry._asdict(), step=CUT)
        template = jax.tree.map(jnp.zeros_like, carry._asdict())
        restored, at = ckpt.load_checkpoint(tmp, template)
        assert at == CUT
    carry2 = nuts.NUTSCarry(
        zs=restored["zs"],
        da=nuts._DAState(*restored["da"]),
        welford=tuple(restored["welford"]),
        mass_inv=restored["mass_inv"],
        step=restored["step"],
    )
    assert int(carry2.step) == CUT
    carry2 = nuts.nuts_warmup(potential, carry2, key, N_WARM - CUT, n_warmup=N_WARM)
    # draws themselves also segmented: 15 + 25
    carry2, res_a = nuts.nuts_draw(potential, carry2, key, 15)
    _, res_b = nuts.nuts_draw(potential, carry2, key, N_SAMP - 15)

    samples = np.concatenate([np.asarray(res_a.samples), np.asarray(res_b.samples)], axis=1)
    np.testing.assert_array_equal(samples, np.asarray(ref.samples))
    np.testing.assert_array_equal(np.asarray(res_a.step_size), np.asarray(ref.step_size))
    np.testing.assert_array_equal(np.asarray(res_a.mass_inv), np.asarray(ref.mass_inv))
