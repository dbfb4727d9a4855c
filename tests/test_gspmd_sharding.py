"""GSPMD time-sharded deep-RGP ELBO == single-device ELBO (the SP/CP analog,
SURVEY.md S2.4/S5.7: XLA inserts the lag-window halo collectives)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rgp_tpu.data import datasets
from rgp_tpu.data.windows import Standardizer
from rgp_tpu.models import rgp
from rgp_tpu.parallel import mesh as pmesh


def test_time_sharded_elbo_and_grads_match():
    d = datasets.narendra(T=128, seed=0)
    sy, su = Standardizer.fit(d.y_train), Standardizer.fit(d.u_train)
    Y = jnp.asarray(sy.transform(d.y_train), jnp.float64)
    U = jnp.asarray(su.transform(d.u_train), jnp.float64)
    cfg = rgp.deep_rgp_config(wins=[0, 2, 2], u_win=2, y_dim=1, u_dim=1, num_inducing=8)
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64)

    f = lambda p, y, u: rgp.elbo(cfg, p, y, u, block=None)
    ref_val, ref_grad = jax.value_and_grad(f)(params, Y, U)

    mesh = pmesh.make_mesh(data=8)
    data_sharded = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    Ys = jax.device_put(Y, data_sharded)
    Us = jax.device_put(U, data_sharded)

    def shard_param(path, x):
        ps = jax.tree_util.keystr(path)
        if ps.endswith("['mu']") or ps.endswith("['log_lam']"):
            return jax.device_put(x, data_sharded)
        return jax.device_put(x, repl)

    params_s = jax.tree_util.tree_map_with_path(shard_param, params)
    val_s, grad_s = jax.jit(jax.value_and_grad(f))(params_s, Ys, Us)

    np.testing.assert_allclose(float(val_s), float(ref_val), rtol=1e-8)
    for a, b in zip(jax.tree.leaves(ref_grad), jax.tree.leaves(grad_s)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6)
