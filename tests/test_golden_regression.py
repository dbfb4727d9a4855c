"""E2E regression gate (SURVEY.md S4 item 4): fixed-seed short-budget actuator
run against a golden ELBO trajectory recorded on the CPU f64 reference.

If this fails after an intentional change to the bound/model/init, re-record
the goldens (see the recording snippet in the git history) and say so in the
commit message.
"""

import jax.numpy as jnp
import numpy as np

from rgp_tpu import train
from rgp_tpu.data import datasets
from rgp_tpu.data.windows import Standardizer
from rgp_tpu.models import rgp

# recorded 2026-08-21 (noise_floor=1e-4 now default in deep_rgp_config — an
# intentional model-robustness change, RGPConfig.noise_floor docstring: the
# floored noise shifts the init-point ELBO by ~1% because the 0.01 init
# variance gains the 1e-4 floor; the round-3 whitened-basis goldens are in
# the git history), f64, seed 0, actuator T=512, M=50, wins=[0,10], u_win=10
_GOLDEN_E0 = -5946.347076392082
_GOLDEN_TRAJ = {  # iter index -> ELBO after that Adam(1e-2) step
    0: -5946.347076393514,
    9: -3795.857900524881,
    24: -2375.0372891290613,
    49: -1293.6259234232734,
}


def test_actuator_golden_elbo_trajectory():
    d = datasets.actuator()
    sy, su = Standardizer.fit(d.y_train), Standardizer.fit(d.u_train)
    Y = jnp.asarray(sy.transform(d.y_train), jnp.float64)
    U = jnp.asarray(su.transform(d.u_train), jnp.float64)
    cfg = rgp.deep_rgp_config(wins=[0, 10], u_win=10, y_dim=1, u_dim=1, num_inducing=50)
    params = rgp.init_params(cfg, Y, U, dtype=jnp.float64, seed=0)

    e0 = float(rgp.elbo(cfg, params, Y, U, block=None))
    np.testing.assert_allclose(e0, _GOLDEN_E0, rtol=1e-8)

    res = train.fit_adam(
        lambda p: -rgp.elbo(cfg, p, Y, U, block=None), params, iters=50,
        learning_rate=1e-2,
    )
    for i, golden in _GOLDEN_TRAJ.items():
        np.testing.assert_allclose(-float(res.losses[i]), golden, rtol=1e-6), i
