"""Metrics logger and profiling helper smoke tests (SURVEY.md S5.1/S5.5)."""

import json
import os
import tempfile

import jax.numpy as jnp

from rgp_tpu.utils.metrics import MetricsLogger
from rgp_tpu.utils.profiling import annotate


def test_metrics_jsonl_roundtrip():
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "metrics.jsonl")
        with MetricsLogger(path) as log:
            log.log(0, elbo=-123.4, grad_norm=jnp.asarray(5.0))
            log.log(1, elbo=-100.0, rmse=jnp.asarray([0.1, 0.2]))
        lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 0
    assert lines[0]["elbo"] == -123.4
    assert lines[0]["grad_norm"] == 5.0
    assert lines[1]["rmse"] == [0.1, 0.2]
    assert "wall_time" in lines[0]


def test_annotate_scope_runs():
    with annotate("psi_stats"):
        x = jnp.ones(4).sum()
    assert float(x) == 4.0


def test_freeze_mask_and_frozen_fit():
    """param.fix() analog: frozen leaves keep their initial values exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rgp_tpu import train

    params = {"a": jnp.ones(3), "nested": {"b": jnp.full(2, 2.0), "c": jnp.zeros(())}}
    frozen = train.freeze_mask(params, lambda p: p.startswith("nested/b"))
    assert bool(jax.tree.reduce(lambda x, y: x or y, frozen))

    def loss(p):
        return jnp.sum(p["a"] ** 2) + jnp.sum((p["nested"]["b"] - 5) ** 2) + p["nested"]["c"] ** 2

    res = train.fit_adam(loss, params, iters=200, learning_rate=0.1, frozen=frozen)
    np.testing.assert_array_equal(np.asarray(res.params["nested"]["b"]), 2.0)  # fixed
    assert abs(float(res.params["nested"]["c"])) < 1e-3  # free params moved
    assert np.abs(np.asarray(res.params["a"])).max() < 1e-3


def test_optimize_restarts_picks_best_and_respects_accept():
    import jax.numpy as jnp
    import numpy as np

    from rgp_tpu import train

    # tilted double well: minima near x = +/-1, the x=-1 basin is deeper;
    # accept_fn vetoes the deeper (say, degenerate) negative basin
    def loss(p):
        x = p["x"]
        return jnp.sum((x**2 - 1.0) ** 2 + 0.1 * x)

    def init_fn(seed):
        # seeds land in both basins: -2.5, -0.5, 1.5, 3.5
        return {"x": jnp.asarray([float(seed) * 2.0 - 2.5])}

    res = train.optimize_restarts(loss, init_fn, range(4), iters=500, learning_rate=0.05)
    assert float(res.params["x"][0]) < 0  # deeper basin wins on raw loss

    res2 = train.optimize_restarts(
        loss, init_fn, range(4), iters=500, learning_rate=0.05,
        accept_fn=lambda p: jnp.all(p["x"] > 0),
    )
    assert float(res2.params["x"][0]) > 0  # vetoed the negative basin


def test_predict_quantiles():
    import jax.numpy as jnp
    import numpy as np

    from rgp_tpu.inference.collapsed_vi import predict_quantiles

    mean = jnp.zeros((5, 1))
    var = jnp.full((5, 1), 4.0)
    lo, hi = predict_quantiles(mean, var)
    np.testing.assert_allclose(np.asarray(hi), 2 * 1.959964, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lo), -2 * 1.959964, rtol=1e-5)


def test_plotting_helpers_render():
    import matplotlib

    matplotlib.use("Agg")
    import numpy as np

    from rgp_tpu.utils import plotting

    x = np.linspace(0, 1, 50)
    mean = np.sin(2 * np.pi * x)
    var = np.full(50, 0.04)
    ax = plotting.plot_gp(x, mean, var, X_data=x[::5], Y_data=mean[::5])
    assert len(ax.lines) >= 2 and len(ax.collections) == 1  # mean+data, band

    ax2 = plotting.plot_freerun(mean, mean + 0.1, var)
    assert "RMSE" in ax2.get_title() and len(ax2.lines) == 2
    import matplotlib.pyplot as plt

    plt.close("all")
