"""Benchmark-harness smoke tests: task x method registry over the DaISy-style
dataset family (SURVEY.md S2.1 'Benchmark harness')."""

import numpy as np
import pytest

from rgp_tpu.bench import harness
from rgp_tpu.data import datasets


def test_all_datasets_finite_and_deterministic():
    for name in ["actuator", "drives", "narendra", "ballbeam", "dryer", "gas_furnace"]:
        a = datasets.load(name)
        b = datasets.load(name)
        for x, y in zip(a[:4], b[:4]):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert all(np.isfinite(np.asarray(x)).all() for x in a[:4]), name
        assert a.u_train.ndim == a.y_train.ndim == 2, name
        # reasonably scaled signals (difference equations must be stable)
        assert np.abs(a.y_train).max() < 100, name


def test_registry_covers_new_tasks_and_methods():
    for t in ["ballbeam", "dryer", "gas_furnace"]:
        assert t in harness.TASKS
    assert "gp_narx_matern" in harness.METHODS


def test_harness_run_smoke():
    out = harness.run("gas_furnace", "gp_narx", iters=30, num_inducing=8)
    assert np.isfinite(out["freerun_rmse"]) and out["elbo_last"] > out["elbo_first"]
    out2 = harness.run("ballbeam", "gp_narx_matern", iters=30, num_inducing=8)
    assert np.isfinite(out2["freerun_rmse"])
    # free simulation should at least beat the zero predictor after a tiny fit
    assert out2["freerun_rmse"] < 5 * out2["zero_predictor_rmse"]


def test_harness_svgp_natgrad_smoke():
    """Config-4 method (BASELINE.json:10): minibatch SVI + natgrad trains and
    free-runs through the same evaluation protocol."""
    out = harness.run("gas_furnace", "svgp_natgrad", iters=60, num_inducing=8)
    assert np.isfinite(out["freerun_rmse"])
    assert out["elbo_last"] > out["elbo_first"]


def test_rollout_selection_and_provenance_schema():
    """Round-5 additions (VERDICT r4 next #4/#6): every record carries git
    provenance + machine-readable degeneracy flags, and ``select="rollout"``
    scores restarts by a training-tail closed-loop rollout (recorded per
    restart alongside the ELBO)."""
    out = harness.run("gas_furnace", "gp_narx", iters=30, num_inducing=8,
                      restarts=2, select="rollout")
    assert out["select"] == "rollout"
    assert len(out["restart_table"]) == 2
    for row in out["restart_table"]:
        assert np.isfinite(row["elbo"])
        assert row["val_rollout_rmse"] is not None
        assert np.isfinite(row["val_rollout_rmse"])
    assert out["git_sha"] != "" and "ts" in out
    assert isinstance(out["degenerate"], bool)
    assert out["final_noise_min"] is None or out["final_noise_min"] > 0
    # a 30-iter fit on gas_furnace is healthy: no insane-ELBO flag
    assert "elbo_insane" not in out["degenerate_reasons"]


def test_rollout_selection_rgp_val_fn():
    """The RGP family's tail-rollout score: q(X) sequences are truncated so
    freerun rolls out from T-K of the training span."""
    prep = harness._prepare("gas_furnace")
    _, _, _, val_fn = harness.METHODS["rgp1"](prep, 10, 1e-2, 0, 8)
    assert np.isfinite(float(val_fn()))


@pytest.mark.slow
def test_rollout_selection_rgp_mlp_val_fn():
    """Back-constrained variant: the encoder re-derives sliced means from the
    sliced Y/U while the free log_lam sequence is truncated to match."""
    prep = harness._prepare("gas_furnace")
    _, _, _, val_fn = harness.METHODS["rgp1_mlp"](prep, 10, 1e-2, 0, 8)
    assert np.isfinite(float(val_fn()))


def test_tanks_dataset_and_minibatch_method():
    """Round-4 additions: the depth-benchmark task (tanks) is registered,
    deterministic and finite; the collapsed-minibatch config-4 method runs
    through the same harness protocol."""
    a, b = datasets.load("tanks"), datasets.load("tanks")
    for x, y in zip(a[:4], b[:4]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert all(np.isfinite(np.asarray(x)).all() for x in a[:4])
    assert "tanks" in harness.TASKS and "gp_narx_minibatch" in harness.METHODS
    out = harness.run("gas_furnace", "gp_narx_minibatch", iters=60, num_inducing=8)
    assert np.isfinite(out["freerun_rmse"])
    assert out["elbo_last"] > out["elbo_first"]
