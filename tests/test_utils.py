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
