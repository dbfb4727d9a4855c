"""Profiling / tracing helpers (SURVEY.md S5.1).

Reference: none (``messages=1`` printing at most). Plan: ``jax.profiler``
traces + ``jax.named_scope`` annotations around the hot ops (psi statistics,
Cholesky, solves) so per-op roofline attribution is measurable
(BASELINE.json:5 ">=60% of roofline").
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rgp_trace"):
    """Capture a profiler trace viewable with tensorboard-plugin-profile."""
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named scope for roofline attribution of a code region."""
    return jax.named_scope(name)
