"""Checkpoint / resume (SURVEY.md S5.3-S5.4).

Reference mechanism: pickle of the model object / ``np.save(m.param_array)``
with ``m[:] = loaded`` restore (paramz contract [H]). TPU-native plan: orbax on
the full state pytree (params + optimizer state + sampler state + PRNG keys) +
a JSON config sidecar, giving deterministic resume (saved keys) for the
fault-tolerance story: frequent checkpoints + resume-identical continuation.
"""

from __future__ import annotations

import json
import os
from typing import Optional


__all__ = ["save_checkpoint", "load_checkpoint", "latest_step"]


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(path: str, state, step: int, *, config: Optional[dict] = None):
    """Save a pytree checkpoint at ``path/step_<n>`` (+ config.json sidecar)."""
    ocp = _ocp()
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckpt_dir = os.path.join(path, f"step_{step:08d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, state, force=True)
    if config is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(path)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def load_checkpoint(path: str, template, step: Optional[int] = None):
    """Restore the pytree saved by :func:`save_checkpoint`.

    ``template``: a pytree with the target structure/shapes/dtypes (e.g. a
    freshly initialized state) — restored arrays adopt its structure.
    Returns (state, step).
    """
    ocp = _ocp()
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    ckpt_dir = os.path.join(os.path.abspath(path), f"step_{step:08d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(ckpt_dir, item=template)
    return restored, step
