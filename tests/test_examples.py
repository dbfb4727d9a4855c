"""Examples smoke gate (round-2 verdict weak #7): every demo script under
``examples/`` must execute green at tiny sizes, so the demo layer (the
reference's notebook layer, SURVEY.md S2.1) cannot rot silently.

Runs each script in a subprocess inheriting the conftest CPU/8-virtual-device
environment; sizes are chosen for compile+run speed, not model quality.
"""

import pathlib
import subprocess
import sys

import pytest

_EX = pathlib.Path(__file__).parent.parent / "examples"

_FAST_CASES = [
    ("actuator_rgp.py", ["--iters", "10", "--num-inducing", "10"]),
    ("drives_deep_rgp.py", ["--iters", "10", "--num-inducing", "8"]),
    ("minibatch_svgp.py",
     ["--iters", "10", "--batch", "64", "--num-inducing", "16"]),
]

_SLOW_CASES = [
    pytest.param(
        "nuts_smc_demo.py",
        ["--iters", "10", "--chains", "2", "--particles", "16",
         "--samples", "3", "--warmup", "3"],
        marks=pytest.mark.slow,  # NUTS warmup+draw compile dominates
    ),
    pytest.param(
        "evidence_tempered_smc.py", ["--iters", "10", "--particles", "8"],
        marks=pytest.mark.slow,  # two variants x tempered-SMC compile
    ),
]


# In this environment the axon sitecustomize pre-imports jax and pins the
# TPU backend regardless of the JAX_PLATFORMS env var; a bare subprocess
# would claim the real TPU (and contend/wedge it). Force CPU in-process —
# config update before first backend use, the only method that works here —
# then exec the script under its own __main__.
_RUNNER = """
import sys, jax
jax.config.update('jax_platforms', 'cpu')
import runpy
script = sys.argv[1]
sys.argv = sys.argv[1:]
runpy.run_path(script, run_name='__main__')
"""

# batch runner: one jax import/process startup (~8 s on this 2-core host)
# amortized over every script; argv swapped per script, each must print
_RUNNER_MULTI = """
import sys, jax
jax.config.update('jax_platforms', 'cpu')
import io, runpy
import contextlib
jobs = sys.argv[1:]
for spec in jobs:
    parts = spec.split('\\x1f')
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sys.argv = parts
        runpy.run_path(parts[0], run_name='__main__')
    assert buf.getvalue().strip(), f'{parts[0]} produced no output'
    print('OK', parts[0])
"""


def test_fast_examples_run_green():
    jobs = ["\x1f".join([str(_EX / s), *a]) for s, a in _FAST_CASES]
    r = subprocess.run(
        [sys.executable, "-c", _RUNNER_MULTI, *jobs],
        capture_output=True, timeout=900, text=True,
    )
    assert r.returncode == 0, f"failed:\n{r.stdout[-2000:]}\n{r.stderr[-4000:]}"
    for s, _ in _FAST_CASES:
        assert f"OK {_EX / s}" in r.stdout, f"{s} did not complete"


@pytest.mark.parametrize("script,args", _SLOW_CASES)
def test_example_runs_green(script, args):
    r = subprocess.run(
        [sys.executable, "-c", _RUNNER, str(_EX / script), *args],
        capture_output=True, timeout=900, text=True,
    )
    assert r.returncode == 0, f"{script} failed:\n{r.stdout[-2000:]}\n{r.stderr[-4000:]}"
    assert r.stdout.strip(), f"{script} produced no output"
