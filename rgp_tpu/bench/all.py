"""One entry point that regenerates EVERY headline number (VERDICT r3 #6).

Runs each BASELINE config (1-5, serving, the depth table) as a SUBPROCESS —
one TPU process at a time is an environment constraint, and a subprocess
crash must not lose the rows already measured — appending one JSON line per
entry to ``artifacts/bench_all_r{N}.jsonl`` AS IT COMPLETES, and echoing each
row to stdout. Rows can therefore never silently go stale: re-running this
module refreshes the lot (the round-3 failure mode was BASELINE.md carrying
config-2/3 numbers measured on code two rewrites old).

Usage:
    python -m rgp_tpu.bench.all --round 4            # full sweep (~1-2 h)
    python -m rgp_tpu.bench.all --round 4 --quick    # smoke sweep (~15 min)
    python -m rgp_tpu.bench.all --only config4,depth # subset
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

_REPO = pathlib.Path(__file__).resolve().parents[2]


def _entries(quick: bool):
    """(name, argv, timeout_s) per headline row. ``quick`` shrinks budgets to
    smoke scale (for rehearsal; official rows use the full budgets)."""
    it = "300" if quick else "10000"
    it4 = "1000" if quick else "10000"
    nuts = (["--chains", "128", "--warmup", "24", "--samples", "8"]
            if quick else
            ["--chains", "256", "--warmup", "96", "--samples", "16"])
    return [
        ("config1_rgp1_actuator",
         [sys.executable, str(_REPO / "bench.py"), "--iters", it], 7200),
        ("config2_rgp2_drives",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "drives",
          "--method", "rgp2", "--iters", it, "--restarts", "1" if quick else "3"],
         7200),
        ("config2_rgp2_mlp_drives",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "drives",
          "--method", "rgp2_mlp", "--iters", it, "--restarts", "1" if quick else "3"],
         7200),
        # config-3 protocol (BASELINE.json:9 / round-1 row): M=50, ~1k iters.
        # Measured r4 sensitivity sweep: RBF-NARX free-runs at 0.074 in this
        # config but falls into a 0.33-0.58 rollout basin at M=100 or 4k
        # iters (moment-matched closed loop amplifies overfit lengthscales),
        # while Matern52 is robust (0.061-0.063) at every setting
        ("config3_gp_narx_actuator",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "actuator",
          "--method", "gp_narx", "--iters", "1000", "--num-inducing", "50"],
         3600),
        ("config3_gp_narx_matern_actuator",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "actuator",
          "--method", "gp_narx_matern", "--iters", "1000",
          "--num-inducing", "50"], 3600),
        # same-code drives cross-checks (VERDICT r4 next #3): the config-2
        # depth claim must compare against CURRENT-code 1-layer and windowed
        # baselines, not round-1 numbers measured before the noise floor
        ("config2_rgp1_drives",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "drives",
          "--method", "rgp1", "--iters", it, "--restarts", "1" if quick else "3"],
         7200),
        ("config2_gp_narx_drives",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "drives",
          "--method", "gp_narx", "--iters", it, "--restarts", "1" if quick else "3"],
         7200),
        ("config4_collapsed_long_corpus",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "long_corpus",
          "--method", "gp_narx_collapsed", "--iters", it4, "--steady"], 7200),
        # config-4 minibatch batch-size sensitivity (VERDICT r4 next #2b):
        # one coherent same-code table of it/s + freerun + final noise per B
        ("config4_narx_minibatch_long_corpus",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "long_corpus",
          "--method", "gp_narx_minibatch", "--iters", it4, "--steady"], 7200),
        ("config4_narx_minibatch_B256",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "long_corpus",
          "--method", "gp_narx_minibatch", "--iters", it4,
          "--batch-size", "256"], 7200),
        ("config4_narx_minibatch_B1024",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "long_corpus",
          "--method", "gp_narx_minibatch", "--iters", it4,
          "--batch-size", "1024"], 7200),
        ("config4_narx_minibatch_B2048",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "long_corpus",
          "--method", "gp_narx_minibatch", "--iters", it4,
          "--batch-size", "2048"], 7200),
        ("config4_svgp_natgrad_long_corpus",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "long_corpus",
          "--method", "svgp_natgrad", "--iters", it4], 7200),
        # same SVGP training run scored through the exact full-data collapsed
        # posterior at the learned hyperparameters (collapse-at-eval): isolates
        # q(u)-lag from bad hyperparameters in the config-4 SVI story
        ("config4_svgp_natgrad_collapsed",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "long_corpus",
          "--method", "svgp_natgrad_collapsed", "--iters", it4], 7200),
        # config-4 minibatch at a floor matched to the measured bias: the
        # stochastic log|B| bias drives the noise to ANY floor, so the floor
        # IS the noise estimate — 1e-3 (-30 dB on standardized data) keeps the
        # model honest where 1e-4 leaves a near-interpolator
        ("config4_narx_minibatch_floor1e3",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "long_corpus",
          "--method", "gp_narx_minibatch", "--iters", it4,
          "--noise-floor", "1e-3"], 7200),
        # config-3 basin probe at the mechanistically-targeted lever (VERDICT
        # r4 next #5): the M=100/4k RBF rollout basin's measured mechanism is
        # noise collapse (every restart pins raw noise ~1e-6); raise the floor
        ("config3_gp_narx_M100_4k_floor1e3",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "actuator",
          "--method", "gp_narx", "--iters", "4000", "--num-inducing", "100",
          "--noise-floor", "1e-3"], 3600),
        # --params-npz: sample at the COMMITTED converged anchor. A fresh
        # 300-iter fit is a premature anchor, and this round's refresh at one
        # death-spiraled (eps -> 0.0, 38% divergence, R-hat 86) exactly as the
        # make_rgp_potential validity condition predicts; the same protocol at
        # the 10k anchor adapts eps ~0.5 with R-hat 1.057
        ("config5_nuts",
         [sys.executable, "-m", "rgp_tpu.bench.sampling", "--what", "nuts",
          "--params-npz", "artifacts/pcheck_params_r5.npz"]
         + nuts, 10800),
        ("config5_smc",
         [sys.executable, "-m", "rgp_tpu.bench.sampling", "--what", "smc",
          "--particles", "1024"], 3600),
        ("serving",
         [sys.executable, "-m", "rgp_tpu.bench.serving"], 3600),
        # depth table (VERDICT r3 #2): the task whose ground truth has genuine
        # two-layer latent structure, all four methods
        ("depth_tanks_rgp1",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "tanks",
          "--method", "rgp1", "--iters", it, "--restarts", "1" if quick else "3"],
         7200),
        ("depth_tanks_rgp2",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "tanks",
          "--method", "rgp2", "--iters", it, "--restarts", "1" if quick else "3"],
         7200),
        ("depth_tanks_rgp2_mlp",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "tanks",
          "--method", "rgp2_mlp", "--iters", it, "--restarts", "1" if quick else "3"],
         7200),
        ("depth_tanks_gp_narx",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "tanks",
          "--method", "gp_narx", "--iters", "300" if quick else "2000"], 3600),
        # rollout-aware selection on the measured failure mode (VERDICT r4
        # next #6): at 10k iters free-form REVARB optima roll out at the zero
        # predictor and ELBO-based best-of-N SELECTS them; the training-tail
        # rollout score is the veto
        ("depth_tanks_rgp2_rollout_select",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "tanks",
          "--method", "rgp2", "--iters", it, "--restarts",
          "1" if quick else "3", "--select", "rollout"], 7200),
        ("depth_tanks_rgp1_rollout_select",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", "tanks",
          "--method", "rgp1", "--iters", it, "--restarts",
          "1" if quick else "3", "--select", "rollout"], 7200),
    ] + [
        # dormant-task certification sweep (VERDICT r4 next #9): the four
        # registry tasks no BASELINE row ever exercised, each with the
        # windowed baseline and the 1-layer RGP at a modest budget
        (f"tasks_{t}_{m}",
         [sys.executable, "-m", "rgp_tpu.bench", "--task", t,
          "--method", m, "--iters", "300" if quick else "2000"], 3600)
        for t in ("ballbeam", "dryer", "gas_furnace", "narendra")
        for m in ("gp_narx", "rgp1")
    ]


def run_all(round_no: int, quick: bool = False, only=None) -> list:
    out_path = _REPO / "artifacts" / f"bench_all_r{round_no}.jsonl"
    out_path.parent.mkdir(exist_ok=True)
    rows = []
    first = True
    for name, argv, timeout in _entries(quick):
        if only and name not in only and not any(name.startswith(o) for o in only):
            continue
        if not first:
            # grant-release window: a TPU client launched within ~30 s of the
            # previous client's exit frequently wedges permanently in claim
            # negotiation (measured round 4; memory: axon-tpu-claim-behavior)
            time.sleep(90)
        first = False
        t0 = time.perf_counter()
        # row provenance (VERDICT r4 next #4): the jsonl accumulates across
        # code states, so every row must identify the code that produced it
        try:
            sha = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
                text=True, timeout=10, cwd=str(_REPO),
            ).stdout.strip() or "unknown"
        except Exception:
            sha = "unknown"
        row = {"name": name, "argv": argv[1:], "quick": quick,
               "git_sha": sha, "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
        try:
            r = subprocess.run(argv, capture_output=True, timeout=timeout,
                               cwd=str(_REPO), env=os.environ.copy())
            lines = [l for l in r.stdout.decode().strip().splitlines() if l.strip()]
            row["result"] = json.loads(lines[-1]) if lines else None
            row["returncode"] = r.returncode
            if r.returncode != 0:
                row["stderr_tail"] = r.stderr.decode()[-2000:]
        except subprocess.TimeoutExpired:
            row["result"] = None
            row["error"] = f"timeout@{timeout}s"
        except Exception as e:  # keep sweeping; record the failure
            row["result"] = None
            row["error"] = repr(e)[:500]
        row["wall_seconds"] = round(time.perf_counter() - t0, 1)
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
        rows.append(row)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--round", type=int, default=0)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated entry-name (prefixes) to run")
    args = ap.parse_args(argv)
    only = set(args.only.split(",")) if args.only else None
    run_all(args.round, quick=args.quick, only=only)


if __name__ == "__main__":
    main()
