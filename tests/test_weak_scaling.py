"""Weak-scaling regression: the virtual ladder's communication
efficiency must stay above a floor (docs/WEAK_SCALING.md leg 2).

Runs benchmarks/weak_scaling.py --virtual in a subprocess (it manages
its own 8-device CPU mesh env) at a small shape and checks
comm_efficiency at the deepest rung. The floor is generous (0.5 vs the
measured ~0.9) because interpret-mode timings at 1024 cells are noisy —
the regression this catches is structural (a collective added per step,
an accidental serialisation), which costs 2-10x, not 10%."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_ladder():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "weak_scaling.py"),
         "--virtual", "--workload", "gray", "--cells-per-shard", "512",
         "--steps", "8", "--repeats", "1", "--control", "last"],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    rows = [json.loads(ln) for ln in out.stdout.splitlines() if ln.strip()]
    assert rows, out.stdout
    deepest = max(rows, key=lambda r: r["shards"])
    assert deepest["shards"] >= 8
    # And every rung must actually have run the coupled solve.
    assert all(r["updates_per_s"] > 0 for r in rows)
    return deepest


def test_virtual_ladder_comm_efficiency():
    deepest = _run_ladder()
    if deepest["comm_efficiency"] <= 0.5:
        # Timing on a 4-core host under external load (another suite, a
        # bench) can depress one measurement; a structural regression
        # (an added collective, a serialisation) reproduces on a rerun.
        deepest = _run_ladder()
    assert deepest["comm_efficiency"] > 0.5, deepest
