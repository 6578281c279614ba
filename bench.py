#!/usr/bin/env python
"""Benchmark: cell-angle-group updates/s per chip on the flagship workload.

Workload (BASELINE.md "high-resolution gray slab"): S_32 gray slab,
N = 2^20 cells, BDF2 — 4 sub-steps per timestep, each a batched
scan-parallel transport sweep. One "update" is one per-(cell, angle,
group) 2x2 upwind solve, i.e. 4*M*G*N updates per full BDF2 step
(matching the reference's innermost-loop trip count, src/solver.cpp:628-811).

dt is derived from a cell Courant number c*dt/dx = 0.4: the reference's
BDF2 predictor-corrector cycle is numerically unstable for cell Courant
>~ 0.5 (verified against the reference binary itself — both codes blow
up identically; see docs/QUIRKS.md "BDF2 stability envelope"), so a
fixed dt=1e-5 at N=2^20 would time exponentially-diverging garbage.
The timing itself is dt-independent (same FLOPs per step).

`vs_baseline`: the reference publishes no numbers (BASELINE.md), so the
comparison point is the ACTUAL reference miniapp, compiled in-image
against the Eigen-subset shim (hot path -O2; see
benchmarks/reference_baseline.py) and timed on this host's CPU with BE
stepping (its BDF2 path has an O(N^2 M^2) per-cell tensor copy that
cannot run at benchmark scale). The denominator is FROZEN
(benchmarks/results/reference_baseline_frozen.json: median of 7
committed runs, 2026-08-21, 9.85 M updates/s) so vs_baseline is
reproducible round-over-round; a live re-measure (and finally a
vectorised-NumPy proxy) is the fallback when the frozen record is
missing. Values > 1 mean faster than the serial reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "updates/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def tpu_updates_per_s(M=32, G=1, N=1 << 20, steps=512, dtype="float32"):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from radiative_transfer_tpu.config.config import Config
    from radiative_transfer_tpu.models import transport
    from radiative_transfer_tpu.ops.fast_sweep import FastEngine

    steps = max(steps, 2)
    C = 299.79245800  # cm/sh, Constants.h:13
    dt = 0.4 * (1.0 / N) / C  # cell Courant 0.4 — inside the BDF2
    # 4-phase cycle's stability envelope (docs/QUIRKS.md)
    cfg = Config(
        M=M, G=G, N=N, X=1.0,
        bc_left_indicator=2, bc_right_indicator=1,
        psi_source=tuple(tuple(4.0931 for _ in range(G)) for _ in range(M)),
        rho=1.0, kappa_grey=1.0, T=1.0,
        ts_method=3, dt=dt, max_timesteps=steps,
        include_validation=False,
    )
    jdt = jnp.float32 if dtype == "float32" else jnp.float64
    tables, _, _ = transport.build_tables(cfg, dtype=jdt)
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu and dtype == "float32":
        # Fused single-pass Pallas kernel, K whole BDF2 timesteps per
        # launch (ops/pallas_sweep.py::multi_step); the engine picks the
        # measured-best (block, K) pair (8192, 4 here).
        from radiative_transfer_tpu.ops.pallas_sweep import PallasEngine

        eng = PallasEngine(cfg, tables)  # auto block
        K = min(eng.max_steps_per_launch(), steps)
        steps = max(steps - steps % K, K)
        state = eng.init_state()

        @jax.jit
        def run(s):
            return lax.fori_loop(
                0, steps // K, lambda _, x: eng.multi_step(x, K), s
            )
    else:
        eng = FastEngine(cfg, tables, dtype=jdt, chunk=256, unroll=8)
        state = eng.init_state()

        @jax.jit
        def run(s):
            return lax.fori_loop(0, steps, lambda _, x: eng.step(x), s)

    # Timing protocol: shared with the suite/weak-scaling harnesses
    # (benchmarks/timing.py) — compile + warm-up, drain one scalar D2H
    # (before it, the tunnel's dispatch is fire-and-forget and
    # block_until_ready does NOT wait), then best-of-N of long runs with
    # the fixed ~24-33 ms/dispatch sync cost INCLUDED and amortised by
    # the steps count (~1 s per run).
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmarks"))
    from timing import time_best

    best, out = time_best(run, state, repeats=4)
    # Guard: the timed state must be finite and bounded (equilibrium is
    # ~4.09) — refuse to report a rate measured on diverged garbage.
    for leaf in jax.tree_util.tree_leaves(out):
        m = float(jnp.max(jnp.abs(leaf)))
        if not np.isfinite(m) or m > 1e3:
            raise RuntimeError(f"bench state diverged (max|x|={m:.3e})")
    updates = 4 * M * G * N * steps
    return updates / best


def cpu_proxy_updates_per_s(M=32, G=1, N=20000, steps=2):
    """Sequential-over-cells NumPy sweep, vectorised over (M/2, G) like a
    good single-core CPU code; BE sub-steps only (same per-cell flop count
    as the reference integrators to within a small constant)."""
    C = 299.79245800
    dx, dt = 1.0 / N, 1e-5
    rhokap = np.ones(G)
    B = np.full(G, 4.0931)
    Mh = M // 2
    absmu = np.linspace(0.05, 0.95, Mh)[:, None]  # (Mh, 1)

    e = np.full((Mh, G, N, 2), 4.0931)
    S = 0.5 * C * dt * dx * rhokap[None, :] * B[None, :]

    const_A = 1.0 + C * dt * rhokap[None, :]
    const_B = C * dt * absmu
    T0 = 0.5 * (const_A * dx + const_B)
    q = 0.5 * const_B
    det = T0 * T0 + q * q

    t0 = time.perf_counter()
    for _ in range(steps * 4 * 2):  # 4 sub-steps x 2 direction halves
        carry = np.zeros((Mh, G))
        for j in range(N):
            r0 = S + const_B * carry + 0.5 * dx * e[:, :, j, 0]
            r1 = S + 0.5 * dx * e[:, :, j, 1]
            x0 = (T0 * r0 - q * r1) / det
            x1 = (q * r0 + T0 * r1) / det
            e[:, :, j, 0], e[:, :, j, 1] = x0, x1
            carry = x1
    dt_s = time.perf_counter() - t0
    updates = 4 * M * G * N * steps
    return updates / dt_s


def reference_binary_updates_per_s(quick=False):
    """The reference miniapp's rate: the FROZEN committed median when
    available (VERDICT r4 #7: a per-round re-measure is ±25% noisy on a
    busy host and polluted the one number the driver tracks
    longitudinally — vs_baseline swung 5871x/8338x/6626x across rounds
    at a near-flat numerator), else a live in-image measurement."""
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    if not quick:
        frozen = os.path.join(here, "benchmarks", "results",
                              "reference_baseline_frozen.json")
        try:
            with open(frozen) as fh:
                rec = json.load(fh)
            return float(rec["updates_per_s"])
        except Exception:
            pass  # no frozen record: measure live below
    sys.path.insert(0, os.path.join(here, "benchmarks"))
    try:
        from reference_baseline import reference_updates_per_s

        if quick:
            return reference_updates_per_s(M=8, N=2000, steps=50)
        return reference_updates_per_s()
    except Exception:
        return None


def _measure_and_print(quick: bool) -> None:
    n_cells = 1 << 15 if quick else 1 << 20
    steps = 2 if quick else 512   # long runs amortise the fixed ~30 ms
    # per-dispatch tunnel sync cost (benchmarks/timing.py)
    value = tpu_updates_per_s(N=n_cells, steps=steps)
    base = reference_binary_updates_per_s(quick)
    if base is None:
        base = cpu_proxy_updates_per_s(
            N=4000 if quick else 20000, steps=1 if quick else 2
        )
    print(json.dumps({
        "metric": "cell_angle_group_updates_per_s_per_chip",
        "value": value,
        "unit": "updates/s",
        "vs_baseline": value / base,
    }))


def main():
    import os
    import subprocess

    quick = "--quick" in sys.argv
    if "--_inline" in sys.argv or os.environ.get("RT_BENCH_FALLBACK"):
        # Child mode: measure directly (raises/hangs bubble to the parent).
        _measure_and_print(quick)
        return

    # Parent mode: isolate the device measurement in a subprocess with a
    # watchdog — the TPU tunnel has been observed to HANG (not raise), and
    # the driver must always get its one JSON line.
    args = [sys.executable, os.path.abspath(__file__), "--_inline"]
    if quick:
        args.append("--quick")
    try:
        out = subprocess.run(
            args, capture_output=True, text=True,
            timeout=240 if quick else 1500,
        )
        lines = out.stdout.strip().splitlines()
        if out.returncode == 0 and lines:
            print(lines[-1])
            return
        print(out.stderr[-2000:], file=sys.stderr)
    except subprocess.TimeoutExpired:
        print("# device bench timed out (tunnel hang?)", file=sys.stderr)

    print("# falling back to a quick CPU run", file=sys.stderr)
    env = dict(os.environ, JAX_PLATFORMS="cpu", RT_BENCH_FALLBACK="1")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--quick"],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    lines = out.stdout.strip().splitlines()
    if out.returncode != 0 or not lines:
        print(out.stderr[-2000:], file=sys.stderr)
        raise SystemExit("bench failed on device AND cpu")
    rec = json.loads(lines[-1])
    rec["note"] = "cpu_fallback_quick_workload"  # NOT the device number
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
