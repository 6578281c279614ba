#!/usr/bin/env python
"""Benchmark suite: updates/s per chip across workloads and engines.

Extends the headline bench.py (which stays the driver-facing single JSON
line) with the BASELINE.md workload matrix: the gray high-resolution slab,
multigroup slabs with correction sources (LLNL-like group counts), every
engine, and both precisions. Prints one JSON line per case plus a summary
table.

Usage:
    python benchmarks/suite.py [--quick] [--engines auto,pallas,fast,general]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Allow `python benchmarks/suite.py` from anywhere (repo root for the
# package, this directory for the shared timing helper).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


_C_LIGHT = 299.79245800  # cm/sh (Constants.h)


def _mk_cfg(M, G, N, steps, use_correction=False, courant=0.4):
    """Workload config. dt derives from a cell Courant number (as in
    bench.py): the BDF2 4-phase cycle is unstable above cell Courant
    ~0.5 (docs/QUIRKS.md "BDF2 stability envelope"), so a fixed dt at
    high resolution would time exponentially diverging state."""
    from radiative_transfer_tpu.config.config import Config

    return Config(
        M=M, G=G, N=N, X=1.0,
        bc_left_indicator=2, bc_right_indicator=1,
        psi_source=tuple(tuple(4.0931 for _ in range(G)) for _ in range(M)),
        rho=1.0, kappa_grey=1.0, T=1.0,
        V=1.0 if use_correction else 0.0,
        use_correction=use_correction,
        ts_method=3, dt=courant * (1.0 / N) / _C_LIGHT,
        max_timesteps=steps,
        include_validation=False,
    )


def _llnl_cfg_at(N, steps, courant=0.4):
    """The real LLNL 124-group deck at benchmark resolution, dt from a
    cell Courant number (the deck's shipped dt=1e-3 is far outside the
    BDF2 stability envelope at high N — and untruncatable, so the halo
    engine would reject it; at Courant 0.4 every group truncates)."""
    from radiative_transfer_tpu import load_config

    deck = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "prm", "llnl_slab_test.prm")
    cfg0 = load_config(deck)
    return load_config(deck, N=N, max_timesteps=steps,
                       dt=courant * (cfg0.X / N) / _C_LIGHT)


def _time_best(run, state, repeats=3):
    # Honest tunnel protocol (benchmarks/timing.py): drain one scalar
    # D2H after warm-up so block_until_ready is real; the fixed ~30 ms
    # sync cost per dispatch is included and amortised by the per-case
    # step counts.
    from timing import time_best

    return time_best(run, state, repeats)[0]


def _mk_mesh(mesh_str):
    import jax
    import numpy as _np

    from jax.sharding import Mesh

    ng, nx = (int(v) for v in mesh_str.lower().split("x"))
    devs = jax.devices()
    assert ng * nx <= len(devs), f"--mesh {mesh_str} needs {ng * nx} devices"
    if ng > 1:
        return Mesh(_np.asarray(devs[: ng * nx]).reshape(ng, nx), ("g", "x"))
    return Mesh(_np.asarray(devs[:nx]), ("x",))


def run_case(engine, cfg, dtype_name, mesh_str="1x1", scan_tol=1e-10):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from radiative_transfer_tpu.models import transport

    dtype = jnp.float32 if dtype_name == "float32" else jnp.float64
    steps = cfg.max_timesteps
    tables, _, _ = transport.build_tables(cfg, dtype=dtype)

    if engine == "auto":
        # The selection entry point (parallel.make_multichip_engine /
        # cli --engine auto): must be >= every sibling row.
        from radiative_transfer_tpu import parallel

        mesh = None if mesh_str == "1x1" else _mk_mesh(mesh_str)
        eng = parallel.make_multichip_engine(cfg, tables, mesh,
                                             scan_tol=scan_tol)
        state = eng.init_state()

        def run(s):
            return eng.solve(s, num_steps=steps)

    elif engine == "sharded-pallas":
        # Multi-chip Pallas path; at --mesh 1x1 this bounds the shard_map
        # + deferred-correction overhead vs the plain pallas engine.
        from radiative_transfer_tpu.parallel.sharded_pallas import (
            ShardedPallasEngine,
        )

        eng = ShardedPallasEngine(cfg, tables, _mk_mesh(mesh_str),
                                  scan_tol=scan_tol)
        state = eng.init_state()

        def run(s):
            return eng.solve(s, num_steps=steps)

    elif engine == "halo-pallas":
        # Fused-kernel multi-chip path (one halo exchange per K steps);
        # at --mesh 1x1 this bounds the halo+fixup overhead vs plain
        # pallas — the per-chip rate multi-chip runs keep.
        from radiative_transfer_tpu.parallel.halo_pallas import (
            HaloPallasEngine,
        )

        eng = HaloPallasEngine(cfg, tables, _mk_mesh(mesh_str),
                               scan_tol=scan_tol)
        state = eng.init_state()

        def run(s):
            return eng.solve(s, num_steps=steps)

    elif engine == "sharded-fast":
        from radiative_transfer_tpu.parallel.sharded_fast import (
            ShardedFastEngine,
        )

        eng = ShardedFastEngine(cfg, tables, _mk_mesh(mesh_str),
                                dtype=dtype, chunk=256)
        state = eng.init_state()

        def run(s):
            return eng.solve(s, num_steps=steps)

    elif engine == "df":
        # Double-float (f64-grade) fused kernel (ops/df_sweep.py): the
        # reference-precision path at kernel rate.
        from radiative_transfer_tpu.ops.df_sweep import DFPallasEngine

        eng = DFPallasEngine(cfg, tables, scan_tol=scan_tol)
        K = min(eng.max_steps_per_launch(), steps)
        while steps % K:
            K //= 2
        state = eng.init_state()

        @jax.jit
        def run(s):
            return lax.fori_loop(
                0, steps // K, lambda _, x: eng.multi_step(x, K), s
            )

    elif engine == "df-halo":
        # Double-float halo-overlap mesh engine (parallel/df_halo.py):
        # f64-grade at kernel rate across a mesh; at --mesh 1x1 this
        # bounds the halo+fixup overhead vs the plain df engine — the
        # per-chip rate f64-grade multi-chip runs keep.
        from radiative_transfer_tpu.parallel.df_halo import DFHaloEngine

        eng = DFHaloEngine(cfg, tables, _mk_mesh(mesh_str),
                           scan_tol=scan_tol)
        state = eng.init_state()

        def run(s):
            return eng.solve(s, num_steps=steps)

    elif engine == "fused-exchange":
        # Single-exchange fused-cycle mesh engine (the untruncatable-
        # regime fallback); at --mesh 1x1 this bounds its second-cycle
        # overhead vs plain pallas.
        from radiative_transfer_tpu.parallel.fused_exchange import (
            FusedExchangeEngine,
        )

        eng = FusedExchangeEngine(cfg, tables, _mk_mesh(mesh_str),
                                  scan_tol=scan_tol)
        state = eng.init_state()

        def run(s):
            return eng.solve(s, num_steps=steps)

    elif engine == "pallas":
        from radiative_transfer_tpu.ops.pallas_sweep import PallasEngine

        eng = PallasEngine(cfg, tables, scan_tol=scan_tol)  # auto block
        K = eng.max_steps_per_launch()
        while steps % K:
            K //= 2
        state = eng.init_state()

        @jax.jit
        def run(s):
            return lax.fori_loop(
                0, steps // K, lambda _, x: eng.multi_step(x, K), s
            )

    elif engine == "fast":
        from radiative_transfer_tpu.ops.fast_sweep import FastEngine

        eng = FastEngine(cfg, tables, dtype=dtype, chunk=256, unroll=8)
        state = eng.init_state()

        @jax.jit
        def run(s):
            return lax.fori_loop(0, steps, lambda _, x: eng.step(x), s)

    else:  # general
        state = transport.initial_state(cfg, tables, dtype=dtype)
        step = transport.make_step_fn(cfg, tables)

        @jax.jit
        def run(s):
            return lax.fori_loop(0, steps, lambda _, x: step(x), s)

    best = _time_best(run, state)
    updates = 4 * cfg.M * cfg.G * cfg.N * steps
    return updates / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--engines", default="auto,pallas,fast")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--check-auto", action="store_true",
                    help="exit nonzero if the auto engine loses to any "
                         "sibling row by more than tunnel noise (the "
                         "selection contract, tests/test_engine_auto.py)")
    ap.add_argument("--mesh", default="1x1", metavar="GxX",
                    help="device mesh for the sharded-* engines "
                         "(1x1 bounds the shard_map overhead on one chip)")
    ap.add_argument("--virtual", action="store_true",
                    help="force an 8-device CPU host mesh (overhead "
                         "trends only, not TPU rates; needed because the "
                         "axon site hook overrides JAX_PLATFORMS=cpu)")
    args = ap.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"
    scale = 1 if not args.quick else 16

    # (name, M, G, N, steps, correction, scan_tol, fam_mult)
    # The full-scan row pins scan_tol=0 (all prefix-scan passes) to show
    # the accuracy-bounded truncation win explicitly. fam_mult scales the
    # pallas-family step counts so each timed run amortises the tunnel's
    # fixed ~30 ms sync cost (timing.py) — small shapes need more steps.
    cases = [
        ("gray_hires_s32", 32, 1, (1 << 20) // scale, 64, False, 1e-10, 8),
        ("gray_hires_s32[full-scan]",
         32, 1, (1 << 20) // scale, 64, False, 0.0, 8),
        ("gray_s8", 8, 1, (1 << 18) // scale, 64, False, 1e-10, 8),
        ("mg16_correction_s8", 8, 16, (1 << 16) // scale, 32, True, 1e-10,
         16),
        ("mg128_s4", 4, 128, (1 << 13) // scale, 32, False, 1e-10, 64),
        # The real LLNL 124-group deck (file-tabulated bounds + kappa_a
        # spanning 8 decades, correction on) at benchmark resolution —
        # the BASELINE.md multi-host multigroup config. At the Courant-0.4
        # benchmark dt even the thinnest group's carry multiplier is
        # ~0.02, so the scan truncates to 3 passes and the halo engine's
        # creep bound ACCEPTS (it only rejects at the deck's shipped
        # dt=1e-3, tests/test_halo_pallas.py). The [full-scan] control
        # pins scan_tol=0 to time the untruncated path.
        ("llnl_124g", None, None, (1 << 12) // scale, 16, None, 1e-10,
         256),
        ("llnl_124g[full-scan]", None, None, (1 << 12) // scale, 16, None,
         0.0, 256),
    ]
    engines = args.engines.split(",")

    rows = []
    for name, M, G, N, steps, corr, tol, fam_mult in cases:
        for engine in engines:
            fam = ("pallas" in engine or engine == "auto"
                   or engine in ("df", "df-halo", "fused-exchange"))
            if fam and not on_tpu and N > (1 << 14):
                continue  # interpreter too slow for big cases
            if "full-scan" in name and "pallas" not in engine \
                    and engine not in ("df", "fused-exchange"):
                continue  # the control row only varies the kernel scans
            if "full-scan" in name and engine == "halo-pallas":
                continue  # scan_tol=0 fails the creep bound by design
            dtypes = ["float32"] if fam else ["float32", "float64"]
            # Pallas-family rows are fast enough to amortise the tunnel's
            # fixed ~30 ms sync cost with longer runs (timing.py); the
            # slower engines keep the base counts (overhead < 2% there).
            steps_eff = steps * (fam_mult if fam and on_tpu else 1)
            for dt in dtypes:
                try:
                    cfg_case = (_llnl_cfg_at(N, steps_eff)
                                if name.startswith("llnl_124g")
                                else _mk_cfg(M, G, N, steps_eff, corr))
                    ups = run_case(engine, cfg_case,
                                   dt, args.mesh, scan_tol=tol)
                    rec = {
                        "case": name, "engine": engine, "dtype": dt,
                        "M": cfg_case.M, "G": cfg_case.G, "N": N,
                        "steps": steps_eff,
                        "platform": platform,
                        "updates_per_s": ups,
                    }
                    rows.append(rec)
                    print(json.dumps(rec), flush=True)
                except Exception as e:  # noqa: BLE001 - report and continue
                    print(json.dumps({
                        "case": name, "engine": engine, "dtype": dt,
                        "error": f"{type(e).__name__}: {e}"[:300],
                    }), flush=True)

    print("\ncase                        engine   dtype    G updates/s",
          file=sys.stderr)
    for r in rows:
        print(f"{r['case']:<27} {r['engine']:<8} {r['dtype']:<8} "
              f"{r['updates_per_s'] / 1e9:8.2f}", file=sys.stderr)

    if args.check_auto:
        # The selection contract: auto must never lose to a sibling
        # engine on any case (within run-to-run tunnel noise).
        bad = []
        for case in {r["case"] for r in rows}:
            case_rows = [r for r in rows if r["case"] == case]
            autos = [r for r in case_rows if r["engine"] == "auto"]
            sibs = [r for r in case_rows if r["engine"] != "auto"]
            if not autos or not sibs:
                continue
            best_auto = max(r["updates_per_s"] for r in autos)
            best_sib = max(r["updates_per_s"] for r in sibs)
            if best_auto < 0.9 * best_sib:
                bad.append((case, best_auto / 1e9, best_sib / 1e9))
        if bad:
            for case, a, s in bad:
                print(f"AUTO LOSES on {case}: {a:.2f} vs {s:.2f} G",
                      file=sys.stderr)
            sys.exit(1)
        print("auto >= best sibling on every case (0.9x noise floor)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
