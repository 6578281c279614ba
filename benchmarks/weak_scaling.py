#!/usr/bin/env python
"""Weak-scaling measurement: updates/s vs spatial shards at fixed
cells/chip — the BASELINE.md north-star table (>= 80% efficiency from 1
chip to a multi-host v5e slice).

For each K in 1, 2, 4, ... up to the available device count, solves a
gray S_32 BDF2 slab with N = cells_per_shard * K on a 1xK mesh and
reports  efficiency(K) = rate(K) / (K * rate(1)).

On the current single-chip image only K=1 runs on real hardware; pass
--virtual to measure the full ladder on a forced CPU host mesh (relative
efficiencies there reflect collective/overhead scaling, not TPU rates —
run this unchanged on a real slice when one is available). Expected
real-hardware efficiency models:

* halo-pallas (default, production): per K=8 BDF2 steps the exchange is
  2 ppermutes of (2, M*G/2, H) plane slices + 1 tiny carry-record
  ppermute, and the redundant halo+fixup compute is 2H/cells_per_shard
  (~0.4% at 2^20 cells, H=2048). Both terms are O(10 us) / <1% against
  ~20 ms of compute per launch group at the headline shape, so
  efficiency should sit > 0.98 — the fused single-chip rate survives
  scaling.
* sharded-pallas: one (2, M*G/2) all_gather + <= 2 tiny ppermutes per
  SUB-step, still O(10 us) each against (cells/chip * M * G /
  rate_chip) compute, so efficiency ~ 1 / (1 + t_coll/t_comp) stays
  > 0.9 for >= 2^17 cells/chip at v5e ICI latencies — but its per-chip
  base rate is ~2.5x below halo-pallas (no in-launch step fusion).

Usage:
    python benchmarks/weak_scaling.py [--cells-per-shard 131072]
        [--steps 16] [--engine halo-pallas|sharded-pallas|sharded-fast]
        [--virtual]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells-per-shard", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None,
                    help="timesteps per timed run (default 256 on TPU — "
                         "amortises the tunnel's fixed sync cost, "
                         "timing.py — and 16 on the virtual CPU mesh)")
    ap.add_argument("--workload", default="gray",
                    choices=("gray", "llnl", "llnl-shipped"),
                    help="gray: S_32 single-group headline; llnl: the "
                         "real 124-group LLNL deck at the Courant-0.4 "
                         "benchmark dt (BASELINE.md's multi-host "
                         "multigroup halo-exchange config); llnl-shipped: "
                         "the deck's own dt=1e-3 — the UNTRUNCATABLE "
                         "regime the fused-exchange engine targets (the "
                         "halo engine's creep bound rejects it)")
    ap.add_argument("--engine", default="halo-pallas",
                    choices=("halo-pallas", "sharded-pallas",
                             "sharded-fast", "fused-exchange",
                             "df-halo"))
    ap.add_argument("--virtual", action="store_true",
                    help="force a virtual CPU host mesh (overhead "
                         "trends only, not TPU rates)")
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual mode: host-mesh device count (the "
                         "pod-scale ladder uses 64)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--control", choices=("all", "last", "none"),
                    default="all",
                    help="virtual mode: measure the zero-communication "
                         "host-capacity control at every rung (all), only "
                         "the deepest (last — cheaper, what the "
                         "regression test uses), or skip (none)")
    args = ap.parse_args()

    if args.virtual:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count="
                + str(args.devices)
            ).strip()

    import jax
    import numpy as np

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.sharding import Mesh

    from radiative_transfer_tpu.models import transport
    from suite import _mk_cfg  # same workload builder as the matrix suite

    on_tpu = jax.devices()[0].platform != "cpu"
    n_dev = len(jax.devices())
    if args.steps is None:
        args.steps = 256 if on_tpu else 16
    if args.workload.startswith("llnl"):
        from suite import _llnl_cfg_at  # Courant-0.4 dt, real deck

        cells = args.cells_per_shard or ((1 << 13) if on_tpu else (1 << 10))
        M, G = 2, 124
    else:
        cells = args.cells_per_shard or ((1 << 20) if on_tpu else (1 << 10))
        M, G = 32, 1

    def _ladder_cfg(K):
        if args.workload == "llnl-shipped":
            # The deck's own dt (untruncatable; full-scan kernels).
            from radiative_transfer_tpu import load_config

            deck = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "prm", "llnl_slab_test.prm")
            return load_config(deck, N=cells * K,
                               max_timesteps=args.steps)
        if args.workload == "llnl":
            return _llnl_cfg_at(cells * K, args.steps)
        return _mk_cfg(M, G, cells * K, args.steps)

    def _control_wall(cfg_ladder, K):
        """Host-capacity control for the virtual ladder: K INDEPENDENT
        1-shard halo engines on K distinct devices — identical per-shard
        compute (same dx/dt coefficients, same halo redundancy, same
        kernel shapes via dataclasses.replace(N=N/K, X=X/K)) with ZERO
        cross-shard communication. On a C-core host running n>C virtual
        devices, raw per-shard rates measure core contention, not the
        engine; the ratio control_wall/ladder_wall cancels the host and
        isolates the communication + synchronisation cost."""
        import dataclasses
        import time as time_mod

        from radiative_transfer_tpu.parallel.fused_exchange import (
            FusedExchangeEngine,
        )
        from radiative_transfer_tpu.parallel.halo_pallas import (
            HaloPallasEngine,
        )

        from radiative_transfer_tpu.parallel.df_halo import DFHaloEngine

        ctor = {"fused-exchange": FusedExchangeEngine,
                "df-halo": DFHaloEngine}.get(args.engine, HaloPallasEngine)
        cfg1 = dataclasses.replace(cfg_ladder, N=cfg_ladder.N // K,
                                   X=cfg_ladder.X / K)
        tb1, _, _ = transport.build_tables(cfg1, dtype=jnp.float32)
        engs = []
        for k in range(K):
            m1 = Mesh(np.asarray(jax.devices()[k:k + 1]), ("x",))
            e = ctor(cfg1, tb1, m1)
            engs.append((e, e.solve(num_steps=args.steps)))  # compile+warm
        for _, s in engs:
            jax.block_until_ready(s)
        best = float("inf")
        states = [s for _, s in engs]
        for _ in range(args.repeats):
            t0 = time_mod.perf_counter()
            states = [e.solve(s, num_steps=args.steps)
                      for (e, _), s in zip(engs, states)]
            for s in states:
                jax.block_until_ready(s)
            best = min(best, time_mod.perf_counter() - t0)
        return best

    rows = []
    base_rate = None
    K = 1
    while K <= n_dev:
        cfg = _ladder_cfg(K)
        tables, _, _ = transport.build_tables(cfg, dtype=jnp.float32)
        mesh = Mesh(np.asarray(jax.devices()[:K]), ("x",))
        if args.engine == "halo-pallas":
            # Production path: fused K-step kernel per shard, one halo
            # exchange per K steps (parallel/halo_pallas.py). The
            # headline workload satisfies its truncated-scan creep bound
            # at >= 2^15 cells/shard.
            from radiative_transfer_tpu.parallel.halo_pallas import (
                HaloPallasEngine,
            )

            eng = HaloPallasEngine(cfg, tables, mesh)
        elif args.engine == "sharded-pallas":
            from radiative_transfer_tpu.parallel.sharded_pallas import (
                ShardedPallasEngine,
            )

            eng = ShardedPallasEngine(cfg, tables, mesh)
        elif args.engine == "fused-exchange":
            from radiative_transfer_tpu.parallel.fused_exchange import (
                FusedExchangeEngine,
            )

            eng = FusedExchangeEngine(cfg, tables, mesh)
        elif args.engine == "df-halo":
            # f64-grade halo engine (round 5): same decomposition as
            # halo-pallas with (hi, lo) double-float halos.
            from radiative_transfer_tpu.parallel.df_halo import (
                DFHaloEngine,
            )

            eng = DFHaloEngine(cfg, tables, mesh)
        else:
            from radiative_transfer_tpu.parallel.sharded_fast import (
                ShardedFastEngine,
            )

            eng = ShardedFastEngine(cfg, tables, mesh,
                                    dtype=jnp.float32, chunk=256)

        # Honest tunnel protocol (benchmarks/timing.py): on the axon TPU
        # tunnel, block_until_ready is only real after a first D2H drain.
        from timing import time_best

        best, _ = time_best(
            lambda s: eng.solve(s, num_steps=args.steps),
            eng.init_state(), repeats=args.repeats)
        rate = 4 * M * G * cells * K * args.steps / best
        if base_rate is None:
            base_rate = rate
        rec = {
            "engine": args.engine, "shards": K,
            "cells_per_shard": cells, "total_cells": cells * K,
            "updates_per_s": rate,
            "per_shard": rate / K,
            "efficiency": rate / (K * base_rate),
            "platform": jax.devices()[0].platform,
        }
        want_control = (args.control == "all"
                        or (args.control == "last" and K * 2 > n_dev))
        if (not on_tpu and want_control
                and args.engine in ("halo-pallas", "fused-exchange",
                                    "df-halo")):
            # The raw efficiency column above is dominated by HOST-CORE
            # contention on a virtual mesh (n_dev devices sharing
            # os.cpu_count() cores) — it measures the host, not the
            # engine. comm_efficiency cancels the host: same per-shard
            # compute run as K independent 1-shard engines (zero
            # communication) vs the coupled ladder rung.
            ctrl = _control_wall(cfg, K)
            rec["control_wall_s"] = ctrl
            rec["ladder_wall_s"] = best
            rec["comm_efficiency"] = ctrl / best
        rows.append(rec)
        print(json.dumps(rec), flush=True)
        K *= 2

    print("\nshards  G upd/s   per-shard   efficiency  comm-eff",
          file=sys.stderr)
    for r in rows:
        ce = (f"{r['comm_efficiency']:.3f}"
              if "comm_efficiency" in r else "     -")
        print(f"{r['shards']:>6}  {r['updates_per_s'] / 1e9:8.2f}  "
              f"{r['per_shard'] / 1e9:9.2f}   {r['efficiency']:.3f}"
              f"     {ce}",
              file=sys.stderr)
    if n_dev == 1:
        print("(single device: K=1 row only — rerun on a multi-chip "
              "slice for the scaling ladder)", file=sys.stderr)


if __name__ == "__main__":
    main()
