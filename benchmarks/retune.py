#!/usr/bin/env python
"""(block, K) retune + mesh-1x1 overhead + halo group-sharding measurement,
all under the honest timing protocol (benchmarks/timing.py).

Round-2's tuning table was measured with the poisoned-dispatch protocol
(every fori_loop launch group paid a fixed ~24-33 ms sync penalty), which
systematically favored fewer, larger launches. This re-derives the
frontier with the fixed cost amortised.

Usage: python benchmarks/retune.py [headline|mesh|groupshard|becn]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from timing import time_best

from radiative_transfer_tpu.config.config import Config
from radiative_transfer_tpu.models import transport

_C = 299.79245800


def gray_cfg(M=32, G=1, N=1 << 20, steps=256, ts_method=3):
    return Config(
        M=M, G=G, N=N, X=1.0,
        bc_left_indicator=2, bc_right_indicator=1,
        psi_source=tuple(tuple(4.0931 for _ in range(G)) for _ in range(M)),
        rho=1.0, kappa_grey=1.0, T=1.0,
        ts_method=ts_method, dt=0.4 * (1.0 / N) / _C, max_timesteps=steps,
        include_validation=False,
    )


def bench_pallas(cfg, block=None, K=None, label=""):
    from radiative_transfer_tpu.ops.pallas_sweep import PallasEngine

    tables, _, _ = transport.build_tables(cfg, dtype=jnp.float32)
    eng = PallasEngine(cfg, tables, block=block)
    steps = cfg.max_timesteps
    K = K or min(eng.max_steps_per_launch(), steps)
    while steps % K:
        K //= 2

    @jax.jit
    def run(s):
        return lax.fori_loop(0, steps // K,
                             lambda _, x: eng.multi_step(x, K), s)

    best, _ = time_best(run, eng.init_state())
    ups = 4 * cfg.M * cfg.G * cfg.N * steps / best
    print(json.dumps({
        "which": f"pallas{label}", "block": eng.block, "K": K,
        "steps": steps, "best_s": round(best, 4),
        "G_updates_per_s": round(ups / 1e9, 2),
    }), flush=True)
    return ups


def bench_mesh_engine(cfg, engine, label, **kw):
    from radiative_transfer_tpu.parallel import make_multichip_engine
    from radiative_transfer_tpu.parallel.halo_pallas import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("x",))
    tables, _, _ = transport.build_tables(cfg, dtype=jnp.float32)
    eng = make_multichip_engine(cfg, tables, mesh, engine=engine, **kw)
    steps = cfg.max_timesteps

    def run(s):
        return eng.solve(s, num_steps=steps)

    best, _ = time_best(run, eng.init_state())
    ups = 4 * cfg.M * cfg.G * cfg.N * steps / best
    print(json.dumps({
        "which": label, "engine": type(eng).__name__, "steps": steps,
        "best_s": round(best, 4), "G_updates_per_s": round(ups / 1e9, 2),
    }), flush=True)
    return ups


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "headline"
    if which == "headline":
        cfg = gray_cfg()
        for blk, K in ((8192, 4), (8192, 8), (4096, 8), (4096, 4),
                       (16384, 4), (16384, 2), (2048, 8)):
            try:
                bench_pallas(cfg, block=blk, K=K, label=f"[b{blk},K{K}]")
            except Exception as e:
                print(json.dumps({"which": f"[b{blk},K{K}]",
                                  "error": repr(e)[:200]}), flush=True)
    elif which == "becn":
        for ts, name in ((1, "BE"), (2, "CN")):
            cfg = gray_cfg(ts_method=ts, steps=1024)
            for blk, K in ((8192, 16), (8192, 8), (16384, 8), (4096, 16)):
                try:
                    bench_pallas(cfg, block=blk, K=K,
                                 label=f"[{name},b{blk},K{K}]")
                except Exception as e:
                    print(json.dumps({"which": f"[{name},b{blk},K{K}]",
                                      "error": repr(e)[:200]}), flush=True)
    elif which == "mesh":
        cfg = gray_cfg()
        bench_pallas(cfg, label="[single-chip]")
        bench_mesh_engine(cfg, "halo", "halo mesh-1x1")
        bench_mesh_engine(cfg, "pallas", "sharded mesh-1x1")
    elif which == "groupshard":
        # Item 6 (VERDICT r2): the halo engine's packed-row VMEM regime.
        # Group sharding reduces Bh_local; on one chip we emulate a
        # G/NG-group shard by running the same per-shard workload
        # directly: mg16-class decks with G = 16, 8, 4 at fixed N.
        for G in (16, 8, 4, 1):
            cfg = gray_cfg(M=8, G=G, N=1 << 16, steps=512)
            bench_pallas(cfg, label=f"[single,G{G}]")
            bench_mesh_engine(cfg, "halo", f"halo mesh-1x1 G={G} "
                              f"(rows={2 * 4 * G})")


if __name__ == "__main__":
    main()
