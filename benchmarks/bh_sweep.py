#!/usr/bin/env python
"""Microbenchmark: fused-kernel visit cost vs batch-row count Bh at fixed
elements-per-visit (Bh * block = 2^17).

Round-2 left the real-LLNL-deck slowness attributed to "launch overhead";
this sweep tests the actual variable: the LLNL shape's Bh=124 (vs 16 at
the headline shape) at the same per-visit element count.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from radiative_transfer_tpu.config.config import Config
from radiative_transfer_tpu.models import transport
from radiative_transfer_tpu.ops.pallas_sweep import PallasEngine

_C = 299.79245800


def case(Bh, blk, nblocks=8, steps=16, K=4, G=None):
    if G is None:
        M, G = 2 * Bh, 1
    else:
        M = 2 * Bh // G
    N = blk * nblocks
    cfg = Config(
        M=M, G=G, N=N, X=1.0,
        bc_left_indicator=2, bc_right_indicator=1,
        psi_source=tuple(tuple(4.0931 for _ in range(G)) for _ in range(M)),
        rho=1.0, kappa_grey=1.0, T=1.0,
        ts_method=3, dt=0.4 * (1.0 / N) / _C, max_timesteps=steps,
        include_validation=False,
    )
    tables, _, _ = transport.build_tables(cfg, dtype=jnp.float32)
    eng = PallasEngine(cfg, tables, block=blk)
    state = eng.init_state()

    @jax.jit
    def run(s):
        return lax.fori_loop(0, steps // K, lambda _, x: eng.multi_step(x, K), s)

    out = jax.block_until_ready(run(state))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(out))
        best = min(best, time.perf_counter() - t0)
    visits = (steps // K) * 2 * nblocks
    ups = 4 * M * G * N * steps / best
    print(json.dumps({
        "Bh": Bh, "G": G, "blk": blk, "N": N, "npass": eng.scan_npass,
        "best_ms": best * 1e3, "us_per_visit": best / visits * 1e6,
        "G_updates_per_s": ups / 1e9,
    }), flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "a"
    if which == "a":
        case(16, 8192)
        case(32, 4096)
        case(64, 2048)
    elif which == "b":
        case(128, 1024)
        case(124, 1024, G=124)   # the LLNL batch shape (M=2, G=124)
    elif which == "c":
        case(128, 1024, G=128)   # G=128, M=2 -> Bh=128 multigroup shape
        case(8, 16384)


if __name__ == "__main__":
    main()
