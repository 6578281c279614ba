#!/usr/bin/env python
"""Probe: where does the real LLNL deck's time go?

The shipped deck (prm/llnl_slab_test.prm at benchmark resolution N=2^12,
S_2, 124 groups) measured only 2.1-2.3 G updates/s in round 2 vs 56 G at
the headline shape — VERDICT r2 asks for a decomposition. This script
times the pallas engine across (block, K) choices, the fast XLA engine,
and a launch-count sweep at fixed work to separate visit latency from
per-element compute.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from radiative_transfer_tpu import load_config
from radiative_transfer_tpu.models import transport

_C = 299.79245800


def llnl_cfg(N=1 << 12, steps=16, courant=0.4):
    deck = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "prm", "llnl_slab_test.prm")
    cfg0 = load_config(deck)
    return load_config(deck, N=N, max_timesteps=steps,
                       dt=courant * (cfg0.X / N) / _C)


def time_best(run, state, repeats=5):
    out = jax.block_until_ready(run(state))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(out))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_pallas(cfg, block=None, K=None, scan_tol=1e-10, label=""):
    from radiative_transfer_tpu.ops.pallas_sweep import PallasEngine

    tables, _, _ = transport.build_tables(cfg, dtype=jnp.float32)
    eng = PallasEngine(cfg, tables, block=block, scan_tol=scan_tol)
    steps = cfg.max_timesteps
    K = K or min(eng.max_steps_per_launch(), steps)
    while steps % K:
        K //= 2
    state = eng.init_state()

    @jax.jit
    def run(s):
        return lax.fori_loop(0, steps // K, lambda _, x: eng.multi_step(x, K), s)

    best = time_best(run, state)
    ups = 4 * cfg.M * cfg.G * cfg.N * steps / best
    print(json.dumps({
        "engine": f"pallas{label}", "block": eng.block, "K": K,
        "nblocks": eng.nblocks, "npass": eng.scan_npass,
        "launches": steps // K, "visits": steps // K * 2 * eng.nblocks,
        "best_s": best, "G_updates_per_s": ups / 1e9,
    }), flush=True)
    return ups


def bench_fast(cfg, chunk=256, dtype=jnp.float32):
    from radiative_transfer_tpu.ops.fast_sweep import FastEngine

    tables, _, _ = transport.build_tables(cfg, dtype=dtype)
    eng = FastEngine(cfg, tables, dtype=dtype, chunk=min(chunk, cfg.N))
    steps = cfg.max_timesteps
    state = eng.init_state()

    @jax.jit
    def run(s):
        return lax.fori_loop(0, steps, lambda _, x: eng.step(x), s)

    best = time_best(run, state)
    ups = 4 * cfg.M * cfg.G * cfg.N * steps / best
    print(json.dumps({
        "engine": "fast", "dtype": str(dtype.__name__), "chunk": chunk,
        "best_s": best, "G_updates_per_s": ups / 1e9,
    }), flush=True)
    return ups


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "base"
    cfg = llnl_cfg()
    print(f"# LLNL deck: M={cfg.M} G={cfg.G} N={cfg.N} steps="
          f"{cfg.max_timesteps} Bh={cfg.M // 2 * cfg.G} which={which}",
          flush=True)
    variants = {
        "base": [lambda: bench_pallas(cfg),
                 lambda: bench_fast(cfg, 256)],
        "blocks": [lambda: bench_pallas(cfg, block=4096, K=4,
                                        label="[whole,K4]"),
                   lambda: bench_pallas(cfg, block=4096, K=8,
                                        label="[whole,K8]"),
                   lambda: bench_pallas(cfg, block=2048, K=4,
                                        label="[b2048,K4]")],
        "k": [lambda: bench_pallas(cfg, block=1024, K=8, label="[b1024,K8]"),
              lambda: bench_pallas(cfg, block=1024, K=16,
                                   label="[b1024,K16]")],
        "steps64": [lambda: bench_pallas(llnl_cfg(steps=64),
                                         label="[steps64]"),
                    lambda: bench_fast(llnl_cfg(steps=64), 256)],
    }
    for fn in variants[which]:
        try:
            fn()
        except Exception as e:
            print(json.dumps({"error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
