#!/usr/bin/env python
"""(block, K) frontier sweep for the DOUBLE-FLOAT Pallas engine
(VERDICT r4 #2: the df engine was tuned for the headline shape only —
off-headline suite rows sat at 18-24% of their f32 siblings while the
measured df arithmetic cost predicts ~37%). Honest timing protocol
(benchmarks/timing.py). Results feed ops/df_sweep.select_block /
DFPallasEngine.max_steps_per_launch.

Usage: python benchmarks/df_tune.py [out.json] [case ...]
  case filters (e.g. gray_s8 mg128_s4) restrict the sweep; the
  DF_TUNE_KS env var (comma list, default 1,2,4,8) restricts the
  fusion depths — both exist so a sweep fits a hardware-time budget.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax import lax

from timing import time_best

from radiative_transfer_tpu.models import transport
from suite import _llnl_cfg_at, _mk_cfg


def bench_df(cfg, block, K):
    from radiative_transfer_tpu.ops.df_sweep import DFPallasEngine

    tables, _, _ = transport.build_tables(cfg, dtype=jnp.float32)
    eng = DFPallasEngine(cfg, tables, block=block)
    steps = cfg.max_timesteps
    while steps % K:
        K //= 2

    @jax.jit
    def run(s):
        return lax.fori_loop(0, steps // K,
                             lambda _, x: eng.multi_step(x, K), s)

    best, _ = time_best(run, eng.init_state())
    # Return the EFFECTIVE (block, K) so the emitted frontier rows can
    # never mislabel a silently-reduced point.
    return 4 * cfg.M * cfg.G * cfg.N * steps / best, eng.block, K


# (name, cfg, candidate blocks) — steps sized to ~1s+ runs at df rates.
def cases():
    yield ("headline_s32", _mk_cfg(32, 1, 1 << 20, 256),
           (2048, 4096, 8192, 16384))
    yield ("gray_s8", _mk_cfg(8, 1, 1 << 18, 512),
           (4096, 8192, 16384, 32768, 65536))
    yield ("mg16_s8", _mk_cfg(8, 16, 1 << 16, 512, use_correction=True),
           (512, 1024, 2048))
    yield ("mg128_s4", _mk_cfg(4, 128, 1 << 13, 2048),
           (512, 1024))
    yield ("llnl_124g", _llnl_cfg_at(1 << 12, 2048),
           (512,))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    only = set(sys.argv[2:])
    ks = tuple(int(k) for k in
               os.environ.get("DF_TUNE_KS", "1,2,4,8").split(","))
    rows = []
    for name, cfg, blocks in cases():
        if only and name not in only:
            continue
        Bh = (cfg.M // 2) * cfg.G
        for block in blocks:
            for K in ks:
                if Bh * block > (1 << 18):
                    continue  # far past any plausible VMEM frontier
                try:
                    ups, blk_eff, k_eff = bench_df(cfg, block, K)
                except Exception as e:  # noqa: BLE001 - Mosaic refusals
                    print(json.dumps({"case": name, "block": block,
                                      "K": K, "error": str(e)[:200]}),
                          flush=True)
                    continue
                rec = {"case": name, "Bh": Bh, "block": blk_eff,
                       "K": k_eff, "updates_per_s": ups}
                rows.append(rec)
                print(json.dumps(rec), flush=True)
                if out_path:  # append as we go: partial sweeps survive
                    with open(out_path, "a") as f:
                        f.write(json.dumps(rec) + "\n")
    best = {}
    for r in rows:
        if r["case"] not in best or r["updates_per_s"] > \
                best[r["case"]]["updates_per_s"]:
            best[r["case"]] = r
    print("\nbest per case:")
    for name, r in best.items():
        print(f"  {name:>14}: block={r['block']:>6} K={r['K']} "
              f"{r['updates_per_s'] / 1e9:6.2f} G")


if __name__ == "__main__":
    main()
