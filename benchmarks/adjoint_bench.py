#!/usr/bin/env python
"""Grad-step cost vs the production fused forward (VERDICT r4 #3 bar:
one grad step <= 3x the K=4-fused forward; round 4 measured 3.7x with
the K=1 diff kernels).

Times three programs on the same shape under the honest tunnel
protocol (benchmarks/timing.py), marginal over a steps-long scan so the
fixed dispatch sync amortises:

  fwd(K)    — the production PallasEngine multi_step at the engine's K
  grad(K=1) — value_and_grad through the K=1 diff kernels
  grad(K)   — value_and_grad through the K-fused diff kernels
              (DiffPallasStepK, the round-5 default)

Usage: python benchmarks/adjoint_bench.py [out.json]
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

from radiative_transfer_tpu.models import transport
from radiative_transfer_tpu.ops import pallas_adjoint as pa
from radiative_transfer_tpu.ops import pallas_sweep as ps
from suite import _mk_cfg


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    M, N = (32, 1 << 17) if on_tpu else (4, 1 << 10)
    steps = 96 if on_tpu else 8
    cfg = _mk_cfg(M, 1, N, steps)
    tables, _, _ = transport.build_tables(cfg, dtype=jnp.float32)

    eng = ps.PallasEngine(cfg, tables)
    K = min(eng.max_steps_per_launch(), 4)
    while steps % K:
        K //= 2

    @jax.jit
    def fwd(s):
        return lax.fori_loop(0, steps // K,
                             lambda _, x: eng.multi_step(x, K), s)

    t_fwd, _ = time_best(fwd, eng.init_state())

    params = {"kappa": jnp.asarray([cfg.kappa_grey], jnp.float64)}
    rows = {"M": M, "N": N, "steps": steps, "K": K,
            "fwd_seconds": t_fwd,
            "fwd_updates_per_s": 4 * M * N * steps / t_fwd}
    for label, k in (("grad_k1", 1), ("grad_kfused", K)):
        solve = pa.make_diff_solve_pallas(cfg, tables, num_steps=steps,
                                          steps_per_launch=k,
                                          remat_group=1_000_000)
        grad = jax.jit(jax.grad(
            lambda p: jnp.sum(solve(p, None).ends ** 2) * 1e-3))

        def run(p):
            g = grad(p)
            return {"kappa": p["kappa"] - 0.0 * g["kappa"]}

        t, _ = time_best(run, params)
        rows[label + "_seconds"] = t
        rows[label + "_vs_fwd"] = t / t_fwd
    print(json.dumps(rows, indent=1))
    if len(sys.argv) > 1:
        json.dump(rows, open(sys.argv[1], "w"), indent=1)


if __name__ == "__main__":
    main()
