#!/usr/bin/env python
"""Example 7: reference-grade precision at kernel rate.

The C++ reference computes everything in `double` and accepts results
at 1e-6 absolute tolerances; TPUs have no f64 vector datapath. This
example runs the same gray transient three ways and reports drift
against the f64 ground truth plus relative runtime:

  * the f64 XLA fast engine       (exact, the old precision path)
  * the f32 Pallas kernel         (fast, ~1e-6 drift)
  * the double-float Pallas kernel (`--engine df`): f64-GRADE results
    from the same f32 hardware via in-kernel iterative refinement
    (ops/df_sweep.py) — drift ~1e-12, ~8x the f64 engine's speed.

Then it differentiates the solve at kernel rate: fit_params with
solver='pallas' recovers a perturbed opacity through the analytic
reverse kernel (ops/pallas_adjoint.py).

Run on a TPU for the quoted speeds; everything also runs (slowly,
interpret mode) on CPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import radiative_transfer_tpu as rt


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from radiative_transfer_tpu.models import transport
    from radiative_transfer_tpu.ops.df_sweep import DFPallasEngine
    from radiative_transfer_tpu.ops.fast_sweep import FastEngine
    from radiative_transfer_tpu.ops.pallas_sweep import PallasEngine

    deck = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "prm", "single_group.prm")
    on_tpu = jax.devices()[0].platform != "cpu"
    N = 1 << 14 if on_tpu else 256
    steps = 400 if on_tpu else 40
    cfg = rt.load_config(deck, M=8, N=N, X=N * 0.01, max_timesteps=steps)
    tables, _, _ = transport.build_tables(cfg)

    def timed(build, run):
        eng = build()
        st = run(eng)                        # compile + warm
        leaf = jax.tree_util.tree_leaves(st)[0]
        float(jnp.max(jnp.abs(leaf)))        # D2H drain: the axon tunnel
        # is fire-and-forget before the first device->host read
        # (benchmarks/timing.py protocol; docs/PERFORMANCE.md).
        t0 = time.perf_counter()
        st = run(eng)
        jax.block_until_ready(st)
        return eng, st, time.perf_counter() - t0

    # 1. f64 ground truth (XLA fast engine).
    def run64(eng):
        return eng.solve(num_steps=steps)

    fe, st64, t64 = timed(
        lambda: FastEngine(cfg, tables, dtype=jnp.float64), run64)
    ref = np.asarray(fe.ends(st64))
    scale = np.abs(ref).max()
    print(f"f64 XLA engine : {t64 * 1e3:7.1f} ms   (ground truth)")

    # 2. f32 Pallas kernel.
    pe, stf, tf = timed(lambda: PallasEngine(cfg, tables), run64)
    drift_f = np.abs(np.asarray(pe.ends(stf)) - ref).max() / scale
    print(f"f32 kernel     : {tf * 1e3:7.1f} ms   drift {drift_f:.2e}")

    # 3. double-float kernel: f64-grade at kernel rate.
    de, std, td = timed(lambda: DFPallasEngine(cfg, tables), run64)
    drift_d = np.abs(np.asarray(de.ends(std)) - ref).max() / scale
    print(f"double-float   : {td * 1e3:7.1f} ms   drift {drift_d:.2e}"
          f"   ({t64 / td:.1f}x the f64 engine)")

    # 3b. Reference precision AT SCALE (round 5): the double-float HALO
    # mesh engine shards the same f64-grade solve over every available
    # device — shard-owned cells are bit-exact vs the single-chip df
    # kernel (parallel/df_halo.py).
    from radiative_transfer_tpu.parallel.df_halo import DFHaloEngine, Mesh

    devs = (jax.devices() if cfg.N % len(jax.devices()) == 0
            else jax.devices()[:1])
    mesh = Mesh(np.asarray(devs), ("x",))
    try:
        he, sth, th = timed(lambda: DFHaloEngine(cfg, tables, mesh), run64)
        drift_h = np.abs(np.asarray(he.ends(sth)) - ref).max() / scale
        print(f"df halo mesh-{len(devs)}: {th * 1e3:7.1f} ms   "
              f"drift {drift_h:.2e}   (f64-grade across the mesh)")
    except ValueError as e:
        print(f"df halo: infeasible at this shape ({e})")

    # 4. Kernel-rate gradients: recover a perturbed opacity. The target
    # comes from a plain (non-differentiable) solve at the perturbed
    # kappa — cheap to compile, same physics.
    from radiative_transfer_tpu import adjoint

    cfg_t = cfg.replace(kappa_grey=cfg.kappa_grey * 1.3,
                        max_timesteps=8)
    tab_t, _, _ = transport.build_tables(cfg_t)
    fe_t = FastEngine(cfg_t, tab_t, dtype=jnp.float64)
    target_ends = fe_t.ends(fe_t.solve(num_steps=8))

    def loss(state, params):
        return jnp.mean((state.ends - target_ends) ** 2)

    params, hist = adjoint.fit_params(
        cfg, tables, None, loss,
        {"kappa": jnp.asarray([cfg.kappa_grey])},
        num_steps=8, learning_rate=0.05, iterations=60, solver="pallas")
    kap = float(np.asarray(params["kappa"])[0])
    print(f"inverse opacity (solver='pallas'): recovered kappa = "
          f"{kap:.4f} (target {cfg.kappa_grey * 1.3:.4f}), "
          f"loss {hist[0]:.3e} -> {hist[-1]:.3e}")


if __name__ == "__main__":
    main()
