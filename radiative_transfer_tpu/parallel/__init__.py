"""Multi-chip engines: general (sharded), fast (sharded_fast), Pallas
per-substep exchange (sharded_pallas), fused-kernel halo overlap
(halo_pallas), single-exchange fused cycle (fused_exchange), and the
f64-grade double-float halo overlap (df_halo)."""

from . import distributed, sharded, sharded_fast  # noqa: F401


def _filter_kwargs(ctor, kw):
    """Keep only kwargs `ctor` accepts (selection crosses engines whose
    signatures differ, e.g. steps_per_launch is halo-only)."""
    import inspect

    accepted = inspect.signature(ctor).parameters
    return {k: v for k, v in kw.items() if k in accepted}


def make_multichip_engine(cfg, tables, mesh, engine: str = "auto",
                          platform=None, **kw):
    """Best engine for (cfg, mesh) — must never lose to a sibling:

    * off-TPU (the Pallas kernels would run the INTERPRETER, which its
      own benchmark data shows losing 2-3x to the XLA engine —
      benchmarks/results/suite_virtual.json): the fast XLA engines;
    * mesh of ONE device (or mesh=None): the plain single-chip
      PallasEngine. At mesh 1x1 the collectives degenerate to
      self-copies but their machinery still costs ~20% (measured,
      docs/PERFORMANCE.md mesh-1x1 table: halo 51.0G vs plain 63.6G at
      the headline shape) — EXCEPT at tiny batches (Bh < 8), where the
      packed-rows kernel wins 1.66x;
    * multi-device mesh: the halo-overlap engine (fused K-step kernel
      per shard, one exchange per K steps) when its truncated-scan creep
      bound admits the workload, else the per-substep-exchange sharded
      Pallas engine.

    Pass engine='halo'/'pallas' to pin a mesh engine (halo raises
    ValueError with guidance if infeasible); engine='single' pins the
    plain PallasEngine. Those are float32; engine='fast' selects the
    XLA engine (f64-capable, dtype=... kwarg). `platform` overrides the
    detected backend for the off-TPU rule (tests pin 'tpu' to exercise
    the selection table deterministically on the CPU harness).

    Returns the constructed engine; all engines expose
    init_state/solve/ends/from_ends with identical semantics.
    """
    from ..ops import pallas_sweep

    n_dev = 1 if mesh is None else mesh.size
    if engine == "fast":
        return sharded_fast.ShardedFastEngine(cfg, tables, mesh, **kw)
    if engine == "df":
        # f64-grade selection (shared by cli auto-f64 and the stacked
        # ensembles): the df halo engine on a real mesh; on one device
        # the plain df kernel — EXCEPT at tiny batches (Bh < 8), where
        # the packed-rows df halo at a 1-device mesh runs both
        # direction halves per visit and measures 1.67x faster
        # (10.35 vs 6.2 G at Bh=4: suite_tpu_r5_dfhalo_mesh1.json vs
        # the suite_tpu_r4.json gray_s8 df row) — the df analogue of
        # the f32 packed selection below.
        from ..ops import df_sweep
        from . import df_halo

        if n_dev > 1:
            dkw = _filter_kwargs(df_halo.DFHaloEngine.__init__, kw)
            return df_halo.DFHaloEngine(cfg, tables, mesh, **dkw)
        if (cfg.M // 2) * cfg.G < 8:
            m1 = mesh
            if m1 is None:
                import jax
                import numpy as np

                m1 = df_halo.Mesh(np.asarray(jax.devices()[:1]), ("x",))
            try:
                hkw = _filter_kwargs(df_halo.DFHaloEngine.__init__, kw)
                return df_halo.DFHaloEngine(cfg, tables, m1, **hkw)
            except ValueError:
                pass  # infeasible (creep bound / odd N): plain df kernel
        dkw = _filter_kwargs(df_sweep.DFPallasEngine.__init__, kw)
        return df_sweep.DFPallasEngine(cfg, tables, **dkw)
    if engine == "auto":
        if platform is None:
            import jax

            platform = jax.devices()[0].platform
        if platform == "cpu":
            fkw = _filter_kwargs(
                sharded_fast.ShardedFastEngine.__init__, kw)
            if n_dev == 1:
                from ..ops import fast_sweep

                fkw = _filter_kwargs(fast_sweep.FastEngine.__init__, kw)
                return fast_sweep.FastEngine(cfg, tables, **fkw)
            return sharded_fast.ShardedFastEngine(cfg, tables, mesh, **fkw)
    if engine == "single" or (engine == "auto" and n_dev == 1):
        if engine == "auto" and (cfg.M // 2) * cfg.G < 8:
            # Tiny batches (Bh < 8, e.g. S_2..S_8 gray decks) waste
            # sublanes AND serialise the two direction halves on the
            # plain engine's grid; the packed-rows halo kernel at a
            # 1-device mesh runs both halves per visit and measures
            # 1.66x faster at Bh=4 (49.3 vs 29.7 G, N=2^18 — the
            # crossover sits between Bh=4 and Bh=8, where the plain
            # engine wins 70.0 vs 54.5; docs/PERFORMANCE.md).
            from . import halo_pallas

            m1 = mesh
            if m1 is None:
                import jax
                import numpy as np

                m1 = halo_pallas.Mesh(np.asarray(jax.devices()[:1]), ("x",))
            try:
                hkw = _filter_kwargs(
                    halo_pallas.HaloPallasEngine.__init__, kw)
                return halo_pallas.HaloPallasEngine(cfg, tables, m1, **hkw)
            except ValueError:
                pass  # infeasible (creep bound / odd N): plain engine
        kw = _filter_kwargs(pallas_sweep.PallasEngine.__init__, kw)
        eng = pallas_sweep.PallasEngine(cfg, tables, **kw)
        if eng.nblocks == 1 and eng.Bh * eng.block > (1 << 19):
            # Awkward (odd) N with no power-of-two block falls back to a
            # single whole-N block; beyond ~2^19 f32 elements the fused
            # kernel's ~8 live planes exceed scoped VMEM and Mosaic
            # refuses. The XLA fast engine pads N internally (masked
            # sweep-downstream tail, fast_sweep._pick_chunk) and stays
            # log-depth at any N.
            import jax.numpy as jnp

            from ..ops import fast_sweep

            fkw = _filter_kwargs(fast_sweep.FastEngine.__init__, kw)
            fkw.setdefault("dtype", jnp.float32)
            return fast_sweep.FastEngine(cfg, tables, **fkw)
        return eng
    from . import df_halo, fused_exchange, halo_pallas, sharded_pallas

    if engine == "df_halo":
        # f64-grade mesh engine (double-float halo overlap). Raises
        # ValueError with f64-XLA guidance when the creep bound fails.
        return df_halo.DFHaloEngine(cfg, tables, mesh, **kw)
    if engine == "halo":
        return halo_pallas.HaloPallasEngine(cfg, tables, mesh, **kw)
    if engine == "pallas":
        return sharded_pallas.ShardedPallasEngine(cfg, tables, mesh, **kw)
    if engine == "fused":
        return fused_exchange.FusedExchangeEngine(cfg, tables, mesh, **kw)
    if engine != "auto":
        raise ValueError(f"unknown multi-chip engine {engine!r}")
    try:
        return halo_pallas.HaloPallasEngine(cfg, tables, mesh, **kw)
    except ValueError:
        pass  # infeasible (creep bound / odd N): untruncatable fallbacks
    # Untruncatable BDF2 (the halo creep bound failed — e.g. the
    # reference's shipped LLNL deck at dt=1e-3): the single-exchange
    # fused engine does 1 launch + 1 small all_gather per whole step
    # vs the per-substep engine's 4+4 — the right trade on a real
    # multi-shard mesh, where exchanges cost latency (at mesh-1x1 the
    # self-copy exchanges are free and per-substep can edge it out on
    # compute-bound shapes, but auto never routes K=1 here).
    # Evidence (docs/WEAK_SCALING.md §4): HLO pin of the 1-vs-6
    # collective count (tests/test_fused_exchange.py::
    # test_one_collective_per_step_hlo), the shipped-dt virtual ladder
    # (benchmarks/results/weak_scaling_virtual_llnlshipped_fused.json,
    # comm-eff flat 0.96-1.02), and the ICI/DCN latency model (fused
    # saves 3 all-gathers + 2 ppermutes/step; decisive on DCN,
    # shape-dependent within ~15% on single-host ICI).
    if cfg.ts_method == 3:
        try:
            fkw = _filter_kwargs(
                fused_exchange.FusedExchangeEngine.__init__, kw)
            return fused_exchange.FusedExchangeEngine(
                cfg, tables, mesh, **fkw)
        except ValueError:
            # Same divisibility constraints as the per-substep engine,
            # so this only fires for engine-specific limits; the final
            # fallback raises a clear ValueError for genuinely
            # un-shardable shapes (N % K != 0).
            pass
    # Drop halo-only kwargs (e.g. steps_per_launch) so the fallback
    # constructor does not die on an unexpected keyword.
    kw = _filter_kwargs(sharded_pallas.ShardedPallasEngine.__init__, kw)
    return sharded_pallas.ShardedPallasEngine(cfg, tables, mesh, **kw)
