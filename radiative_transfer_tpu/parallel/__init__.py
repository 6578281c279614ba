"""Multi-chip engines: general (sharded), fast (sharded_fast), Pallas
per-substep exchange (sharded_pallas), and fused-kernel halo overlap
(halo_pallas)."""

from . import distributed, sharded, sharded_fast  # noqa: F401


def make_multichip_engine(cfg, tables, mesh, engine: str = "auto", **kw):
    """Best multi-chip engine for (cfg, mesh): the halo-overlap engine
    (fused K-step kernel per shard) when its truncated-scan creep bound
    admits the workload, else the per-substep-exchange sharded Pallas
    engine. Pass engine='halo'/'pallas' to pin (halo then raises
    ValueError with guidance if infeasible). Both are float32;
    engine='fast' selects the XLA engine (f64-capable, dtype=... kwarg).

    Returns the constructed engine; all engines expose
    init_state/solve/ends/from_ends with identical semantics.
    """
    if engine == "fast":
        return sharded_fast.ShardedFastEngine(cfg, tables, mesh, **kw)
    from . import halo_pallas, sharded_pallas

    if engine == "halo":
        return halo_pallas.HaloPallasEngine(cfg, tables, mesh, **kw)
    if engine == "pallas":
        return sharded_pallas.ShardedPallasEngine(cfg, tables, mesh, **kw)
    if engine != "auto":
        raise ValueError(f"unknown multi-chip engine {engine!r}")
    try:
        return halo_pallas.HaloPallasEngine(cfg, tables, mesh, **kw)
    except ValueError:
        # Drop halo-only kwargs (e.g. steps_per_launch) so the fallback
        # constructor does not die on an unexpected keyword.
        import inspect

        accepted = inspect.signature(
            sharded_pallas.ShardedPallasEngine.__init__).parameters
        kw = {k: v for k, v in kw.items() if k in accepted}
        return sharded_pallas.ShardedPallasEngine(cfg, tables, mesh, **kw)
