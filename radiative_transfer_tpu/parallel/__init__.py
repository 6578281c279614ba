"""Multi-chip engines: general (sharded), fast (sharded_fast), Pallas
per-substep exchange (sharded_pallas), and fused-kernel halo overlap
(halo_pallas)."""

from . import distributed, sharded, sharded_fast  # noqa: F401
