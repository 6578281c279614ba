"""Multi-chip engines: general (sharded) and fast (sharded_fast)."""

from . import distributed, sharded, sharded_fast  # noqa: F401
