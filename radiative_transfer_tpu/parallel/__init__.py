"""Multi-chip engines: general (sharded) and fast (sharded_fast)."""

from . import sharded, sharded_fast  # noqa: F401
