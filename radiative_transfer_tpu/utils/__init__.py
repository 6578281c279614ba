"""Host-side runtime utilities: IO, checkpointing, diagnostics,
profiling, numeric guards."""

from . import checkpoint, debug, diagnostics, io, profiling  # noqa: F401
