"""On-device (real TPU) test harness.

Unlike tests/ (which forces a virtual 8-device CPU mesh so the numerics
and sharding logic are covered everywhere), this suite runs the Pallas
kernels through the REAL Mosaic compiler on an attached TPU. CPU
interpret mode cannot catch lowering/legalisation bugs — e.g. the
bare-BlockSpec default index map that traced i64 coordinates and broke
`func.return` legalisation on hardware while every interpreted test
passed (parallel/halo_pallas.py reset_spec). Run with:

    python -m pytest tests_tpu/ -q

The whole suite skips cleanly when no TPU platform is attached.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if not _on_tpu():
        skip = pytest.mark.skip(reason="no TPU attached (CPU-only backend)")
        for item in items:
            item.add_marker(skip)
