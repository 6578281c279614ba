"""Numerical kernels: quadrature, group grids, Planck integrals,
correction sources, and the sweep engines (general scan / fast XLA /
Pallas)."""

from . import correction, fast_sweep, groups, planck, quadrature, scan, sweep  # noqa: F401,E501
