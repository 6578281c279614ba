"""Batched first-order affine recurrences (the parallelised sweep core).

The reference's spatial sweep is a strictly sequential per-cell loop
carrying one upwind edge value per (direction, group)
(reference: src/solver.cpp:700-811, carried state at 359/397/540/579).
Each cell applies an affine map to the carry:

    carry_j = a_j * carry_{j-1} + b_j

Composition of affine maps is associative, so the whole N-cell chain is
computed in log-depth with `lax.associative_scan`, batched over the
(M, G) axes — this is the TPU-native restructuring of the hot loop.

The scan returns the PREFIX COMPOSITION (pref_a, pref_b) rather than the
carry itself, so that

    carry_j = pref_a_j * init + pref_b_j

can be evaluated for any boundary value `init` after the fact. That form
is exactly what the multi-chip decomposition needs: each shard scans
locally, shards exchange their (M, G)-sized total composites, and every
carry is recovered without re-scanning (see parallel/sharded.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _combine(left, right):
    """Compose affine maps: (apply left, then right)."""
    a_l, b_l = left
    a_r, b_r = right
    return a_r * a_l, a_r * b_l + b_r


def affine_scan(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inclusive prefix composition of x -> a*x + b along `axis`.

    Returns (pref_a, pref_b) with pref_j = f_j ∘ ... ∘ f_0.
    """
    return lax.associative_scan(_combine, (a, b), axis=axis)


def affine_scan_sequential(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference implementation via lax.scan over the last axis (sequential,
    used in tests to validate the associative version)."""
    a_t = jnp.moveaxis(a, -1, 0)
    b_t = jnp.moveaxis(b, -1, 0)

    def body(carry, ab):
        new = _combine(carry, ab)
        return new, new

    init = (jnp.ones_like(a_t[0]), jnp.zeros_like(b_t[0]))
    _, (pa, pb) = lax.scan(body, init, (a_t, b_t))
    return jnp.moveaxis(pa, 0, -1), jnp.moveaxis(pb, 0, -1)


def apply_prefix(
    pref_a: jnp.ndarray, pref_b: jnp.ndarray, init: jnp.ndarray
) -> jnp.ndarray:
    """carry_j = pref_a_j * init + pref_b_j (init broadcast along the scan axis)."""
    return pref_a * init[..., None] + pref_b
