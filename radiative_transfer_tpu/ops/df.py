"""Double-float (two-float32) building blocks for the extended-precision
Pallas sweep (ops/df_sweep.py).

TPU VPUs have no f64 datapath (Mosaic rejects f64 kernels outright), but
IEEE-f32 error-free transformations hold exactly on the hardware — both
under XLA and inside Pallas kernels (probed on-chip: max two_sum /
Veltkamp-two_prod reconstruction error vs f64 is 0.0). A value is carried
as an unevaluated sum hi + lo with |lo| <= 0.5 ulp(hi), giving ~2^-48
relative precision — comfortably beyond the reference's all-double hot
path requirement (reference: src/solver.cpp:319-587 computes in double;
its acceptance bar is 1e-6 in f64, tests/test_gray.cpp:89).

Everything here is plain jnp on f32 arrays so the same functions run
inside Pallas kernel bodies, under jit, and in interpret mode on CPU.
Host-side packing helpers produce the (hi, lo, split-hi, split-lo)
constant columns the kernels consume.

Op-cost notes (per element): two_sum 6, split 3, captured product ~10
(df_sweep._cap). The df_sweep kernels keep these off the hot path
wherever possible — the design computes *solves* in plain f32 and
spends double-float ops only on the residual of the exact equations
(see ops/df_sweep.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Veltkamp splitter for f32 (p=24): 2^ceil(p/2) + 1.
SPLITTER = np.float32(4097.0)


# ---------------------------------------------------------------------------
# Kernel-safe primitives (f32 arrays in, f32 arrays out)
# ---------------------------------------------------------------------------

def two_sum(a, b):
    """Knuth two-sum: s + e == a + b exactly, s = fl(a+b). 6 flops, no
    magnitude precondition.

    Safe WITHOUT a freeze as long as the caller's a and b are
    themselves single-valued (loaded, frozen products, or prior
    two_sum outputs): the formula contains no multiplies, so FMA
    contraction — the one compiler transform that corrupts EFTs here
    (see make_freeze) — cannot touch it; verified drift-clean against
    the XLA CPU emitter. Do NOT feed it a bare product: freeze it
    first (the sum would contract into an fma and the captured error
    would describe a value that was never computed)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def split(x):
    """Bitmask split: x == h + l exactly with h carrying the top 12
    significant bits and l the bottom 12, so every partial product
    h*h', h*l', l*h', l*l' is EXACT in f32 (12+12 <= 24 mantissa bits).

    Deliberately integer-masked rather than the classic float Veltkamp
    sequence (c = 4097*x; h = c - (c - x)): inside a large fused kernel
    body the compiler may contract `4097*x - x` into an FMA, silently
    destroying the split (observed under the Pallas interpreter's XLA
    CPU compilation; Mosaic kept it intact — but only by luck of its
    fusion heuristics). Bit ops cannot be contracted."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    h = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(bits, jnp.int32(-4096)), jnp.float32)
    return h, x - h


def make_freeze(one, materialize: bool = False):
    """A value 'freeze' that pins a product to its ROUNDED f32 result
    before it enters an error-free transformation.

    Without it, the compiler may contract `p = a*b; s = p + c` into
    `s = fma(a, b, c)` — the sum then uses the UNROUNDED product while
    the capture formula uses the rounded p, silently corrupting every
    captured error term. Root-caused under the Pallas interpreter's
    XLA CPU compilation: the fuser duplicates shared subexpressions
    into several kLoop "multiply_add" fusions and contracts each copy
    independently, so `u = r0 + w*cin` executed as fma(w, cin, r0)
    while the capture formula used the separately-materialised rounded
    product (verified bit-for-bit: the kernel's u == fma(w,cin,r0)).
    No HLO-level defence survives that pipeline — optimization_barrier
    is stripped before CPU fusion, bitcast round-trips are folded by
    the algebraic simplifier, and the fast-math / excess-precision
    flags do not reach the emitter's contraction (all probed).

    The robust freeze is semantic, not structural, built on an OPAQUE
    runtime 1.0 (`one`, a value the compiler cannot constant-fold —
    the engines ride it in the state pytree so it always enters jit as
    a parameter).

    * TPU (materialize=False): x * one. Exact (x*1), and even if the
      neighbouring add contracts to fma(x, one, c) the result is
      round(x*1 + c) = fl(x + c) — the required semantics. One VPU mul
      per site. Mosaic compiles the kernel body once (no cross-fusion
      subexpression duplication), so value-consistency holds; the
      tests_tpu drift pins guard it against compiler changes.
    * interpret/XLA CPU (materialize=True): x / one. The CPU fuser
      DUPLICATES shared subexpressions into sibling kLoop fusions and
      contracts each copy independently, so a frozen value could still
      be computed twice with different roundings (observed: tapping a
      value changed which outputs were wrong). XLA's fusion pass
      treats `divide` as expensive and will not duplicate it — the
      quotient is materialized once and every consumer reads the same
      buffer. x/1.0 is exact under IEEE division (CPU)."""
    if materialize:
        def freeze(x):
            return x / one
    else:
        def freeze(x):
            return x * one

    return freeze


def prod_err(p, xh, xl, yh, yl):
    """Exact error of p = fl(x*y) given the Veltkamp splits of x and y:
    x*y == p + prod_err. (If the compiler contracts xh*yh - p into an
    FMA the result only gets MORE exact.)"""
    return ((xh * yh - p) + xh * yl + xl * yh) + xl * yl


def two_prod(x, y):
    """p + e == x*y exactly. ~17 flops (generic; the kernels use
    df_sweep._cap with precomputed constant splits on the hot path)."""
    xh, xl = split(x)
    yh, yl = split(y)
    p = x * y
    return p, prod_err(p, xh, xl, yh, yl)


class DFConst(NamedTuple):
    """A double-float CONSTANT with its hi-part Veltkamp split
    precomputed (host-side): value == hi + lo, hi == hh + hl exactly."""

    hi: jnp.ndarray
    lo: jnp.ndarray
    hh: jnp.ndarray
    hl: jnp.ndarray


def renorm(hi, delta):
    """Fold an f32 correction into a value: two_sum so hi' + lo' ==
    hi + delta exactly (delta may exceed lo-magnitude when the base
    solution is poor; no precondition)."""
    return two_sum(hi, delta)


# ---------------------------------------------------------------------------
# Host-side packing (numpy, f64 in)
# ---------------------------------------------------------------------------

def np_split(hi: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host Veltkamp split of f32 values (same algorithm, numpy f32)."""
    hi = np.asarray(hi, np.float32)
    c = np.float32(SPLITTER) * hi
    h = (c - (c - hi)).astype(np.float32)
    return h, (hi - h).astype(np.float32)


def np_df(x64: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """f64 -> (hi, lo) f32 pair with hi + lo == x64 to f64 roundoff."""
    x64 = np.asarray(x64, np.float64)
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


