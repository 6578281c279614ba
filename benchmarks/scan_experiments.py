"""Microbenchmarks for the in-block prefix-scan design space (VERDICT #2).

The fused Pallas sweep kernel spends ~60% of its time in the in-register
Hillis-Steele prefix scan (docs/PERFORMANCE.md "Where the time goes").
Round-1's verdict proposed moving that work to the MXU as a blocked
lower-triangular Toeplitz matmul (L[t,s] = a^{t-s}) + cross-chunk fixup.
This script measures, on the real chip, the primitives that decide it:

  hs        the current scan: log2(blk) roll+select+fma full-width passes
  hs-wd     scan with precomputed (mask * a^d) planes: roll+mul+add
  hs-last7  only the passes at stride >= 32 (what remains if a matmul
            replaces the first 5 passes)
  mxu       the replacement matmul: per-row (nch, 128) @ (128, 128) dots,
            f32 accumulate, at several precisions
  reshape   feasibility probe: (Bh, blk) -> (Bh, nch, 128) inside a kernel

Decision rule: the matmul route wins iff
    t(mxu) + t(hs-last7) < t(hs).
Per-element useful work: hs does ~4*log2(blk) VPU ops; the matmul does 128
padded MACs (the 128-lane contraction is fixed regardless of chunk width),
so on paper MXU wins only if its f32 MAC rate is >~3x the VPU flop rate.

Usage: python benchmarks/scan_experiments.py [--bh 16] [--blk 4096] [--reps 50]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


# -- Hillis-Steele variants --------------------------------------------------

def hs_kernel(b_ref, a_ref, o_ref, *, blk, inner):
    b, a = b_ref[...], a_ref[...]
    col = lax.broadcasted_iota(jnp.int32, b.shape, 1)
    pref = b
    for _ in range(inner):
        apow = a
        d = 1
        while d < blk:
            rolled = pltpu.roll(pref, jnp.int32(d), axis=1)
            shifted = jnp.where(col < d, 0.0, rolled)
            pref = pref + apow * shifted
            apow = apow * apow
            d *= 2
    o_ref[...] = pref


def hs_tail_kernel(b_ref, a_ref, o_ref, *, blk, inner, start):
    """Only the passes at stride >= `start` (the post-matmul remainder)."""
    b, a = b_ref[...], a_ref[...]
    col = lax.broadcasted_iota(jnp.int32, b.shape, 1)
    pref = b
    for _ in range(inner):
        apow = a
        d = start
        while d < blk:
            rolled = pltpu.roll(pref, jnp.int32(d), axis=1)
            shifted = jnp.where(col < d, 0.0, rolled)
            pref = pref + apow * shifted
            apow = apow * apow
            d *= 2
    o_ref[...] = pref


def hs_wd_kernel(b_ref, wd_ref, o_ref, *, blk, inner):
    """Masked multiplier planes precomputed: W_d = where(col<d, 0, a^d).
    Per pass: roll, mul, add (no iota compare / select)."""
    b = b_ref[...]
    pref = b
    npass = int(np.log2(blk))
    for _ in range(inner):
        for k in range(npass):
            rolled = pltpu.roll(pref, jnp.int32(1 << k), axis=1)
            pref = pref + wd_ref[k] * rolled
    o_ref[...] = pref


# -- MXU probe ---------------------------------------------------------------

def mxu_kernel(x_ref, l_ref, o_ref, *, bh, inner, precision):
    acc = jnp.zeros_like(x_ref[0])
    for _ in range(inner):
        for r in range(bh):
            acc = acc + jax.lax.dot(
                x_ref[r], l_ref[...],
                preferred_element_type=jnp.float32,
                precision=precision,
            )
    o_ref[...] = acc


def reshape_kernel(x_ref, o_ref, *, bh, nch):
    x = x_ref[...]
    y = x.reshape(bh, nch, 128)
    o_ref[...] = y.sum(axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bh", type=int, default=16)
    ap.add_argument("--blk", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--inner", type=int, default=8,
                    help="kernel-internal repetitions (amortise launch)")
    args = ap.parse_args()
    bh, blk, inner = args.bh, args.blk, args.inner
    nch = blk // 128
    npass = int(np.log2(blk))
    interp = jax.devices()[0].platform == "cpu"

    key = jax.random.PRNGKey(0)
    b = jax.random.uniform(key, (bh, blk), jnp.float32)
    a = jnp.full((bh, 1), 0.9, jnp.float32)

    # masked multiplier planes for hs-wd
    col = np.arange(blk)[None, :]
    wd = np.stack([
        np.where(col < (1 << k), 0.0, 0.9 ** (1 << k)) *
        np.ones((bh, 1))
        for k in range(npass)
    ]).astype(np.float32)
    wd = jnp.asarray(wd)

    def call(kernel, out_shape, *ins, **kw):
        f = pl.pallas_call(
            functools.partial(kernel, **kw),
            out_shape=out_shape,
            interpret=interp,
        )
        return jax.jit(f), ins

    plane = jax.ShapeDtypeStruct((bh, blk), jnp.float32)
    results = {}

    f, ins = call(hs_kernel, plane, b, a, blk=blk, inner=inner)
    t = timeit(f, *ins, reps=args.reps)
    results["hs"] = t
    print(f"hs        (x{inner}): {t*1e6:9.1f} us  "
          f"({bh*blk*inner*npass/t/1e9:7.1f} G elem-pass/s)")

    f, ins = call(hs_wd_kernel, plane, b, wd, blk=blk, inner=inner)
    t = timeit(f, *ins, reps=args.reps)
    results["hs_wd"] = t
    print(f"hs-wd     (x{inner}): {t*1e6:9.1f} us  "
          f"({bh*blk*inner*npass/t/1e9:7.1f} G elem-pass/s)")

    f, ins = call(hs_tail_kernel, plane, b, a, blk=blk, inner=inner, start=32)
    t = timeit(f, *ins, reps=args.reps)
    results["hs_tail32"] = t
    print(f"hs-last{npass-5} (x{inner}): {t*1e6:9.1f} us")

    x = jax.random.uniform(key, (bh, nch, 128), jnp.float32)
    L = jax.random.uniform(key, (128, 128), jnp.float32)
    out_mm = jax.ShapeDtypeStruct((nch, 128), jnp.float32)
    for prec in ("default", "high", "highest"):
        f, ins = call(mxu_kernel, out_mm, x, L, bh=bh, inner=inner,
                      precision=prec)
        try:
            t = timeit(f, *ins, reps=args.reps)
        except Exception as e:  # noqa: BLE001
            print(f"mxu-{prec:8s}: FAILED ({type(e).__name__})")
            continue
        results[f"mxu_{prec}"] = t
        macs = bh * nch * 128 * 128 * inner
        print(f"mxu-{prec:8s} (x{inner}): {t*1e6:9.1f} us  "
              f"({macs/t/1e12:7.2f} T MAC/s)")

    try:
        f, ins = call(reshape_kernel, jax.ShapeDtypeStruct((bh, 128),
                                                           jnp.float32),
                      b, bh=bh, nch=nch)
        jax.block_until_ready(f(*ins))
        print("reshape (Bh,blk)->(Bh,nch,128): OK")
    except Exception as e:  # noqa: BLE001
        print(f"reshape (Bh,blk)->(Bh,nch,128): FAILED "
              f"({type(e).__name__}: {str(e)[:120]})")

    if "mxu_high" in results:
        lhs = results["mxu_high"] + results["hs_tail32"]
        print(f"\nmatmul route total {lhs*1e6:.1f} us vs hs {results['hs']*1e6:.1f} us "
              f"-> {'WIN' if lhs < results['hs'] else 'LOSS'} "
              f"({results['hs']/lhs:.2f}x)")


if __name__ == "__main__":
    main()


# -- appended variants (round 2 follow-up) -----------------------------------

def hs_mask_kernel(b_ref, a_ref, m_ref, o_ref, *, blk, inner):
    """Shared 0/1 mask planes (npass, 1, blk) + per-row apow scalars.
    Per pass: roll, mul(mask bcast), mul(apow), add."""
    b, a = b_ref[...], a_ref[...]
    pref = b
    npass = int(np.log2(blk))
    for _ in range(inner):
        apow = a
        for k in range(npass):
            rolled = pltpu.roll(pref, jnp.int32(1 << k), axis=1)
            pref = pref + apow * (m_ref[k] * rolled)
            apow = apow * apow
    o_ref[...] = pref


def hs_maskmul_kernel(b_ref, a_ref, m_ref, o_ref, *, blk, inner):
    """Same, but (apow * m_ref[k]) first (outer-product order)."""
    b, a = b_ref[...], a_ref[...]
    pref = b
    npass = int(np.log2(blk))
    for _ in range(inner):
        apow = a
        for k in range(npass):
            rolled = pltpu.roll(pref, jnp.int32(1 << k), axis=1)
            pref = pref + (apow * m_ref[k]) * rolled
            apow = apow * apow
    o_ref[...] = pref


def variants_main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bh", type=int, default=16)
    ap.add_argument("--blk", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--inner", type=int, default=8)
    args = ap.parse_args()
    bh, blk, inner = args.bh, args.blk, args.inner
    npass = int(np.log2(blk))
    interp = jax.devices()[0].platform == "cpu"

    key = jax.random.PRNGKey(0)
    b = jax.random.uniform(key, (bh, blk), jnp.float32)
    a = jnp.full((bh, 1), 0.9, jnp.float32)
    col = np.arange(blk)[None, None, :]
    m = jnp.asarray((col >= (1 << np.arange(npass))[:, None, None])
                    .astype(np.float32))          # (npass, 1, blk)

    plane = jax.ShapeDtypeStruct((bh, blk), jnp.float32)

    for name, kern, ins in [
        ("hs-mask", hs_mask_kernel, (b, a, m)),
        ("hs-maskmul", hs_maskmul_kernel, (b, a, m)),
    ]:
        f = jax.jit(pl.pallas_call(
            functools.partial(kern, blk=blk, inner=inner),
            out_shape=plane, interpret=interp))
        try:
            t = timeit(f, *ins, reps=args.reps)
            print(f"{name:10s} (x{inner}): {t*1e6:9.1f} us  "
                  f"({bh*blk*inner*npass/t/1e9:7.1f} G elem-pass/s)")
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s}: FAILED ({type(e).__name__}: {str(e)[:100]})")
