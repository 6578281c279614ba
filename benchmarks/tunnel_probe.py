#!/usr/bin/env python
"""Characterise the axon tunnel's dispatch behavior (the measured basis
for benchmarks/timing.py — run this to re-verify on a new image).

Three phases, one process:

1. CLEAN mode (no device->host read has happened yet): dispatch is
   fire-and-forget — block_until_ready returns in ~0.1 ms regardless of
   the computation's size. Evidence: a 16x and a 16Kx bigger fori_loop
   "complete" in the same wall time.
2. The first D2H read (here: one scalar) permanently flips the process
   into SYNC mode.
3. SYNC mode: block_until_ready is real, but every dispatch carries a
   fixed ~24-33 ms round trip. Evidence: trivial-kernel dispatch jumps
   from ~0.1 ms to ~25 ms and a launch-count sweep extrapolates to the
   same intercept.

Implications (encoded in timing.py and the engine design):
* benchmarks must drain once after warm-up, then time LONG runs;
* setup code must never read device values (or capture device arrays in
  jit closures — lowering fetches them), or every later dispatch of the
  process pays the penalty. All engine constants are therefore host
  numpy (models/transport.Tables).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _t(fn, *args):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) * 1e3


def main():
    x = jax.device_put(np.zeros((2, 124, 4096), np.float32))

    @jax.jit
    def trivial(a):
        return a + 1.0

    def loop(n):
        @jax.jit
        def f(a):
            return lax.fori_loop(0, n, lambda _, v: v * 0.9999 + 1e-7, a)
        return f

    small, big = loop(16), loop(1 << 18)
    for f in (trivial, small, big):
        f(x)  # compile

    print("# phase 1: CLEAN mode (no D2H yet) — block_until_ready lies")
    print(f"trivial: {min(_t(trivial, x) for _ in range(4)):8.2f} ms")
    print(f"loop 16: {min(_t(small, x) for _ in range(4)):8.2f} ms")
    print(f"loop 262144: {min(_t(big, x) for _ in range(4)):8.2f} ms "
          "(same as loop 16 => dispatch did not wait)")

    print("# phase 2: one scalar D2H (the poison)")
    float(jnp.ravel(trivial(x))[0])

    print("# phase 3: SYNC mode — real waits + fixed per-dispatch cost")
    print(f"trivial: {min(_t(trivial, x) for _ in range(4)):8.2f} ms "
          "(the fixed round-trip)")
    t16 = min(_t(small, x) for _ in range(4))
    tbig = min(_t(big, x) for _ in range(4))
    print(f"loop 16: {t16:8.2f} ms")
    print(f"loop 262144: {tbig:8.2f} ms (now scales with work)")


if __name__ == "__main__":
    main()
