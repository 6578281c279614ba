"""Honest device timing through the axon TPU tunnel.

Measured behavior of the tunnelled backend (2026-08-19, bisected with
trivial kernels — see docs/PERFORMANCE.md "dispatch latency"):

* In a process that has never performed a device->host read, dispatch is
  fire-and-forget: ``jax.block_until_ready`` returns in ~0.1 ms WITHOUT
  waiting for the computation (timing a 1600-step solve and a 16-step
  solve both measure ~0.15 ms). Timings taken in this mode are garbage.
* The FIRST device->host read (np.asarray / float / device_get / jit
  lowering of a captured device array) permanently switches the process
  into a synchronous mode where ``block_until_ready`` is real but every
  dispatch carries a fixed ~24 ms round-trip penalty, independent of the
  computation (a trivial kernel also measures ~24 ms).

Protocol here: warm up (compile), force one tiny scalar D2H to drain the
queue and flip the process into sync mode, then time long runs — the
fixed ~24 ms is amortised by sizing the workload (aim >= ~1 s per timed
call) and is INCLUDED in the reported rate (we do not subtract it).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def drain(out) -> None:
    """Force true completion of everything dispatched so far via one
    scalar D2H read (flips the tunnel into synchronous mode — do this
    AFTER compile/warm-up and BEFORE the first timed call).

    The scalar is a full reduction, not an element slice: a reduction's
    output is replicated across the mesh, so the fetch is legal on every
    process even when the leaf is a multi-host global array (an element
    of a sharded leaf would only be addressable from its owner)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    scalar = jax.jit(lambda x: jnp.sum(jnp.abs(x)))(leaf)
    float(scalar)


def time_best(run, state, repeats: int = 3):
    """(best_seconds, final_out): timed best-of-N of ``run`` chained on
    its own output. Compile + drain happen before the first measurement;
    each timed call includes the tunnel's fixed ~24 ms sync overhead, so
    size the workload to amortise it."""
    out = run(state)
    drain(out)                            # sync mode from here on
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(out))
        best = min(best, time.perf_counter() - t0)
    return best, out
