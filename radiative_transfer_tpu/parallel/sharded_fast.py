"""Multi-chip spatial decomposition of the FAST (tiled, constant-
coefficient) engine — the production multi-chip path.

parallel/sharded.py shards the readable general engine; this module runs
ops/fast_sweep.py's fused sub-step inside `shard_map` so multi-chip runs
keep the single-chip performance layout. Design (see also
docs/ARCHITECTURE.md §4):

* State planes (chunk, 2, Bh, nc) are sharded along the chunk-column
  axis `nc` — contiguous spatial blocks per device (cell j = i*chunk+t).
* In the sweep-order storage frame the mu<0 half is pre-reversed, so
  BOTH direction halves sweep k -> k+1 across shards: ONE ppermute
  direction carries every halo and the composite exchange is uniform.
* Per sub-step: local two-level scan (ops/fast_sweep.py::local_scan,
  zero inflow) -> `all_gather` of the K per-shard composite affine maps
  (2·K·(M·G) numbers) -> each shard folds its exclusive prefix and the
  GLOBAL total (which yields the reflective mu>0 inflow from the mu<0
  global outflow without extra communication) -> local reconstruction.
* The CN/BDF one-cell-downwind history shift crosses shard boundaries
  at the first local cell: a single `ppermute` of the last-cell
  prev/half edge patches it (shard 0 keeps the zero fill — the true
  boundary contribution is folded into the effective inflow, see
  fast_sweep module doc).

Communication per sub-step: 2 ppermutes (CN) or 3 (BDF) of (2, Bh)
values + 2 all_gathers of (K, 2, Bh) — independent of the local cell
count, riding ICI.

Group-axis sharding is not offered here (the fast layout flattens
(Mh, G) into one batch axis); shard groups with parallel/sharded.py or
run independent group blocks as separate calls.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config.config import Config
from ..ops import fast_sweep as fs


def make_mesh_1d(n_spatial: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_spatial
    return Mesh(np.asarray(devices[:n_spatial]), axis_names=("x",))


class ShardedFastEngine:
    """Drop-in FastEngine running the whole time loop on a 1-D mesh."""

    def __init__(self, cfg: Config, tables, mesh: Mesh,
                 dtype=jnp.float32, chunk: int = 256, unroll: int = 4,
                 spatial_axis: str = "x"):
        self.mesh = mesh
        self.axis = spatial_axis
        self.K = mesh.shape[spatial_axis]
        self.eng = fs.FastEngine(cfg, tables, dtype=dtype, chunk=chunk,
                                 unroll=unroll)
        assert self.eng.nc % self.K == 0, (
            f"chunk columns nc={self.eng.nc} not divisible by "
            f"{self.K} spatial shards (N={cfg.N}, chunk={self.eng.chunk})"
        )
        self.cfg = cfg
        self.plane_spec = P(None, None, None, spatial_axis)
        self.plane_sharding = NamedSharding(mesh, self.plane_spec)
        self._solve_cache: dict = {}

    # -- sharded pieces (run inside shard_map on local blocks) ---------------

    def _shift1(self, x: jnp.ndarray) -> jnp.ndarray:
        """One-cell-downwind shift with cross-shard halo patch."""
        shifted = fs._shift1_tiled(x)
        if self.K == 1:
            return shifted
        halo = lax.ppermute(
            x[-1, :, :, -1], self.axis,
            [(i, i + 1) for i in range(self.K - 1)],
        )  # (2, Bh); shard 0 receives zeros = the folded boundary fill
        return shifted.at[0, :, :, 0].set(halo)

    def _substep(self, kind: int, st: fs.FlatState):
        eng = self.eng
        r0, r1, b = eng.rhs(kind, st, shift1=self._shift1)
        pb, pow_t, EXa, EXb, a_powN, tot_b = eng.local_scan(kind, b)

        if self.K == 1:
            incoming = eng.inflow(kind, a_powN, tot_b)
            return eng.finish(kind, r0, r1, pb, pow_t, EXa, EXb, incoming)

        # Composite exchange: shard order IS sweep order for both halves
        # (the mu<0 half is stored pre-reversed).
        gA = lax.all_gather(a_powN[..., 0], self.axis)   # (K, 2, Bh)
        gB = lax.all_gather(tot_b[..., 0], self.axis)
        k = lax.axis_index(self.axis)

        accA = jnp.ones_like(gA[0])
        accB = jnp.zeros_like(gB[0])
        exclA = jnp.ones_like(gA[0])
        exclB = jnp.zeros_like(gB[0])
        for i in range(self.K):
            exclA = jnp.where(k == i, accA, exclA)
            exclB = jnp.where(k == i, accB, exclB)
            accA, accB = gA[i] * accA, gA[i] * accB + gB[i]
        # accA/accB now hold the GLOBAL total composite.

        inflow = eng.inflow(kind, accA[..., None], accB[..., None])
        incoming = exclA[..., None] * inflow + exclB[..., None]
        return eng.finish(kind, r0, r1, pb, pow_t, EXa, EXb, incoming)

    def _step(self, st: fs.FlatState) -> fs.FlatState:
        cfg = self.cfg
        if cfg.ts_method == 1:
            ne0, ne1 = self._substep(fs.BE, st)
            return fs.FlatState(ne0, ne1, st.e0, st.e1, st.h0, st.h1)
        if cfg.ts_method == 2:
            s1 = fs.FlatState(st.e0, st.e1, st.e0, st.e1, st.h0, st.h1)
            ne0, ne1 = self._substep(fs.CN, s1)
            return fs.FlatState(ne0, ne1, st.e0, st.e1, st.h0, st.h1)
        # BDF2 4-phase cycle.
        p0, p1 = st.e0, st.e1
        s1 = fs.FlatState(st.e0, st.e1, p0, p1, st.h0, st.h1)
        b0, b1 = self._substep(fs.BE, s1)
        s2 = fs.FlatState(b0, b1, p0, p1, st.h0, st.h1)
        e0, e1 = self._substep(fs.CN, s2)
        # mu>0 half snapshot = phase-0 BE output (reference quirk,
        # solver.cpp:733 vs 784-787; see ops/fast_sweep.py).
        h0 = jnp.concatenate([e0[:, :1], b0[:, 1:]], axis=1)
        h1 = jnp.concatenate([e1[:, :1], b1[:, 1:]], axis=1)
        s3 = fs.FlatState(e0, e1, p0, p1, h0, h1)
        e0, e1 = self._substep(fs.BE, s3)
        s4 = fs.FlatState(e0, e1, p0, p1, h0, h1)
        e0, e1 = self._substep(fs.BDF, s4)
        return fs.FlatState(e0, e1, p0, p1, h0, h1)

    # -- public API ----------------------------------------------------------

    def init_state(self) -> fs.FlatState:
        st = self.eng.init_state()
        put = functools.partial(jax.device_put, device=self.plane_sharding)
        return jax.tree_util.tree_map(put, st)

    def ends(self, st: fs.FlatState) -> jnp.ndarray:
        return self.eng.ends(st)

    def from_ends(self, ends, prev, half) -> fs.FlatState:
        st = self.eng.from_ends(ends, prev, half)
        put = functools.partial(jax.device_put, device=self.plane_sharding)
        return jax.tree_util.tree_map(put, st)

    def solve(self, state: Optional[fs.FlatState] = None,
              num_steps: Optional[int] = None) -> fs.FlatState:
        """Run the whole time loop in ONE shard_map region (no per-step
        dispatch or resharding)."""
        n = self.cfg.max_timesteps if num_steps is None else num_steps
        if state is None:
            state = self.init_state()

        run = self._solve_cache.get(n)
        if run is None:
            spec = fs.FlatState(*([self.plane_spec] * 6))

            def run_local(st):
                return lax.fori_loop(0, n, lambda _, s: self._step(s), st)

            run = jax.jit(shard_map(
                run_local, mesh=self.mesh, in_specs=(spec,), out_specs=spec,
            ))
            self._solve_cache[n] = run
        return run(state)
