"""Multi-chip decomposition of the PALLAS single-pass sweep kernel.

parallel/sharded_fast.py shards the XLA fast engine (~10G f32
updates/s/chip); this module runs the fused Pallas kernel
(ops/pallas_sweep.py, ~3.4x faster per chip) inside `shard_map`, so a
multi-chip run keeps single-chip kernel throughput. The reference has no
parallel decomposition at all (SURVEY §2: serial loop nest,
src/solver.cpp:628-811) — this design comes from the problem structure:

* State planes (2, Bh, N) (flat sweep order, both halves flowing shard
  k -> k+1) shard along N over the spatial mesh axis 'x' and optionally
  along the (Mh*G) batch rows over 'g'.
* Per sub-step, each shard launches the kernel with ZERO half-inflow and
  no reflective coupling. Because the sweep recurrence is affine with
  spatially constant carry multiplier `a` (fast_sweep module doc), the
  shard's true output differs from the zero-inflow output by a closed
  form:   o0(j) += d0 * a^j * inc,   o1(j) += a^{j+1} * inc,
  where inc is the carry entering the shard's first cell and
  d0 = T0*w/det. The per-shard composite map is (A, B) with
  A = a^{N_loc} (a HOST constant — same for every shard) and
  B = o1_zero_inflow(last cell), read off the kernel output.
* ONE all_gather of the (2, Bh_local) B values per sub-step folds the
  global composite chain, yields the reflective mu>0 inflow from the
  global mu<0 outflow (solver.cpp:679-683), and gives every shard its
  inc. The correction is NOT materialised: it rides along as a pending
  (inc, kind) tag and is applied in-register when the NEXT kernel loads
  the planes (ops/pallas_sweep._make_sharded_packed_kernel). Planes only touch
  HBM inside kernel launches.
* The CN/BDF one-cell upwind shift crosses shard boundaries at the first
  local cell: one ppermute of the CORRECTED last-cell edge per history
  plane patches it (shard 0 keeps the zero fill — the true boundary
  contribution is folded into the inflow, fast_sweep module doc).

Communication per sub-step: one (2, Bh_l) all_gather + at most two
(2, Bh_l, 1) ppermutes over 'x' (+ a (Bh,) all_gather over 'g' for
reflective decks) — independent of the local cell count, riding ICI.
HBM traffic per BDF2 step: 21 plane-passes (4 zero-inflow substep
launches) vs ~50+ for the sharded XLA engine; the single-chip fused
kernel's 6 needs cross-phase exchange fusion (future work, see
docs/PERFORMANCE.md).

float32 only (like the single-chip Pallas engine); interpret mode
off-TPU so the CPU test mesh exercises the same code.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config.config import Config
from ..ops import fast_sweep as fs
from ..ops import pallas_sweep as ps
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BE, CN, BDF = fs.BE, fs.CN, fs.BDF

# Pending-correction coefficient columns (per producing sub-step kind):
# [d0, a, ln_a]; the kernel-side packed vector prepends inc.
_CC_COLS = 3


class ZState(NamedTuple):
    """Lazy sweep state: zero-inflow planes + pending inflow corrections.

    Planes are (2, Bh, N) flat sweep order (global view; (2, Bh_l, N_loc)
    inside shard_map). inc_* are (2, Bh, K) globally / (2, Bh_l, 1)
    locally: the carry that entered each shard's first cell when the
    producing sub-step ran — the true planes are reconstructed on load
    (kernel) or export (materialise)."""

    e0: jnp.ndarray
    e1: jnp.ndarray
    p0: jnp.ndarray
    p1: jnp.ndarray
    h0: jnp.ndarray
    h1: jnp.ndarray
    inc_e: jnp.ndarray
    inc_p: jnp.ndarray
    inc_h: jnp.ndarray


def _cc_arrays(kc: fs.KindCoeffs) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cc, A): correction coefficients [d0, a, ln_a] (2, Bh, 3) and the
    shard composite multiplier A = a^{N_loc} — computed later by the
    caller (needs N_loc); here returns the f64 (2, Bh) a and d0."""
    a = np.asarray(kc.a, dtype=np.float64)[0, :, :, 0]          # (2, Bh)
    d0 = (np.asarray(kc.T0, dtype=np.float64)
          * np.asarray(kc.w, dtype=np.float64)
          * np.asarray(kc.inv_det, dtype=np.float64))[0, :, :, 0]
    return d0, a


def _pack_cc(d0: np.ndarray, a: np.ndarray) -> jnp.ndarray:
    """[d0, a, ln_a] planes, f32; ln(a) clamped to >= -80 so the kernel's
    exp(j*ln_a) is NaN-free at j=0 even when a underflows f32 (a < e^-80
    means a^1 is already ~0 relative to anything representable)."""
    with np.errstate(divide="ignore"):
        ln_a = np.maximum(np.log(a), -80.0)
    return np.stack([d0, a, ln_a], axis=-1).astype(np.float32)


class ShardedPallasEngine:
    """Drop-in PallasEngine running the whole time loop on a device mesh."""

    def __init__(self, cfg: Config, tables, mesh: Mesh,
                 block: Optional[int] = None,
                 spatial_axis: str = "x", group_axis: Optional[str] = "g",
                 interpret: Optional[bool] = None,
                 scan_tol: float = 1e-10):
        self.cfg = cfg
        self.tables = tables
        self.scan_tol = scan_tol
        auto_block = block is None
        if auto_block:
            block = 2048
        self.mesh = mesh
        self.axis = spatial_axis
        self.K = mesh.shape[spatial_axis]
        self.gaxis = (
            group_axis
            if group_axis is not None and group_axis in mesh.shape
            and mesh.shape[group_axis] > 1
            else None
        )
        self.NG = mesh.shape[self.gaxis] if self.gaxis else 1

        Mh, G = cfg.M // 2, cfg.G
        self.Bh = Mh * G
        if cfg.N % self.K:
            raise ValueError(
                f"N={cfg.N} does not split evenly over {self.K} spatial "
                "shards")
        self.N_loc = cfg.N // self.K
        if self.Bh % self.NG:
            raise ValueError(
                f"batch rows Bh={self.Bh} not divisible by {self.NG} "
                "group shards")
        self.Bh_l = self.Bh // self.NG

        # Largest power-of-two block <= `block` dividing N_loc, under the
        # fused kernel's VMEM budget (pallas_sweep.PallasEngine); falls
        # back to one block per shard for awkward N_loc.
        blk = 1
        while (blk * 2 <= min(block, self.N_loc)
               and self.N_loc % (blk * 2) == 0):
            blk *= 2
        # VMEM cap in PACKED rows (both halves share the row dim,
        # rows = 2*Bh_l — see _build_call).
        while 2 * self.Bh_l * blk > (1 << 17) and blk > 128:
            blk //= 2
        if blk < min(8, self.N_loc):
            # No useful power-of-two divisor (odd N_loc): one block per
            # shard — the in-register scan handles any width.
            blk = self.N_loc
        if auto_block:
            # Small local batches underfill grid visits (the serial
            # inter-block carry makes per-visit latency the floor): grow
            # toward rows*blk ~ 2^16 full-size visits, as in the
            # single-chip engine (rows = 2*Bh_l, packed halves).
            while (2 * self.Bh_l * blk * 2 <= (1 << 16)
                   and blk < self.N_loc
                   and self.N_loc % (blk * 2) == 0):
                blk *= 2
        self.block = blk
        self.nblocks = self.N_loc // blk

        if interpret is None:
            interpret = jax.devices()[0].platform == "cpu"
        self.interpret = interpret

        # Coefficients / BCs / layout converters from the XLA fast engine
        # (full-size planes; rows shard via the in_specs below).
        self._fe = fs.FastEngine(cfg, tables, dtype=jnp.float32,
                                 chunk=min(256, cfg.N), pad=False)
        self.reflective = self._fe.bc_pos_fixed is None
        if self.reflective:
            self._refl_flip = np.asarray(self._fe.refl_flip)

        self._kind_s = {k: float(kc.s) for k, kc in self._fe.kcs.items()}
        # Accuracy-bounded scan truncation (ops/pallas_sweep._scan_npass).
        self.scan_npass = {
            kind: ps._scan_npass(
                float(np.max(np.asarray(kc.a, dtype=np.float64))),
                self.block, scan_tol)
            for kind, kc in self._fe.kcs.items()
        }
        self._mask_count = max(1, *self.scan_npass.values())
        # Host numpy constants (see models/transport.Tables on the axon
        # D2H dispatch penalty for captured device arrays).
        self.scan_masks = ps._scan_masks(self.block)[:self._mask_count]
        tb = {
            "bc_neg": self._fe.bc_neg,
            "bc_pos": (
                self._fe.bc_pos_fixed
                if self._fe.bc_pos_fixed is not None
                else np.zeros_like(self._fe.bc_neg)
            ),
        }
        cc64 = {}
        for kind, kc in self._fe.kcs.items():
            d0, a = _cc_arrays(kc)
            cc64[kind] = (d0, a)
            tb[f"k{kind}"] = {
                "coef": ps._pack_coeffs(kc),                   # (2, Bh, 10)
                "cc": _pack_cc(d0, a),                         # (2, Bh, 3)
                "A": (a ** self.N_loc).astype(np.float32),  # (2, Bh)
            }
        if cfg.ts_method == 3:
            # Half-snapshot slot: mu<0 rows CN-produced, mu>0 rows
            # BE-produced (reference quirk, solver.cpp:733 vs 784-787)
            # unless the corrected symmetric scheme is on.
            if cfg.bdf2_symmetric_half:
                tb["cc_h"], tb["A_h"] = tb["k2"]["cc"], tb["k2"]["A"]
            else:
                tb["cc_h"] = np.concatenate(
                    [tb["k2"]["cc"][:1], tb["k1"]["cc"][1:]], axis=0)
                tb["A_h"] = np.concatenate(
                    [tb["k2"]["A"][:1], tb["k1"]["A"][1:]], axis=0)
        self._tb = tb

        gax = self.gaxis
        row2 = P(None, gax)          # (2, Bh)
        row3 = P(None, gax, None)    # (2, Bh, cols)
        specs = {"bc_neg": P(gax), "bc_pos": P(gax)}
        for kind in self._fe.kcs:
            specs[f"k{kind}"] = {"coef": row3, "cc": row3, "A": row2}
        if cfg.ts_method == 3:
            specs["cc_h"], specs["A_h"] = row3, row2
        self._tb_specs = specs

        self.plane_spec = P(None, gax, spatial_axis)
        self.inc_spec = P(None, gax, spatial_axis)
        self.state_spec = ZState(*([self.plane_spec] * 6
                                   + [self.inc_spec] * 3))
        self.plane_sharding = NamedSharding(mesh, self.plane_spec)
        self.inc_sharding = NamedSharding(mesh, self.inc_spec)

        self._calls = {k: self._build_call(k) for k in self._fe.kcs}
        self._solve_cache: dict = {}
        self._mat_fn = None

    # -- pallas call builders -------------------------------------------------

    def _build_call(self, kind: int):
        """Packed-kernel launcher: both direction halves ride the row
        (sublane) dimension (rows = 2*Bh_l) on a 1-D grid of nblocks
        visits — halves are independent under zero-inflow, so
        serialising them on the grid (as the single-chip kernel must,
        for the reflective coupling) would only double the sequential
        visit count and waste sublanes at small Bh_l. The (2, Bh_l, X)
        <-> (rows, X) conversions are free leading-dim collapses done
        here, outside the kernel."""
        Bh, blk, nb = self.Bh_l, self.block, self.nblocks
        rows = 2 * Bh
        N = self.N_loc

        plane_spec = pl.BlockSpec(
            (rows, blk), lambda i: (i * 0, i), memory_space=pltpu.VMEM
        )
        coef_spec = pl.BlockSpec(
            (rows, ps._NCOEF), lambda i: (i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )
        corr_spec = pl.BlockSpec(
            (rows, 4), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM
        )
        halo_spec = pl.BlockSpec(
            (rows, 1), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM
        )
        mask_spec = pl.BlockSpec(
            (self._mask_count, 1, blk), lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )

        n_planes = {BE: 2, CN: 3, BDF: 6}[kind]
        in_specs = [coef_spec, mask_spec, corr_spec]
        if kind == CN:
            in_specs += [corr_spec, halo_spec]
        elif kind == BDF:
            in_specs += [corr_spec, corr_spec, halo_spec, halo_spec]
        in_specs += [plane_spec] * n_planes

        kernel = ps._make_sharded_packed_kernel(
            kind, rows=rows, blk=blk, npass=self.scan_npass[kind])
        plane = jax.ShapeDtypeStruct((rows, N), jnp.float32)
        raw = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=(plane_spec, plane_spec),
            out_shape=(plane, plane),
            scratch_shapes=[pltpu.VMEM((rows, 1), jnp.float32)] * 3,
            interpret=self.interpret,
            compiler_params=ps._params(self.interpret),
        )

        def call(coef, masks, *rest):
            packed = [coef.reshape(rows, ps._NCOEF), masks]
            packed += [a.reshape((rows,) + a.shape[2:]) for a in rest]
            z0, z1 = raw(*packed)
            return z0.reshape(2, Bh, N), z1.reshape(2, Bh, N)

        return call

    # -- sharded pieces (inside shard_map, local blocks) ----------------------

    @staticmethod
    def _corr(inc: jnp.ndarray, cc: jnp.ndarray) -> jnp.ndarray:
        """(inc (2,Bh,1), cc (2,Bh,3)) -> packed (2,Bh,4) kernel input."""
        return jnp.concatenate([inc, cc], axis=-1)

    def _halo(self, corrected_last: jnp.ndarray) -> jnp.ndarray:
        """Forward the corrected last-cell edge to the next shard
        ((2, Bh_l, 1)); shard 0 receives zeros (the folded boundary)."""
        if self.K == 1:
            return jnp.zeros_like(corrected_last)
        return lax.ppermute(
            corrected_last, self.axis,
            [(i, i + 1) for i in range(self.K - 1)],
        )

    def _exchange(self, kind: int, tb, totb: jnp.ndarray) -> jnp.ndarray:
        """Fold the per-shard zero-inflow composites into each shard's
        true incoming carry (2, Bh_l, 1). A is uniform across shards (a
        is spatially constant), so only the B values travel."""
        A = tb[f"k{kind}"]["A"]                                   # (2, Bh_l)
        s = self._kind_s[kind]
        if self.K == 1:
            exclA = jnp.ones_like(A)
            exclB = jnp.zeros_like(totb)
            totA, totB = A, totb
        else:
            gB = lax.all_gather(totb, self.axis)            # (K, 2, Bh_l)
            k = lax.axis_index(self.axis)
            accA, accB = jnp.ones_like(A), jnp.zeros_like(totb)
            exclA, exclB = jnp.ones_like(A), jnp.zeros_like(totb)
            for i in range(self.K):
                exclA = jnp.where(k == i, accA, exclA)
                exclB = jnp.where(k == i, accB, exclB)
                accA, accB = A * accA, A * accB + gB[i]
            totA, totB = accA, accB

        init_neg = s * tb["bc_neg"]                         # (Bh_l,)
        if not self.reflective:
            bc_pos = tb["bc_pos"]
        else:
            out_neg = totA[0] * init_neg + totB[0]
            if self.gaxis is not None:
                full = lax.all_gather(out_neg, self.gaxis).reshape(-1)
                flipped = full[self._refl_flip]
                g = lax.axis_index(self.gaxis)
                nloc = out_neg.shape[0]
                bc_pos = lax.dynamic_slice_in_dim(flipped, g * nloc, nloc)
            else:
                bc_pos = out_neg[self._refl_flip]
        inflow = jnp.stack([init_neg, s * bc_pos], axis=0)  # (2, Bh_l)
        return (exclA * inflow + exclB)[..., None]

    def _step(self, st: ZState, tb) -> ZState:
        cfg = self.cfg
        if cfg.ts_method == 1:
            kB = tb["k1"]
            z0, z1 = self._calls[BE](
                kB["coef"], self.scan_masks,
                self._corr(st.inc_e, kB["cc"]), st.e0, st.e1
            )
            inc = self._exchange(BE, tb, z1[:, :, -1])
            return ZState(z0, z1, st.e0, st.e1, st.h0, st.h1,
                          inc, st.inc_e, st.inc_h)
        if cfg.ts_method == 2:
            kC = tb["k2"]
            ce = self._corr(st.inc_e, kC["cc"])
            halo = self._halo(
                st.e1[:, :, -1:] + kC["A"][..., None] * st.inc_e
            )
            z0, z1 = self._calls[CN](
                kC["coef"], self.scan_masks, ce, ce, halo,
                st.e0, st.e1, st.e1
            )
            inc = self._exchange(CN, tb, z1[:, :, -1])
            return ZState(z0, z1, st.e0, st.e1, st.h0, st.h1,
                          inc, st.inc_e, st.inc_h)

        # BDF2 4-phase cycle (solver.cpp:594-598, 620-625, 700-811); prev
        # for every phase = this step's INPUT ends (committed at phase 0).
        kB, kC, kD = tb["k1"], tb["k2"], tb["k3"]
        ce_in = self._corr(st.inc_e, kD["cc"])   # input ends: BDF-produced
        halo_e = self._halo(
            st.e1[:, :, -1:] + kD["A"][..., None] * st.inc_e
        )
        # Phase 0: BE(dt/2) predictor.
        b0, b1 = self._calls[BE](kB["coef"], self.scan_masks, ce_in,
                                 st.e0, st.e1)
        inc0 = self._exchange(BE, tb, b1[:, :, -1])
        # Phase 1: CN(dt/2) corrector; prev = input ends.
        c0, c1 = self._calls[CN](
            kC["coef"], self.scan_masks, self._corr(inc0, kB["cc"]),
            ce_in, halo_e, b0, b1, st.e1,
        )
        inc1 = self._exchange(CN, tb, c1[:, :, -1])
        # Half snapshot: mu<0 = CN output, mu>0 = phase-0 BE output
        # (reference quirk, solver.cpp:733 vs 784-787).
        if cfg.bdf2_symmetric_half:
            h0z, h1z, inc_h = c0, c1, inc1
        else:
            h0z = jnp.concatenate([c0[:1], b0[1:]], axis=0)
            h1z = jnp.concatenate([c1[:1], b1[1:]], axis=0)
            inc_h = jnp.concatenate([inc1[:1], inc0[1:]], axis=0)
        # Phase 2: second BE(dt/2) predictor.
        d0_, d1_ = self._calls[BE](
            kB["coef"], self.scan_masks, self._corr(inc1, kC["cc"]), c0, c1
        )
        inc2 = self._exchange(BE, tb, d1_[:, :, -1])
        # Phase 3: BDF2 corrector (prev = input ends, half = snapshot).
        halo_h = self._halo(
            h1z[:, :, -1:] + tb["A_h"][..., None] * inc_h
        )
        f0, f1 = self._calls[BDF](
            kD["coef"], self.scan_masks, self._corr(inc2, kB["cc"]), ce_in,
            self._corr(inc_h, tb["cc_h"]), halo_e, halo_h,
            d0_, d1_, st.e0, st.e1, h0z, h1z,
        )
        inc3 = self._exchange(BDF, tb, f1[:, :, -1])
        return ZState(f0, f1, st.e0, st.e1, h0z, h1z,
                      inc3, st.inc_e, inc_h)

    # -- materialisation / layout --------------------------------------------

    def _materialize_local(self, z0, z1, inc, cc):
        """Apply the pending correction to local (2, Bh_l, N_loc) planes."""
        j = jnp.arange(z0.shape[-1], dtype=jnp.float32)[None, None, :]
        d0 = cc[..., 0:1]
        a = cc[..., 1:2]
        ln_a = cc[..., 2:3]
        apj = jnp.exp(j * ln_a) * inc
        return z0 + d0 * apj, z1 + a * apj

    def _slot_cc(self, slot: str):
        """The tb key holding a state slot's producing-kind coefficients."""
        ts = self.cfg.ts_method
        if ts == 1:
            return ("k1", "cc"), ("k1", "A")
        if ts == 2:
            return ("k2", "cc"), ("k2", "A")
        if slot == "h":
            return ("cc_h",), ("A_h",)
        return ("k3", "cc"), ("k3", "A")

    def _materialize(self, st: ZState):
        """True (e0, e1, p0, p1, h0, h1) planes (global arrays)."""
        if self._mat_fn is None:
            def local(st, tb):
                def get(path):
                    d = tb
                    for k in path:
                        d = d[k]
                    return d

                out = []
                for slot, (z0, z1, inc) in (
                    ("e", (st.e0, st.e1, st.inc_e)),
                    ("p", (st.p0, st.p1, st.inc_p)),
                    ("h", (st.h0, st.h1, st.inc_h)),
                ):
                    cc = get(self._slot_cc(slot)[0])
                    out.extend(self._materialize_local(z0, z1, inc, cc))
                return tuple(out)

            # check_vma=False: pallas_call outputs carry no
            # varying-manual-axes metadata for shard_map's checker.
            self._mat_fn = jax.jit(shard_map(
                local, mesh=self.mesh,
                in_specs=(self.state_spec, self._tb_specs),
                out_specs=(self.plane_spec,) * 6, check_vma=False,
            ))
        return self._mat_fn(st, self._tb)

    def init_state(self) -> ZState:
        cfg = self.cfg
        Bg = jnp.asarray(
            np.broadcast_to(
                np.asarray(self.tables.B, dtype=np.float64)[None, :],
                (cfg.M // 2, cfg.G),
            ).reshape(self.Bh),
            dtype=jnp.float32,
        )
        plane = jnp.asarray(
            jnp.broadcast_to(Bg[None, :, None], (2, self.Bh, cfg.N))
        )
        plane = jax.device_put(plane, self.plane_sharding)
        inc = jax.device_put(
            jnp.zeros((2, self.Bh, self.K), jnp.float32), self.inc_sharding
        )
        return ZState(plane, plane, plane, plane, plane, plane,
                      inc, inc, inc)

    def from_ends(self, ends, prev, half) -> ZState:
        """Global (M, G, N, 2) arrays -> exact ZState (no pending corr)."""
        t = self._fe.from_ends(ends, prev, half)
        u = self._fe.untile
        put = functools.partial(jax.device_put, device=self.plane_sharding)
        inc = jax.device_put(
            jnp.zeros((2, self.Bh, self.K), jnp.float32), self.inc_sharding
        )
        return ZState(put(u(t.e0)), put(u(t.e1)), put(u(t.p0)), put(u(t.p1)),
                      put(u(t.h0)), put(u(t.h1)), inc, inc, inc)

    def ends(self, st: ZState) -> jnp.ndarray:
        e0, e1, *_ = self._materialize(st)
        return self._fe.ends_pair(self._fe.tile(e0), self._fe.tile(e1))

    def prev_half_ends(self, st: ZState):
        """(prev_ends, half_ends) in global (M, G, N, 2) layout."""
        _, _, p0, p1, h0, h1 = self._materialize(st)
        pair = lambda a, b: self._fe.ends_pair(self._fe.tile(a),
                                               self._fe.tile(b))
        return pair(p0, p1), pair(h0, h1)

    def solve(self, state: Optional[ZState] = None,
              num_steps: Optional[int] = None) -> ZState:
        """Run the whole time loop in ONE shard_map region."""
        n = self.cfg.max_timesteps if num_steps is None else num_steps
        if state is None:
            state = self.init_state()
        run = self._solve_cache.get(n)
        if run is None:
            def run_local(st, tb):
                return lax.fori_loop(
                    0, n, lambda _, s: self._step(s, tb), st
                )

            run = jax.jit(shard_map(
                run_local, mesh=self.mesh,
                in_specs=(self.state_spec, self._tb_specs),
                out_specs=self.state_spec, check_vma=False,
            ))
            self._solve_cache[n] = run
        return run(state, self._tb)
