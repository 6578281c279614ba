"""Double-float halo-overlap multi-chip engine: f64-grade AT SCALE.

The reference's entire hot path is `double` (src/solver.cpp:319-587) and
the single-chip df kernel (ops/df_sweep.py) matches that grade at ~15 G
updates/s — but until this module, any `--dtype float64 --mesh` run fell
back to the sharded XLA fast engine at ~1.9 G/chip. This engine runs the
fused K-step DOUBLE-FLOAT kernel per shard over the same overlapping
decomposition as parallel/halo_pallas.py, so reference precision scales
across a device mesh with one halo exchange per K whole timesteps.

Exactness argument (extends halo_pallas's creep bound to the df engine's
two-scan structure): within one df sub-step the forward influence of any
upwind perturbation is HARD-capped at

    R = 2^(npass+1) + 2^(npass_c+1) + 2

cells — 2^(npass+1) through the truncated BASE scan (in-block window
plus one inter-block carry hop), +1 for the output-based residual's
one-cell upwind coupling (rho_j reads o1_{j-1}), 2^(npass_c+1) through
the truncated CORRECTION scan, +1 for the history shifts. Each shard
prepends an H >= S*R cell halo of its upstream neighbour's (hi, lo)
planes and runs the df kernel zero-seeded over the extended domain: the
zero-seed error cannot creep past the halo in S = 4K (BDF2) or K (BE/CN)
fused sub-steps, so the shard-owned cells are exactly what the
single-chip df kernel computes (same block decomposition — N_loc and H
are block multiples, so the truncation windows line up). The residual
machinery inside the halo is identical to the single-chip kernel's: the
owned cells carry FULL double-float accuracy, not an f32 approximation
patched at shard seams (the per-substep deferred-correction pattern was
evaluated and rejected for exactly that reason — its f32 correction
profiles would inject ~1e-7 errors near shard starts;
docs/PERFORMANCE.md "Multi-chip f64-grade").

The reflective left boundary (solver.cpp:679-683) follows the f32 halo
engine's record-and-fixup pattern, at df precision: the kernel records
each mu<0 chain's CORRECTED end-of-launch outflows two_sum(base o1 edge,
correction edge) — bit-identical to what the single-chip kernel's
_half_init fold consumes — one ppermute brings shard Kx-1's (hi, lo)
record to shard 0, and a fixup launch recomputes shard 0's first H cells
with the true reflected df seeds.

Communication per K steps: 1 ppermute of the stacked (hi, lo) plane
slices (4, 2, Bh_l, H) (+ 1 ppermute of the (2, Bh_l, 4K) x 2 outflow
records and an all_gather over the group axis for reflective decks).

Decks whose optics are too thin to truncate either scan (the LLNL deck
at its shipped dt=1e-3) cannot satisfy the creep bound — the constructor
raises and the caller should use the f64 XLA engine
(parallel/sharded_fast.ShardedFastEngine, dtype=float64) instead.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config.config import Config
from ..ops import df
from ..ops import df_sweep as dfs
from ..ops import fast_sweep as fs
from ..ops import pallas_sweep as ps
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BE, CN, BDF = fs.BE, fs.CN, fs.BDF

_F64_GUIDE = ("use the sharded XLA fast engine for f64 instead "
              "(--engine fast --dtype float64)")


class DFHaloEngine:
    """Multi-chip double-float solver: the fused K-step df kernel per
    shard over an H-cell overlapping decomposition.

    State: dfs.DFState — (hi, lo) FlatState plane pairs (2, Bh, N) f32
    sharded P(None, group_axis, spatial_axis), plus the replicated
    opaque `one` (the EFT freeze operand; must stay a runtime
    parameter, ops/df_sweep.DFState doc).
    """

    def __init__(self, cfg: Config, tables, mesh: Mesh,
                 block: Optional[int] = None,
                 steps_per_launch: Optional[int] = None,
                 spatial_axis: str = "x", group_axis: Optional[str] = "g",
                 interpret: Optional[bool] = None,
                 scan_tol: float = 1e-10, corr_scan_tol: float = 1e-6):
        self.cfg = cfg
        self.tables = tables
        self.mesh = mesh
        self.axis = spatial_axis
        self.Kx = mesh.shape[spatial_axis]
        self.gaxis = (
            group_axis
            if group_axis is not None and group_axis in mesh.shape
            and mesh.shape[group_axis] > 1
            else None
        )
        self.NG = mesh.shape[self.gaxis] if self.gaxis else 1

        Mh, G = cfg.M // 2, cfg.G
        self.Mh, self.G = Mh, G
        self.Bh = Mh * G
        if cfg.N % self.Kx != 0:
            raise ValueError(
                f"N={cfg.N} does not split evenly over {self.Kx} shards")
        self.N_loc = cfg.N // self.Kx
        if self.Bh % self.NG != 0:
            raise ValueError(
                f"batch rows Bh={self.Bh} not divisible by {self.NG}")
        self.Bh_l = self.Bh // self.NG
        self.rows = 2 * self.Bh_l

        if interpret is None:
            interpret = jax.devices()[0].platform == "cpu"
        self.interpret = interpret

        # -- block choice: same divisor walk as the f32 halo engine, with
        #    the df kernel's ~4x-live-planes VMEM target (rows*blk = 2^16,
        #    one notch under the f32 halo's 2^17; ops/df_sweep
        #    .DFPallasEngine block notes) -----------------------------------
        auto_block = block is None
        if auto_block:
            block = 2048
        blk = 1
        while (blk * 2 <= min(block, self.N_loc)
               and self.N_loc % (blk * 2) == 0):
            blk *= 2
        while auto_block and self.rows * blk > (1 << 16) and blk > 128:
            blk //= 2
        if auto_block:
            while (self.rows * blk * 2 <= (1 << 16)
                   and blk < self.N_loc
                   and self.N_loc % (blk * 2) == 0):
                blk *= 2
        if blk < 2:
            raise ValueError(
                f"N_loc={self.N_loc} has no usable power-of-two block "
                f"(per-shard cell count must be even) — {_F64_GUIDE}")
        if not interpret and blk % 128 != 0:
            raise ValueError(
                f"block {blk} is not a multiple of 128; this resolution "
                f"needs the XLA engine on real TPUs — {_F64_GUIDE}")
        self.block = blk
        self.nblocks = self.N_loc // blk

        # -- coefficients / BCs (f32 base + df packs + f64 layout) ---------
        self._fe = fs.FastEngine(cfg, tables, dtype=jnp.float32,
                                 chunk=min(256, cfg.N), pad=False)
        self._fe64 = fs.FastEngine(cfg, tables, dtype=jnp.float64,
                                   chunk=min(256, cfg.N), pad=False)
        self.reflective = self._fe.bc_pos_fixed is None
        flip = fs._refl_flip_indices(Mh, G)
        self._refl_flip = np.asarray(flip)

        self.scan_npass = {
            kind: ps._scan_npass(
                float(np.max(np.asarray(kc.a, dtype=np.float64))),
                blk, scan_tol)
            for kind, kc in self._fe.kcs.items()
        }
        self.corr_npass = {
            kind: ps._scan_npass(
                float(np.max(np.asarray(kc.a, dtype=np.float64))),
                blk, corr_scan_tol)
            for kind, kc in self._fe.kcs.items()
        }
        self._mask_count = max(
            1, *self.scan_npass.values(), *self.corr_npass.values())
        self.scan_masks = ps._scan_masks(blk)[:self._mask_count]

        # -- halo regime: creep bound (module doc) -------------------------
        npass_max = max(self.scan_npass.values())
        npass_c_max = max(self.corr_npass.values())
        if (1 << max(npass_max, npass_c_max)) > blk // 2:
            raise ValueError(
                f"scan truncation reaches 2^{max(npass_max, npass_c_max)} "
                f"of block {blk}: carry influence is unbounded (optically "
                f"thin workload) — {_F64_GUIDE}")
        reach = (1 << (npass_max + 1)) + (1 << (npass_c_max + 1)) + 2
        self._subs = 4 if cfg.ts_method == 3 else 1
        # Fusion depth: the df max_steps_per_launch frontier with packed
        # rows in place of Bh (ops/df_sweep.DFPallasEngine).
        p = self.rows * blk
        if cfg.ts_method in (1, 2):
            cap = 8 if self.rows <= 32 else 4
        elif p <= (1 << 15):
            cap = 8
        elif p < (1 << 16):
            cap = 4
        else:
            cap = 2
        if steps_per_launch is not None:
            cap = min(cap, max(1, steps_per_launch))
        K = cap
        while K >= 1:
            hb = -(-(self._subs * K * reach) // blk)
            if hb * blk <= self.N_loc:
                break
            K -= 1
        if K < 1:
            raise ValueError(
                f"halo for even 1 step/launch ({self._subs * reach} cells, "
                f"influence reach {reach}) exceeds N_loc={self.N_loc} — "
                f"{_F64_GUIDE} or use more cells per shard")
        self.K_launch = K
        self.hb = -(-(self._subs * K * reach) // blk)
        self.H = self.hb * blk
        self.reach = reach

        # -- df boundary values (ops/df_sweep.DFPallasEngine) --------------
        psrc = np.asarray(tables.psi_source, dtype=np.float64)
        bc_neg64 = (fs._to_plane(psrc, Mh, G)[0]
                    if cfg.bc_right_indicator == 1 else np.zeros(self.Bh))
        if self.reflective:
            bc_pos64 = np.zeros(self.Bh)                 # fixed up
        else:
            bc_pos64 = fs._to_plane(psrc, Mh, G)[1]
        bch, bcl = df.np_df(np.stack([bc_neg64, bc_pos64]))

        # -- sharded table dict + specs ------------------------------------
        tb = {"bch": bch, "bcl": bcl}
        for kind, kc in self._fe.kcs.items():
            tb[f"k{kind}"] = ps._pack_coeffs(kc)          # (2, Bh, 10)
            tb[f"d{kind}"] = dfs._pack_df_coeffs(cfg, tables, kind, kc.ts)
        self._tb = tb

        gax = self.gaxis
        specs = {"bch": P(None, gax), "bcl": P(None, gax)}
        for kind in self._fe.kcs:
            specs[f"k{kind}"] = P(None, gax, None)
            specs[f"d{kind}"] = P(None, gax, None)
        self._tb_specs = specs

        self.plane_spec = P(None, gax, spatial_axis)
        flat_spec = fs.FlatState(*([self.plane_spec] * 6))
        self.state_spec = dfs.DFState(flat_spec, flat_spec, P(None, None))
        self.plane_sharding = NamedSharding(mesh, self.plane_spec)
        self.one_sharding = NamedSharding(mesh, P(None, None))

        self._main_calls: dict = {}
        self._fix_calls: dict = {}
        self._solve_cache: dict = {}

    # -- pallas call builders --------------------------------------------------

    def _build_call(self, K: int, n_cells: int):
        """A packed seeded df launcher over `n_cells` (the extended
        halo+domain width for the main launch; H for the fixup). Wraps
        the raw call with the free (2, Bh_l, X) <-> (rows, X) leading-dim
        collapses."""
        rows, blk = self.rows, self.block
        nb = n_cells // blk
        C = 4 * K if self.cfg.ts_method == 3 else K

        plane_spec = pl.BlockSpec(
            (rows, blk), lambda i: (i * 0, i), memory_space=pltpu.VMEM)
        coef_spec = pl.BlockSpec(
            (rows, ps._NCOEF), lambda i: (i * 0, i * 0),
            memory_space=pltpu.VMEM)
        dcoef_spec = pl.BlockSpec(
            (rows, dfs._NDF), lambda i: (i * 0, i * 0),
            memory_space=pltpu.VMEM)
        seed_spec = pl.BlockSpec(
            (rows, C), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM)
        # (1, 1) block + i32 index map: the bare-default index map's
        # literal zeros trace as i64 under x64 and Mosaic refuses
        # (halo_pallas._build_call).
        reset_spec = pl.BlockSpec(
            (1, 1), lambda i: (i * 0, i * 0), memory_space=pltpu.SMEM)
        mask_spec = pl.BlockSpec(
            (self._mask_count, 1, blk), lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM)
        one_spec = pl.BlockSpec(
            (1, 1), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM)
        oc_spec = pl.BlockSpec(
            (rows, C), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM)

        plane = jax.ShapeDtypeStruct((rows, n_cells), jnp.float32)
        oc = jax.ShapeDtypeStruct((rows, C), jnp.float32)

        if self.cfg.ts_method == 3:
            kernel = dfs._make_df_halo_bdf2_kernel(
                rows=rows, blk=blk, K=K,
                use_corr=bool(self.cfg.use_correction),
                symmetric_half=self.cfg.bdf2_symmetric_half,
                npass=self.scan_npass, npass_c=self.corr_npass,
                interpret=self.interpret,
            )
            in_specs = ([coef_spec] * 3 + [dcoef_spec] * 3
                        + [seed_spec, seed_spec, reset_spec, mask_spec,
                           one_spec] + [plane_spec] * 4)
            n_out, n_scratch = 12, 20 * K
        else:
            kind = BE if self.cfg.ts_method == 1 else CN
            kernel = dfs._make_df_halo_multistep_kernel(
                kind, rows=rows, blk=blk, K=K,
                use_corr=bool(self.cfg.use_correction),
                npass=self.scan_npass[kind],
                npass_c=self.corr_npass[kind],
                interpret=self.interpret,
            )
            in_specs = ([coef_spec, dcoef_spec, seed_spec, seed_spec,
                         reset_spec, mask_spec, one_spec]
                        + [plane_spec] * 4)
            n_out = 8
            n_scratch = (6 if kind == CN else 4) * K

        raw = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=tuple([plane_spec] * n_out + [oc_spec] * 2),
            out_shape=tuple([plane] * n_out + [oc] * 2),
            scratch_shapes=[pltpu.VMEM((rows, 1), jnp.float32)] * n_scratch,
            interpret=self.interpret,
            compiler_params=ps._params(self.interpret),
        )
        Bh_l = self.Bh_l
        n_coef = 6 if self.cfg.ts_method == 3 else 2

        def call(*args):
            # args: [coef/dcoef]*n_coef, seeds_h, seeds_l, reset, masks,
            # one, e0h, e0l, e1h, e1l — everything except reset, masks and
            # one arrives (2, Bh_l, X) and collapses to packed (rows, X).
            coefs = [a.reshape(rows, -1) for a in args[:n_coef]]
            seeds_h, seeds_l, reset, masks, one = args[n_coef:n_coef + 5]
            planes = [a.reshape(rows, -1) for a in args[n_coef + 5:]]
            packed = coefs + [
                seeds_h.reshape(rows, -1), seeds_l.reshape(rows, -1),
                reset, masks, one,
            ] + planes
            outs = raw(*packed)
            return tuple(o.reshape(2, Bh_l, o.shape[-1]) for o in outs)

        return call

    def _get_calls(self, K: int):
        main = self._main_calls.get(K)
        if main is None:
            main = self._build_call(K, self.H + self.N_loc)
            self._main_calls[K] = main
        if not self.reflective:
            return main, None
        fix = self._fix_calls.get(K)
        if fix is None:
            fix = self._build_call(K, self.H)
            self._fix_calls[K] = fix
        return main, fix

    # -- sharded pieces (inside shard_map, local arrays) -----------------------

    def _main_seeds(self, tb, K: int, xk):
        """((2, Bh_l, C) hi, lo) chain seeds: the true df boundary inflow
        on shard 0 (no s-multiplier fold — the base keeps a plain-bc
        inflow and the residual corrects it, ops/df_sweep._half_init;
        reflective mu>0 rows stay zero, fixed up post-launch), zeros on
        shards whose halo absorbs the upstream chain."""
        C = 4 * K if self.cfg.ts_method == 3 else K
        bh = jnp.broadcast_to(
            tb["bch"][:, :, None], (2, self.Bh_l, C)).astype(jnp.float32)
        bl = jnp.broadcast_to(
            tb["bcl"][:, :, None], (2, self.Bh_l, C)).astype(jnp.float32)
        z = jnp.zeros_like(bh)
        return (jnp.where(xk == 0, bh, z), jnp.where(xk == 0, bl, z))

    def _fix_seeds(self, tb, K: int, och, ocl):
        """Reflective fixup seeds for shard 0: mu<0 rows repeat the main
        seeds; mu>0 rows take the direction-flipped mu<0 CORRECTED
        end-of-chain records from shard Kx-1 (the physical left-edge df
        outflow per (step, phase), solver.cpp:679-683)."""
        C = och.shape[-1]
        neg_h = jnp.broadcast_to(
            tb["bch"][0][:, None], (self.Bh_l, C)).astype(jnp.float32)
        neg_l = jnp.broadcast_to(
            tb["bcl"][0][:, None], (self.Bh_l, C)).astype(jnp.float32)
        vh, vl = och[0], ocl[0]                        # (Bh_l, C) mu<0 rows
        if self.gaxis is not None:
            fh = lax.all_gather(vh, self.gaxis).reshape(self.Bh, -1)
            fl_ = lax.all_gather(vl, self.gaxis).reshape(self.Bh, -1)
            fh, fl_ = fh[self._refl_flip], fl_[self._refl_flip]
            g = lax.axis_index(self.gaxis)
            vh = lax.dynamic_slice_in_dim(fh, g * self.Bh_l, self.Bh_l, 0)
            vl = lax.dynamic_slice_in_dim(fl_, g * self.Bh_l, self.Bh_l, 0)
        else:
            vh, vl = vh[self._refl_flip], vl[self._refl_flip]
        return (jnp.stack([neg_h, vh], axis=0),
                jnp.stack([neg_l, vl], axis=0))

    def _halo_slices(self, hi: fs.FlatState, lo: fs.FlatState):
        """Upstream neighbours' last-H (hi, lo) plane slices, moved with
        ONE stacked ppermute; shard 0 receives zeros (halo skipped via
        `reset`). Returns (h_e0h, h_e0l, h_e1h, h_e1l)."""
        sl = jnp.stack([hi.e0[..., -self.H:], lo.e0[..., -self.H:],
                        hi.e1[..., -self.H:], lo.e1[..., -self.H:]])
        if self.Kx == 1:
            moved = jnp.zeros_like(sl)
        else:
            perm = [(i, i + 1) for i in range(self.Kx - 1)]
            moved = lax.ppermute(sl, self.axis, perm)
        return moved[0], moved[1], moved[2], moved[3]

    def _launch_group(self, st: dfs.DFState, tb, K: int, main, fix
                      ) -> dfs.DFState:
        """K whole df timesteps: halo exchange -> one fused df kernel
        launch over the extended domain -> (reflective) seed fixup."""
        cfg, H = self.cfg, self.H
        h0h, h0l, h1h, h1l = self._halo_slices(st.hi, st.lo)
        xe0h = jnp.concatenate([h0h, st.hi.e0], axis=-1)
        xe0l = jnp.concatenate([h0l, st.lo.e0], axis=-1)
        xe1h = jnp.concatenate([h1h, st.hi.e1], axis=-1)
        xe1l = jnp.concatenate([h1l, st.lo.e1], axis=-1)
        xk = lax.axis_index(self.axis)
        reset = jnp.where(xk == 0, self.hb, 0).astype(
            jnp.int32).reshape(1, 1)
        seeds_h, seeds_l = self._main_seeds(tb, K, xk)

        if cfg.ts_method == 3:
            coefs = (tb["k1"], tb["k2"], tb["k3"],
                     tb["d1"], tb["d2"], tb["d3"])
        else:
            kind = BE if cfg.ts_method == 1 else CN
            coefs = (tb[f"k{kind}"], tb[f"d{kind}"])
        outs = main(*coefs, seeds_h, seeds_l, reset, self.scan_masks,
                    st.one, xe0h, xe0l, xe1h, xe1l)
        planes, och, ocl = [o[..., H:] for o in outs[:-2]], *outs[-2:]

        if self.reflective:
            if self.Kx > 1:
                oc = jnp.stack([och, ocl])
                oc = lax.ppermute(oc, self.axis, [(self.Kx - 1, 0)])
                och, ocl = oc[0], oc[1]
            fsh, fsl = self._fix_seeds(tb, K, och, ocl)
            zreset = jnp.zeros((1, 1), jnp.int32)
            fouts = fix(*coefs, fsh, fsl, zreset, self.scan_masks,
                        st.one,
                        st.hi.e0[..., :H], st.lo.e0[..., :H],
                        st.hi.e1[..., :H], st.lo.e1[..., :H])
            planes = [
                jnp.where(xk == 0, p.at[..., :H].set(f), p)
                for p, f in zip(planes, fouts[:-2])
            ]

        if cfg.ts_method == 3:
            (ne0h, ne0l, ne1h, ne1l, nh0h, nh0l, nh1h, nh1l,
             np0h, np0l, np1h, np1l) = planes
            return dfs.DFState(
                fs.FlatState(ne0h, ne1h, np0h, np1h, nh0h, nh1h),
                fs.FlatState(ne0l, ne1l, np0l, np1l, nh0l, nh1l),
                st.one)
        ne0h, ne0l, ne1h, ne1l, np0h, np0l, np1h, np1l = planes
        return dfs.DFState(
            fs.FlatState(ne0h, ne1h, np0h, np1h, st.hi.h0, st.hi.h1),
            fs.FlatState(ne0l, ne1l, np0l, np1l, st.lo.h0, st.lo.h1),
            st.one)

    # -- layout / state --------------------------------------------------------

    def _put(self, flat_hi, flat_lo) -> dfs.DFState:
        put = functools.partial(jax.device_put, device=self.plane_sharding)
        one = jax.device_put(jnp.ones((1, 1), jnp.float32),
                             self.one_sharding)
        return dfs.DFState(fs.FlatState(*[put(x) for x in flat_hi]),
                           fs.FlatState(*[put(x) for x in flat_lo]),
                           one)

    def init_state(self) -> dfs.DFState:
        """psi = ends = B_g everywhere (solver.cpp:165-181), split to
        double-float so the initial condition is exact to ~2^-48."""
        cfg = self.cfg
        B64 = np.broadcast_to(
            np.asarray(self.tables.B, dtype=np.float64)[None, :],
            (cfg.M // 2, cfg.G)).reshape(self.Bh)
        bh, bl = df.np_df(B64)

        def plane(v):
            return jnp.asarray(np.broadcast_to(
                v[None, :, None], (2, self.Bh, cfg.N)))

        ph, plo = plane(bh), plane(bl)
        return self._put([ph] * 6, [plo] * 6)

    def from_ends(self, ends, prev, half) -> dfs.DFState:
        """Global f64 (M, G, N, 2) arrays -> sharded double-float state."""
        t = self._fe64.from_ends(ends, prev, half)
        u = self._fe64.untile
        his, los = [], []
        for pl64 in (t.e0, t.e1, t.p0, t.p1, t.h0, t.h1):
            x64 = u(jnp.asarray(pl64, jnp.float64))
            hi = x64.astype(jnp.float32)
            lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
            his.append(hi)
            los.append(lo)
        return self._put(his, los)

    def ends_pair(self, hi0, lo0, hi1, lo1) -> jnp.ndarray:
        x0 = hi0.astype(jnp.float64) + lo0.astype(jnp.float64)
        x1 = hi1.astype(jnp.float64) + lo1.astype(jnp.float64)
        return self._fe64.ends_pair(self._fe64.tile(x0),
                                    self._fe64.tile(x1))

    def ends(self, st: dfs.DFState) -> jnp.ndarray:
        return self.ends_pair(st.hi.e0, st.lo.e0, st.hi.e1, st.lo.e1)

    def prev_half_ends(self, st: dfs.DFState):
        prev = self.ends_pair(st.hi.p0, st.lo.p0, st.hi.p1, st.lo.p1)
        half = self.ends_pair(st.hi.h0, st.lo.h0, st.hi.h1, st.lo.h1)
        return prev, half

    # -- driver ----------------------------------------------------------------

    def solve(self, state: Optional[dfs.DFState] = None,
              num_steps: Optional[int] = None) -> dfs.DFState:
        """Run n timesteps, K_launch per fused launch group, the whole
        loop in ONE shard_map region."""
        n = self.cfg.max_timesteps if num_steps is None else num_steps
        if state is None:
            state = self.init_state()
        Kd = min(self.K_launch, max(n, 1))
        body, tail = divmod(n, Kd)
        run = self._solve_cache.get((body, tail, Kd))
        if run is None:
            main_b, fix_b = self._get_calls(Kd) if body else (None, None)
            main_t, fix_t = self._get_calls(tail) if tail else (None, None)

            def run_local(st, tb):
                if body:
                    st = lax.fori_loop(
                        0, body,
                        lambda _, s: self._launch_group(
                            s, tb, Kd, main_b, fix_b),
                        st)
                if tail:
                    st = self._launch_group(st, tb, tail, main_t, fix_t)
                return st

            run = jax.jit(shard_map(
                run_local, mesh=self.mesh,
                in_specs=(self.state_spec, self._tb_specs),
                out_specs=self.state_spec, check_vma=False,
            ))
            self._solve_cache[(body, tail, Kd)] = run
        return run(state, self._tb)
