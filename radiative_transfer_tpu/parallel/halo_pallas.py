"""Halo-overlap multi-chip engine: the FUSED K-step Pallas kernel per shard.

parallel/sharded_pallas.py keeps multi-chip runs on the Pallas kernel, but
pays one composite exchange per SUB-step (4 per BDF2 step) and therefore
cannot fuse timesteps inside a launch — measured ~15G updates/s/chip at the
headline shape vs ~37G for the single-chip fused kernel
(ops/pallas_sweep._make_bdf2_kernel, K=8 steps/launch). This module closes
that gap with an overlapping domain decomposition that needs NO
communication during a K-step launch:

* The engine runs in the physically-bounded truncated-scan regime
  (ops/pallas_sweep._scan_npass): each sub-step's upwind influence is
  HARD-capped at 2^npass cells within a block plus one inter-block carry
  hop — at most R = 2^(npass+1) cells forward per sub-step, because the
  carry leaving a block sees only that block's last 2^npass cells.
* Each shard prepends an H-cell halo of its upstream neighbour's state
  (one ppermute of the last-H plane slices per K steps) and runs the
  fused kernel over the extended domain with ZERO inflow seeds at the
  halo start. The zero-seed error can creep forward at most R cells per
  sub-step, so after S = 4K (BDF2) or K (BE/CN) fused sub-steps the
  shard's own cells are BIT-EXACTLY what the single-chip truncated
  kernel computes, provided H >= S*R. The halo cells are discarded.
* Shard 0 has no upstream: its halo is zero-filled garbage and a runtime
  `reset` block index makes the kernel re-seed the true boundary inflow
  (s_p * psi_source, solver.cpp:639-692) where the real domain starts
  (ops/pallas_sweep._make_halo_bdf2_kernel).
* The reflective left boundary (solver.cpp:679-683) couples the mu<0
  outflow at the END of the flat chain (shard Kx-1; the mu<0 half is
  stored N-reversed) into the mu>0 inflow at shard 0 per (step, phase) —
  values only known after the launch. The main launch runs shard 0's
  mu>0 rows with zero seeds, the kernel records each chain's end-of-launch
  carries (= the per-(step, phase) outflows), one ppermute brings shard
  Kx-1's record to shard 0, and a small FIXUP launch recomputes shard 0's
  first H cells with the true reflected seeds; cells beyond H were never
  influenced by the seeds (same creep bound), so splicing the fixup over
  [0, H) restores exactness.

Communication per K steps: 2 ppermutes of (2, Bh_l, H) plane slices
(+ 1 ppermute of the (2*Bh_l, 4K) carry record and an all_gather over the
group axis for reflective decks) — vs 4K composite exchanges for the
per-substep sharded engine. Redundant compute: H/N_loc per shard (plus an
H-cell fixup for reflective decks), well under 1% at production sizes.

Decks whose optics are too thin to truncate the scan (a_max near 1, e.g.
the LLNL deck at coarse resolution: npass == log2(block), unbounded carry
influence) cannot satisfy the creep bound — the constructor raises and the
caller should use ShardedPallasEngine instead.

float32 only (like the single-chip Pallas engine); interpret mode off-TPU
so the CPU test mesh exercises the same code.
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
from ..ops import fast_sweep as fs
from ..ops import pallas_sweep as ps
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BE, CN, BDF = fs.BE, fs.CN, fs.BDF


class HaloPallasEngine:
    """Multi-chip solver running the fused K-step kernel per shard.

    State: exact fs.FlatState planes (2, Bh, N) float32, sharded
    P(None, group_axis, spatial_axis). Unlike ShardedPallasEngine there
    are no pending lazy corrections — every launch group leaves true
    plane values.
    """

    def __init__(self, cfg: Config, tables, mesh: Mesh,
                 block: Optional[int] = None,
                 steps_per_launch: Optional[int] = None,
                 spatial_axis: str = "x", group_axis: Optional[str] = "g",
                 interpret: Optional[bool] = None,
                 scan_tol: float = 1e-10):
        self.cfg = cfg
        self.tables = tables
        self.scan_tol = scan_tol
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

        # -- block choice (packed rows; same heuristics as the sharded
        #    engine, ops/pallas_sweep.PallasEngine VMEM notes) -------------
        auto_block = block is None
        if auto_block:
            block = 2048
        blk = 1
        while (blk * 2 <= min(block, self.N_loc)
               and self.N_loc % (blk * 2) == 0):
            blk *= 2
        while auto_block and self.rows * blk > (1 << 17) and blk > 128:
            blk //= 2
        if auto_block and cfg.ts_method == 3:
            # K=8 BDF2 fusion prefers rows*blk <= 2^16 (measured,
            # ops/pallas_sweep.max_steps_per_launch).
            while self.rows * blk > (1 << 16) and blk > 512:
                blk //= 2
        if auto_block:
            while (self.rows * blk * 2 <= (1 << 16)
                   and blk < self.N_loc
                   and self.N_loc % (blk * 2) == 0):
                blk *= 2
        if blk < 2:
            # The divisor loop leaves blk=1 whenever N_loc is odd; the
            # truncated-scan machinery needs at least one Hillis-Steele
            # pass (block >= 2) to exist.
            raise ValueError(
                f"N_loc={self.N_loc} has no usable power-of-two block "
                "(per-shard cell count must be even) — use "
                "ShardedPallasEngine or adjust N/mesh")
        if not interpret and blk % 128 != 0:
            # Mosaic needs the lane block dim to be a multiple of 128 (the
            # extended halo+domain array is always > 1 block, so the
            # whole-array fallback of the single-chip engine cannot apply).
            raise ValueError(
                f"block {blk} is not a multiple of 128; this resolution "
                "needs ShardedPallasEngine on real TPUs")
        self.block = blk
        self.nblocks = self.N_loc // blk

        # -- coefficients / BCs (XLA fast engine hosts the algebra) --------
        self._fe = fs.FastEngine(cfg, tables, dtype=jnp.float32,
                                 chunk=min(256, cfg.N), pad=False)
        self.reflective = self._fe.bc_pos_fixed is None
        if self.reflective:
            self._refl_flip = np.asarray(self._fe.refl_flip)
        self._kind_s = {k: float(kc.s) for k, kc in self._fe.kcs.items()}

        self.scan_npass = {
            kind: ps._scan_npass(
                float(np.max(np.asarray(kc.a, dtype=np.float64))),
                blk, scan_tol)
            for kind, kc in self._fe.kcs.items()
        }
        self._mask_count = max(1, *self.scan_npass.values())
        # Host numpy (see models/transport.Tables on why constants must
        # not be captured device arrays).
        self.scan_masks = ps._scan_masks(blk)[:self._mask_count]

        # -- halo regime: creep bound (module doc) -------------------------
        npass_max = max(self.scan_npass.values())
        if (1 << npass_max) > blk // 2:
            raise ValueError(
                f"scan truncation reaches 2^{npass_max} of block {blk}: "
                "carry influence is unbounded (optically thin workload) — "
                "use ShardedPallasEngine")
        reach = 1 << (npass_max + 1)        # max cells forward per sub-step
        self._subs = 4 if cfg.ts_method == 3 else 1
        cap = 8 if cfg.ts_method == 3 else (16 if self.rows <= 32 else 8)
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
                "use ShardedPallasEngine or more cells per shard")
        self.K_launch = K
        self.hb = -(-(self._subs * K * reach) // blk)
        self.H = self.hb * blk
        self.reach = reach

        # -- sharded table dict + specs ------------------------------------
        tb = {
            "bc_neg": self._fe.bc_neg,
            "bc_pos": (
                self._fe.bc_pos_fixed
                if self._fe.bc_pos_fixed is not None
                else np.zeros_like(self._fe.bc_neg)
            ),
        }
        for kind, kc in self._fe.kcs.items():
            tb[f"k{kind}"] = {"coef": ps._pack_coeffs(kc)}   # (2, Bh, 10)
        self._tb = tb

        gax = self.gaxis
        specs = {"bc_neg": P(gax), "bc_pos": P(gax)}
        for kind in self._fe.kcs:
            specs[f"k{kind}"] = {"coef": P(None, gax, None)}
        self._tb_specs = specs

        self.plane_spec = P(None, gax, spatial_axis)
        self.state_spec = fs.FlatState(*([self.plane_spec] * 6))
        self.plane_sharding = NamedSharding(mesh, self.plane_spec)

        self._main_calls: dict = {}
        self._fix_calls: dict = {}
        self._solve_cache: dict = {}

    # -- per-column boundary-fill multipliers ---------------------------------

    def _s_cols(self, K: int) -> np.ndarray:
        """(C,) per-seed-column fill multiplier s_p: BDF2 phases cycle
        (s_be, s_cn, s_be, s_bdf); BE/CN repeat their single s."""
        if self.cfg.ts_method == 3:
            phase = [self._kind_s[BE], self._kind_s[CN],
                     self._kind_s[BE], self._kind_s[BDF]]
            return np.asarray(phase * K, dtype=np.float32)
        kind = BE if self.cfg.ts_method == 1 else CN
        return np.full(K, self._kind_s[kind], dtype=np.float32)

    # -- pallas call builders --------------------------------------------------

    def _build_call(self, K: int, n_cells: int):
        """A packed seeded launcher over `n_cells` (the extended halo+domain
        width for the main launch; H for the fixup). Wraps the raw call
        with the free (2, Bh_l, X) <-> (rows, X) leading-dim collapses."""
        rows, blk = self.rows, self.block
        nb = n_cells // blk
        C = 4 * K if self.cfg.ts_method == 3 else K

        plane_spec = pl.BlockSpec(
            (rows, blk), lambda i: (i * 0, i), memory_space=pltpu.VMEM)
        coef_spec = pl.BlockSpec(
            (rows, ps._NCOEF), lambda i: (i * 0, i * 0),
            memory_space=pltpu.VMEM)
        seed_spec = pl.BlockSpec(
            (rows, C), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM)
        # Explicit (1, 1) block + i32 index map: a bare BlockSpec gets
        # Pallas's default index map, whose literal-zero coordinates trace
        # as i64 under the package-wide x64 mode — Mosaic then fails with
        # "failed to legalize operation 'func.return'" on real TPUs (the
        # interpreter never sees it, so CPU tests can't catch this).
        reset_spec = pl.BlockSpec(
            (1, 1), lambda i: (i * 0, i * 0), memory_space=pltpu.SMEM)
        mask_spec = pl.BlockSpec(
            (self._mask_count, 1, blk), lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM)
        oc_spec = pl.BlockSpec(
            (rows, C), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM)

        plane = jax.ShapeDtypeStruct((rows, n_cells), jnp.float32)
        oc = jax.ShapeDtypeStruct((rows, C), jnp.float32)

        if self.cfg.ts_method == 3:
            kernel = ps._make_halo_bdf2_kernel(
                rows=rows, blk=blk, K=K,
                symmetric_half=self.cfg.bdf2_symmetric_half,
                npass_be=self.scan_npass[BE],
                npass_cn=self.scan_npass[CN],
                npass_bdf=self.scan_npass[BDF],
            )
            in_specs = [coef_spec] * 3 + [seed_spec, reset_spec, mask_spec,
                                          plane_spec, plane_spec]
            n_out, n_scratch = 6, 6 * K
        else:
            kind = BE if self.cfg.ts_method == 1 else CN
            kernel = ps._make_halo_multistep_kernel(
                kind, rows=rows, blk=blk, K=K, npass=self.scan_npass[kind])
            in_specs = [coef_spec, seed_spec, reset_spec, mask_spec,
                        plane_spec, plane_spec]
            n_out, n_scratch = 4, 2 * K

        raw = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=tuple([plane_spec] * n_out + [oc_spec]),
            out_shape=tuple([plane] * n_out + [oc]),
            scratch_shapes=[pltpu.VMEM((rows, 1), jnp.float32)] * n_scratch,
            interpret=self.interpret,
            compiler_params=ps._params(self.interpret),
        )
        Bh_l = self.Bh_l
        n_coef = 3 if self.cfg.ts_method == 3 else 1

        def call(*args):
            # args: [coef]*n_coef, seeds, reset, masks, e0, e1 — everything
            # except reset (SMEM (1,1)) and masks (npass, 1, blk) arrives
            # (2, Bh_l, X) and collapses to packed (rows, X). Positional:
            # shape-sniffing would misfire at Bh_l == 1 (M=2 decks).
            coefs = [a.reshape(rows, -1) for a in args[:n_coef]]
            seeds, reset, masks, e0, e1 = args[n_coef:]
            packed = coefs + [
                seeds.reshape(rows, -1), reset, masks,
                e0.reshape(rows, -1), e1.reshape(rows, -1),
            ]
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

    def _main_seeds(self, tb, K: int, xk) -> jnp.ndarray:
        """(2, Bh_l, C) carry seeds: true boundary inflow on shard 0
        (reflective mu>0 rows stay zero — fixed up post-launch), zeros on
        shards whose halo absorbs the upstream chain."""
        s = self._s_cols(K)[None, :]
        neg = s * tb["bc_neg"][:, None].astype(jnp.float32)
        pos = s * tb["bc_pos"][:, None].astype(jnp.float32)
        base = jnp.stack([neg, pos], axis=0)
        return jnp.where(xk == 0, base, jnp.zeros_like(base))

    def _fix_seeds(self, tb, K: int, oc0: jnp.ndarray) -> jnp.ndarray:
        """Reflective fixup seeds for shard 0: mu<0 rows repeat the main
        seeds; mu>0 rows take the direction-flipped mu<0 end-of-chain
        record from shard Kx-1 (the physical left-edge outflow per
        (step, phase), solver.cpp:679-683), scaled by s_p."""
        s = self._s_cols(K)[None, :]
        neg = s * tb["bc_neg"][:, None].astype(jnp.float32)
        ocn = oc0[0]                                   # (Bh_l, C) mu<0 rows
        if self.gaxis is not None:
            full = lax.all_gather(ocn, self.gaxis).reshape(self.Bh, -1)
            flipped = full[self._refl_flip]
            g = lax.axis_index(self.gaxis)
            ocn = lax.dynamic_slice_in_dim(
                flipped, g * self.Bh_l, self.Bh_l, 0)
        else:
            ocn = ocn[self._refl_flip]
        return jnp.stack([neg, s * ocn], axis=0)

    def _halo_slices(self, e0, e1):
        """Upstream neighbours' last-H plane slices ((2, Bh_l, H) each);
        shard 0 receives zeros (its halo is skipped via `reset`)."""
        if self.Kx == 1:
            return (jnp.zeros_like(e0[..., :self.H]),
                    jnp.zeros_like(e1[..., :self.H]))
        perm = [(i, i + 1) for i in range(self.Kx - 1)]
        return (lax.ppermute(e0[..., -self.H:], self.axis, perm),
                lax.ppermute(e1[..., -self.H:], self.axis, perm))

    def _launch_group(self, st: fs.FlatState, tb, K: int, main, fix
                      ) -> fs.FlatState:
        """K whole timesteps: halo exchange -> one fused kernel launch over
        the extended domain -> (reflective) seed fixup splice."""
        cfg, H = self.cfg, self.H
        h0, h1 = self._halo_slices(st.e0, st.e1)
        xe0 = jnp.concatenate([h0, st.e0], axis=-1)
        xe1 = jnp.concatenate([h1, st.e1], axis=-1)
        xk = lax.axis_index(self.axis)
        reset = jnp.where(xk == 0, self.hb, 0).astype(
            jnp.int32).reshape(1, 1)
        seeds = self._main_seeds(tb, K, xk)

        if cfg.ts_method == 3:
            coefs = (tb["k1"]["coef"], tb["k2"]["coef"], tb["k3"]["coef"])
        else:
            kind = BE if cfg.ts_method == 1 else CN
            coefs = (tb[f"k{kind}"]["coef"],)
        outs = main(*coefs, seeds, reset, self.scan_masks, xe0, xe1)
        planes, oc = [o[..., H:] for o in outs[:-1]], outs[-1]

        if self.reflective:
            if self.Kx > 1:
                oc = lax.ppermute(oc, self.axis, [(self.Kx - 1, 0)])
            fseeds = self._fix_seeds(tb, K, oc)
            zreset = jnp.zeros((1, 1), jnp.int32)
            fouts = fix(*coefs, fseeds, zreset, self.scan_masks,
                        st.e0[..., :H], st.e1[..., :H])
            planes = [
                jnp.where(xk == 0, p.at[..., :H].set(f), p)
                for p, f in zip(planes, fouts[:-1])
            ]

        if cfg.ts_method == 3:
            ne0, ne1, nh0, nh1, np0, np1 = planes
            return fs.FlatState(ne0, ne1, np0, np1, nh0, nh1)
        ne0, ne1, np0, np1 = planes
        return fs.FlatState(ne0, ne1, np0, np1, st.h0, st.h1)

    # -- layout / state --------------------------------------------------------

    def init_state(self) -> fs.FlatState:
        cfg = self.cfg
        Bg = jnp.asarray(
            np.broadcast_to(
                np.asarray(self.tables.B, dtype=np.float64)[None, :],
                (cfg.M // 2, cfg.G),
            ).reshape(self.Bh),
            dtype=jnp.float32,
        )
        plane = jnp.asarray(
            jnp.broadcast_to(Bg[None, :, None], (2, self.Bh, cfg.N)))
        plane = jax.device_put(plane, self.plane_sharding)
        return fs.FlatState(plane, plane, plane, plane, plane, plane)

    def from_ends(self, ends, prev, half) -> fs.FlatState:
        t = self._fe.from_ends(ends, prev, half)
        u = self._fe.untile
        put = functools.partial(jax.device_put, device=self.plane_sharding)
        return fs.FlatState(put(u(t.e0)), put(u(t.e1)), put(u(t.p0)),
                            put(u(t.p1)), put(u(t.h0)), put(u(t.h1)))

    def ends_pair(self, x0, x1) -> jnp.ndarray:
        return self._fe.ends_pair(self._fe.tile(x0), self._fe.tile(x1))

    def ends(self, st: fs.FlatState) -> jnp.ndarray:
        return self.ends_pair(st.e0, st.e1)

    def prev_half_ends(self, st: fs.FlatState):
        return (self.ends_pair(st.p0, st.p1), self.ends_pair(st.h0, st.h1))

    # -- driver ----------------------------------------------------------------

    def solve(self, state: Optional[fs.FlatState] = None,
              num_steps: Optional[int] = None) -> fs.FlatState:
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
