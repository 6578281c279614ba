"""Single-exchange fused BDF2 mesh engine.

The missing multi-chip path for the UNTRUNCATABLE regime (VERDICT r3 #2):
workloads whose scan cannot truncate (optically-thin groups at large dt —
including the reference's own shipped LLNL configuration,
/root/reference/prm/llnl_slab_test.prm, dt=1e-3) fail the halo-overlap
engine's creep bound and used to fall back to the per-substep exchange
engine (parallel/sharded_pallas.py) at 4 zero-inflow launches + 4
collective exchanges per BDF2 step (27% of single-chip at mesh-1x1,
docs/PERFORMANCE.md). This engine runs ONE fused kernel launch and ONE
small exchange per whole BDF2 step:

* The cycle is AFFINE in the NV=7 per-shard boundary scalars
  v = (inc_be1, inc_cn, inc_be2, inc_bdf, fill_p1@cn, fill_p1@bdf,
  fill_h1), so  true_cycle(x, v) = cycle(x, 0) + linear_cycle(0, v)
  exactly. Each launch therefore does BOTH halves of that split,
  STAGGERED by one step, block by block in VMEM:
    1. evaluate the LINEAR correction cycle for the PREVIOUS step
       (its unknowns v were folded after the previous launch) — pure
       carry-seeded compute, no sources, zero plane inputs (which fold
       away at compile time);
    2. materialise the true input ends  e = z_prev + correction  and
       run THIS step's zero-boundary 4-phase cycle on them, recording
       the per-phase outflow carries.
* ONE all_gather of the per-shard (zero-cycle outflows t, true e1 edge)
  6-vectors folds the feed-forward shard chain: shard k+1's phase
  inflows are shard k's CORRECTED outflows o_k = t_k + M v_k, its p1
  fills are shard k's true input-e1 edge, its h1 fill is o_k's
  half-edge component. The (NT, NV) outflow map M is a HOST constant
  (parallel/step_response.py, computed by stable f64 recurrences and
  validated against brute-force simulation). The global axis start
  seeds all seven unknowns from the boundary value
  (solver.cpp:695-697) — or, for the reflective mu>0 half, from the
  flipped mu<0 chain end's per-phase outflows (solver.cpp:679-683).

Communication per whole BDF2 step: one (rows, 6) all_gather —
independent of local cell count. Kernel launches per step: ONE (vs 4).
HBM per step: ~6 plane transfers (read z0/z1, write z0'/z1'/h0'/h1');
the correction costs a second in-VMEM cycle of COMPUTE, not traffic.

Two earlier designs were measured and rejected: (a) in-kernel
reconstruction from a 5-term exponential closed-form basis — exact but
numerically EXPLOSIVE precisely in the untruncatable regime (mixture
coefficients carry 1/(a_i - a_j) factors; see step_response.py); (b)
host-precomputed per-cell response PROFILES applied by XLA — stable,
but it reads 2*NV extra response planes per step and carries GB-scale
tables at production N (measured mesh-1x1: 21.4 G gray-headline /
13.3 G LLNL vs this design's 24.8 / 16.2).

Measured mesh-1x1 (v5e, honest protocol): gray headline 24.8 G vs the
per-substep engine's 16.8 G; LLNL shipped-dt 16.2 G vs 19.4 G — at a
1-device mesh the per-substep engine's 4 exchanges are free self-copies
while this engine pays a second in-VMEM cycle, so it trails on
compute-bound shapes there; on a real K-shard mesh the comparison is 1
collective vs 4 per step. The untruncatable single-chip ceiling on the
LLNL deck is 31.5 G (full-scan regime — the truncated-scan 63 G does
not apply), so mesh-1x1 runs at 51-77% of the attainable rate.

float32 compute like the sibling engines; interpret mode off-TPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config.config import Config
from ..ops import fast_sweep as fs
from ..ops import pallas_sweep as ps
from . import step_response as sr

BE, CN, BDF = fs.BE, fs.CN, fs.BDF
NV, NT = sr.NV, sr.NT


class FXState(NamedTuple):
    """Sweep state, corrections pending. z0/z1 are the CURRENT step's
    zero-boundary cycle output ends and h0/h1 its half-snapshot planes
    ((2, Bh, N) flat sweep order, global view); v ((2, Bh, K, NV),
    spatial-sharded) holds the step's folded boundary unknowns — the
    true planes are z + linear_cycle(v), materialised in the next
    launch (hot path) or by the materialisation kernel (diagnostics).
    z0p/z1p/vp are the same for the PREVIOUS step (whose corrected
    planes are this step's inputs = the reference's prev_ends)."""

    z0: jnp.ndarray
    z1: jnp.ndarray
    z0p: jnp.ndarray
    z1p: jnp.ndarray
    h0: jnp.ndarray
    h1: jnp.ndarray
    v: jnp.ndarray
    vp: jnp.ndarray


def _corr_cycle_block(kbe, kcn, kbdf, col, blk, m_ref, symmetric_half,
                      is_neg, zero, scr, npass):
    """One block of the LINEAR correction cycle: the 4-phase cycle's
    response to the boundary unknowns, with zero sources (Sb = c0 = 0)
    and zero step-input planes (compile-time-constant zeros — Mosaic
    folds the dead multiplies). Carries/fills live in `scr` (seeded
    from v at the first block). Returns the correction planes of the
    output ends and both half planes."""
    cb1, ccn, cb2, cbd, et_cn, et_bdf, ht = scr

    def lin(kc):
        zc = jnp.zeros_like(kc.Sb)
        return kc._replace(Sb=zc, c0=zc)

    # The p1 fills differ per phase at the sweep start (V_P1CN vs
    # V_P1BDF seeds); both scratches hold 0 after the first block (the
    # zero p1 plane's edge).
    etc = et_cn[:]
    etb = et_bdf[:]
    htc = ht[:]
    zt = jnp.zeros_like(etc)
    b0, b1 = ps._substep_block(BE, lin(kbe), col, blk, m_ref,
                               zero, zero, zero, zero, zero, zero,
                               cb1, zt, zt, npass[BE])
    c0, c1 = ps._substep_block(CN, lin(kcn), col, blk, m_ref,
                               b0, b1, zero, zero, zero, zero,
                               ccn, etc, zt, npass[CN])
    if symmetric_half:
        hs0, hs1 = c0, c1
    else:
        hs0 = jnp.where(is_neg, c0, b0)
        hs1 = jnp.where(is_neg, c1, b1)
    d0, d1 = ps._substep_block(BE, lin(kbe), col, blk, m_ref,
                               c0, c1, zero, zero, zero, zero,
                               cb2, zt, zt, npass[BE])
    f0, f1 = ps._substep_block(BDF, lin(kbdf), col, blk, m_ref,
                               d0, d1, zero, zero, hs0, hs1,
                               cbd, etb, htc, npass[BDF])
    et_cn[:] = zt
    et_bdf[:] = zt
    ht[:] = hs1[:, -1:]
    return f0, f1, hs0, hs1


def _make_fused_step_kernel(*, rows: int, blk: int, symmetric_half: bool,
                            npass: dict, materialize_only: bool = False):
    """One whole BDF2 step per launch: correct the previous step's
    planes in VMEM (linear cycle from its unknowns v), then run this
    step's zero-boundary cycle on the corrected ends.

    1-D grid of nblocks visits over (rows, blk) blocks (both direction
    halves ride the rows — they are independent under zero boundary;
    the reflective coupling lives in the engine's chain fold). Inputs:
    the three f32 coefficient packs, scan masks, the previous step's
    unknown vector v (rows, NV), and its zero-cycle end planes.
    Outputs: this step's zero-cycle end + half planes and the
    (rows, NT+1) edge record [4 phase carries, half edge, true input-e1
    edge]. With materialize_only=True the kernel instead outputs the
    CORRECTED planes of the given step and its half-plane corrections
    (the diagnostics/checkpoint path)."""

    def kernel(cbe_ref, ccn_ref, cbdf_ref, m_ref, v_ref, z0_ref, z1_ref,
               *rest):
        if materialize_only:
            e0r, e1r, hc0r, hc1r = rest[:4]
            scratch = rest[4:]
            assert len(scratch) == 7
        else:
            o0r, o1r, oh0r, oh1r, oc_ref = rest[:5]
            scratch = rest[5:]
            assert len(scratch) == 13
        cscr = scratch[:7]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            v = v_ref[...]                              # (rows, NV)
            for s, q in zip(cscr, (sr.V_BE1, sr.V_CN, sr.V_BE2, sr.V_BDF,
                                   sr.V_P1CN, sr.V_P1BDF, sr.V_FILLH)):
                s[:] = v[:, q:q + 1]
            if not materialize_only:
                for c in scratch[7:]:
                    c[:] = jnp.zeros_like(c[:])

        def unpack(ref):
            c = ref[...]
            return ps._Coef(*(c[:, k:k + 1] for k in range(ps._NCOEF)))

        kbe, kcn, kbdf = unpack(cbe_ref), unpack(ccn_ref), unpack(cbdf_ref)
        col = lax.broadcasted_iota(jnp.int32, (rows, blk), 1)
        row = lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        is_neg = row < (rows // 2)
        zero = jnp.zeros((rows, blk), jnp.float32)

        # Correction planes of the previous step (this step's input).
        f0c, f1c, hs0c, hs1c = _corr_cycle_block(
            kbe, kcn, kbdf, col, blk, m_ref, symmetric_half, is_neg,
            zero, cscr, npass)
        e0 = z0_ref[...] + f0c
        e1 = z1_ref[...] + f1c

        if materialize_only:
            e0r[...], e1r[...] = e0, e1
            hc0r[...], hc1r[...] = hs0c, hs1c
            return

        cbe1, ccn_c, cbe2, cbdf_c, etail, htail = scratch[7:]
        et_prev = etail[:]
        ht_prev = htail[:]
        zt = jnp.zeros_like(et_prev)

        # Phase 0: BE(dt/2) predictor.
        b0, b1 = ps._substep_block(BE, kbe, col, blk, m_ref,
                                   e0, e1, e0, e1, e0, e1, cbe1, zt, zt,
                                   npass[BE])
        # Phase 1: CN(dt/2) corrector (p1 = step input e1).
        hc0, hc1 = ps._substep_block(CN, kcn, col, blk, m_ref,
                                     b0, b1, e0, e1, e0, e1, ccn_c,
                                     et_prev, zt, npass[CN])
        # Half snapshot: CN output for mu<0 rows, phase-0 BE output for
        # mu>0 (reference quirk, solver.cpp:733 vs 784-787).
        if symmetric_half:
            hs0, hs1 = hc0, hc1
        else:
            hs0 = jnp.where(is_neg, hc0, b0)
            hs1 = jnp.where(is_neg, hc1, b1)
        # Phase 2: second BE(dt/2) predictor.
        d0, d1 = ps._substep_block(BE, kbe, col, blk, m_ref,
                                   hc0, hc1, e0, e1, hs0, hs1, cbe2,
                                   zt, zt, npass[BE])
        # Phase 3: BDF2 corrector (prev = step input, half = snapshot).
        f0, f1 = ps._substep_block(BDF, kbdf, col, blk, m_ref,
                                   d0, d1, e0, e1, hs0, hs1, cbdf_c,
                                   et_prev, ht_prev, npass[BDF])

        etail[:] = e1[:, -1:]
        htail[:] = hs1[:, -1:]
        o0r[...], o1r[...] = f0, f1
        oh0r[...], oh1r[...] = hs0, hs1
        for p, c in enumerate((cbe1, ccn_c, cbe2, cbdf_c)):
            oc_ref[:, p:p + 1] = c[:]
        oc_ref[:, 4:5] = hs1[:, -1:]
        oc_ref[:, 5:6] = e1[:, -1:]

    return kernel


class FusedExchangeEngine:
    """Drop-in mesh engine: one launch + one exchange per BDF2 step."""

    def __init__(self, cfg: Config, tables, mesh: Mesh,
                 block: Optional[int] = None,
                 spatial_axis: str = "x", group_axis: Optional[str] = "g",
                 interpret: Optional[bool] = None,
                 scan_tol: float = 1e-10):
        if cfg.ts_method != 3:
            raise ValueError(
                "FusedExchangeEngine fuses the BDF2 4-phase cycle; BE/CN "
                "steps already run one exchange per step on the "
                "per-substep engine")
        self.cfg = cfg
        self.tables = tables
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
        self.rows = 2 * self.Bh_l

        auto_block = block is None
        if auto_block:
            block = 2048
        blk = 1
        while (blk * 2 <= min(block, self.N_loc)
               and self.N_loc % (blk * 2) == 0):
            blk *= 2
        while self.rows * blk > (1 << 17) and blk > 128:
            blk //= 2
        if blk < min(8, self.N_loc):
            blk = self.N_loc
        if auto_block:
            while (self.rows * blk * 2 <= (1 << 17)
                   and blk < self.N_loc
                   and self.N_loc % (blk * 2) == 0):
                blk *= 2
        self.block = blk
        self.nblocks = self.N_loc // blk

        if interpret is None:
            interpret = jax.devices()[0].platform == "cpu"
        self.interpret = interpret

        self._fe = fs.FastEngine(cfg, tables, dtype=jnp.float32,
                                 chunk=min(256, cfg.N), pad=False)
        self.reflective = self._fe.bc_pos_fixed is None
        if self.reflective:
            self._refl_flip = np.asarray(self._fe.refl_flip)

        self.scan_npass = {
            kind: ps._scan_npass(
                float(np.max(np.asarray(kc.a, dtype=np.float64))),
                self.block, scan_tol)
            for kind, kc in self._fe.kcs.items()
        }
        self._mask_count = max(1, *self.scan_npass.values())
        self.scan_masks = ps._scan_masks(self.block)[:self._mask_count]

        # Host outflow map (stable f64 recurrences; profiles skipped —
        # corrections are evaluated in-kernel, not from stored tables).
        kr = {k: sr.kind_rows(kc) for k, kc in self._fe.kcs.items()}
        resp = sr.bdf2_cycle_response(kr, self.Bh, self.N_loc,
                                      cfg.bdf2_symmetric_half,
                                      profiles=False)

        def f32(x):
            return np.asarray(x, np.float32)

        def rows2(x):
            """(2*Bh, ...) -> (2, Bh, ...) for row sharding over 'g'."""
            return np.reshape(x, (2, self.Bh) + x.shape[1:])

        tb = {
            "M": rows2(f32(resp.M)),
            "bc_neg": np.asarray(self._fe.bc_neg, np.float32),
            "bc_pos": (f32(self._fe.bc_pos_fixed)
                       if not self.reflective
                       else np.zeros(self.Bh, np.float32)),
        }
        for kind, kc in self._fe.kcs.items():
            tb[f"k{kind}"] = ps._pack_coeffs(kc)

        gax = self.gaxis
        specs = {
            "M": P(None, gax, None, None),
            "bc_neg": P(gax), "bc_pos": P(gax),
        }
        for kind in self._fe.kcs:
            specs[f"k{kind}"] = P(None, gax, None)
        self._tb_specs = specs
        # Pin the tables to the device(s) once — host numpy as a
        # per-call jit argument re-uploads through the tunnel per call.
        self._tb = {
            k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in tb.items()
        }

        self.plane_spec = P(None, gax, spatial_axis)
        self.v_spec = P(None, gax, spatial_axis, None)
        self.state_spec = FXState(*([self.plane_spec] * 6
                                    + [self.v_spec] * 2))
        self.plane_sharding = NamedSharding(mesh, self.plane_spec)
        self.v_sharding = NamedSharding(mesh, self.v_spec)

        self._call = self._build_call(materialize_only=False)
        self._mat_call = None
        self._solve_cache: dict = {}
        self._mat_fn = None

    # -- kernel launcher -----------------------------------------------------

    def _build_call(self, materialize_only: bool):
        rows, blk, nb = self.rows, self.block, self.nblocks
        N = self.N_loc

        plane_spec = pl.BlockSpec((rows, blk), lambda i: (i * 0, i),
                                  memory_space=pltpu.VMEM)
        coef_spec = pl.BlockSpec((rows, ps._NCOEF),
                                 lambda i: (i * 0, i * 0),
                                 memory_space=pltpu.VMEM)
        v_in_spec = pl.BlockSpec((rows, NV), lambda i: (i * 0, i * 0),
                                 memory_space=pltpu.VMEM)
        mask_spec = pl.BlockSpec((self._mask_count, 1, blk),
                                 lambda i: (i * 0, i * 0, i * 0),
                                 memory_space=pltpu.VMEM)
        oc_spec = pl.BlockSpec((rows, NT + 1), lambda i: (i * 0, i * 0),
                               memory_space=pltpu.VMEM)

        kernel = _make_fused_step_kernel(
            rows=rows, blk=blk,
            symmetric_half=self.cfg.bdf2_symmetric_half,
            npass=self.scan_npass, materialize_only=materialize_only,
        )
        plane = jax.ShapeDtypeStruct((rows, N), jnp.float32)
        if materialize_only:
            out_specs = (plane_spec,) * 4
            out_shape = (plane,) * 4
            nscr = 7
        else:
            out_specs = (plane_spec,) * 4 + (oc_spec,)
            out_shape = (plane,) * 4 + (
                jax.ShapeDtypeStruct((rows, NT + 1), jnp.float32),)
            nscr = 13
        raw = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[coef_spec] * 3 + [mask_spec, v_in_spec,
                                        plane_spec, plane_spec],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((rows, 1), jnp.float32)] * nscr,
            interpret=self.interpret,
            compiler_params=ps._params(self.interpret),
        )

        Bh = self.Bh_l

        def call(tb, v, z0, z1):
            r2 = lambda x: x.reshape((rows,) + x.shape[2:])
            outs = raw(r2(tb["k1"]), r2(tb["k2"]), r2(tb["k3"]),
                       self.scan_masks, r2(v), r2(z0), r2(z1))
            planes = [o.reshape(2, Bh, N) for o in outs[:4]]
            if materialize_only:
                return planes
            return planes, outs[4].reshape(2, Bh, NT + 1)

        return call

    # -- sharded step pieces -------------------------------------------------

    def _assemble_interior(self, o, edge):
        """Shard k+1's unknowns from shard k's corrected outflows o
        (..., NT) and true input-e1 edge (...,): phase inflows from the
        per-phase outflows, both p1 fills from the edge, the h1 fill
        from the half-edge outflow (the upstream half snapshot is
        computed in the same launch — hence part of the chain)."""
        return jnp.stack([o[..., sr.T_BE1], o[..., sr.T_CN],
                          o[..., sr.T_BE2], o[..., sr.T_BDF],
                          edge, edge, o[..., sr.T_H1]], axis=-1)

    def _assemble_reflective(self, o):
        """The mu>0 axis-start unknowns from the FLIPPED mu<0 chain-end
        corrected outflows: the reference re-reads the mu<0 ends before
        each sub-step's mu>0 sweep and seeds inflow AND both history
        fills from that same bdry_cond (solver.cpp:679-683, 695-697) —
        so each phase's fill components use that phase's outflow."""
        return jnp.stack([o[..., sr.T_BE1], o[..., sr.T_CN],
                          o[..., sr.T_BE2], o[..., sr.T_BDF],
                          o[..., sr.T_CN], o[..., sr.T_BDF],
                          o[..., sr.T_BDF]], axis=-1)

    def _fold(self, tb, oc):
        """Fold the feed-forward shard chain. oc: local (2, Bh_l, NT+1)
        edge record [zero-cycle outflows t, true input-e1 edge].
        Returns this shard's unknown vector (2, Bh_l, 1, NV)."""
        K = self.K
        half = self.Bh_l
        pr = oc.reshape(self.rows, NT + 1)
        gP = (pr[None] if K == 1
              else lax.all_gather(pr, self.axis))        # (K, rows, NT+1)
        M = tb["M"].reshape(self.rows, NT, NV)

        def chain(v0, gH, MH):
            vs = [v0]
            v = v0
            o = None
            for k in range(K):
                o = jnp.einsum("rij,rj->ri", MH, v) + gH[k, :, :NT]
                v = self._assemble_interior(o, gH[k, :, NT])
                vs.append(v)
            return vs, o                                 # o = chain end

        zero7 = jnp.zeros((half, NV), jnp.float32)
        v0n = zero7 + tb["bc_neg"][:, None]              # all seven = bc
        vsn, o_end = chain(v0n, gP[:, :half], M[:half])
        if self.reflective:
            if self.gaxis is not None:
                full = lax.all_gather(o_end, self.gaxis).reshape(-1, NT)
                flipped = full[self._refl_flip]
                g = lax.axis_index(self.gaxis)
                o_flip = lax.dynamic_slice_in_dim(flipped, g * half, half)
            else:
                o_flip = o_end[self._refl_flip]
            v0p = self._assemble_reflective(o_flip)
        else:
            v0p = zero7 + tb["bc_pos"][:, None]
        vsp, _ = chain(v0p, gP[:, half:], M[half:])

        k = lax.axis_index(self.axis)
        vn = vsn[0]
        vp = vsp[0]
        for i in range(1, K):
            vn = jnp.where(k == i, vsn[i], vn)
            vp = jnp.where(k == i, vsp[i], vp)
        return jnp.stack([vn, vp], axis=0)[:, :, None, :]  # (2,Bh_l,1,NV)

    def _step(self, st: FXState, tb) -> FXState:
        planes, oc = self._call(tb, st.v[:, :, 0, :], st.z0, st.z1)
        z0n, z1n, h0n, h1n = planes
        v_new = self._fold(tb, oc)
        return FXState(z0n, z1n, st.z0, st.z1, h0n, h1n, v_new, st.v)

    # -- materialisation / state ---------------------------------------------

    def _materialize(self, st: FXState, full: bool = True):
        """True planes from the pending state: current (e0, e1) from
        (z, v) plus — when ``full`` — prev planes from (z_p, v_p) and
        the current generation's half-plane corrections. ends() uses
        full=False: diagnostics loops (e.g. --balance-every) would
        otherwise pay a second correction-cycle launch for prev/half
        planes they discard."""
        if self._mat_call is None:
            self._mat_call = self._build_call(materialize_only=True)
        if self._mat_fn is None:
            def local_full(st, tb):
                e0, e1, hc0, hc1 = self._mat_call(
                    tb, st.v[:, :, 0, :], st.z0, st.z1)
                p0, p1, _, _ = self._mat_call(
                    tb, st.vp[:, :, 0, :], st.z0p, st.z1p)
                return e0, e1, p0, p1, st.h0 + hc0, st.h1 + hc1

            def local_ends(st, tb):
                e0, e1, _, _ = self._mat_call(
                    tb, st.v[:, :, 0, :], st.z0, st.z1)
                return e0, e1

            sm = lambda f, n: jax.jit(shard_map(
                f, mesh=self.mesh,
                in_specs=(self.state_spec, self._tb_specs),
                out_specs=(self.plane_spec,) * n, check_vma=False,
            ))
            self._mat_fn = {True: sm(local_full, 6),
                            False: sm(local_ends, 2)}
        return self._mat_fn[full](st, self._tb)

    def init_state(self) -> FXState:
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
        v = jax.device_put(
            jnp.zeros((2, self.Bh, self.K, NV), jnp.float32),
            self.v_sharding)
        return FXState(plane, plane, plane, plane, plane, plane, v, v)

    def from_ends(self, ends, prev, half) -> FXState:
        t = self._fe.from_ends(ends, prev, half)
        u = self._fe.untile
        put = functools.partial(jax.device_put, device=self.plane_sharding)
        v = jax.device_put(
            jnp.zeros((2, self.Bh, self.K, NV), jnp.float32),
            self.v_sharding)
        return FXState(put(u(t.e0)), put(u(t.e1)), put(u(t.p0)),
                       put(u(t.p1)), put(u(t.h0)), put(u(t.h1)), v, v)

    def ends(self, st: FXState) -> jnp.ndarray:
        e0, e1 = self._materialize(st, full=False)
        return self._fe.ends_pair(self._fe.tile(e0), self._fe.tile(e1))

    def prev_half_ends(self, st: FXState):
        _, _, p0, p1, h0, h1 = self._materialize(st)
        pair = lambda a, b: self._fe.ends_pair(self._fe.tile(a),
                                               self._fe.tile(b))
        return pair(p0, p1), pair(h0, h1)

    def solve(self, state: Optional[FXState] = None,
              num_steps: Optional[int] = None) -> FXState:
        n = self.cfg.max_timesteps if num_steps is None else num_steps
        if state is None:
            state = self.init_state()
        run = self._solve_cache.get(n)
        if run is None:
            def run_local(st, tb):
                return lax.fori_loop(
                    0, n, lambda _, s: self._step(s, tb), st)

            run = jax.jit(shard_map(
                run_local, mesh=self.mesh,
                in_specs=(self.state_spec, self._tb_specs),
                out_specs=self.state_spec, check_vma=False,
            ))
            self._solve_cache[n] = run
        return run(state, self._tb)
