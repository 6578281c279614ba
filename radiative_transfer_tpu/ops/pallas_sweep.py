"""Single-pass Pallas sweep kernel — the speed-of-light transport substep.

The XLA fast engine (ops/fast_sweep.py) needs ~12-16 HBM plane-passes per
sub-step because the scan prefixes, RHS planes and carry arrays all
materialise. This kernel does ONE pass: each (direction-half, cell-block)
grid step DMAs its input blocks HBM->VMEM, builds the RHS, runs an
in-register Hillis-Steele prefix scan over the block (constant per-row
carry multiplier `a`, see fast_sweep module doc), reconstructs both cell
edges, and writes them back — the inter-block carry, the upwind history
tails for the CN/BDF shift terms, and the reflective-boundary coupling all
live in VMEM scratch that persists across the sequential TPU grid.

Grid order (half, block): Pallas TPU grids execute sequentially with the
last axis fastest, so all mu<0 blocks run before the mu>0 blocks; at the
half boundary the carry scratch holds the mu<0 outflow, which IS the
reflective left-boundary inflow (solver.cpp:679-683) up to the direction
flip and the fill-folding multiplier s (1 BE / 2 CN / 6 BDF2).

Fusion levels (see _make_bdf2_kernel / _make_multistep_kernel):
* all 4 BDF2 phases per block visit — the intermediate BE/CN planes
  never touch HBM (half_ends never crosses step boundaries);
* K whole timesteps per launch — step k at block i depends only on its
  own carries from upstream blocks (VMEM scratch) and step k-1 at block
  i (registers), so the in-order grid admits K-step chaining. HBM
  traffic: 6/K plane-passes per BDF2 step, 4/K per BE/CN step. The
  kernel is then compute-bound on the in-register scan, whose pass
  count is truncated to the workload's physical attenuation depth
  (_scan_npass: the carry multiplier a < 1, so passes whose reach
  exceeds the a^dist decay horizon are numerically irrelevant; bound
  a^(2^k)/(1-a) < scan_tol). See docs/PERFORMANCE.md.

State layout here is plain sweep-order planes (2, Bh, N) (not the XLA
engine's chunk-tiled layout): blocks slice the lane axis directly.

float32 only (TPU-native); the float64 paths go through the XLA engines.
Falls back to interpret mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config.config import Config
from . import fast_sweep as fs

BE, CN, BDF = fs.BE, fs.CN, fs.BDF

# Packed per-(half, batch) coefficient plane column indices.
_W, _T0, _Q, _IDET, _A, _SB, _C1, _C0, _KEE, _KP = range(10)
_NCOEF = 10


def _pack_coeffs(kc: fs.KindCoeffs) -> np.ndarray:
    """KindCoeffs (1, 2, Bh, 1) planes -> (2, Bh, NCOEF) float32.

    Host numpy (the engines close over these in jitted runners; captured
    device arrays would be fetched at lowering — see
    models/transport.Tables on the axon D2H dispatch penalty)."""
    cols = [kc.w, kc.T0, kc.q, kc.inv_det, kc.a, kc.Sbase, kc.c1, kc.c0,
            kc.k_ee, kc.k_p]
    packed = np.concatenate([np.asarray(c)[0, :, :, :] for c in cols],
                            axis=-1)
    return packed.astype(np.float32)


def _scan_strides(blk: int) -> Tuple[int, ...]:
    """The Hillis-Steele pass strides 1, 2, 4, ... below blk."""
    out = []
    d = 1
    while d < blk:
        out.append(d)
        d *= 2
    return tuple(out)


def _scan_masks(blk: int) -> np.ndarray:
    """Precomputed per-pass edge masks: masks[k, 0, col] = 1.0 iff
    col >= stride_k. Shared across rows, sub-step kinds and fused steps;
    folding the per-row carry power into them ((a^d * mask) * rolled)
    replaces the per-pass iota compare + select of the naive scan — the
    outer products are loop-invariant within a kernel body, so Mosaic
    computes each one once per launch. Measured ~1.9x on the scan
    (benchmarks/scan_experiments.py: hs-maskmul vs hs)."""
    col = np.arange(blk)[None, :]
    return np.stack(
        [(col >= d).astype(np.float32) for d in _scan_strides(blk)]
    )  # (npass, 1, blk)


def _scan_npass(a_max: float, blk: int, tol: float) -> int:
    """Passes needed for the truncated scan to be `tol`-accurate.

    The carry multiplier a is < 1 (attenuation: a = q*w/det,
    fast_sweep.build_kind_coeffs), so upwind influence decays as a^dist.
    After the first k passes the prefix includes every contribution
    closer than 2^k cells; the neglected tail has relative weight at
    most sum_{j>=2^k} a^j = a^(2^k)/(1-a). The smallest k with that
    bound < tol gives an error indistinguishable from f32 roundoff for
    tol ~ 1e-10 (measured engine drift is 1e-6..3e-5,
    docs/PERFORMANCE.md "f32 accuracy") while skipping most of the
    scan on optically thick / sub-Courant workloads. tol=0 disables
    truncation (full log2(blk) passes)."""
    full = len(_scan_strides(blk))
    if tol <= 0.0 or not np.isfinite(a_max):
        return full
    a = min(max(float(a_max), 0.0), 1.0 - 1e-12)
    for k in range(full):
        if a ** (1 << k) / (1.0 - a) < tol:
            return k
    return full


def _hillis_steele(b: jnp.ndarray, a: jnp.ndarray, blk: int,
                   m_ref, npass: Optional[int] = None) -> jnp.ndarray:
    """Inclusive prefix of carry_j = a*carry_{j-1} + b_j along axis 1
    (zero init), constant per-row a. `npass` (default: all) full-width
    VPU steps of roll + mul + add, using the precomputed _scan_masks
    planes; see _scan_npass for the truncation contract."""
    pref = b
    apow = a
    strides = _scan_strides(blk)
    if npass is not None:
        strides = strides[:npass]
    for k, d in enumerate(strides):
        # int32 shift: x64 mode would promote a Python int to i64, which
        # tpu.dynamic_rotate rejects.
        rolled = pltpu.roll(pref, jnp.int32(d), axis=1)
        pref = pref + (apow * m_ref[k]) * rolled
        apow = apow * apow
    return pref


# NOTE on rejected alternatives (measured, benchmarks/scan_experiments.py):
# * a two-level (chunked) in-register scan would cut the full-width
#   roll passes from log2(blk) to log2(128)+fixup, but Mosaic's layout
#   inference rejects the required lane-dim shape casts ("unsupported
#   shape cast" for (Bh, blk) -> (Bh*nch, 128)), and a (Bh, nch, 1)
#   cross-chunk array pads to full lane registers, erasing the saving;
# * the MXU Toeplitz-matmul prefix (L[t,s] = a^{t-s} blocked at 128,
#   replacing the first 5 passes) LOSES ~2x: the 128-lane contraction is
#   padded regardless of chunk width (128 MACs/element vs ~20 remaining
#   VPU ops), per-row L forces (nch,128)@(128,128) dots that reach only
#   ~1.8 T MAC/s, and Mosaic's dot has no f32-accurate fast path
#   (precision=HIGH is NotImplemented; bf16 default is far too coarse
#   for a^{t-s}). Measured: matmul route 91 us vs flat scan 52 us at the
#   headline shape.

# Mosaic's default scoped-VMEM budget is 16 MiB — well under the chip's
# physical VMEM (128 MiB on v5e). Round 1's empirical fusion limits
# (block <= 8192, K <= 8) were artifacts of that default; raising it
# admits larger blocks and deeper multi-step fusion.
_VMEM_LIMIT = 100 * 1024 * 1024


def _params(interpret: bool):
    return (None if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT))


class _Coef(NamedTuple):
    w: jnp.ndarray
    T0: jnp.ndarray
    q: jnp.ndarray
    idet: jnp.ndarray
    a: jnp.ndarray
    Sb: jnp.ndarray
    c1: jnp.ndarray
    c0: jnp.ndarray
    kee: jnp.ndarray
    kp: jnp.ndarray


def _unpack_coef(coef_ref) -> _Coef:
    c = coef_ref[0]                            # (Bh, NCOEF)
    return _Coef(*(c[:, k:k + 1] for k in range(_NCOEF)))


def _substep_block(kind, kc: _Coef, col, blk, m_ref,
                   e0, e1, p0, p1, h0, h1,
                   carry_ref, ptail, htail, npass=None):
    """One sub-step on one VMEM-resident block: RHS build, in-block scan,
    2x2 reconstruct. Reads/updates the inter-block carry scratch; `ptail`/
    `htail` are the previous block's upwind p1/h1 edge VALUES (not refs).
    Returns (new_e0, new_e1, carry-independent b total unused)."""

    def shift1(x, tail):
        rolled = pltpu.roll(x, jnp.int32(1), axis=1)
        return jnp.where(col < 1, tail, rolled)

    psi = 0.5 * (e0 + e1)
    S = kc.Sb + kc.c1 * psi + kc.c0

    if kind == BE:
        r0 = S + kc.kee * e0
        r1 = S + kc.kee * e1
    elif kind == CN:
        r0 = S + kc.kee * e0 - kc.q * e1 + kc.w * shift1(p1, ptail)
        r1 = S + kc.q * e0 + kc.kee * e1
    else:  # BDF
        r0 = (
            S + kc.kee * h0 - 2.0 * kc.w * h1 - kc.kp * p0 - kc.q * p1
            + kc.w * (4.0 * shift1(h1, htail) + shift1(p1, ptail))
        )
        r1 = S + 2.0 * kc.w * h0 + kc.kee * h1 + kc.q * p0 - kc.kp * p1

    b = (kc.q * r0 + kc.T0 * r1) * kc.idet

    c_in0 = carry_ref[:]
    b_adj = jnp.where(col < 1, b + kc.a * c_in0, b)
    pref = _hillis_steele(b_adj, kc.a, blk, m_ref, npass)
    carry_ref[:] = pref[:, -1:]

    rolled = pltpu.roll(pref, jnp.int32(1), axis=1)
    carry_in = jnp.where(col < 1, c_in0, rolled)

    u = r0 + kc.w * carry_in
    o0 = (kc.T0 * u - kc.q * r1) * kc.idet
    o1 = (kc.q * u + kc.T0 * r1) * kc.idet
    return o0, o1


def _make_kernel(kind: int, *, Bh: int, blk: int, Mh: int, G: int,
                 reflective: bool, s: float, npass: int = None):
    """Kernel factory, specialised per sub-step kind."""

    def kernel(coef_ref, bc_ref, perm_ref, m_ref, *refs):
        if kind == BDF:
            e0r, e1r, p0r, p1r, h0r, h1r, o0r, o1r, carry, ptail, htail = refs
        elif kind == CN:
            e0r, e1r, p1r, o0r, o1r, carry, ptail, htail = refs
        else:
            e0r, e1r, o0r, o1r, carry, ptail, htail = refs

        h = pl.program_id(0)
        i = pl.program_id(1)
        kc = _unpack_coef(coef_ref)

        # --- inflow / scratch management at the start of each half -------
        @pl.when(jnp.logical_and(h == 0, i == 0))
        def _():
            carry[:] = s * bc_ref[0]
            ptail[:] = jnp.zeros_like(ptail)
            htail[:] = jnp.zeros_like(htail)

        @pl.when(jnp.logical_and(h == 1, i == 0))
        def _():
            if reflective:
                # mu>0 inflow = flipped-direction mu<0 outflow, which the
                # carry scratch holds after the last h==0 block. The flip
                # m -> Mh-1-m is a (Bh x Bh) permutation matmul (Mosaic
                # has no rev primitive).
                carry[:] = s * jnp.dot(
                    perm_ref[:], carry[:], preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )
            else:
                carry[:] = s * bc_ref[0]
            ptail[:] = jnp.zeros_like(ptail)
            htail[:] = jnp.zeros_like(htail)

        col = lax.broadcasted_iota(jnp.int32, (Bh, blk), 1)
        e0, e1 = e0r[0], e1r[0]
        if kind == BDF:
            p0, p1, h0, h1 = p0r[0], p1r[0], h0r[0], h1r[0]
        elif kind == CN:
            p0, p1, h0, h1 = e0, p1r[0], e0, e1   # p0/h unused by CN
        else:
            p0, p1, h0, h1 = e0, e1, e0, e1       # unused by BE

        o0, o1 = _substep_block(kind, kc, col, blk, m_ref,
                                e0, e1, p0, p1, h0, h1,
                                carry, ptail[:], htail[:], npass)
        if kind in (CN, BDF):
            ptail[:] = p1[:, -1:]
        if kind == BDF:
            htail[:] = h1[:, -1:]
        o0r[0], o1r[0] = o0, o1

    return kernel


def _make_sharded_packed_kernel(kind: int, *, rows: int, blk: int,
                                npass: int = None):
    """Zero-inflow substep kernel for the multi-chip engine
    (parallel/sharded_pallas.py), with BOTH direction halves packed into
    the row (sublane) dimension: rows = 2*Bh_local.

    Same per-block math as _make_kernel, with three changes that make
    the kernel shard-local:

    * the half inflow carry starts at ZERO — the true inflow (boundary
      source / upstream shard / reflective coupling) is applied lazily as
      a deferred correction, because the per-cell 2x2 solve is AFFINE in
      the incoming carry: true(j) = zero_inflow(j) + (d0*a^j, a^{j+1}) *
      inc for the (o0, o1) edges, with d0 = T0*w/det and inc the carry
      entering the shard's first cell (known only after the cross-shard
      composite exchange);
    * every input plane pair arrives as (z-planes + pending correction
      vector) and the correction profile exp(j*ln a) is reconstructed on
      load — the previous substep's planes never need materialising;
    * the upwind history tails for block 0 (the CN/BDF one-cell shift
      terms, solver.cpp:359/397/540-542) come from halo inputs (the
      upstream shard's corrected last-cell edge, delivered by ppermute)
      instead of the folded-boundary zero fill (which shard 0 keeps).

    Because every row runs zero-inflow, the two halves are fully
    independent within a launch, so there is no reason to serialise
    them on the grid: a 1-D grid of nb visits processes (rows, blk)
    blocks with both halves' rows side by side. This halves the
    sequential visit count (each visit costs ~2 us of carry-chain
    latency regardless of occupancy) and fills the 8-sublane tiles when
    Bh_local < 8 (e.g. gray S_8 decks have Bh_local = 4 -> 8 packed
    rows). Layout conversion (2, Bh, X) <-> (2*Bh, X) is a free
    leading-dim collapse done by the caller outside the kernel.

    Input order: coef, corr_e, [corr_p, halo_p,] [corr_h, halo_h,]
    planes...; corr_* packs (inc, d0, a, ln_a) per row; every ref is
    2-D (rows, X) and the grid is (nblocks,).
    """

    def kernel(*refs):
        if kind == BDF:
            (coef_ref, m_ref, ce_ref, cp_ref, ch_ref, hp_ref, hh_ref,
             e0r, e1r, p0r, p1r, h0r, h1r,
             o0r, o1r, carry, ptail, htail) = refs
        elif kind == CN:
            (coef_ref, m_ref, ce_ref, cp_ref, hp_ref,
             e0r, e1r, p1r, o0r, o1r, carry, ptail, htail) = refs
        else:
            (coef_ref, m_ref, ce_ref,
             e0r, e1r, o0r, o1r, carry, ptail, htail) = refs

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[:] = jnp.zeros_like(carry)
            if kind in (CN, BDF):
                ptail[:] = hp_ref[...]
            else:
                ptail[:] = jnp.zeros_like(ptail)
            if kind == BDF:
                htail[:] = hh_ref[...]
            else:
                htail[:] = jnp.zeros_like(htail)

        c = coef_ref[...]                          # (rows, NCOEF)
        kc = _Coef(*(c[:, k:k + 1] for k in range(_NCOEF)))
        col = lax.broadcasted_iota(jnp.int32, (rows, blk), 1)
        jloc = (i * blk + col).astype(jnp.float32)

        def corr_pair(z0, z1, cref):
            cc = cref[...]                         # (rows, 4)
            inc, d0, a, ln_a = (cc[:, k:k + 1] for k in range(4))
            apj = jnp.exp(jloc * ln_a) * inc       # a^j * inc
            return z0 + d0 * apj, z1 + a * apj

        e0, e1 = corr_pair(e0r[...], e1r[...], ce_ref)
        if kind == BDF:
            p0, p1 = corr_pair(p0r[...], p1r[...], cp_ref)
            h0, h1 = corr_pair(h0r[...], h1r[...], ch_ref)
        elif kind == CN:
            _, p1 = corr_pair(p1r[...], p1r[...], cp_ref)
            p0, h0, h1 = e0, e0, e1                # unused by CN
        else:
            p0, p1, h0, h1 = e0, e1, e0, e1        # unused by BE

        o0, o1 = _substep_block(kind, kc, col, blk, m_ref,
                                e0, e1, p0, p1, h0, h1,
                                carry, ptail[:], htail[:], npass)
        if kind in (CN, BDF):
            ptail[:] = p1[:, -1:]
        if kind == BDF:
            htail[:] = h1[:, -1:]
        o0r[...], o1r[...] = o0, o1

    return kernel


def _make_multistep_kernel(kind: int, *, Bh: int, blk: int,
                           reflective: bool, s: float, K: int,
                           npass: int = None):
    """K whole BE or CN timesteps per launch (the BDF2 analogue lives in
    _make_bdf2_kernel). Per step: prev_ends is the step's input (committed
    every step, solver.cpp:620-625), so only the final ends + prev planes
    touch HBM — 4/K plane-passes per step. Same in-order (half, block)
    grid argument as the BDF2 multi-step kernel."""
    assert kind in (BE, CN)

    def kernel(coef_ref, bc_ref, perm_ref, m_ref, e0r, e1r,
               o0r, o1r, op0r, op1r, *scratch):
        assert len(scratch) == 2 * K
        carries = scratch[:K]
        etails = scratch[K: 2 * K]
        h = pl.program_id(0)
        i = pl.program_id(1)
        kc = _unpack_coef(coef_ref)

        @pl.when(jnp.logical_and(h == 0, i == 0))
        def _():
            for k in range(K):
                carries[k][:] = s * bc_ref[0]
                etails[k][:] = jnp.zeros_like(etails[k])

        @pl.when(jnp.logical_and(h == 1, i == 0))
        def _():
            for k in range(K):
                if reflective:
                    carries[k][:] = s * jnp.dot(
                        perm_ref[:], carries[k][:],
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST,
                    )
                else:
                    carries[k][:] = s * bc_ref[0]
                etails[k][:] = jnp.zeros_like(etails[k])

        col = lax.broadcasted_iota(jnp.int32, (Bh, blk), 1)
        e0, e1 = e0r[0], e1r[0]
        for k in range(K):
            et_prev = etails[k][:]
            zt = jnp.zeros_like(et_prev)
            # prev = this step's input ends (both kinds commit per step).
            f0, f1 = _substep_block(kind, kc, col, blk, m_ref,
                                    e0, e1, e0, e1, e0, e1, carries[k],
                                    et_prev, zt, npass)
            etails[k][:] = e1[:, -1:]
            if k == K - 1:
                op0r[0], op1r[0] = e0, e1
            e0, e1 = f0, f1

        o0r[0], o1r[0] = e0, e1

    return kernel


def _make_bdf2_kernel(*, Bh: int, blk: int, Mh: int, G: int,
                      reflective: bool, s_be: float, s_cn: float,
                      s_bdf: float, K: int = 1,
                      symmetric_half: bool = False,
                      npass_be: int = None, npass_cn: int = None,
                      npass_bdf: int = None):
    """ONE kernel for K whole BDF2 4-phase timesteps.

    The sub-steps couple only (a) cell-locally within a block, (b) through
    per-(step, kind) carries in sweep order, and (c) through the
    reflective half-boundary — all expressible with VMEM carry scratches
    over the same sequential (half, block) grid. Two fusion levels:

    * across PHASES: half_ends never crosses step boundaries in the
      reference BDF2 cycle (snapshotted at phase 1, consumed at phase 3,
      solver.cpp:733, 493-587) and prev_ends is the step's input ends, so
      the intermediate BE/CN/BE planes never touch HBM;
    * across STEPS: step k at block i depends only on step k at blocks
      < i (its own carries, in scratch) and step k-1 at block i (in
      registers) — and the mu<0 half never reads the mu>0 half — so the
      in-order (half, block) grid admits running K timesteps per block
      visit. Intermediate steps' ends planes never touch HBM either.

    HBM traffic for K timesteps: read 2 planes + write 4 (final ends +
    final half snapshot, kept for state parity) = 6/K plane-passes per
    step, versus ~21 for 4 separate substep launches.

    Scratches: per step k, 4 phase carries; plus per step k an
    ends/half tail pair (the upwind block's last prev/half edge for the
    CN/BDF shift terms).
    """

    def kernel(cbe_ref, ccn_ref, cbdf_ref, bc_ref, perm_ref, m_ref,
               e0r, e1r, o0r, o1r, oh0r, oh1r, op0r, op1r, *scratch):
        assert len(scratch) == 6 * K
        carries = scratch[: 4 * K]     # [k*4 + phase]
        etails = scratch[4 * K: 5 * K]
        htails = scratch[5 * K: 6 * K]
        h = pl.program_id(0)
        i = pl.program_id(1)
        kbe = _unpack_coef(cbe_ref)
        kcn = _unpack_coef(ccn_ref)
        kbdf = _unpack_coef(cbdf_ref)

        s_of_phase = (s_be, s_cn, s_be, s_bdf)

        @pl.when(jnp.logical_and(h == 0, i == 0))
        def _():
            for k in range(K):
                for p in range(4):
                    carries[4 * k + p][:] = s_of_phase[p] * bc_ref[0]
                etails[k][:] = jnp.zeros_like(etails[k])
                htails[k][:] = jnp.zeros_like(htails[k])

        @pl.when(jnp.logical_and(h == 1, i == 0))
        def _():
            for k in range(K):
                for p in range(4):
                    cs = carries[4 * k + p]
                    if reflective:
                        cs[:] = s_of_phase[p] * jnp.dot(
                            perm_ref[:], cs[:],
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST,
                        )
                    else:
                        cs[:] = s_of_phase[p] * bc_ref[0]
                etails[k][:] = jnp.zeros_like(etails[k])
                htails[k][:] = jnp.zeros_like(htails[k])

        col = lax.broadcasted_iota(jnp.int32, (Bh, blk), 1)
        e0, e1 = e0r[0], e1r[0]
        hc0 = hc1 = e0  # placeholder; overwritten in the loop

        # The half_ends snapshot is the CN output for the mu<0 half but
        # the phase-0 BE output for the mu>0 half (reference quirk: the
        # copy sits only in the mu<0 branch of the cell loop,
        # solver.cpp:733 vs 784-787). This grid step processes one half,
        # so the snapshot source is selected once per grid step.
        is_neg = (h == 0)
        hs0 = hs1 = e0  # placeholders; overwritten in the loop

        for k in range(K):
            et_prev = etails[k][:]
            ht_prev = htails[k][:]
            zt = jnp.zeros_like(et_prev)
            cbe1, ccn, cbe2, cbdf = carries[4 * k: 4 * k + 4]

            # Phase 0: BE(dt/2) predictor.
            b0, b1 = _substep_block(BE, kbe, col, blk, m_ref,
                                    e0, e1, e0, e1, e0, e1, cbe1, zt, zt,
                                    npass_be)
            # Phase 1: CN(dt/2) corrector -> half snapshot (see above).
            hc0, hc1 = _substep_block(CN, kcn, col, blk, m_ref,
                                      b0, b1, e0, e1, e0, e1, ccn,
                                      et_prev, zt, npass_cn)
            if symmetric_half:
                hs0, hs1 = hc0, hc1
            else:
                hs0 = jnp.where(is_neg, hc0, b0)
                hs1 = jnp.where(is_neg, hc1, b1)
            # Phase 2: second BE(dt/2) predictor.
            d0, d1 = _substep_block(BE, kbe, col, blk, m_ref,
                                    hc0, hc1, e0, e1, hs0, hs1, cbe2,
                                    zt, zt, npass_be)
            # Phase 3: BDF2 corrector (prev = step input ends, half = the
            # mixed snapshot).
            f0, f1 = _substep_block(BDF, kbdf, col, blk, m_ref,
                                    d0, d1, e0, e1, hs0, hs1, cbdf,
                                    et_prev, ht_prev, npass_bdf)

            etails[k][:] = e1[:, -1:]
            htails[k][:] = hs1[:, -1:]
            if k == K - 1:
                # prev_ends of the final state = the LAST step's input.
                op0r[0], op1r[0] = e0, e1
            e0, e1 = f0, f1

        o0r[0], o1r[0] = e0, e1
        oh0r[0], oh1r[0] = hs0, hs1

    return kernel


def _make_halo_multistep_kernel(kind: int, *, rows: int, blk: int,
                                K: int, npass: int = None):
    """Seeded packed K-step BE/CN kernel for the halo-overlap multi-chip
    engine (parallel/halo_pallas.py).

    Differences from _make_multistep_kernel:

    * both direction halves ride the row (sublane) dimension
      (rows = 2*Bh_local) on a 1-D grid — there is no intra-kernel
      reflective coupling to serialise the halves for (the global
      mu<0 -> mu>0 reflective jump is handled by the engine with a
      recorded-outflow fixup launch);
    * per-(row, step) seed VALUES replace the s*bc scalar fill (the
      engine pre-folds the fill multiplier s, and seeds differ per
      shard / per fixup substep);
    * a `reset` block index (SMEM scalar) at which the carries and
      upwind tails are (re)initialised from the seeds, so a halo
      prefix of zero-seeded absorber cells can precede the true
      domain (shard 0 skips its garbage halo; other shards reset at
      block 0 with zero seeds);
    * the end-of-chain carries (the physical outflow edge values per
      step, see parallel/sharded_pallas._exchange) are recorded to a
      small output for the reflective fixup.
    """
    assert kind in (BE, CN)

    def kernel(coef_ref, seeds_ref, reset_ref, m_ref, e0r, e1r,
               o0r, o1r, op0r, op1r, oc_ref, *scratch):
        assert len(scratch) == 2 * K
        carries = scratch[:K]
        etails = scratch[K:]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for k in range(K):
                carries[k][:] = jnp.zeros_like(carries[k])
                etails[k][:] = jnp.zeros_like(etails[k])

        # Re-seed where the true domain starts (program order: after the
        # zero init, so reset==0 applies seeds on top of the zero fill).
        @pl.when(i == reset_ref[0, 0])
        def _():
            sv = seeds_ref[...]                     # (rows, K)
            for k in range(K):
                carries[k][:] = sv[:, k:k + 1]
                etails[k][:] = jnp.zeros_like(etails[k])

        c = coef_ref[...]                           # (rows, NCOEF)
        kc = _Coef(*(c[:, k:k + 1] for k in range(_NCOEF)))
        col = lax.broadcasted_iota(jnp.int32, (rows, blk), 1)
        e0, e1 = e0r[...], e1r[...]
        for k in range(K):
            et_prev = etails[k][:]
            zt = jnp.zeros_like(et_prev)
            f0, f1 = _substep_block(kind, kc, col, blk, m_ref,
                                    e0, e1, e0, e1, e0, e1, carries[k],
                                    et_prev, zt, npass)
            etails[k][:] = e1[:, -1:]
            if k == K - 1:
                op0r[...], op1r[...] = e0, e1
            e0, e1 = f0, f1
        o0r[...], o1r[...] = e0, e1
        # Record end-of-chain carries (the last visit's write persists).
        for k in range(K):
            oc_ref[:, k:k + 1] = carries[k][:]

    return kernel


def _make_halo_bdf2_kernel(*, rows: int, blk: int, K: int,
                           symmetric_half: bool = False,
                           npass_be: int = None, npass_cn: int = None,
                           npass_bdf: int = None):
    """Seeded packed K-step BDF2 4-phase kernel for the halo-overlap
    engine — the _make_bdf2_kernel analogue of _make_halo_multistep_kernel
    (see its docstring for the seed/reset/record semantics). Seeds and the
    recorded outflows are laid out (rows, 4K) with column 4k+p for step k
    phase p. The reference's asymmetric half-ends snapshot (CN output for
    mu<0 rows, phase-0 BE output for mu>0 rows, solver.cpp:733 vs 784-787)
    becomes a per-row blend since both halves share a visit."""

    def kernel(cbe_ref, ccn_ref, cbdf_ref, seeds_ref, reset_ref, m_ref,
               e0r, e1r, o0r, o1r, oh0r, oh1r, op0r, op1r, oc_ref,
               *scratch):
        assert len(scratch) == 6 * K
        carries = scratch[: 4 * K]     # [k*4 + phase]
        etails = scratch[4 * K: 5 * K]
        htails = scratch[5 * K:]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for s in range(4 * K):
                carries[s][:] = jnp.zeros_like(carries[s])
            for k in range(K):
                etails[k][:] = jnp.zeros_like(etails[k])
                htails[k][:] = jnp.zeros_like(htails[k])

        @pl.when(i == reset_ref[0, 0])
        def _():
            sv = seeds_ref[...]                     # (rows, 4K)
            for s in range(4 * K):
                carries[s][:] = sv[:, s:s + 1]
            for k in range(K):
                etails[k][:] = jnp.zeros_like(etails[k])
                htails[k][:] = jnp.zeros_like(htails[k])

        def unpack(ref):
            c = ref[...]
            return _Coef(*(c[:, k:k + 1] for k in range(_NCOEF)))

        kbe, kcn, kbdf = unpack(cbe_ref), unpack(ccn_ref), unpack(cbdf_ref)
        col = lax.broadcasted_iota(jnp.int32, (rows, blk), 1)
        row = lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        is_neg = row < (rows // 2)                  # mu<0 rows first

        e0, e1 = e0r[...], e1r[...]
        hs0 = hs1 = e0                              # overwritten in loop
        for k in range(K):
            et_prev = etails[k][:]
            ht_prev = htails[k][:]
            zt = jnp.zeros_like(et_prev)
            cbe1, ccn, cbe2, cbdf = carries[4 * k: 4 * k + 4]

            # Phase 0: BE(dt/2) predictor.
            b0, b1 = _substep_block(BE, kbe, col, blk, m_ref,
                                    e0, e1, e0, e1, e0, e1, cbe1, zt, zt,
                                    npass_be)
            # Phase 1: CN(dt/2) corrector -> half snapshot.
            hc0, hc1 = _substep_block(CN, kcn, col, blk, m_ref,
                                      b0, b1, e0, e1, e0, e1, ccn,
                                      et_prev, zt, npass_cn)
            if symmetric_half:
                hs0, hs1 = hc0, hc1
            else:
                hs0 = jnp.where(is_neg, hc0, b0)
                hs1 = jnp.where(is_neg, hc1, b1)
            # Phase 2: second BE(dt/2) predictor.
            d0, d1 = _substep_block(BE, kbe, col, blk, m_ref,
                                    hc0, hc1, e0, e1, hs0, hs1, cbe2,
                                    zt, zt, npass_be)
            # Phase 3: BDF2 corrector (prev = step input ends).
            f0, f1 = _substep_block(BDF, kbdf, col, blk, m_ref,
                                    d0, d1, e0, e1, hs0, hs1, cbdf,
                                    et_prev, ht_prev, npass_bdf)

            etails[k][:] = e1[:, -1:]
            htails[k][:] = hs1[:, -1:]
            if k == K - 1:
                op0r[...], op1r[...] = e0, e1
            e0, e1 = f0, f1

        o0r[...], o1r[...] = e0, e1
        oh0r[...], oh1r[...] = hs0, hs1
        for s in range(4 * K):
            oc_ref[:, s:s + 1] = carries[s][:]

    return kernel


class PallasEngine:
    """Drop-in fused solver using the single-pass Pallas sweep kernel.

    State: plain sweep-order planes (2, Bh, N) float32 (mu<0 half stored
    N-reversed / edge-swapped, as in fast_sweep).
    """

    def __init__(self, cfg: Config, tables, block: Optional[int] = None,
                 interpret: Optional[bool] = None,
                 scan_tol: float = 1e-10):
        self.cfg = cfg
        self.tables = tables
        self.scan_tol = scan_tol
        auto_block = block is None
        if auto_block:
            block = 2048
        Mh, G = cfg.M // 2, cfg.G
        self.Mh, self.G = Mh, G
        self.Bh = Mh * G
        if interpret is None:
            # Mosaic-compile on any real TPU backend (including tunnelled
            # platforms whose backend name is not literally "tpu");
            # interpret elsewhere (CPU tests).
            interpret = jax.devices()[0].platform == "cpu"
        self.interpret = interpret

        self.block = block
        while cfg.N % self.block != 0 or (self.block & (self.block - 1)):
            self.block //= 2
            if self.block == 0:
                raise ValueError(f"N={cfg.N} has no power-of-two block")
        # VMEM budget (auto mode only — an explicit `block` is pinned so
        # callers/tests control the decomposition): the fused kernel keeps
        # ~8 double-buffered block planes live (2 in + 6 out); Bh*block
        # <= 2^17 f32 elements keeps the working set comfortable (Mosaic's
        # scoped-VMEM limit is raised to _VMEM_LIMIT, but Bh=64 x blk=4096
        # still fails to compile at high fusion depth).
        while auto_block and self.Bh * self.block > (1 << 17) \
                and self.block > 128:
            self.block //= 2
        # BDF2 prefers Bh*block = 2^17 with K=4 steps/launch over the
        # round-2 default 2^16 with K=8 (same-session sweep: headline
        # Bh=16 55.4G at (8192, K=4) vs 54.0G at (4096, K=8); 16-group
        # S_8 Bh=64 35.5G at (2048, K=4) vs 34.2G at (1024, K=8); gray
        # S_8 Bh=4 13.1G vs 12.5G; 128-group S_4 neutral). (2^17, K=8)
        # compiles but loses ~4%; max_steps_per_launch picks the matching
        # K. Floor blk=512 (128-group S_4: 21.1G at 512 vs 15.8G at 256).
        while (auto_block and cfg.ts_method == 3
                and self.Bh * self.block > (1 << 17)
                and self.block > 512):
            self.block //= 2
        # Small batches (Bh < 16) underfill grid visits, and the serial
        # inter-block carry makes the per-visit cost (~2 us) the floor:
        # grow the block until Bh*block hits the fusion-regime target
        # (2^17 for BDF2 at K=4, 2^16 for BE/CN at K<=16) so each visit
        # carries a full-size workload. Measured: gray S_8 (Bh=4) 13.1G
        # at blk=32768/K=4 vs 7.7G at blk=4096 (and 9.1G for the XLA
        # engine). Only in auto mode — an explicit `block` is respected
        # so tests and callers can pin the inter-block decomposition.
        if auto_block:
            # 2^17 wins for every integrator (same-session, headline
            # shape: BDF2 56.0 vs 54.0 at K=4, BE 35.8 vs 34.3 and CN
            # 35.6 vs 33.1 sub-G at K=16).
            target = 1 << 17
            while (self.Bh * self.block * 2 <= target
                   and self.block < cfg.N
                   and cfg.N % (self.block * 2) == 0):
                self.block *= 2
        # Mosaic requires the lane (last) block dim to be a multiple of 128
        # or equal to the full array dim. Small reference decks (N=100, 50)
        # have no such power-of-two divisor — run them as ONE whole-N block
        # (grid (2, 1)); the in-block scan handles any length. Auto mode
        # applies the same fallback in interpret so CPU runs use the same
        # decomposition as the chip; an explicit block stays pinned there.
        if self.block % 128 != 0 and self.block != cfg.N:
            if not interpret or auto_block:
                self.block = cfg.N
        self.nblocks = cfg.N // self.block

        # Reuse the XLA fast engine for coefficients, BCs and layout maps.
        self._fe = fs.FastEngine(cfg, tables, dtype=jnp.float32,
                                 chunk=self.block, pad=False)

        # Accuracy-bounded scan truncation (see _scan_npass): per-kind
        # pass counts from the largest carry multiplier; the shared mask
        # input is sized to the largest count (min 1 so the block spec
        # stays non-degenerate when every scan is a no-op).
        self.scan_npass = {
            kind: _scan_npass(
                float(np.max(np.asarray(kc.a, dtype=np.float64))),
                self.block, scan_tol)
            for kind, kc in self._fe.kcs.items()
        }
        self._mask_count = max(1, *self.scan_npass.values())
        # All engine constants stay host numpy (closed over in jit ->
        # HLO literals; device captures would D2H at lowering, see
        # models/transport.Tables).
        self.scan_masks = _scan_masks(self.block)[:self._mask_count]
        self.reflective = self._fe.bc_pos_fixed is None
        psrc = np.asarray(tables.psi_source, dtype=np.float64)
        bc_neg = np.asarray(self._fe.bc_neg, dtype=np.float32)
        if self.reflective:
            bc_pos = np.zeros(self.Bh, dtype=np.float32)  # unused
        else:
            bc_pos = np.asarray(self._fe.bc_pos_fixed, dtype=np.float32)
        self.bc = np.stack([bc_neg, bc_pos])[..., None].astype(
            np.float32)  # (2, Bh, 1)

        flip = fs._refl_flip_indices(Mh, G)
        P = np.zeros((self.Bh, self.Bh), dtype=np.float32)
        P[np.arange(self.Bh), flip] = 1.0
        self.refl_P = P

        self.coef = {
            kind: _pack_coeffs(kc) for kind, kc in self._fe.kcs.items()
        }
        self._calls = {kind: self._build_call(kind) for kind in self.coef}
        self._bdf2_calls: dict = {}
        self._multi_calls: dict = {}
        if cfg.ts_method == 3:
            self._bdf2_calls[1] = self._build_bdf2_call(1)

    # -- pallas call builder --------------------------------------------------

    def _build_call(self, kind: int):
        Bh, blk, nb = self.Bh, self.block, self.nblocks
        N = self.cfg.N
        kc = self._fe.kcs[kind]

        n_in = {BE: 2, CN: 3, BDF: 6}[kind]
        # Index maps derive every constant from the traced grid indices:
        # under jax_enable_x64 a literal 0 traces as i64, which Mosaic's
        # index-map signature (i32) rejects.
        plane_spec = pl.BlockSpec(
            (1, Bh, blk), lambda h, i: (h, h * 0, i), memory_space=pltpu.VMEM
        )
        coef_spec = pl.BlockSpec(
            (1, Bh, _NCOEF), lambda h, i: (h, h * 0, h * 0),
            memory_space=pltpu.VMEM,
        )
        bc_spec = pl.BlockSpec(
            (1, Bh, 1), lambda h, i: (h, h * 0, h * 0), memory_space=pltpu.VMEM
        )
        perm_spec = pl.BlockSpec(
            (Bh, Bh), lambda h, i: (h * 0, h * 0), memory_space=pltpu.VMEM
        )
        mask_spec = pl.BlockSpec(
            (self._mask_count, 1, blk), lambda h, i: (h * 0, h * 0, h * 0),
            memory_space=pltpu.VMEM,
        )

        kernel = _make_kernel(
            kind, Bh=Bh, blk=blk, Mh=self.Mh, G=self.G,
            reflective=self.reflective, s=float(kc.s),
            npass=self.scan_npass[kind],
        )

        call = pl.pallas_call(
            kernel,
            grid=(2, nb),
            in_specs=[coef_spec, bc_spec, perm_spec, mask_spec]
            + [plane_spec] * n_in,
            out_specs=(plane_spec, plane_spec),
            out_shape=(
                jax.ShapeDtypeStruct((2, Bh, N), jnp.float32),
                jax.ShapeDtypeStruct((2, Bh, N), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((Bh, 1), jnp.float32),   # carry
                pltpu.VMEM((Bh, 1), jnp.float32),   # prev tail
                pltpu.VMEM((Bh, 1), jnp.float32),   # half tail
            ],
            interpret=self.interpret,
            compiler_params=_params(self.interpret),
        )
        return call

    def _build_bdf2_call(self, K: int = 1):
        Bh, blk, nb = self.Bh, self.block, self.nblocks
        N = self.cfg.N

        plane_spec = pl.BlockSpec(
            (1, Bh, blk), lambda h, i: (h, h * 0, i), memory_space=pltpu.VMEM
        )
        coef_spec = pl.BlockSpec(
            (1, Bh, _NCOEF), lambda h, i: (h, h * 0, h * 0),
            memory_space=pltpu.VMEM,
        )
        bc_spec = pl.BlockSpec(
            (1, Bh, 1), lambda h, i: (h, h * 0, h * 0), memory_space=pltpu.VMEM
        )
        perm_spec = pl.BlockSpec(
            (Bh, Bh), lambda h, i: (h * 0, h * 0), memory_space=pltpu.VMEM
        )
        mask_spec = pl.BlockSpec(
            (self._mask_count, 1, blk), lambda h, i: (h * 0, h * 0, h * 0),
            memory_space=pltpu.VMEM,
        )

        kernel = _make_bdf2_kernel(
            Bh=Bh, blk=blk, Mh=self.Mh, G=self.G,
            reflective=self.reflective,
            s_be=float(self._fe.kcs[BE].s),
            s_cn=float(self._fe.kcs[CN].s),
            s_bdf=float(self._fe.kcs[BDF].s),
            K=K,
            symmetric_half=self.cfg.bdf2_symmetric_half,
            npass_be=self.scan_npass[BE],
            npass_cn=self.scan_npass[CN],
            npass_bdf=self.scan_npass[BDF],
        )

        plane = jax.ShapeDtypeStruct((2, Bh, N), jnp.float32)
        return pl.pallas_call(
            kernel,
            grid=(2, nb),
            in_specs=[coef_spec, coef_spec, coef_spec, bc_spec, perm_spec,
                      mask_spec, plane_spec, plane_spec],
            out_specs=(plane_spec,) * 6,
            out_shape=(plane,) * 6,
            scratch_shapes=[pltpu.VMEM((Bh, 1), jnp.float32)] * (6 * K),
            interpret=self.interpret,
            compiler_params=_params(self.interpret),
        )

    # -- stepping ---------------------------------------------------------------

    def substep(self, kind: int, st) -> Tuple[jnp.ndarray, jnp.ndarray]:
        coef, bc = self.coef[kind], self.bc
        if kind == BDF:
            ins = (st.e0, st.e1, st.p0, st.p1, st.h0, st.h1)
        elif kind == CN:
            ins = (st.e0, st.e1, st.p1)
        else:
            ins = (st.e0, st.e1)
        return self._calls[kind](coef, bc, self.refl_P, self.scan_masks,
                                 *ins)

    def step(self, st: fs.FlatState) -> fs.FlatState:
        cfg = self.cfg
        if cfg.ts_method == 1:
            ne0, ne1 = self.substep(BE, st)
            return fs.FlatState(ne0, ne1, st.e0, st.e1, st.h0, st.h1)
        if cfg.ts_method == 2:
            st1 = fs.FlatState(st.e0, st.e1, st.e0, st.e1, st.h0, st.h1)
            ne0, ne1 = self.substep(CN, st1)
            return fs.FlatState(ne0, ne1, st.e0, st.e1, st.h0, st.h1)
        # BDF2: the whole 4-phase cycle in one fused kernel launch.
        return self.multi_step(st, 1)

    def _build_multistep_call(self, kind: int, K: int):
        Bh, blk, nb = self.Bh, self.block, self.nblocks
        N = self.cfg.N

        plane_spec = pl.BlockSpec(
            (1, Bh, blk), lambda h, i: (h, h * 0, i), memory_space=pltpu.VMEM
        )
        coef_spec = pl.BlockSpec(
            (1, Bh, _NCOEF), lambda h, i: (h, h * 0, h * 0),
            memory_space=pltpu.VMEM,
        )
        bc_spec = pl.BlockSpec(
            (1, Bh, 1), lambda h, i: (h, h * 0, h * 0), memory_space=pltpu.VMEM
        )
        perm_spec = pl.BlockSpec(
            (Bh, Bh), lambda h, i: (h * 0, h * 0), memory_space=pltpu.VMEM
        )
        mask_spec = pl.BlockSpec(
            (self._mask_count, 1, blk), lambda h, i: (h * 0, h * 0, h * 0),
            memory_space=pltpu.VMEM,
        )
        kernel = _make_multistep_kernel(
            kind, Bh=Bh, blk=blk, reflective=self.reflective,
            s=float(self._fe.kcs[kind].s), K=K,
            npass=self.scan_npass[kind],
        )
        plane = jax.ShapeDtypeStruct((2, Bh, N), jnp.float32)
        return pl.pallas_call(
            kernel,
            grid=(2, nb),
            in_specs=[coef_spec, bc_spec, perm_spec, mask_spec,
                      plane_spec, plane_spec],
            out_specs=(plane_spec,) * 4,
            out_shape=(plane,) * 4,
            scratch_shapes=[pltpu.VMEM((Bh, 1), jnp.float32)] * (2 * K),
            interpret=self.interpret,
            compiler_params=_params(self.interpret),
        )

    def max_steps_per_launch(self) -> int:
        """Best K for the fused multi-step kernel at this block shape.
        Round-1's tight limits (K=8 only at Bh <= 16; K=2 at Bh=64) were
        artifacts of Mosaic's default 16 MiB scoped-VMEM budget; with
        the raised _VMEM_LIMIT the K-vs-block tradeoff is a measured
        frontier (same-session sweeps, docs/PERFORMANCE.md): BDF2 wins
        at Bh*block = 2^17 with K=4 (headline 55.4G vs 54.0G at
        2^16/K=8), falls back to K=8 in the 2^16 regime (small N), and
        K=16 still fails Mosaic compile (hang). BE/CN keep only 4
        planes live: K=16 wins at Bh <= 16 (block 8192: BE 35.8, CN
        35.6 sub-G vs 33.6/33.8 at K=8) and loses at Bh=64 (12.9 vs
        15.5 sub-G), where K=8 stays."""
        p = self.Bh * self.block
        if self.cfg.ts_method in (1, 2):
            if self.Bh <= 16:
                return 16  # verified at Bh=16, block=8192 (2^17): BE
                # 35.8 / CN 35.6 sub-G vs 33.6/33.8 at K=8
            return 8  # K=16 at Bh=64 measures 12.9 vs 15.5 sub-G
        if p <= (1 << 16):
            return 8
        if p <= (1 << 17):
            return 4
        return 1

    def multi_step(self, st: fs.FlatState, K: int) -> fs.FlatState:
        """K whole timesteps in ONE kernel launch (intermediate steps'
        planes never touch HBM — 6/K plane-passes per step for BDF2,
        4/K for BE/CN). Identical trajectory to K calls of step()."""
        if self.cfg.ts_method in (1, 2):
            kind = BE if self.cfg.ts_method == 1 else CN
            call = self._multi_calls.get((kind, K))
            if call is None:
                call = self._build_multistep_call(kind, K)
                self._multi_calls[(kind, K)] = call
            ne0, ne1, np0, np1 = call(
                self.coef[kind], self.bc, self.refl_P, self.scan_masks,
                st.e0, st.e1
            )
            return fs.FlatState(ne0, ne1, np0, np1, st.h0, st.h1)
        call = self._bdf2_calls.get(K)
        if call is None:
            call = self._build_bdf2_call(K)
            self._bdf2_calls[K] = call
        ne0, ne1, nh0, nh1, np0, np1 = call(
            self.coef[BE], self.coef[CN], self.coef[BDF],
            self.bc, self.refl_P, self.scan_masks, st.e0, st.e1,
        )
        return fs.FlatState(ne0, ne1, np0, np1, nh0, nh1)

    # -- layout: planes are flat (2, Bh, N); reuse FastEngine converters ---------

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
            jnp.broadcast_to(Bg[None, :, None], (2, self.Bh, cfg.N))
        )
        return fs.FlatState(plane, plane, plane, plane, plane, plane)

    def from_ends(self, ends, prev, half) -> fs.FlatState:
        t = self._fe.from_ends(ends, prev, half)
        u = self._fe.untile
        return fs.FlatState(u(t.e0), u(t.e1), u(t.p0), u(t.p1), u(t.h0), u(t.h1))

    def ends_pair(self, x0, x1) -> jnp.ndarray:
        return self._fe.ends_pair(self._fe.tile(x0), self._fe.tile(x1))

    def ends(self, st: fs.FlatState) -> jnp.ndarray:
        return self.ends_pair(st.e0, st.e1)

    def solve(self, state: Optional[fs.FlatState] = None,
              num_steps: Optional[int] = None,
              steps_per_launch: Optional[int] = None) -> fs.FlatState:
        """Run n timesteps. For BDF2, multiple whole timesteps are fused
        into each kernel launch (default 8, or as many as remain) — same
        trajectory, ~1/K of the HBM traffic."""
        n = self.cfg.max_timesteps if num_steps is None else num_steps
        if state is None:
            state = self.init_state()

        K = steps_per_launch or min(self.max_steps_per_launch(), max(n, 1))
        body, tail = divmod(n, K)

        cache = getattr(self, "_solve_runs", None)
        if cache is None:
            cache = self._solve_runs = {}
        run = cache.get((body, tail, K))
        if run is None:
            @jax.jit
            def run(st):
                if body:
                    st = lax.fori_loop(
                        0, body, lambda _, s: self.multi_step(s, K), st
                    )
                if tail:
                    st = self.multi_step(st, tail)
                return st

            cache[(body, tail, K)] = run
        return run(state)
