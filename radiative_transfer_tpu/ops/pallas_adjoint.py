"""Kernel-rate adjoints: a custom_vjp for the fused Pallas step.

VERDICT r3 #6. The differentiable path used to top out at the XLA fast
engine (adjoint.make_diff_solve_fast); this module gives the Pallas
engine's step an analytic reverse kernel so gradients run at kernel
rate. Three structural facts make it compact:

* The transport step is AFFINE in the state (reference
  solver.cpp:319-587 is a linear solve per cell), so the state adjoint
  is the TRANSPOSED affine cycle — it needs the coefficient constants
  but NO primal trajectory values.
* The adjoint of the in-block carry scan  pref_j = sum_{i<=j} a^{j-i} b_i
  is the same Hillis-Steele scan run in the REVERSED direction
  (b_adj_i = sum_{j>=i} a^{j-i} pref_cot_j), with mirrored masks — same
  cost, same truncation bound.
* Coefficient gradients need the primal values, which the backward
  kernel RECOMPUTES in-VMEM from the step's saved input planes plus
  tiny per-block carry/edge records the forward kernel emits
  ((2, 4, Bh, nb) and (2, Bh, nb) — negligible HBM). One grad step
  therefore costs ~1 forward (recompute) + ~1 transposed cycle on top
  of the forward itself — the <=3x budget.
  A useful identity keeps the scan's a-gradient free: with
  dpref_j/da = sum_i (j-i) a^{j-i-1} b_i, transposing the sum gives
  a_cot = sum_cells cin * b_adj_cot — both factors already computed.

The backward kernel runs the (half, block) grid REVERSED (mu>0 half
first, blocks downstream-to-upstream) so the cross-block edge/carry
cotangents flow naturally, and the reflective coupling's adjoint — the
mu>0 inflow cotangent, flipped and scaled by the phase's s-fold — is
deposited exactly when the mu<0 half's last block is visited next.
The s-folded boundary (carry = s*bc, zero fills; fast_sweep
_kind_coeff_fields s in {1,2,6}, parameter-independent multiplicities)
is identical to the unfolded math as a FUNCTION of (state, bc, coefs),
so its adjoint yields exact bc/coefficient gradients too.

make_diff_solve_pallas wires it into the same contract as
adjoint.make_diff_solve_fast: params (kappa/rho/psi_source/T) enter
through adjoint.traced_tables -> build_kind_coeffs_traced -> a traced
f32 coefficient pack, and JAX chains the kernel's pack/bc cotangents
back to the params. float32 compute end to end: gradients carry
f32-grade (~1e-5 relative) fidelity vs the f64 adjoint — the precision
trade is the same one the forward perf engines make
(docs/PERFORMANCE.md "f32 accuracy").
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config.config import Config
from . import fast_sweep as fs
from . import pallas_sweep as ps

BE, CN, BDF = fs.BE, fs.CN, fs.BDF


# ---------------------------------------------------------------------------
# Reversed truncated scan
# ---------------------------------------------------------------------------

def _rev_scan_masks(blk: int) -> np.ndarray:
    """masks[k, 0, col] = 1.0 iff col < blk - stride_k (the mirror of
    ps._scan_masks): pass k of the reversed scan pulls from col+stride."""
    col = np.arange(blk)[None, :]
    return np.stack(
        [(col < blk - d).astype(np.float32) for d in ps._scan_strides(blk)]
    )


def _hillis_steele_rev(x, a, blk, mrev_ref, npass=None):
    """out_i = sum_{j>=i} a^{j-i} x_j — the transpose of
    ps._hillis_steele (same truncation contract)."""
    pref = x
    apow = a
    strides = ps._scan_strides(blk)
    if npass is not None:
        strides = strides[:npass]
    for k, d in enumerate(strides):
        rolled = pltpu.roll(pref, jnp.int32(blk - d), axis=1)
        pref = pref + (apow * mrev_ref[k]) * rolled
        apow = apow * apow
    return pref


def _shift_up(x, col, blk, tail_cot=None):
    """Adjoint of shift1 (x_j -> x_{j-1} with a tail fill): y_j = x_{j+1}
    for j < blk-1, and y_{blk-1} = tail_cot (the cotangent arriving from
    the downstream block's first cell), default 0."""
    rolled = pltpu.roll(x, jnp.int32(blk - 1), axis=1)
    fill = jnp.zeros_like(x[:, :1]) if tail_cot is None else tail_cot
    return jnp.where(col == blk - 1, fill, rolled)


# ---------------------------------------------------------------------------
# Forward substep (pure, value-carry, returns primals for the adjoint)
# ---------------------------------------------------------------------------

class _SubPrimals(NamedTuple):
    r0: jnp.ndarray
    r1: jnp.ndarray
    psi: jnp.ndarray
    cin: jnp.ndarray
    u: jnp.ndarray
    p1s: jnp.ndarray        # zeros-like for BE
    h1s: jnp.ndarray        # zeros-like for BE/CN
    o1: jnp.ndarray
    carry_out: jnp.ndarray


def _substep_vals(kind, kc, col, blk, m_ref, e0, e1, p0, p1, h0, h1,
                  c_in, ptail, htail, npass):
    """ps._substep_block with a VALUE carry, returning the primal
    intermediates the adjoint's coefficient gradients need (same
    algebra; reference solver.cpp:319-587)."""
    def shift1(x, tail):
        rolled = pltpu.roll(x, jnp.int32(1), axis=1)
        return jnp.where(col < 1, tail, rolled)

    psi = 0.5 * (e0 + e1)
    S = kc.Sb + kc.c1 * psi + kc.c0
    z = jnp.zeros_like(e0)
    p1s = h1s = z
    if kind == BE:
        r0 = S + kc.kee * e0
        r1 = S + kc.kee * e1
    elif kind == CN:
        p1s = shift1(p1, ptail)
        r0 = S + kc.kee * e0 - kc.q * e1 + kc.w * p1s
        r1 = S + kc.q * e0 + kc.kee * e1
    else:
        p1s = shift1(p1, ptail)
        h1s = shift1(h1, htail)
        r0 = (S + kc.kee * h0 - 2.0 * kc.w * h1 - kc.kp * p0 - kc.q * p1
              + kc.w * (4.0 * h1s + p1s))
        r1 = S + 2.0 * kc.w * h0 + kc.kee * h1 + kc.q * p0 - kc.kp * p1

    b = (kc.q * r0 + kc.T0 * r1) * kc.idet
    b_adj = jnp.where(col < 1, b + kc.a * c_in, b)
    pref = ps._hillis_steele(b_adj, kc.a, blk, m_ref, npass)
    carry_out = pref[:, -1:]
    rolled = pltpu.roll(pref, jnp.int32(1), axis=1)
    cin = jnp.where(col < 1, c_in, rolled)
    u = r0 + kc.w * cin
    o0 = (kc.T0 * u - kc.q * r1) * kc.idet
    o1 = (kc.q * u + kc.T0 * r1) * kc.idet
    return o0, o1, _SubPrimals(r0, r1, psi, cin, u, p1s, h1s, o1, carry_out)


# ---------------------------------------------------------------------------
# Substep adjoint
# ---------------------------------------------------------------------------

class _SubCots(NamedTuple):
    e0: jnp.ndarray
    e1: jnp.ndarray
    p0: jnp.ndarray
    p1: jnp.ndarray
    h0: jnp.ndarray
    h1: jnp.ndarray
    c_in: jnp.ndarray       # (Bh, 1) cotangent on the incoming carry
    ptail: jnp.ndarray      # (Bh, 1) cotangent on the upstream p1 edge
    htail: jnp.ndarray      # (Bh, 1) cotangent on the upstream hs1 edge
    coef: jnp.ndarray       # (Bh, NCOEF) gradient rows (cell-summed)


def _substep_adj(kind, kc, col, blk, mrev_ref, pr: _SubPrimals,
                 e0, e1, p0, p1, h0, h1, o0c, o1c, carry_out_c, npass):
    """Transpose of _substep_vals: cotangents on (o0, o1, carry_out) ->
    cotangents on the input planes, incoming carry, upstream edges, and
    the per-row coefficient gradients (summed over this block's cells;
    the input planes and saved primals feed only those gradients — the
    state adjoint is coefficient-only, the step being affine in state).
    """
    # Reconstruct adjoint: o0 = idet(T0 u - q r1), o1 = idet(q u + T0 r1).
    u_c = kc.idet * (kc.T0 * o0c + kc.q * o1c)
    r1_c = kc.idet * (kc.T0 * o1c - kc.q * o0c)
    cin_c = kc.w * u_c

    # Scan adjoint: pref cotangent = rolled-up cin cotangent with the
    # outgoing-carry cotangent in the last column (cin_0 reads c_in
    # directly, not pref; pref[-1] feeds only carry_out).
    pref_c = _shift_up(cin_c, col, blk, tail_cot=carry_out_c)
    b_adj_c = _hillis_steele_rev(pref_c, kc.a, blk, mrev_ref, npass)
    c_in_c = kc.a * b_adj_c[:, :1] + cin_c[:, :1]
    b_c = b_adj_c
    r0_c = u_c + kc.idet * kc.q * b_c
    r1_c = r1_c + kc.idet * kc.T0 * b_c

    S_c = r0_c + r1_c
    z = jnp.zeros_like(o0c)
    zc = jnp.zeros_like(o0c[:, :1])
    p0c = p1c = h0c = h1c = z
    ptail_c = htail_c = zc
    half = 0.5 * kc.c1 * S_c

    def rs(x):
        return jnp.sum(x, axis=1, keepdims=True)

    if kind == BE:
        e0c = kc.kee * r0_c + half
        e1c = kc.kee * r1_c + half
        g_kee = rs(e0 * r0_c + e1 * r1_c)
        g_kp = zc
        g_w_rhs = zc
        g_q_rhs = zc
    elif kind == CN:
        e0c = kc.kee * r0_c + kc.q * r1_c + half
        e1c = -kc.q * r0_c + kc.kee * r1_c + half
        p1s_c = kc.w * r0_c
        p1c = _shift_up(p1s_c, col, blk)
        ptail_c = p1s_c[:, :1]
        g_kee = rs(e0 * r0_c + e1 * r1_c)
        g_kp = zc
        g_w_rhs = rs(pr.p1s * r0_c)
        g_q_rhs = rs(-e1 * r0_c + e0 * r1_c)
    else:
        e0c = half
        e1c = half
        h0c = kc.kee * r0_c + 2.0 * kc.w * r1_c
        h1c = -2.0 * kc.w * r0_c + kc.kee * r1_c
        p0c = -kc.kp * r0_c + kc.q * r1_c
        p1c = -kc.q * r0_c - kc.kp * r1_c
        p1s_c = kc.w * r0_c
        h1s_c = 4.0 * kc.w * r0_c
        p1c = p1c + _shift_up(p1s_c, col, blk)
        h1c = h1c + _shift_up(h1s_c, col, blk)
        ptail_c = p1s_c[:, :1]
        htail_c = h1s_c[:, :1]
        g_kee = rs(h0 * r0_c + h1 * r1_c)
        g_kp = rs(-p0 * r0_c - p1 * r1_c)
        g_w_rhs = rs((-2.0 * h1 + 4.0 * pr.h1s + pr.p1s) * r0_c
                     + 2.0 * h0 * r1_c)
        g_q_rhs = rs(-p1 * r0_c + p0 * r1_c)

    # Remaining coefficient gradients, ps._pack_coeffs column order
    # [w, T0, q, idet, a, Sb, c1, c0, kee, kp].
    P0 = kc.T0 * pr.u - kc.q * pr.r1        # o0 = idet * P0
    P1 = kc.q * pr.u + kc.T0 * pr.r1        # o1 = idet * P1
    qr = kc.q * pr.r0 + kc.T0 * pr.r1       # b = idet * qr
    g_idet = rs(P0 * o0c + P1 * o1c + qr * b_c)
    g_T0 = rs(kc.idet * (pr.u * o0c + pr.r1 * o1c + pr.r1 * b_c))
    g_q = g_q_rhs + rs(kc.idet * (-pr.r1 * o0c + pr.u * o1c
                                  + pr.r0 * b_c))
    g_a = rs(pr.cin * b_adj_c)              # scan-transpose identity
    g_Sb = rs(S_c)
    g_c0 = rs(S_c)
    g_c1 = rs(pr.psi * S_c)
    g_w = g_w_rhs + rs(pr.cin * u_c)
    coef = jnp.concatenate([g_w, g_T0, g_q, g_idet, g_a, g_Sb,
                            g_c1, g_c0, g_kee, g_kp], axis=1)
    return _SubCots(e0c, e1c, p0c, p1c, h0c, h1c, c_in_c, ptail_c,
                    htail_c, coef)


# ---------------------------------------------------------------------------
# Forward-with-records kernel (K=1)
# ---------------------------------------------------------------------------

def _make_fwd_record_kernel(ts_method: int, *, Bh: int, blk: int,
                            reflective: bool, s_be: float, s_cn: float,
                            s_bdf: float, symmetric_half: bool,
                            npass: dict):
    """The production K=1 step kernel (ps._make_bdf2_kernel /
    _make_multistep_kernel) plus tiny per-block records the backward
    kernel replays: each phase's carry at block entry and the upwind
    p1/hs1 edges. Same (half, block) in-order grid."""
    bdf2 = ts_method == 3
    kind1 = BE if ts_method == 1 else CN
    s1 = s_be if ts_method == 1 else s_cn
    nph = 4 if bdf2 else 1

    def kernel(cbe_ref, ccn_ref, cbdf_ref, bc_ref, perm_ref, m_ref,
               e0r, e1r, o0r, o1r, oh0r, oh1r, op0r, op1r,
               rc_ref, ret_ref, rht_ref, *scratch):
        assert len(scratch) == nph + 2
        carries = scratch[:nph]
        etail, htail = scratch[nph], scratch[nph + 1]
        h = pl.program_id(0)
        i = pl.program_id(1)
        kbe = ps._unpack_coef(cbe_ref)
        kcn = ps._unpack_coef(ccn_ref)
        kbdf = ps._unpack_coef(cbdf_ref)
        s_of = (s_be, s_cn, s_be, s_bdf) if bdf2 else (s1,)

        @pl.when(jnp.logical_and(h == 0, i == 0))
        def _():
            for p in range(nph):
                carries[p][:] = s_of[p] * bc_ref[0]
            etail[:] = jnp.zeros_like(etail)
            htail[:] = jnp.zeros_like(htail)

        @pl.when(jnp.logical_and(h == 1, i == 0))
        def _():
            for p in range(nph):
                cs = carries[p]
                if reflective:
                    cs[:] = s_of[p] * jnp.dot(
                        perm_ref[:], cs[:],
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
                else:
                    cs[:] = s_of[p] * bc_ref[0]
            etail[:] = jnp.zeros_like(etail)
            htail[:] = jnp.zeros_like(htail)

        # Records: carry/tails AT BLOCK ENTRY. Mosaic requires legal
        # trailing block dims, so the records are whole (Bh, nb) planes
        # revisited every block; each visit deposits its column i
        # (first visit initialises the plane).
        lane_nb = lax.broadcasted_iota(jnp.int32, (Bh, rc_ref.shape[-1]),
                                       1)

        def rec_write(ref, idx, val):
            sel = lane_nb == i
            init = jnp.where(sel, val, 0.0)
            rmw = jnp.where(sel, val, ref[idx])
            ref[idx] = jnp.where(i == 0, init, rmw)

        for p in range(nph):
            rec_write(rc_ref, (0, p), carries[p][:])
        rec_write(ret_ref, (0,), etail[:])
        rec_write(rht_ref, (0,), htail[:])

        col = lax.broadcasted_iota(jnp.int32, (Bh, blk), 1)
        e0, e1 = e0r[0], e1r[0]
        et_prev = etail[:]
        ht_prev = htail[:]
        zt = jnp.zeros_like(et_prev)
        is_neg = h == 0

        def sub(kind, kc, p, a0, a1, pp0, pp1, hh0, hh1, pt, ht):
            o0, o1, pr = _substep_vals(kind, kc, col, blk, m_ref,
                                       a0, a1, pp0, pp1, hh0, hh1,
                                       carries[p][:], pt, ht, npass[kind])
            carries[p][:] = pr.carry_out
            return o0, o1

        if bdf2:
            b0, b1 = sub(BE, kbe, 0, e0, e1, e0, e1, e0, e1, zt, zt)
            hc0, hc1 = sub(CN, kcn, 1, b0, b1, e0, e1, e0, e1, et_prev, zt)
            if symmetric_half:
                hs0, hs1 = hc0, hc1
            else:
                hs0 = jnp.where(is_neg, hc0, b0)
                hs1 = jnp.where(is_neg, hc1, b1)
            d0, d1 = sub(BE, kbe, 2, hc0, hc1, e0, e1, hs0, hs1, zt, zt)
            f0, f1 = sub(BDF, kbdf, 3, d0, d1, e0, e1, hs0, hs1,
                         et_prev, ht_prev)
            htail[:] = hs1[:, -1:]
            oh0r[0], oh1r[0] = hs0, hs1
        else:
            kc1 = kbe if ts_method == 1 else kcn
            f0, f1 = sub(kind1, kc1, 0, e0, e1, e0, e1, e0, e1,
                         et_prev, zt)
            oh0r[0], oh1r[0] = e0, e1     # h planes pass through
        etail[:] = e1[:, -1:]
        o0r[0], o1r[0] = f0, f1
        op0r[0], op1r[0] = e0, e1

    return kernel


# ---------------------------------------------------------------------------
# Backward kernel (reversed grid)
# ---------------------------------------------------------------------------

def _make_bwd_kernel(ts_method: int, *, Bh: int, blk: int, nb: int,
                     reflective: bool, s_be: float, s_cn: float,
                     s_bdf: float, symmetric_half: bool, npass: dict):
    """The transposed step. Grid (2, nb) with REVERSED index maps (built
    by the caller): visit order is (mu>0 half, blocks downstream ->
    upstream) then (mu<0, same), so adjoint carries flow naturally and
    the reflective coupling's flipped cotangent lands on the mu<0
    half's final carry exactly when needed. Recomputes the forward
    phases from the saved inputs + records, then runs _substep_adj in
    reverse phase order, accumulating coefficient gradients in VMEM."""
    bdf2 = ts_method == 3
    kind1 = BE if ts_method == 1 else CN
    s1 = s_be if ts_method == 1 else s_cn
    nph = 4 if bdf2 else 1
    s_of = (s_be, s_cn, s_be, s_bdf) if bdf2 else (s1,)

    def kernel(cbe_ref, ccn_ref, cbdf_ref, perm_ref, m_ref, mrev_ref,
               e0r, e1r, co0r, co1r, coh0r, coh1r,
               rc_ref, ret_ref, rht_ref,
               ce0r, ce1r, cbc_ref, gbe_ref, gcn_ref, gbdf_ref,
               *scratch):
        assert len(scratch) == nph + 2 + 3
        lam = scratch[:nph]                 # adjoint phase carries
        cet, cht = scratch[nph], scratch[nph + 1]
        gacc = scratch[nph + 2:]            # (Bh, NCOEF) per kind
        g0 = pl.program_id(0)
        g1 = pl.program_id(1)
        h = 1 - g0                          # actual half
        kbe = ps._unpack_coef(cbe_ref)
        kcn = ps._unpack_coef(ccn_ref)
        kbdf = ps._unpack_coef(cbdf_ref)

        @pl.when(g1 == 0)                   # first visit of this half
        def _():
            if reflective:
                # Entering h==0: the mu<0 final carry's cotangent is the
                # flipped, s-scaled mu>0 inflow cotangent (accumulated in
                # lam during the h==1 pass).
                for p in range(nph):
                    @pl.when(g0 == 1)
                    def _(p=p):
                        lam[p][:] = s_of[p] * jnp.dot(
                            perm_ref[:], lam[p][:],
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
                    @pl.when(g0 == 0)
                    def _(p=p):
                        lam[p][:] = jnp.zeros_like(lam[p])
            else:
                for p in range(nph):
                    lam[p][:] = jnp.zeros_like(lam[p])
            cet[:] = jnp.zeros_like(cet)
            cht[:] = jnp.zeros_like(cht)
            for g in gacc:
                g[:] = jnp.zeros_like(g)

        col = lax.broadcasted_iota(jnp.int32, (Bh, blk), 1)
        e0, e1 = e0r[0], e1r[0]
        # Record reads: pick column i of the whole-plane records
        # (masked reduction — legal on any nb).
        i = nb - 1 - g1
        lane_nb = lax.broadcasted_iota(jnp.int32, (Bh, ret_ref.shape[-1]),
                                       1)

        def rec_read(ref, idx):
            return jnp.sum(jnp.where(lane_nb == i, ref[idx], 0.0),
                           axis=1, keepdims=True)

        et_rec = rec_read(ret_ref, (0,))
        ht_rec = rec_read(rht_ref, (0,))
        rc = [rec_read(rc_ref, (0, p)) for p in range(nph)]
        zt = jnp.zeros_like(et_rec)
        is_neg = h == 0
        et_in = cet[:]
        ht_in = cht[:]
        last = col == blk - 1

        if bdf2:
            # --- forward recompute (records give the block carries) ----
            b0, b1, prB = _substep_vals(BE, kbe, col, blk, m_ref,
                                        e0, e1, e0, e1, e0, e1,
                                        rc[0], zt, zt, npass[BE])
            hc0, hc1, prC = _substep_vals(CN, kcn, col, blk, m_ref,
                                          b0, b1, e0, e1, e0, e1,
                                          rc[1], et_rec, zt,
                                          npass[CN])
            if symmetric_half:
                hs0, hs1 = hc0, hc1
            else:
                hs0 = jnp.where(is_neg, hc0, b0)
                hs1 = jnp.where(is_neg, hc1, b1)
            d0, d1, prD = _substep_vals(BE, kbe, col, blk, m_ref,
                                        hc0, hc1, e0, e1, hs0, hs1,
                                        rc[2], zt, zt, npass[BE])
            _, _, prF = _substep_vals(BDF, kbdf, col, blk, m_ref,
                                      d0, d1, e0, e1, hs0, hs1,
                                      rc[3], et_rec, ht_rec,
                                      npass[BDF])

            # --- adjoint, reverse phase order --------------------------
            f0c = co0r[0]
            f1c = co1r[0]
            hs0c = coh0r[0]
            hs1c = coh1r[0] + jnp.where(last, ht_in, 0.0)
            A3 = _substep_adj(BDF, kbdf, col, blk, mrev_ref, prF,
                              d0, d1, e0, e1, hs0, hs1,
                              f0c, f1c, lam[3][:], npass[BDF])
            lam[3][:] = A3.c_in
            A2 = _substep_adj(BE, kbe, col, blk, mrev_ref, prD,
                              hc0, hc1, e0, e1, hs0, hs1,
                              A3.e0, A3.e1, lam[2][:], npass[BE])
            lam[2][:] = A2.c_in
            hs0c = hs0c + A3.h0
            hs1c = hs1c + A3.h1
            if symmetric_half:
                hc0c = A2.e0 + hs0c
                hc1c = A2.e1 + hs1c
                b0c = jnp.zeros_like(hs0c)
                b1c = jnp.zeros_like(hs1c)
            else:
                hc0c = A2.e0 + jnp.where(is_neg, hs0c, 0.0)
                hc1c = A2.e1 + jnp.where(is_neg, hs1c, 0.0)
                b0c = jnp.where(is_neg, 0.0, hs0c)
                b1c = jnp.where(is_neg, 0.0, hs1c)
            A1 = _substep_adj(CN, kcn, col, blk, mrev_ref, prC,
                              b0, b1, e0, e1, e0, e1,
                              hc0c, hc1c, lam[1][:], npass[CN])
            lam[1][:] = A1.c_in
            A0 = _substep_adj(BE, kbe, col, blk, mrev_ref, prB,
                              e0, e1, e0, e1, e0, e1,
                              b0c + A1.e0, b1c + A1.e1, lam[0][:],
                              npass[BE])
            lam[0][:] = A0.c_in
            e0c = A0.e0 + A3.p0
            e1c = A0.e1 + A3.p1 + A1.p1
            e1c = e1c + jnp.where(last, et_in, 0.0)
            cet[:] = A1.ptail + A3.ptail
            cht[:] = A3.htail
            gacc[0][:] = gacc[0][:] + A0.coef + A2.coef
            gacc[1][:] = gacc[1][:] + A1.coef
            gacc[2][:] = gacc[2][:] + A3.coef
        else:
            kc1 = kbe if ts_method == 1 else kcn
            _, _, pr = _substep_vals(kind1, kc1, col, blk, m_ref,
                                     e0, e1, e0, e1, e0, e1,
                                     rc[0], et_rec, zt,
                                     npass[kind1])
            f0c = co0r[0]
            f1c = co1r[0]
            A0 = _substep_adj(kind1, kc1, col, blk, mrev_ref, pr,
                              e0, e1, e0, e1, e0, e1,
                              f0c, f1c, lam[0][:], npass[kind1])
            lam[0][:] = A0.c_in
            # h planes pass through OUTSIDE the kernel for BE/CN steps
            # (the wrapper routes their cotangents identically).
            e0c = A0.e0
            e1c = A0.e1 + A0.p1
            e1c = e1c + jnp.where(last, et_in, 0.0)
            cet[:] = A0.ptail
            cht[:] = jnp.zeros_like(cht)
            gacc[0][:] = gacc[0][:] + A0.coef

        ce0r[0], ce1r[0] = e0c, e1c

        # Half start reached (last visit of this half): the inflow
        # cotangents fold into bc (per-phase s multiplicities); the
        # reflective flip for h==1 happens at h==0 entry above.
        @pl.when(g1 == nb - 1)
        def _():
            acc = jnp.zeros_like(lam[0][:])
            for p in range(nph):
                acc = acc + s_of[p] * lam[p][:]
            if reflective:
                # bc feeds only the mu<0 half (g0==1); the mu>0 inflow is
                # the flipped outflow, whose cotangent went through lam.
                cbc_ref[0] = jnp.where(g0 == 1, acc, jnp.zeros_like(acc))
            else:
                cbc_ref[0] = acc
            if bdf2:
                for knd, g in enumerate(gacc):
                    ref = (gbe_ref, gcn_ref, gbdf_ref)[knd]
                    ref[0] = g[:]
            else:
                # The single-kind step's gradients go to ITS pack; the
                # dummy packs get zeros.
                z = jnp.zeros_like(gacc[0][:])
                gbe_ref[0] = gacc[0][:] if ts_method == 1 else z
                gcn_ref[0] = gacc[0][:] if ts_method == 2 else z
                gbdf_ref[0] = z

    return kernel


# ---------------------------------------------------------------------------
# K-fused forward-with-records + backward kernels (BDF2; VERDICT r4 #3)
# ---------------------------------------------------------------------------

def _make_fwd_record_kernel_bdf2_k(*, Bh: int, blk: int, reflective: bool,
                                   s_be: float, s_cn: float, s_bdf: float,
                                   symmetric_half: bool, npass: dict,
                                   K: int):
    """K whole BDF2 timesteps per launch WITH the backward pass's
    residuals: the production fusion (ps._make_bdf2_kernel) plus

    * per-(step, phase) carry records and per-step etail/htail records
      at block entry ((2, 4K, Bh, nb) + 2 x (2, K, Bh, nb) — tiny), and
    * the intermediate steps' INPUT planes ((K-1, 2, Bh, N) x 2 — the
      only non-trivial record traffic: 2(K-1)/K extra plane-writes per
      step, which still leaves the fused forward at ~(8+2(K-1))/K
      plane-passes per step vs 8 for the K=1 record kernel).

    The backward kernel recomputes each step's phases from ITS OWN
    input planes (exactly the K=1 scheme per step), so the adjoint
    stays one recompute + one transposed cycle per step."""
    assert K >= 2

    def kernel(cbe_ref, ccn_ref, cbdf_ref, bc_ref, perm_ref, m_ref,
               e0r, e1r, o0r, o1r, oh0r, oh1r, op0r, op1r,
               rc_ref, ret_ref, rht_ref, ri0_ref, ri1_ref, *scratch):
        nph = 4 * K
        assert len(scratch) == nph + 2 * K
        carries = scratch[:nph]
        etails = scratch[nph:nph + K]
        htails = scratch[nph + K:]
        h = pl.program_id(0)
        i = pl.program_id(1)
        kbe = ps._unpack_coef(cbe_ref)
        kcn = ps._unpack_coef(ccn_ref)
        kbdf = ps._unpack_coef(cbdf_ref)
        s_of = (s_be, s_cn, s_be, s_bdf)

        @pl.when(jnp.logical_and(h == 0, i == 0))
        def _():
            for s in range(nph):
                carries[s][:] = s_of[s % 4] * bc_ref[0]
            for k in range(K):
                etails[k][:] = jnp.zeros_like(etails[k])
                htails[k][:] = jnp.zeros_like(htails[k])

        @pl.when(jnp.logical_and(h == 1, i == 0))
        def _():
            for s in range(nph):
                cs = carries[s]
                if reflective:
                    cs[:] = s_of[s % 4] * jnp.dot(
                        perm_ref[:], cs[:],
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
                else:
                    cs[:] = s_of[s % 4] * bc_ref[0]
            for k in range(K):
                etails[k][:] = jnp.zeros_like(etails[k])
                htails[k][:] = jnp.zeros_like(htails[k])

        lane_nb = lax.broadcasted_iota(jnp.int32, (Bh, rc_ref.shape[-1]),
                                       1)

        def rec_write(ref, idx, val):
            sel = lane_nb == i
            init = jnp.where(sel, val, 0.0)
            rmw = jnp.where(sel, val, ref[idx])
            ref[idx] = jnp.where(i == 0, init, rmw)

        for s in range(4 * K):
            rec_write(rc_ref, (0, s), carries[s][:])
        for k in range(K):
            rec_write(ret_ref, (0, k), etails[k][:])
            rec_write(rht_ref, (0, k), htails[k][:])

        col = lax.broadcasted_iota(jnp.int32, (Bh, blk), 1)
        e0, e1 = e0r[0], e1r[0]
        is_neg = h == 0
        hs0 = hs1 = e0                      # overwritten in the loop

        for k in range(K):
            if k >= 1:
                ri0_ref[k - 1, 0] = e0
                ri1_ref[k - 1, 0] = e1
            et_prev = etails[k][:]
            ht_prev = htails[k][:]
            zt = jnp.zeros_like(et_prev)

            def sub(kind, kc, s, a0, a1, pp0, pp1, hh0, hh1, pt, ht):
                o0, o1, pr = _substep_vals(
                    kind, kc, col, blk, m_ref, a0, a1, pp0, pp1,
                    hh0, hh1, carries[s][:], pt, ht, npass[kind])
                carries[s][:] = pr.carry_out
                return o0, o1

            b0, b1 = sub(BE, kbe, 4 * k, e0, e1, e0, e1, e0, e1, zt, zt)
            hc0, hc1 = sub(CN, kcn, 4 * k + 1, b0, b1, e0, e1, e0, e1,
                           et_prev, zt)
            if symmetric_half:
                hs0, hs1 = hc0, hc1
            else:
                hs0 = jnp.where(is_neg, hc0, b0)
                hs1 = jnp.where(is_neg, hc1, b1)
            d0, d1 = sub(BE, kbe, 4 * k + 2, hc0, hc1, e0, e1, hs0, hs1,
                         zt, zt)
            f0, f1 = sub(BDF, kbdf, 4 * k + 3, d0, d1, e0, e1, hs0, hs1,
                         et_prev, ht_prev)
            etails[k][:] = e1[:, -1:]
            htails[k][:] = hs1[:, -1:]
            if k == K - 1:
                op0r[0], op1r[0] = e0, e1
            e0, e1 = f0, f1

        o0r[0], o1r[0] = e0, e1
        oh0r[0], oh1r[0] = hs0, hs1

    return kernel


def _make_bwd_kernel_bdf2_k(*, Bh: int, blk: int, nb: int,
                            reflective: bool, s_be: float, s_cn: float,
                            s_bdf: float, symmetric_half: bool,
                            npass: dict, K: int):
    """The transposed K-fused BDF2 launch: same reversed (2, nb) grid as
    _make_bwd_kernel, processing the K steps newest-to-oldest per visit.
    Step k's output cotangent is step k+1's input cotangent (computed
    in-VMEM the same visit); the external cotangents enter at step K-1
    (ends/half) and — because the fused step RETURNS prev = the last
    step's input — at step K-1's input (cop). Per-(step, phase) adjoint
    carries and per-step edge-cotangent scratches mirror the forward's
    scratch layout."""
    assert K >= 2
    s_of = (s_be, s_cn, s_be, s_bdf)

    def kernel(cbe_ref, ccn_ref, cbdf_ref, perm_ref, m_ref, mrev_ref,
               e0r, e1r, ri0_ref, ri1_ref,
               co0r, co1r, coh0r, coh1r, cop0r, cop1r,
               rc_ref, ret_ref, rht_ref,
               ce0r, ce1r, cbc_ref, gbe_ref, gcn_ref, gbdf_ref,
               *scratch):
        nph = 4 * K
        assert len(scratch) == nph + 2 * K + 3
        lam = scratch[:nph]
        cets = scratch[nph:nph + K]
        chts = scratch[nph + K:nph + 2 * K]
        gacc = scratch[nph + 2 * K:]
        g0 = pl.program_id(0)
        g1 = pl.program_id(1)
        h = 1 - g0
        kbe = ps._unpack_coef(cbe_ref)
        kcn = ps._unpack_coef(ccn_ref)
        kbdf = ps._unpack_coef(cbdf_ref)

        @pl.when(g1 == 0)
        def _():
            if reflective:
                for s in range(nph):
                    @pl.when(g0 == 1)
                    def _(s=s):
                        lam[s][:] = s_of[s % 4] * jnp.dot(
                            perm_ref[:], lam[s][:],
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)

                    @pl.when(g0 == 0)
                    def _(s=s):
                        lam[s][:] = jnp.zeros_like(lam[s])
            else:
                for s in range(nph):
                    lam[s][:] = jnp.zeros_like(lam[s])
            for k in range(K):
                cets[k][:] = jnp.zeros_like(cets[k])
                chts[k][:] = jnp.zeros_like(chts[k])
            for g in gacc:
                g[:] = jnp.zeros_like(g)

        col = lax.broadcasted_iota(jnp.int32, (Bh, blk), 1)
        i = nb - 1 - g1
        lane_nb = lax.broadcasted_iota(jnp.int32, (Bh, ret_ref.shape[-1]),
                                       1)

        def rec_read(ref, idx):
            return jnp.sum(jnp.where(lane_nb == i, ref[idx], 0.0),
                           axis=1, keepdims=True)

        et_rec = [rec_read(ret_ref, (0, k)) for k in range(K)]
        ht_rec = [rec_read(rht_ref, (0, k)) for k in range(K)]
        rc = [rec_read(rc_ref, (0, s)) for s in range(nph)]
        zt = jnp.zeros_like(et_rec[0])
        is_neg = h == 0
        last = col == blk - 1

        lam0c, lam1c = co0r[0], co1r[0]     # ends cotangent (step K-1)
        for k in reversed(range(K)):
            e0 = e0r[0] if k == 0 else ri0_ref[k - 1, 0]
            e1 = e1r[0] if k == 0 else ri1_ref[k - 1, 0]

            # --- forward recompute of step k (records give carries) ----
            b0, b1, prB = _substep_vals(BE, kbe, col, blk, m_ref,
                                        e0, e1, e0, e1, e0, e1,
                                        rc[4 * k], zt, zt, npass[BE])
            hc0, hc1, prC = _substep_vals(CN, kcn, col, blk, m_ref,
                                          b0, b1, e0, e1, e0, e1,
                                          rc[4 * k + 1], et_rec[k], zt,
                                          npass[CN])
            if symmetric_half:
                hs0, hs1 = hc0, hc1
            else:
                hs0 = jnp.where(is_neg, hc0, b0)
                hs1 = jnp.where(is_neg, hc1, b1)
            d0, d1, prD = _substep_vals(BE, kbe, col, blk, m_ref,
                                        hc0, hc1, e0, e1, hs0, hs1,
                                        rc[4 * k + 2], zt, zt, npass[BE])
            _, _, prF = _substep_vals(BDF, kbdf, col, blk, m_ref,
                                      d0, d1, e0, e1, hs0, hs1,
                                      rc[4 * k + 3], et_rec[k], ht_rec[k],
                                      npass[BDF])

            # --- adjoint of step k, reverse phase order ----------------
            f0c, f1c = lam0c, lam1c
            if k == K - 1:
                hs0c = coh0r[0]
                hs1c = coh1r[0]
            else:
                hs0c = jnp.zeros_like(f0c)
                hs1c = jnp.zeros_like(f1c)
            hs1c = hs1c + jnp.where(last, chts[k][:], 0.0)
            et_in = cets[k][:]
            A3 = _substep_adj(BDF, kbdf, col, blk, mrev_ref, prF,
                              d0, d1, e0, e1, hs0, hs1,
                              f0c, f1c, lam[4 * k + 3][:], npass[BDF])
            lam[4 * k + 3][:] = A3.c_in
            A2 = _substep_adj(BE, kbe, col, blk, mrev_ref, prD,
                              hc0, hc1, e0, e1, hs0, hs1,
                              A3.e0, A3.e1, lam[4 * k + 2][:], npass[BE])
            lam[4 * k + 2][:] = A2.c_in
            hs0c = hs0c + A3.h0
            hs1c = hs1c + A3.h1
            if symmetric_half:
                hc0c = A2.e0 + hs0c
                hc1c = A2.e1 + hs1c
                b0c = jnp.zeros_like(hs0c)
                b1c = jnp.zeros_like(hs1c)
            else:
                hc0c = A2.e0 + jnp.where(is_neg, hs0c, 0.0)
                hc1c = A2.e1 + jnp.where(is_neg, hs1c, 0.0)
                b0c = jnp.where(is_neg, 0.0, hs0c)
                b1c = jnp.where(is_neg, 0.0, hs1c)
            A1 = _substep_adj(CN, kcn, col, blk, mrev_ref, prC,
                              b0, b1, e0, e1, e0, e1,
                              hc0c, hc1c, lam[4 * k + 1][:], npass[CN])
            lam[4 * k + 1][:] = A1.c_in
            A0 = _substep_adj(BE, kbe, col, blk, mrev_ref, prB,
                              e0, e1, e0, e1, e0, e1,
                              b0c + A1.e0, b1c + A1.e1, lam[4 * k][:],
                              npass[BE])
            lam[4 * k][:] = A0.c_in
            e0c = A0.e0 + A3.p0
            e1c = A0.e1 + A3.p1 + A1.p1
            e1c = e1c + jnp.where(last, et_in, 0.0)
            cets[k][:] = A1.ptail + A3.ptail
            chts[k][:] = A3.htail
            gacc[0][:] = gacc[0][:] + A0.coef + A2.coef
            gacc[1][:] = gacc[1][:] + A1.coef
            gacc[2][:] = gacc[2][:] + A3.coef

            # Step k's input cotangent feeds step k-1's output; the
            # fused step's prev output IS step K-1's input.
            lam0c, lam1c = e0c, e1c
            if k == K - 1:
                lam0c = lam0c + cop0r[0]
                lam1c = lam1c + cop1r[0]

        ce0r[0], ce1r[0] = lam0c, lam1c

        @pl.when(g1 == nb - 1)
        def _():
            acc = jnp.zeros_like(lam[0][:])
            for s in range(4 * K):
                acc = acc + s_of[s % 4] * lam[s][:]
            if reflective:
                cbc_ref[0] = jnp.where(g0 == 1, acc, jnp.zeros_like(acc))
            else:
                cbc_ref[0] = acc
            gbe_ref[0] = gacc[0][:]
            gcn_ref[0] = gacc[1][:]
            gbdf_ref[0] = gacc[2][:]

    return kernel


# ---------------------------------------------------------------------------
# custom_vjp step + differentiable solve
# ---------------------------------------------------------------------------

def _pack_coeffs_traced(kc) -> jnp.ndarray:
    """Traced f32 twin of ps._pack_coeffs: KindCoeffs (possibly tracer)
    planes (1, 2, Bh, 1) -> (2, Bh, NCOEF)."""
    cols = [kc.w, kc.T0, kc.q, kc.inv_det, kc.a, kc.Sbase, kc.c1, kc.c0,
            kc.k_ee, kc.k_p]
    return jnp.concatenate(
        [jnp.asarray(c, jnp.float32)[0] for c in cols], axis=-1)


class DiffPallasStep:
    """A custom_vjp'd whole timestep on the Pallas engine's plane layout:

        step(e0, e1, cbe, ccn, cbdf, bc) -> (o0, o1, h0, h1)

    with the analytic reverse kernel (module doc). For BDF2 the h
    outputs are the step's half snapshot; for BE/CN steps h planes are
    untouched by the physics and ride outside. prev planes are by
    definition the input ends, so the caller forms them directly.
    Geometry (block/npass/masks/reflective) comes from a PallasEngine.
    """

    def __init__(self, eng: ps.PallasEngine):
        self.eng = eng
        cfg = eng.cfg
        self.cfg = cfg
        Bh, blk, nb = eng.Bh, eng.block, eng.nblocks
        self.nb = nb
        kcs = eng._fe.kcs
        s_be = float(kcs[BE].s) if BE in kcs else 1.0
        s_cn = float(kcs[CN].s) if CN in kcs else 2.0
        s_bdf = float(kcs[BDF].s) if BDF in kcs else 6.0
        npass = dict(eng.scan_npass)
        for k in (BE, CN, BDF):
            npass.setdefault(k, None)
        self._mask_count = eng._mask_count
        self.scan_masks = eng.scan_masks
        self.rev_masks = _rev_scan_masks(blk)[:self._mask_count]
        self.refl_P = eng.refl_P if eng.reflective else np.zeros(
            (Bh, Bh), np.float32)

        N = cfg.N
        plane = jax.ShapeDtypeStruct((2, Bh, N), jnp.float32)
        nph = 4 if cfg.ts_method == 3 else 1

        fwd_plane = pl.BlockSpec((1, Bh, blk), lambda h, i: (h, h * 0, i),
                                 memory_space=pltpu.VMEM)
        coef = pl.BlockSpec((1, Bh, ps._NCOEF), lambda h, i: (h, h * 0, h * 0),
                            memory_space=pltpu.VMEM)
        bcs = pl.BlockSpec((1, Bh, 1), lambda h, i: (h, h * 0, h * 0),
                           memory_space=pltpu.VMEM)
        perm = pl.BlockSpec((Bh, Bh), lambda h, i: (h * 0, h * 0),
                            memory_space=pltpu.VMEM)
        mask = pl.BlockSpec((self._mask_count, 1, blk),
                            lambda h, i: (h * 0, h * 0, h * 0),
                            memory_space=pltpu.VMEM)
        rc = pl.BlockSpec((1, nph, Bh, nb), lambda h, i: (h, h * 0, h * 0, h * 0),
                          memory_space=pltpu.VMEM)
        rt = pl.BlockSpec((1, Bh, nb), lambda h, i: (h, h * 0, h * 0),
                          memory_space=pltpu.VMEM)

        fwd_kernel = _make_fwd_record_kernel(
            cfg.ts_method, Bh=Bh, blk=blk, reflective=eng.reflective,
            s_be=s_be, s_cn=s_cn, s_bdf=s_bdf,
            symmetric_half=cfg.bdf2_symmetric_half, npass=npass)
        self._fwd_call = pl.pallas_call(
            fwd_kernel,
            grid=(2, nb),
            in_specs=[coef] * 3 + [bcs, perm, mask, fwd_plane, fwd_plane],
            out_specs=(fwd_plane,) * 6 + (rc, rt, rt),
            out_shape=(plane,) * 6 + (
                jax.ShapeDtypeStruct((2, nph, Bh, nb), jnp.float32),
                jax.ShapeDtypeStruct((2, Bh, nb), jnp.float32),
                jax.ShapeDtypeStruct((2, Bh, nb), jnp.float32),
            ),
            scratch_shapes=[pltpu.VMEM((Bh, 1), jnp.float32)] * (nph + 2),
            interpret=eng.interpret,
            compiler_params=ps._params(eng.interpret),
        )

        # Backward: same grid, REVERSED visit order via the index maps.
        r_plane = pl.BlockSpec((1, Bh, blk),
                               lambda g0, g1: (1 - g0, g0 * 0, nb - 1 - g1),
                               memory_space=pltpu.VMEM)
        r_coef = pl.BlockSpec((1, Bh, ps._NCOEF),
                              lambda g0, g1: (1 - g0, g0 * 0, g0 * 0),
                              memory_space=pltpu.VMEM)
        r_bc = pl.BlockSpec((1, Bh, 1), lambda g0, g1: (1 - g0, g0 * 0, g0 * 0),
                            memory_space=pltpu.VMEM)
        r_perm = pl.BlockSpec((Bh, Bh), lambda g0, g1: (g0 * 0, g0 * 0),
                              memory_space=pltpu.VMEM)
        r_mask = pl.BlockSpec((self._mask_count, 1, blk),
                              lambda g0, g1: (g0 * 0, g0 * 0, g0 * 0),
                              memory_space=pltpu.VMEM)
        r_rc = pl.BlockSpec((1, nph, Bh, nb),
                            lambda g0, g1: (1 - g0, g0 * 0, g0 * 0, g0 * 0),
                            memory_space=pltpu.VMEM)
        r_rt = pl.BlockSpec((1, Bh, nb),
                            lambda g0, g1: (1 - g0, g0 * 0, g0 * 0),
                            memory_space=pltpu.VMEM)
        r_gc = pl.BlockSpec((1, Bh, ps._NCOEF),
                            lambda g0, g1: (1 - g0, g0 * 0, g0 * 0),
                            memory_space=pltpu.VMEM)

        bwd_kernel = _make_bwd_kernel(
            cfg.ts_method, Bh=Bh, blk=blk, nb=nb,
            reflective=eng.reflective, s_be=s_be, s_cn=s_cn, s_bdf=s_bdf,
            symmetric_half=cfg.bdf2_symmetric_half, npass=npass)
        self._bwd_call = pl.pallas_call(
            bwd_kernel,
            grid=(2, nb),
            in_specs=[r_coef] * 3 + [r_perm, r_mask, r_mask]
            + [r_plane] * 6 + [r_rc, r_rt, r_rt],
            out_specs=(r_plane, r_plane, r_bc, r_gc, r_gc, r_gc),
            out_shape=(plane, plane,
                       jax.ShapeDtypeStruct((2, Bh, 1), jnp.float32),
                       jax.ShapeDtypeStruct((2, Bh, ps._NCOEF),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((2, Bh, ps._NCOEF),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((2, Bh, ps._NCOEF),
                                            jnp.float32)),
            scratch_shapes=[pltpu.VMEM((Bh, 1), jnp.float32)] * (nph + 2)
            + [pltpu.VMEM((Bh, ps._NCOEF), jnp.float32)] * 3,
            interpret=eng.interpret,
            compiler_params=ps._params(eng.interpret),
        )

        @jax.custom_vjp
        def step(e0, e1, cbe, ccn, cbdf, bc):
            outs = self._fwd_call(cbe, ccn, cbdf, bc, self.refl_P,
                                  self.scan_masks, e0, e1)
            return outs[:4]                  # (o0, o1, h0, h1)

        def step_fwd(e0, e1, cbe, ccn, cbdf, bc):
            outs = self._fwd_call(cbe, ccn, cbdf, bc, self.refl_P,
                                  self.scan_masks, e0, e1)
            res = (e0, e1, cbe, ccn, cbdf) + outs[6:]
            return outs[:4], res

        def step_bwd(res, cots):
            e0, e1, cbe, ccn, cbdf, rc, ret, rht = res
            o0c, o1c, h0c, h1c = [jnp.asarray(c, jnp.float32)
                                  for c in cots]
            if cfg.ts_method != 3:
                # h planes never enter the BE/CN kernel: their
                # cotangent is routed by the solve wrapper.
                h0c = jnp.zeros_like(h0c)
                h1c = jnp.zeros_like(h1c)
            (ce0, ce1, cbc, gbe, gcn, gbdf) = self._bwd_call(
                cbe, ccn, cbdf, self.refl_P, self.scan_masks,
                self.rev_masks, e0, e1, o0c, o1c, h0c, h1c, rc, ret, rht)
            return ce0, ce1, gbe, gcn, gbdf, cbc

        step.defvjp(step_fwd, step_bwd)
        self.step = step


class DiffPallasStepK:
    """K fused differentiable BDF2 timesteps (custom_vjp; VERDICT r4 #3):

        step(e0, e1, cbe, ccn, cbdf, bc) -> (o0, o1, h0, h1, p0, p1)

    with prev = the LAST step's input (the production multi_step
    contract, ps._make_bdf2_kernel) returned as an output because
    intermediate ends never leave the launch. Forward/backward are
    _make_fwd_record_kernel_bdf2_k / _make_bwd_kernel_bdf2_k.

    BDF2 only, by scope: BE/CN diff solves keep the K=1 kernels — the
    reference's production integrator (and every headline workload) is
    BDF2, and the BE/CN forward's fusion win is smaller (2-plane
    states); extend symmetrically if a BE/CN gradient workload ever
    becomes hot."""

    def __init__(self, eng: ps.PallasEngine, K: int):
        cfg = eng.cfg
        assert cfg.ts_method == 3 and K >= 2
        self.eng = eng
        self.cfg = cfg
        self.K = K
        Bh, blk, nb = eng.Bh, eng.block, eng.nblocks
        self.nb = nb
        kcs = eng._fe.kcs
        s_be, s_cn, s_bdf = (float(kcs[BE].s), float(kcs[CN].s),
                             float(kcs[BDF].s))
        npass = dict(eng.scan_npass)
        self._mask_count = eng._mask_count
        self.scan_masks = eng.scan_masks
        self.rev_masks = _rev_scan_masks(blk)[:self._mask_count]
        self.refl_P = eng.refl_P if eng.reflective else np.zeros(
            (Bh, Bh), np.float32)

        N = cfg.N
        nph = 4 * K
        plane = jax.ShapeDtypeStruct((2, Bh, N), jnp.float32)
        ri_shape = jax.ShapeDtypeStruct((K - 1, 2, Bh, N), jnp.float32)

        fwd_plane = pl.BlockSpec((1, Bh, blk), lambda h, i: (h, h * 0, i),
                                 memory_space=pltpu.VMEM)
        coef = pl.BlockSpec((1, Bh, ps._NCOEF),
                            lambda h, i: (h, h * 0, h * 0),
                            memory_space=pltpu.VMEM)
        bcs = pl.BlockSpec((1, Bh, 1), lambda h, i: (h, h * 0, h * 0),
                           memory_space=pltpu.VMEM)
        perm = pl.BlockSpec((Bh, Bh), lambda h, i: (h * 0, h * 0),
                            memory_space=pltpu.VMEM)
        mask = pl.BlockSpec((self._mask_count, 1, blk),
                            lambda h, i: (h * 0, h * 0, h * 0),
                            memory_space=pltpu.VMEM)
        rc = pl.BlockSpec((1, nph, Bh, nb),
                          lambda h, i: (h, h * 0, h * 0, h * 0),
                          memory_space=pltpu.VMEM)
        rt = pl.BlockSpec((1, K, Bh, nb),
                          lambda h, i: (h, h * 0, h * 0, h * 0),
                          memory_space=pltpu.VMEM)
        ri = pl.BlockSpec((K - 1, 1, Bh, blk),
                          lambda h, i: (h * 0, h, h * 0, i),
                          memory_space=pltpu.VMEM)

        fwd_kernel = _make_fwd_record_kernel_bdf2_k(
            Bh=Bh, blk=blk, reflective=eng.reflective,
            s_be=s_be, s_cn=s_cn, s_bdf=s_bdf,
            symmetric_half=cfg.bdf2_symmetric_half, npass=npass, K=K)
        self._fwd_call = pl.pallas_call(
            fwd_kernel,
            grid=(2, nb),
            in_specs=[coef] * 3 + [bcs, perm, mask, fwd_plane, fwd_plane],
            out_specs=(fwd_plane,) * 6 + (rc, rt, rt, ri, ri),
            out_shape=(plane,) * 6 + (
                jax.ShapeDtypeStruct((2, nph, Bh, nb), jnp.float32),
                jax.ShapeDtypeStruct((2, K, Bh, nb), jnp.float32),
                jax.ShapeDtypeStruct((2, K, Bh, nb), jnp.float32),
                ri_shape, ri_shape,
            ),
            scratch_shapes=[pltpu.VMEM((Bh, 1), jnp.float32)]
            * (nph + 2 * K),
            interpret=eng.interpret,
            compiler_params=ps._params(eng.interpret),
        )

        r_plane = pl.BlockSpec((1, Bh, blk),
                               lambda g0, g1: (1 - g0, g0 * 0, nb - 1 - g1),
                               memory_space=pltpu.VMEM)
        r_coef = pl.BlockSpec((1, Bh, ps._NCOEF),
                              lambda g0, g1: (1 - g0, g0 * 0, g0 * 0),
                              memory_space=pltpu.VMEM)
        r_bc = pl.BlockSpec((1, Bh, 1),
                            lambda g0, g1: (1 - g0, g0 * 0, g0 * 0),
                            memory_space=pltpu.VMEM)
        r_perm = pl.BlockSpec((Bh, Bh), lambda g0, g1: (g0 * 0, g0 * 0),
                              memory_space=pltpu.VMEM)
        r_mask = pl.BlockSpec((self._mask_count, 1, blk),
                              lambda g0, g1: (g0 * 0, g0 * 0, g0 * 0),
                              memory_space=pltpu.VMEM)
        r_rc = pl.BlockSpec((1, nph, Bh, nb),
                            lambda g0, g1: (1 - g0, g0 * 0, g0 * 0, g0 * 0),
                            memory_space=pltpu.VMEM)
        r_rt = pl.BlockSpec((1, K, Bh, nb),
                            lambda g0, g1: (1 - g0, g0 * 0, g0 * 0, g0 * 0),
                            memory_space=pltpu.VMEM)
        r_ri = pl.BlockSpec((K - 1, 1, Bh, blk),
                            lambda g0, g1: (g0 * 0, 1 - g0, g0 * 0,
                                            nb - 1 - g1),
                            memory_space=pltpu.VMEM)
        r_gc = pl.BlockSpec((1, Bh, ps._NCOEF),
                            lambda g0, g1: (1 - g0, g0 * 0, g0 * 0),
                            memory_space=pltpu.VMEM)

        bwd_kernel = _make_bwd_kernel_bdf2_k(
            Bh=Bh, blk=blk, nb=nb, reflective=eng.reflective,
            s_be=s_be, s_cn=s_cn, s_bdf=s_bdf,
            symmetric_half=cfg.bdf2_symmetric_half, npass=npass, K=K)
        self._bwd_call = pl.pallas_call(
            bwd_kernel,
            grid=(2, nb),
            in_specs=[r_coef] * 3 + [r_perm, r_mask, r_mask]
            + [r_plane] * 2 + [r_ri] * 2 + [r_plane] * 6
            + [r_rc, r_rt, r_rt],
            out_specs=(r_plane, r_plane, r_bc, r_gc, r_gc, r_gc),
            out_shape=(plane, plane,
                       jax.ShapeDtypeStruct((2, Bh, 1), jnp.float32),
                       jax.ShapeDtypeStruct((2, Bh, ps._NCOEF),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((2, Bh, ps._NCOEF),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((2, Bh, ps._NCOEF),
                                            jnp.float32)),
            scratch_shapes=[pltpu.VMEM((Bh, 1), jnp.float32)]
            * (nph + 2 * K)
            + [pltpu.VMEM((Bh, ps._NCOEF), jnp.float32)] * 3,
            interpret=eng.interpret,
            compiler_params=ps._params(eng.interpret),
        )

        @jax.custom_vjp
        def step(e0, e1, cbe, ccn, cbdf, bc):
            outs = self._fwd_call(cbe, ccn, cbdf, bc, self.refl_P,
                                  self.scan_masks, e0, e1)
            return outs[:6]          # (o0, o1, h0, h1, p0, p1)

        def step_fwd(e0, e1, cbe, ccn, cbdf, bc):
            outs = self._fwd_call(cbe, ccn, cbdf, bc, self.refl_P,
                                  self.scan_masks, e0, e1)
            res = (e0, e1, cbe, ccn, cbdf) + outs[6:]
            return outs[:6], res

        def step_bwd(res, cots):
            e0, e1, cbe, ccn, cbdf, rc_, ret_, rht_, ri0, ri1 = res
            o0c, o1c, h0c, h1c, p0c, p1c = [
                jnp.asarray(c, jnp.float32) for c in cots]
            (ce0, ce1, cbc, gbe, gcn, gbdf) = self._bwd_call(
                cbe, ccn, cbdf, self.refl_P, self.scan_masks,
                self.rev_masks, e0, e1, ri0, ri1,
                o0c, o1c, h0c, h1c, p0c, p1c, rc_, ret_, rht_)
            return ce0, ce1, gbe, gcn, gbdf, cbc

        step.defvjp(step_fwd, step_bwd)
        self.step = step


def make_diff_solve_pallas(cfg: Config, tables, num_steps=None,
                           remat_group: Optional[int] = None,
                           steps_per_launch: Optional[int] = None):
    """Differentiable solve at Pallas-kernel rate.

    Same contract as adjoint.make_diff_solve_fast (``solve_fn(params,
    state) -> State`` in global (M, G, N, 2) layout), with the forward
    AND backward passes running the fused f32 kernels (DiffPallasStep /
    DiffPallasStepK). Gradients are the exact discrete adjoint of the
    f32 kernel program; vs the f64 general adjoint they carry f32-grade
    fidelity (~1e-5 relative — the same trade the forward perf engines
    make).

    ``steps_per_launch`` (BDF2 only): K timesteps fused per launch with
    per-step in-launch records — the differentiable twin of the
    production engine's K-fusion (VERDICT r4 #3). Default None picks
    the engine's production K (ps.PallasEngine.max_steps_per_launch);
    pass 1 to pin the single-step kernels.

    Memory: by default the step scan stores the input planes + tiny
    per-block records for EVERY step (reverse-mode residuals) — ~2 f32
    planes/step (the K-fused path stores the same total: 2/K launch
    inputs + 2(K-1)/K in-launch records). For long horizons pass
    ``remat_group=g`` (or leave None with num_steps > 256, which
    auto-picks g ~ sqrt(n_launches)): launches run in jax.checkpoint'd
    groups of g, storing only the group-boundary states plus one
    group's residuals at a time (sqrt-schedule memory, one extra
    forward recompute per group in the backward pass)."""
    from .. import adjoint as adj

    n = cfg.max_timesteps if num_steps is None else num_steps
    eng = ps.PallasEngine(cfg, tables)
    dstep = DiffPallasStep(eng)
    if steps_per_launch is None:
        # Cap the default at the production headline K=4: deeper fusion
        # is measured-saturated for the forward (PERFORMANCE.md "deeper
        # K fusion"), the K-fused backward's per-visit body grows
        # linearly in K (VMEM/compile pressure), and the XLA CPU
        # compiler has been observed to crash on the interpret-mode
        # K=7 linearized program under suite-level memory pressure.
        Kd = (min(eng.max_steps_per_launch(), 4, max(n, 1))
              if cfg.ts_method == 3 else 1)
    else:
        Kd = max(1, steps_per_launch)
    if cfg.ts_method != 3:
        Kd = 1
    dstep_k = DiffPallasStepK(eng, Kd) if Kd >= 2 and n >= Kd else None
    if dstep_k is None:
        Kd = 1
    Mh, G = cfg.M // 2, cfg.G
    if cfg.ts_method == 1:
        kinds = {BE: cfg.dt}
    elif cfg.ts_method == 2:
        kinds = {CN: cfg.dt}
    else:
        half = cfg.dt / 2.0
        kinds = {BE: half, CN: half, BDF: half}

    def solve_fn(params: dict, state=None):
        unknown = set(params) - set(adj._PARAM_KEYS)
        if unknown:
            raise ValueError(
                f"unknown differentiable parameters {sorted(unknown)}; "
                f"supported: {adj._PARAM_KEYS}")
        t = adj.traced_tables(cfg, tables, **params)
        packs = {k: _pack_coeffs_traced(
            fs.build_kind_coeffs_traced(cfg, t, k, ts))
            for k, ts in kinds.items()}
        cbe = packs.get(BE, jnp.zeros((2, Mh * G, ps._NCOEF), jnp.float32))
        ccn = packs.get(CN, jnp.zeros((2, Mh * G, ps._NCOEF), jnp.float32))
        cbdf = packs.get(BDF, jnp.zeros((2, Mh * G, ps._NCOEF),
                                        jnp.float32))
        psi_plane = fs._to_plane(jnp.asarray(t.psi_source, jnp.float64),
                                 Mh, G)
        bc_neg = (psi_plane[0] if cfg.bc_right_indicator == 1
                  else jnp.zeros(Mh * G))
        bc_pos = (jnp.zeros(Mh * G) if cfg.bc_left_indicator == 2
                  else psi_plane[1])
        bc = jnp.stack([bc_neg, bc_pos], 0)[..., None].astype(jnp.float32)

        fe = eng._fe
        if state is None:
            Bg = jnp.broadcast_to(
                jnp.asarray(t.B, jnp.float64)[None, :], (Mh, G)
            ).reshape(Mh * G)
            plane = jnp.broadcast_to(
                Bg[None, :, None], (2, Mh * G, cfg.N)).astype(jnp.float32)
            st = fs.FlatState(plane, plane, plane, plane, plane, plane)
        else:
            tiled = fe.from_ends(state.ends, state.prev_ends,
                                 state.half_ends)
            st = jax.tree_util.tree_map(
                lambda x: fe.untile(jnp.asarray(x, jnp.float32)), tiled)

        def body(s, _):
            o0, o1, h0, h1 = dstep.step(s.e0, s.e1, cbe, ccn, cbdf, bc)
            if cfg.ts_method == 3:
                ns = fs.FlatState(o0, o1, s.e0, s.e1, h0, h1)
            else:
                ns = fs.FlatState(o0, o1, s.e0, s.e1, s.h0, s.h1)
            return ns, None

        def body_k(s, _):
            o0, o1, h0, h1, p0, p1 = dstep_k.step(
                s.e0, s.e1, cbe, ccn, cbdf, bc)
            return fs.FlatState(o0, o1, p0, p1, h0, h1), None

        launch = body_k if Kd >= 2 else body
        n_launch, n_tail = divmod(n, Kd)
        g = remat_group
        if g is None and n > 256:
            g = max(1, int(np.sqrt(n_launch)))
        if g and g > 1 and n_launch > g:
            def group(s, _):
                s, _ = lax.scan(launch, s, None, length=g)
                return s, None

            ngroups, gtail = divmod(n_launch, g)
            st, _ = lax.scan(jax.checkpoint(group), st, None,
                             length=ngroups)
            if gtail:
                st, _ = lax.scan(launch, st, None, length=gtail)
        else:
            st, _ = lax.scan(launch, st, None, length=n_launch)
        if n_tail:
            st, _ = lax.scan(body, st, None, length=n_tail)

        def pair(x0, x1):
            return fe.ends_pair(fe.tile(jnp.asarray(x0, jnp.float64)),
                                fe.tile(jnp.asarray(x1, jnp.float64)))

        return adj.State(ends=pair(st.e0, st.e1),
                         prev_ends=pair(st.p0, st.p1),
                         half_ends=pair(st.h0, st.h1))

    return solve_fn
