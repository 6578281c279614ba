"""Brute-force validation of the BDF2 cycle linear-response profiles
(parallel/step_response.py) against a direct scalar simulation of the
4-phase cycle. Since the cycle is affine in the boundary unknowns, the
exact response to a unit unknown is simulate(v=e_q) - simulate(0) with
zero sources/state — compared per cell against the response planes
(which are computed through different machinery: vectorised
scipy-lfilter recurrences vs this explicit per-cell loop)."""

import conftest  # noqa: F401

import numpy as np
import pytest

from radiative_transfer_tpu import load_config
from radiative_transfer_tpu.models import transport
from radiative_transfer_tpu.ops import fast_sweep as fs
from radiative_transfer_tpu.parallel import step_response as sr

BE, CN, BDF = fs.BE, fs.CN, fs.BDF


def _kind_rows(cfg):
    tables, _, _ = transport.build_tables(cfg)
    fe = fs.FastEngine(cfg, tables, dtype=np.float64, chunk=min(64, cfg.N))
    return {k: sr.kind_rows(kc) for k, kc in fe.kcs.items()}


def _substep_sim(k, kind, e0, e1, p0, p1, h0, h1, inc, p1f, hf):
    rows, N = e0.shape
    col = lambda x: x[:, None]
    p1s = np.concatenate([p1f[:, None], p1[:, :-1]], axis=1)
    h1s = np.concatenate([hf[:, None], h1[:, :-1]], axis=1)
    S = 0.5 * col(k.c1) * (e0 + e1)
    if kind == BE:
        r0 = S + col(k.kee) * e0
        r1 = S + col(k.kee) * e1
    elif kind == CN:
        r0 = S + col(k.kee) * e0 - col(k.q) * e1 + col(k.w) * p1s
        r1 = S + col(k.q) * e0 + col(k.kee) * e1
    else:
        r0 = (S + col(k.kee) * h0 - 2.0 * col(k.w) * h1
              - col(k.kp) * p0 - col(k.q) * p1
              + col(k.w) * (4.0 * h1s + p1s))
        r1 = (S + 2.0 * col(k.w) * h0 + col(k.kee) * h1
              + col(k.q) * p0 - col(k.kp) * p1)
    o0 = np.zeros_like(e0)
    o1 = np.zeros_like(e0)
    c = inc.copy()
    for j in range(N):
        u = r0[:, j] + k.w * c
        o0[:, j] = k.idet * (k.T0 * u - k.q * r1[:, j])
        o1[:, j] = k.idet * (k.q * u + k.T0 * r1[:, j])
        c = o1[:, j]
    return o0, o1


def _cycle_sim(kr, N, v, Bh, symmetric_half):
    """One BDF2 cycle with zero state/sources and boundary unknowns v
    ((rows, NV), the 7-component convention of step_response)."""
    rows = kr[BE].a.shape[0]
    z = np.zeros((rows, N))
    zr = np.zeros(rows)
    is_neg = (np.arange(rows) < Bh)[:, None]

    b0, b1 = _substep_sim(kr[BE], BE, z, z, z, z, z, z, v[:, sr.V_BE1],
                          zr, zr)
    c0, c1 = _substep_sim(kr[CN], CN, b0, b1, z, z, z, z, v[:, sr.V_CN],
                          v[:, sr.V_P1CN], zr)
    if symmetric_half:
        hs0, hs1 = c0, c1
    else:
        hs0 = np.where(is_neg, c0, b0)
        hs1 = np.where(is_neg, c1, b1)
    d0, d1 = _substep_sim(kr[BE], BE, c0, c1, z, z, z, z, v[:, sr.V_BE2],
                          zr, zr)
    f0, f1 = _substep_sim(kr[BDF], BDF, d0, d1, z, z, hs0, hs1,
                          v[:, sr.V_BDF], v[:, sr.V_P1BDF],
                          v[:, sr.V_FILLH])
    outflow = np.stack([b1[:, -1], c1[:, -1], d1[:, -1], f1[:, -1],
                        hs1[:, -1]], axis=1)
    return f0, f1, hs0, hs1, outflow


@pytest.mark.parametrize("deck,kw", [
    ("single_group.prm", dict(N=64, M=4)),
    ("multi_group_equilibrium.prm", dict(N=64)),
    ("llnl_slab_test.prm", dict(N=32)),
])
def test_cycle_response_matches_simulation(deck, kw):
    cfg = load_config(conftest.reference_deck(deck), ts_method=3, **kw)
    kr = _kind_rows(cfg)
    Bh = (cfg.M // 2) * cfg.G
    N = 16
    resp = sr.bdf2_cycle_response(kr, Bh, N,
                                  symmetric_half=cfg.bdf2_symmetric_half)
    rows = 2 * Bh

    for qv in range(sr.NV):
        v = np.zeros((rows, sr.NV))
        v[:, qv] = 1.0
        got = _cycle_sim(kr, N, v, Bh, cfg.bdf2_symmetric_half)
        for R, sim in zip((resp.R_e0, resp.R_e1, resp.R_h0, resp.R_h1),
                          got[:4]):
            scale = np.max(np.abs(sim)) + 1e-300
            np.testing.assert_allclose(R[:, qv], sim, rtol=0,
                                       atol=1e-12 * scale)
        np.testing.assert_allclose(
            resp.M[:, :, qv], got[4], rtol=0,
            atol=1e-12 * (np.max(np.abs(got[4])) + 1e-300))


def test_symmetric_half_variant():
    cfg = load_config(conftest.reference_deck("single_group.prm"),
                      N=32, M=4, ts_method=3, bdf2_symmetric_half=True)
    kr = _kind_rows(cfg)
    Bh = (cfg.M // 2) * cfg.G
    N = 12
    resp = sr.bdf2_cycle_response(kr, Bh, N, symmetric_half=True)
    v = np.zeros((2 * Bh, sr.NV))
    v[:, sr.V_CN] = 1.0
    got = _cycle_sim(kr, N, v, Bh, True)
    scale = np.max(np.abs(got[3])) + 1e-300
    np.testing.assert_allclose(resp.R_h1[:, sr.V_CN], got[3], rtol=0,
                               atol=1e-12 * scale)
