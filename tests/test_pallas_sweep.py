"""Pallas single-pass sweep kernels == XLA fast engine (interpret mode).

Runs the Mosaic kernels through the Pallas interpreter on CPU, comparing
against the XLA fast engine at the same float32 precision. Error metric is
normalised by the per-array magnitude: the LLNL deck's optically-thick
groups produce values spanning ~10 orders of magnitude and the engines'
different reduction orders differ at f32 roundoff on the tiny entries
(both are equally far from the float64 truth).
"""

import conftest  # noqa: F401

import jax.numpy as jnp
import numpy as np
import pytest

from radiative_transfer_tpu import load_config
from radiative_transfer_tpu.models import transport
from radiative_transfer_tpu.ops import fast_sweep, pallas_sweep


def _relerr(got, ref):
    scale = np.max(np.abs(ref)) + 1e-300
    return np.max(np.abs(got - ref)) / scale


def _compare(cfg, num_steps, block=16, tol=1e-5):
    tables, _, _ = transport.build_tables(cfg)
    eng, fst = fast_sweep.solve_fast(
        cfg, tables, num_steps=num_steps, dtype=jnp.float32, chunk=block
    )
    peng = pallas_sweep.PallasEngine(cfg, tables, block=block)
    pst = peng.solve(num_steps=num_steps)
    assert peng.interpret, "tests must run the interpreter (CPU)"
    assert _relerr(np.asarray(peng.ends(pst)), np.asarray(eng.ends(fst))) < tol
    assert _relerr(
        np.asarray(peng.ends_pair(pst.p0, pst.p1)),
        np.asarray(eng.ends_pair(fst.p0, fst.p1)),
    ) < tol
    if cfg.ts_method == 3:
        assert _relerr(
            np.asarray(peng.ends_pair(pst.h0, pst.h1)),
            np.asarray(eng.ends_pair(fst.h0, fst.h1)),
        ) < tol


@pytest.mark.parametrize("ts_method", [1, 2, 3])
def test_gray_deck(ts_method):
    cfg = load_config(
        conftest.reference_deck("single_group.prm"),
        N=64, ts_method=ts_method, max_timesteps=3,
    )
    _compare(cfg, 3)


def test_multigroup_correction_deck():
    cfg = load_config(
        conftest.reference_deck("multi_group_equilibrium.prm"),
        N=64, max_timesteps=3,
    )
    _compare(cfg, 3)


def test_llnl_deck():
    cfg = load_config(
        conftest.reference_deck("llnl_slab_test.prm"), N=32, max_timesteps=2
    )
    _compare(cfg, 2)


@pytest.mark.parametrize("bc_left,bc_right", [(0, 0), (1, 1), (2, 0), (2, 1)])
def test_bc_combinations(bc_left, bc_right):
    cfg = load_config(
        conftest.reference_deck("single_group.prm"),
        M=8, N=64, ts_method=3, max_timesteps=2,
        bc_left_indicator=bc_left, bc_right_indicator=bc_right,
        psi_source=tuple((float(i + 1),) for i in range(8)),
    )
    _compare(cfg, 2)


def test_multi_step_fusion_matches_single_steps():
    """K fused timesteps per launch == K separate step() calls (bitwise:
    identical op order per block, only the HBM round-trips differ)."""
    cfg = load_config(conftest.reference_deck("single_group.prm"),
                      max_timesteps=6, N=64)
    tables, _, _ = transport.build_tables(cfg)
    eng = pallas_sweep.PallasEngine(cfg, tables, block=16)

    st_loop = eng.init_state()
    for _ in range(6):
        st_loop = eng.step(st_loop)

    st_fused = eng.multi_step(eng.init_state(), 6)
    np.testing.assert_array_equal(
        np.asarray(st_fused.e0), np.asarray(st_loop.e0)
    )
    np.testing.assert_array_equal(
        np.asarray(st_fused.e1), np.asarray(st_loop.e1)
    )
    np.testing.assert_array_equal(
        np.asarray(st_fused.h1), np.asarray(st_loop.h1)
    )

    # and through solve()'s mixed body+tail path (K=4 then tail=2)
    st_solve = eng.solve(num_steps=6, steps_per_launch=4)
    np.testing.assert_array_equal(
        np.asarray(st_solve.e0), np.asarray(st_loop.e0)
    )


@pytest.mark.parametrize("ts_method", [1, 2])
def test_multi_step_fusion_be_cn(ts_method):
    """K fused BE/CN timesteps per launch == K separate step() calls."""
    cfg = load_config(conftest.reference_deck("single_group.prm"),
                      max_timesteps=6, N=64, ts_method=ts_method)
    tables, _, _ = transport.build_tables(cfg)
    eng = pallas_sweep.PallasEngine(cfg, tables, block=16)

    st_loop = eng.init_state()
    for _ in range(6):
        st_loop = eng.step(st_loop)
    st_fused = eng.multi_step(eng.init_state(), 6)
    np.testing.assert_array_equal(
        np.asarray(st_fused.e0), np.asarray(st_loop.e0)
    )
    np.testing.assert_array_equal(
        np.asarray(st_fused.e1), np.asarray(st_loop.e1)
    )
    np.testing.assert_array_equal(
        np.asarray(st_fused.p1), np.asarray(st_loop.p1)
    )


# -- accuracy-bounded scan truncation (ops/pallas_sweep._scan_npass) ---------

def test_scan_npass_bound():
    """The pass-count bound: tol=0 disables truncation; a=0 needs no
    passes; a -> 1 needs all; count is monotone in a and in 1/tol."""
    blk = 4096
    full = len(pallas_sweep._scan_strides(blk))
    assert pallas_sweep._scan_npass(0.5, blk, 0.0) == full
    assert pallas_sweep._scan_npass(0.0, blk, 1e-10) == 0
    assert pallas_sweep._scan_npass(1.0 - 1e-15, blk, 1e-10) == full
    n_loose = pallas_sweep._scan_npass(0.3, blk, 1e-6)
    n_tight = pallas_sweep._scan_npass(0.3, blk, 1e-12)
    assert n_loose <= n_tight < full
    assert (pallas_sweep._scan_npass(0.1, blk, 1e-10)
            <= pallas_sweep._scan_npass(0.9, blk, 1e-10))
    # the bound itself: after k passes the neglected tail is
    # a^(2^k)/(1-a) — verify directly for a mid-range a
    a, tol = 0.6, 1e-10
    k = pallas_sweep._scan_npass(a, blk, tol)
    assert a ** (1 << k) / (1 - a) < tol
    if k > 0:
        assert a ** (1 << (k - 1)) / (1 - a) >= tol


def test_scan_truncation_accuracy():
    """Default scan_tol vs the full scan: differences bounded far below
    the engines' f32 drift floor, on a deck sized so truncation actually
    removes passes."""
    cfg = load_config(conftest.reference_deck("single_group.prm"),
                      max_timesteps=12, N=512, dt=2e-6)
    tables, _, _ = transport.build_tables(cfg)
    eng_t = pallas_sweep.PallasEngine(cfg, tables)
    eng_f = pallas_sweep.PallasEngine(cfg, tables, scan_tol=0.0)
    full = len(pallas_sweep._scan_strides(eng_t.block))
    assert max(eng_t.scan_npass.values()) < full, (
        f"deck does not exercise truncation: {eng_t.scan_npass}"
    )
    st_t = eng_t.solve(eng_t.init_state(), 12)
    st_f = eng_f.solve(eng_f.init_state(), 12)
    a = np.asarray(eng_f.ends(st_f))
    b = np.asarray(eng_t.ends(st_t))
    rel = np.max(np.abs(a - b)) / np.max(np.abs(a))
    assert rel < 1e-7, rel


def test_scan_npass_llnl_keeps_more_passes():
    """Optically-thin LLNL groups have carry multipliers near 1 at the
    shipped dt, so the truncation keeps (nearly) the full scan there,
    while the gray deck truncates aggressively."""
    cfg_g = load_config(conftest.reference_deck("single_group.prm"))
    cfg_l = load_config(conftest.reference_deck("llnl_slab_test.prm"))
    tg, _, _ = transport.build_tables(cfg_g)
    tl, _, _ = transport.build_tables(cfg_l)
    eg = pallas_sweep.PallasEngine(cfg_g, tg)
    el = pallas_sweep.PallasEngine(cfg_l, tl)
    full_l = len(pallas_sweep._scan_strides(el.block))
    assert max(el.scan_npass.values()) == full_l
    assert max(eg.scan_npass.values()) < full_l


def test_block_autotune_and_pinning():
    """Auto mode targets the measured-best BDF2 fusion regime
    (Bh*block = 2^17 with K=4 steps/launch, docs/PERFORMANCE.md); an
    explicit block= is pinned verbatim so callers and tests control the
    inter-block decomposition."""
    from conftest import reference_deck

    cfg = load_config(reference_deck("single_group.prm"),
                      M=32, N=1 << 14, X=1.0, max_timesteps=2)  # Bh=16
    tables, _, _ = transport.build_tables(cfg)

    auto = pallas_sweep.PallasEngine(cfg, tables)
    assert auto.Bh * auto.block == 1 << 17
    assert auto.max_steps_per_launch() == 4

    pinned = pallas_sweep.PallasEngine(cfg, tables, block=2048)
    assert pinned.block == 2048
    assert pinned.max_steps_per_launch() == 8  # 2^15 is the 2^16 regime
