"""Single-exchange fused BDF2 mesh engine == single-chip Pallas engine.

Runs on the virtual 8-device CPU mesh (interpret-mode kernels). The
fused engine computes the same f32 math through zero-inflow cycles +
host-derived 5-profile corrections (parallel/fused_exchange.py), so
agreement is at f32 roundoff, normalised per array — the same metric
and bar as test_sharded_pallas.py. The LLNL deck runs at its SHIPPED
dt=1e-3 (the untruncatable regime this engine exists for)."""

import conftest  # noqa: F401
from conftest import reference_deck

import jax
import numpy as np
import pytest

from radiative_transfer_tpu import load_config
from radiative_transfer_tpu.models import transport
from radiative_transfer_tpu.ops import pallas_sweep
from radiative_transfer_tpu.parallel import fused_exchange


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return fused_exchange.Mesh(np.asarray(jax.devices()[:8]), ("x",))


@pytest.fixture(scope="module")
def mesh2x4():
    assert len(jax.devices()) >= 8
    arr = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return fused_exchange.Mesh(arr, ("g", "x"))


def _relerr(got, ref):
    scale = np.max(np.abs(ref)) + 1e-300
    return np.max(np.abs(got - ref)) / scale


def _compare(cfg, mesh, num_steps, block=16, tol=1e-5):
    tables, _, _ = transport.build_tables(cfg)

    peng = pallas_sweep.PallasEngine(cfg, tables, block=block)
    assert peng.interpret, "tests must run the interpreter (CPU)"
    pst = peng.solve(num_steps=num_steps)

    feng = fused_exchange.FusedExchangeEngine(cfg, tables, mesh,
                                              block=block)
    assert feng.interpret
    fst = feng.solve(num_steps=num_steps)

    assert _relerr(np.asarray(feng.ends(fst)),
                   np.asarray(peng.ends(pst))) < tol
    prev, half = feng.prev_half_ends(fst)
    assert _relerr(np.asarray(prev),
                   np.asarray(peng.ends_pair(pst.p0, pst.p1))) < tol
    assert _relerr(np.asarray(half),
                   np.asarray(peng.ends_pair(pst.h0, pst.h1))) < tol


def test_gray_reflective(mesh8):
    cfg = load_config(reference_deck("single_group.prm"),
                      N=128, max_timesteps=4)
    _compare(cfg, mesh8, 4)


def test_gray_larger_M(mesh8):
    cfg = load_config(reference_deck("single_group.prm"),
                      M=8, N=128, max_timesteps=3)
    _compare(cfg, mesh8, 3)


def test_llnl_shipped_dt_untruncatable(mesh8):
    """The engine's raison d'etre: the reference's own LLNL deck at its
    shipped dt=1e-3 (prm/llnl_slab_test.prm), where the halo engine's
    creep bound fails."""
    cfg = load_config(reference_deck("llnl_slab_test.prm"),
                      N=32, max_timesteps=2)
    assert cfg.dt == 1e-3
    _compare(cfg, mesh8, 2, block=4)


def test_multigroup_correction(mesh8):
    cfg = load_config(reference_deck("multi_group_equilibrium.prm"),
                      N=64, max_timesteps=3)
    _compare(cfg, mesh8, 3)


def test_source_left_bc(mesh8):
    cfg = load_config(reference_deck("single_group.prm"),
                      M=4, N=64, max_timesteps=2,
                      bc_left_indicator=1, bc_right_indicator=1,
                      psi_source=((1.0,), (2.0,), (3.0,), (4.0,)))
    _compare(cfg, mesh8, 2)


def test_group_sharded_mesh(mesh2x4):
    cfg = load_config(reference_deck("single_group.prm"),
                      M=8, N=64, max_timesteps=2)
    _compare(cfg, mesh2x4, 2)


def test_symmetric_half(mesh8):
    cfg = load_config(reference_deck("single_group.prm"),
                      N=64, max_timesteps=2, bdf2_symmetric_half=True)
    _compare(cfg, mesh8, 2)


def test_refuses_non_bdf2(mesh8):
    cfg = load_config(reference_deck("single_group.prm"),
                      N=64, ts_method=1)
    tables, _, _ = transport.build_tables(cfg)
    with pytest.raises(ValueError):
        fused_exchange.FusedExchangeEngine(cfg, tables, mesh8)


def test_from_ends_round_trip(mesh8):
    """Mid-run handoff: state imported with from_ends continues exactly
    like the single-chip engine from the same state."""
    cfg = load_config(reference_deck("single_group.prm"),
                      N=128, max_timesteps=4)
    tables, _, _ = transport.build_tables(cfg)
    peng = pallas_sweep.PallasEngine(cfg, tables, block=16)
    pst = peng.solve(num_steps=2)
    ends = peng.ends(pst)
    prev = peng.ends_pair(pst.p0, pst.p1)
    half = peng.ends_pair(pst.h0, pst.h1)

    feng = fused_exchange.FusedExchangeEngine(cfg, tables, mesh8,
                                              block=16)
    fst = feng.from_ends(ends, prev, half)
    fst = feng.solve(fst, num_steps=2)
    pst = peng.solve(pst, num_steps=2)
    assert _relerr(np.asarray(feng.ends(fst)),
                   np.asarray(peng.ends(pst))) < 1e-5


def _collective_counts(eng, num_steps):
    """Op counts in the OPTIMIZED HLO of one jitted solve (the fori_loop
    body appears once regardless of trip count, so num_steps=1 counts
    the per-BDF2-step collectives directly)."""
    import re

    import jax

    st = eng.init_state()
    txt = jax.jit(
        lambda s: eng.solve(s, num_steps=num_steps)).lower(st)\
        .compile().as_text()
    return {op: len(re.findall(rf"{op}\(", txt))
            for op in ("all-gather", "collective-permute")}


def test_one_collective_per_step_hlo(mesh8):
    """VERDICT r4 #4a: the routing claim 'fused does 1 collective per
    whole BDF2 step vs 4+ for the per-substep engine' pinned on the
    compiled HLO of the virtual 8-mesh (what auto's untruncatable-mesh
    routing cites, parallel/__init__.py). Measured 2026-08-20:
    fused = 1 all-gather + 0 ppermutes; per-substep = 4 all-gathers +
    2 ppermutes (the history-halo ppermutes)."""
    from radiative_transfer_tpu.parallel import sharded_pallas

    cfg = load_config(reference_deck("llnl_slab_test.prm"), N=512)
    tables, _, _ = transport.build_tables(cfg)

    feng = fused_exchange.FusedExchangeEngine(cfg, tables, mesh8,
                                              block=64)
    fc = _collective_counts(feng, 1)
    assert fc == {"all-gather": 1, "collective-permute": 0}, fc

    peng = sharded_pallas.ShardedPallasEngine(cfg, tables, mesh8,
                                              block=64)
    pc = _collective_counts(peng, 1)
    assert pc["all-gather"] + pc["collective-permute"] >= 4, pc
