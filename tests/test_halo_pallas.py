"""Halo-overlap PALLAS engine == single-chip fused Pallas engine.

The halo engine (parallel/halo_pallas.py) runs the SAME truncated-scan
kernel math over an overlapping decomposition whose creep bound makes the
shard-owned cells exactly what the single-chip kernel computes — measured
agreement is bit-exact up to compiler-level FMA/grouping reassociation
(different K-step launch groupings of the single-chip engine itself
differ by ~1 f32 ulp at M=8), so the tolerance here is ~10 ulps, much
tighter than the deferred-correction sharded engine's 1e-5.

Decks are run at N=1024 with X scaled to keep dx at the reference decks'
physical 0.01 cm (X=1, N=100): the creep bound needs N_loc >= 4K*reach
cells per shard, and reach grows as cells go optically thin.
"""

import conftest  # noqa: F401
from conftest import reference_deck

import jax
import numpy as np
import pytest

from radiative_transfer_tpu import load_config
from radiative_transfer_tpu.models import transport
from radiative_transfer_tpu.ops import pallas_sweep
from radiative_transfer_tpu.parallel import halo_pallas

TOL = 2e-6


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return halo_pallas.Mesh(np.asarray(jax.devices()[:8]), ("x",))


@pytest.fixture(scope="module")
def mesh2x4():
    assert len(jax.devices()) >= 8
    arr = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return halo_pallas.Mesh(arr, ("g", "x"))


def _relerr(got, ref):
    scale = np.max(np.abs(ref)) + 1e-300
    return np.max(np.abs(got - ref)) / scale


def _compare(cfg, mesh, num_steps, block=32, tol=TOL, **halo_kw):
    tables, _, _ = transport.build_tables(cfg)

    peng = pallas_sweep.PallasEngine(cfg, tables, block=block)
    assert peng.interpret, "tests must run the interpreter (CPU)"
    pst = peng.solve(num_steps=num_steps)

    heng = halo_pallas.HaloPallasEngine(cfg, tables, mesh, block=block,
                                        **halo_kw)
    assert heng.interpret
    hst = heng.solve(num_steps=num_steps)

    assert _relerr(
        np.asarray(heng.ends(hst)), np.asarray(peng.ends(pst))
    ) < tol
    if cfg.ts_method == 3:
        prev, half = heng.prev_half_ends(hst)
        assert _relerr(
            np.asarray(prev), np.asarray(peng.ends_pair(pst.p0, pst.p1))
        ) < tol
        assert _relerr(
            np.asarray(half), np.asarray(peng.ends_pair(pst.h0, pst.h1))
        ) < tol
    return heng


def _gray(**ov):
    ov.setdefault("N", 1024)
    ov.setdefault("X", 10.24)
    return load_config(reference_deck("single_group.prm"), **ov)


@pytest.mark.parametrize("ts_method", [1, 2, 3])
def test_gray_deck(mesh8, ts_method):
    cfg = _gray(max_timesteps=6, ts_method=ts_method)
    heng = _compare(cfg, mesh8, 6)
    # the launch fusion must actually engage (this is the engine's point)
    assert heng.K_launch >= 2


def test_multigroup_correction(mesh8):
    cfg = load_config(reference_deck("multi_group_equilibrium.prm"),
                      max_timesteps=5, N=1024, X=10.24)
    _compare(cfg, mesh8, 5)


@pytest.mark.parametrize("bc_left,bc_right", [(0, 0), (1, 1), (2, 0)])
def test_bc_combinations(mesh8, bc_left, bc_right):
    cfg = _gray(max_timesteps=5, bc_left_indicator=bc_left,
                bc_right_indicator=bc_right)
    _compare(cfg, mesh8, 5)


@pytest.mark.parametrize("ts_method", [1, 3])
def test_2d_mesh_gray(mesh2x4, ts_method):
    """(g=2, x=4) mesh: batch rows sharded; the reflective fixup's
    direction flip crosses the group shards (all_gather over 'g')."""
    cfg = _gray(max_timesteps=5, M=8,
                psi_source=tuple((4.0931,) for _ in range(8)),
                ts_method=ts_method)
    _compare(cfg, mesh2x4, 5)


def test_tail_launch_group(mesh8):
    """num_steps not divisible by K_launch exercises the tail-K kernel."""
    cfg = _gray(max_timesteps=5)
    tables, _, _ = transport.build_tables(cfg)
    heng = halo_pallas.HaloPallasEngine(cfg, tables, mesh8, block=32)
    assert heng.K_launch == 2  # 5 = 2*2 + 1 tail
    _compare(cfg, mesh8, 5)


def test_steps_per_launch_cap(mesh8):
    cfg = _gray(max_timesteps=4)
    tables, _, _ = transport.build_tables(cfg)
    heng = halo_pallas.HaloPallasEngine(cfg, tables, mesh8, block=32,
                                        steps_per_launch=1)
    assert heng.K_launch == 1
    _compare(cfg, mesh8, 4, steps_per_launch=1)


def test_untruncated_regime_raises(mesh8):
    """The LLNL deck at coarse resolution is too optically thin per cell
    to truncate the scan (npass == log2(block)): the halo creep bound is
    unsatisfiable and the engine must refuse (use ShardedPallasEngine)."""
    cfg = load_config(reference_deck("llnl_slab_test.prm"), N=64)
    tables, _, _ = transport.build_tables(cfg)
    with pytest.raises(ValueError, match="ShardedPallasEngine"):
        halo_pallas.HaloPallasEngine(cfg, tables, mesh8, block=8)


def test_llnl_benchmark_dt_accepted(mesh8):
    """The real LLNL 124-group deck at the benchmark (Courant-0.4) dt:
    even the thinnest group's carry multiplier is ~0.02, so the scan
    truncates to ~3 passes and the creep bound ADMITS the workload — the
    halo engine must run it and match the single-chip kernel. This is
    BASELINE.md's north-star "spatially-decomposed multi-host LLNL
    multigroup run with overlapped halo exchange"; only the deck's
    shipped dt=1e-3 is untruncatable (test_untruncated_regime_raises)."""
    C = 299.79245800  # Constants.h:13
    N = 2048
    cfg0 = load_config(reference_deck("llnl_slab_test.prm"))
    cfg = load_config(reference_deck("llnl_slab_test.prm"), N=N,
                      max_timesteps=2, dt=0.4 * (cfg0.X / N) / C)
    heng = _compare(cfg, mesh8, 2, block=128)
    assert max(heng.scan_npass.values()) <= 4


def test_halo_exceeds_shard_raises(mesh8):
    """Feasible truncation but N_loc too small for even a 1-step halo."""
    cfg = _gray(N=256, X=2.56)  # N_loc=32 < 4*reach=64
    tables, _, _ = transport.build_tables(cfg)
    with pytest.raises(ValueError, match="N_loc"):
        halo_pallas.HaloPallasEngine(cfg, tables, mesh8, block=32)


def test_from_ends_roundtrip(mesh8):
    """Checkpoint-style restart: solve(3)+solve(3) == solve(6) through the
    global-layout export/import."""
    cfg = _gray(max_timesteps=6)
    tables, _, _ = transport.build_tables(cfg)
    heng = halo_pallas.HaloPallasEngine(cfg, tables, mesh8, block=32)

    mid = heng.solve(num_steps=3)
    prev, half = heng.prev_half_ends(mid)
    st2 = heng.from_ends(np.asarray(heng.ends(mid), np.float64),
                         np.asarray(prev, np.float64),
                         np.asarray(half, np.float64))
    final = heng.solve(st2, num_steps=3)
    one = heng.solve(num_steps=6)
    assert _relerr(
        np.asarray(heng.ends(final)), np.asarray(heng.ends(one))
    ) < 1e-5


def test_mask_count_2_at_single_row(mesh8):
    """M=2 deck (Bh_l=1) with exactly npass_max=2: the mask planes array
    is (2, 1, blk), shape-colliding with the (2, Bh_l, X) packed arrays —
    regression for the call wrapper's arg packing."""
    cfg = _gray(max_timesteps=4, X=40.96)  # dx=0.04 -> npass=2 everywhere
    tables, _, _ = transport.build_tables(cfg)
    heng = halo_pallas.HaloPallasEngine(cfg, tables, mesh8, block=32)
    assert heng.Bh_l == 1 and heng._mask_count == 2
    _compare(cfg, mesh8, 4)


def test_mesh_1x1():
    """Single-device mesh (what bench runs on one chip): the halo is
    zero-filled + reset-skipped and the reflective fixup self-permutes."""
    mesh1 = halo_pallas.Mesh(np.asarray(jax.devices()[:1]), ("x",))
    cfg = _gray(max_timesteps=5)
    _compare(cfg, mesh1, 5)


def test_checkpointed_solve(mesh8, tmp_path):
    """The engine-agnostic checkpoint layer drives the halo engine:
    interrupted run + resume == uninterrupted run."""
    from radiative_transfer_tpu.utils import checkpoint as ckpt

    cfg = _gray(max_timesteps=6)
    tables, _, _ = transport.build_tables(cfg)
    heng = halo_pallas.HaloPallasEngine(cfg, tables, mesh8, block=32)

    ckpt.solve_with_checkpoints_engine(
        heng, cfg, str(tmp_path), every=2, num_steps=4)
    st2 = ckpt.solve_with_checkpoints_engine(
        heng, cfg, str(tmp_path), every=2, num_steps=6)[0]  # resumes at 4
    one = heng.solve(num_steps=6)
    assert _relerr(
        np.asarray(heng.ends(st2)), np.asarray(heng.ends(one))
    ) < 1e-5


def test_influence_hard_cap():
    """The creep bound's foundation, tested directly on the single-chip
    kernel: with the truncated scan, a point perturbation of the input
    state cannot influence cells further than S*reach downstream after a
    fused K-step launch (reach = 2^(npass+1): in-block scan window plus
    one inter-block carry hop). Upstream cells may differ freely (the
    perturbed cell itself changes), downstream-beyond-reach must be
    BIT-identical — this is what makes the halo engine's shard cells
    exact rather than merely tol-accurate."""
    cfg = _gray(max_timesteps=4)
    tables, _, _ = transport.build_tables(cfg)
    peng = pallas_sweep.PallasEngine(cfg, tables, block=32)
    K = 2
    npass_max = max(peng.scan_npass.values())
    reach = 1 << (npass_max + 1)
    S = 4 * K  # BDF2 sub-steps per launch
    j0 = 256

    st = peng.init_state()
    e0p = st.e0.at[:, :, j0].multiply(1.5)
    stp = st._replace(e0=e0p)
    out = peng.multi_step(st, K)
    outp = peng.multi_step(stp, K)

    for name in ("e0", "e1", "h0", "h1"):
        d = np.abs(np.asarray(getattr(out, name))
                   - np.asarray(getattr(outp, name)))
        touched = np.nonzero(d.max(axis=(0, 1)))[0]
        assert touched.size, f"{name}: perturbation had no effect"
        # influence must reach forward of j0 at all (test bites) ...
        assert touched.max() > j0, name
        # ... but never beyond the hard cap.
        assert touched.max() <= j0 + S * reach, (
            f"{name}: influence reached {touched.max() - j0} cells "
            f"downstream, cap is {S * reach}")


def test_make_multichip_engine_auto(mesh8):
    """parallel.make_multichip_engine picks halo when the creep bound
    admits the workload and falls back to the per-substep engine when
    it does not (LLNL at coarse resolution)."""
    from radiative_transfer_tpu import parallel
    from radiative_transfer_tpu.parallel import sharded_pallas

    cfg = _gray(max_timesteps=4)
    tables, _, _ = transport.build_tables(cfg)
    eng = parallel.make_multichip_engine(cfg, tables, mesh8, block=32,
                                         platform="tpu")
    assert isinstance(eng, halo_pallas.HaloPallasEngine)

    cfg2 = load_config(reference_deck("llnl_slab_test.prm"), N=64)
    tables2, _, _ = transport.build_tables(cfg2)
    # halo-only kwargs (steps_per_launch) must be dropped when the
    # fallback constructor fires, not raise TypeError. The untruncatable
    # BDF2 fallback is the single-exchange fused engine (round 4,
    # parallel/fused_exchange.py); the per-substep engine remains the
    # fallback for non-BDF2 stepping (test_engine_auto).
    from radiative_transfer_tpu.parallel.fused_exchange import (
        FusedExchangeEngine,
    )

    eng2 = parallel.make_multichip_engine(cfg2, tables2, mesh8, block=8,
                                          steps_per_launch=4,
                                          platform="tpu")
    assert isinstance(eng2, FusedExchangeEngine)


def test_odd_shard_cells_guidance(mesh8):
    """An odd per-shard cell count has no power-of-two block: the engine
    must raise the guidance error up front, not crash in _scan_masks."""
    cfg = _gray(N=1000, max_timesteps=2)   # N_loc = 125
    tables, _, _ = transport.build_tables(cfg)
    with pytest.raises(ValueError, match="power-of-two block"):
        halo_pallas.HaloPallasEngine(cfg, tables, mesh8)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_vs_single_chip(mesh8, seed):
    """Randomized shapes/BCs/integrators/physics: halo engine == single
    chip wherever the creep bound admits the workload; infeasible draws
    must raise the documented guidance (never silently degrade)."""
    from radiative_transfer_tpu.config.config import Config

    rng = np.random.default_rng(4200 + seed)
    M = int(rng.choice([2, 4, 8]))
    G = int(rng.integers(1, 4))
    N = 1024
    cfg = Config(
        M=M, G=G, N=N,
        X=float(N * 10.0 ** rng.uniform(-2.2, -1.6)),  # dx 6e-3..2.5e-2
        efirst=0.1, elast=10.0,
        bc_left_indicator=int(rng.choice([0, 1, 2])),
        bc_right_indicator=int(rng.choice([0, 1, 2])),
        psi_source=tuple(
            tuple(float(rng.uniform(0, 5)) for _ in range(G))
            for _ in range(M)
        ),
        rho=float(rng.uniform(0.5, 2.0)),
        kappa_grey=float(10.0 ** rng.uniform(-0.2, 1.5)),
        T=float(rng.uniform(0.5, 2.0)),
        V=float(rng.uniform(0.0, 3.0)),
        use_correction=bool(rng.integers(0, 2)),
        ts_method=int(rng.choice([1, 2, 3])),
        dt=float(10.0 ** rng.uniform(-6, -5)),
        max_timesteps=5,
        include_validation=False,
        bdf2_symmetric_half=bool(rng.integers(0, 2)),
    )
    tables, _, _ = transport.build_tables(cfg)
    try:
        heng = halo_pallas.HaloPallasEngine(cfg, tables, mesh8, block=32)
    except ValueError as e:
        assert "ShardedPallasEngine" in str(e) or "N_loc" in str(e)
        return
    peng = pallas_sweep.PallasEngine(cfg, tables, block=32)
    pst = peng.solve(num_steps=5)
    hst = heng.solve(num_steps=5)
    assert _relerr(
        np.asarray(heng.ends(hst)), np.asarray(peng.ends(pst))
    ) < 1e-5


def test_equilibrium_preserved(mesh8):
    """GrayTest invariant on the halo engine: the equilibrium slab keeps
    max|F| tiny over a longer run (f32 engine bar, cf. test_gray.py)."""
    cfg = _gray(max_timesteps=40)
    tables, _, _ = transport.build_tables(cfg)
    B = float(np.asarray(tables.B)[0])
    cfg = _gray(max_timesteps=40, psi_source=((B,), (B,)))
    tables, _, _ = transport.build_tables(cfg)
    heng = halo_pallas.HaloPallasEngine(cfg, tables, mesh8, block=32)
    st = heng.solve(num_steps=40)
    ends = np.asarray(heng.ends(st), np.float64)  # (M, G, N, 2)
    psi = 0.5 * (ends[..., 0] + ends[..., 1])
    mu = np.asarray(tables.mu)[:, None, None]
    wt = np.asarray(tables.wt)[:, None, None]
    F = (mu * wt * psi).sum(axis=0)
    assert np.max(np.abs(F)) < 1e-4 * B
