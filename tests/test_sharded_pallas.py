"""Sharded PALLAS engine == single-chip Pallas == sharded FAST engine.

Runs the Mosaic kernels through the Pallas interpreter on a virtual
8-device CPU mesh. The sharded engine computes the SAME f32 math in a
different order (zero-inflow kernels + deferred a^j-profile inflow
corrections, parallel/sharded_pallas.py), so agreement is at f32
roundoff, normalised by per-array magnitude (same metric as
test_pallas_sweep.py).
"""

import conftest  # noqa: F401
from conftest import reference_deck

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radiative_transfer_tpu import load_config
from radiative_transfer_tpu.models import transport
from radiative_transfer_tpu.ops import fast_sweep, pallas_sweep
from radiative_transfer_tpu.parallel import sharded_fast, sharded_pallas


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return sharded_pallas.Mesh(np.asarray(jax.devices()[:8]), ("x",))


@pytest.fixture(scope="module")
def mesh2x4():
    assert len(jax.devices()) >= 8
    arr = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return sharded_pallas.Mesh(arr, ("g", "x"))


def _relerr(got, ref):
    scale = np.max(np.abs(ref)) + 1e-300
    return np.max(np.abs(got - ref)) / scale


def _compare(cfg, mesh, num_steps, block=16, tol=1e-5):
    tables, _, _ = transport.build_tables(cfg)

    peng = pallas_sweep.PallasEngine(cfg, tables, block=block)
    assert peng.interpret, "tests must run the interpreter (CPU)"
    pst = peng.solve(num_steps=num_steps)

    seng = sharded_pallas.ShardedPallasEngine(cfg, tables, mesh, block=block)
    assert seng.interpret
    sst = seng.solve(num_steps=num_steps)

    assert _relerr(
        np.asarray(seng.ends(sst)), np.asarray(peng.ends(pst))
    ) < tol
    # BDF2 history too (prev/half must survive the decomposition +
    # deferred-correction representation).
    if cfg.ts_method == 3:
        prev, half = seng.prev_half_ends(sst)
        assert _relerr(
            np.asarray(prev), np.asarray(peng.ends_pair(pst.p0, pst.p1))
        ) < tol
        assert _relerr(
            np.asarray(half), np.asarray(peng.ends_pair(pst.h0, pst.h1))
        ) < tol

    # Cross-engine: the sharded FAST engine at the same f32 precision.
    feng = sharded_fast.ShardedFastEngine(
        cfg, mesh=mesh, tables=tables, dtype=jnp.float32, chunk=block
    )
    fst = feng.solve(num_steps=num_steps)
    assert _relerr(
        np.asarray(seng.ends(sst)), np.asarray(feng.ends(fst))
    ) < tol


@pytest.mark.parametrize("ts_method", [1, 2, 3])
def test_gray_deck(mesh8, ts_method):
    cfg = load_config(reference_deck("single_group.prm"),
                      max_timesteps=6, N=128, ts_method=ts_method)
    _compare(cfg, mesh8, 6)


def test_multigroup_correction(mesh8):
    cfg = load_config(reference_deck("multi_group_equilibrium.prm"),
                      max_timesteps=5, N=64)
    _compare(cfg, mesh8, 5)


def test_llnl_deck(mesh8):
    """124 groups with kappa up to 1e6: the optically-thick composites
    underflow (a^{N_loc} -> 0) — the physically correct loss of upwind
    influence; the deferred corrections must stay NaN-free."""
    cfg = load_config(reference_deck("llnl_slab_test.prm"), N=64)
    _compare(cfg, mesh8, 2)


@pytest.mark.parametrize("bc_left,bc_right", [(0, 0), (1, 1), (2, 0)])
def test_bc_combinations(mesh8, bc_left, bc_right):
    cfg = load_config(reference_deck("single_group.prm"),
                      max_timesteps=5, N=64,
                      bc_left_indicator=bc_left, bc_right_indicator=bc_right)
    _compare(cfg, mesh8, 5)


@pytest.mark.parametrize("ts_method", [1, 3])
def test_2d_mesh_gray(mesh2x4, ts_method):
    """(g=2, x=4) mesh: batch rows sharded too."""
    cfg = load_config(reference_deck("single_group.prm"),
                      max_timesteps=5, N=64, M=8,
                      psi_source=tuple((4.0931,) for _ in range(8)),
                      ts_method=ts_method)
    _compare(cfg, mesh2x4, 5)


def test_2d_mesh_multigroup_reflective(mesh2x4):
    """Group-sharded rows + reflective left boundary: the direction flip
    crosses row shards inside the composite exchange."""
    cfg = load_config(reference_deck("multi_group_equilibrium.prm"),
                      max_timesteps=4, N=64, bc_left_indicator=2)
    _compare(cfg, mesh2x4, 4)


def test_awkward_N(mesh8):
    """N=104: N_loc=13 per shard has no power-of-two block — the engine
    must fall back to one odd-sized block per shard."""
    cfg = load_config(reference_deck("single_group.prm"),
                      max_timesteps=4, N=104)
    tables, _, _ = transport.build_tables(cfg)
    seng = sharded_pallas.ShardedPallasEngine(cfg, tables, mesh8)
    assert seng.block == 13 and seng.nblocks == 1
    _compare(cfg, mesh8, 4)


def test_checkpoint_roundtrip(mesh8, tmp_path):
    """from_ends/ends round-trip through the checkpoint layer: a sharded
    Pallas run can resume a FAST-engine checkpoint and vice versa."""
    from radiative_transfer_tpu.utils import checkpoint as ckpt

    cfg = load_config(reference_deck("single_group.prm"),
                      max_timesteps=6, N=128)
    tables, _, _ = transport.build_tables(cfg)

    seng = sharded_pallas.ShardedPallasEngine(cfg, tables, mesh8, block=16)
    mid = seng.solve(num_steps=3)
    prev, half = seng.prev_half_ends(mid)
    gstate = transport.State(
        ends=np.asarray(seng.ends(mid), np.float64),
        prev_ends=np.asarray(prev, np.float64),
        half_ends=np.asarray(half, np.float64),
    )
    ckpt.save_checkpoint(str(tmp_path), gstate, 3, cfg)

    st2 = seng.from_ends(gstate.ends, gstate.prev_ends, gstate.half_ends)
    final = seng.solve(st2, num_steps=3)

    one = seng.solve(num_steps=6)
    assert _relerr(
        np.asarray(seng.ends(final)), np.asarray(seng.ends(one))
    ) < 1e-5
