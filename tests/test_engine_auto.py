"""Engine auto-selection: `auto` must never lose to a sibling engine.

The selection table (parallel.make_multichip_engine + cli --engine auto;
measured basis in docs/PERFORMANCE.md):

| topology                | workload            | engine selected      |
|-------------------------|---------------------|----------------------|
| no mesh / 1-device mesh | Bh >= 8             | plain PallasEngine   |
| no mesh / 1-device mesh | Bh < 8, truncatable | packed rows (halo at |
|                         |                     | a 1-device mesh)     |
| multi-device mesh       | truncatable scan    | HaloPallasEngine     |
| multi-device mesh       | untruncatable scan  | ShardedPallasEngine  |
| any (f64 requested)     | any                 | fast XLA engine(s)   |

Measured basis (docs/PERFORMANCE.md): at Bh >= 8 the plain engine wins
(mesh machinery costs ~20%: 51.0 vs 63.6 G at the headline shape), but
at tiny batches the packed-rows kernel WINS 1.66x (49.3 vs 29.7 G at
Bh=4) — the selection is shape-aware.
"""

import subprocess
import sys

import conftest  # noqa: F401
from conftest import deck_edit, reference_deck

import jax
import numpy as np
import pytest

from radiative_transfer_tpu import load_config, parallel
from radiative_transfer_tpu.config.config import Config
from radiative_transfer_tpu.models import transport
from radiative_transfer_tpu.ops.pallas_sweep import PallasEngine
from radiative_transfer_tpu.parallel.halo_pallas import (
    HaloPallasEngine,
    Mesh,
)
from radiative_transfer_tpu.parallel.sharded_pallas import (
    ShardedPallasEngine,
)


def _gray(N=1024, steps=4, M=4, G=1):
    C = 299.79245800
    return Config(
        M=M, G=G, N=N, X=1.0,
        bc_left_indicator=2, bc_right_indicator=1,
        psi_source=tuple((4.0931,) * G for _ in range(M)),
        rho=1.0, kappa_grey=1.0, T=1.0,
        ts_method=3, dt=0.4 * (1.0 / N) / C, max_timesteps=steps,
        include_validation=False,
    )


def _gray_big_bh(**kw):
    """Bh = 8: the plain-engine side of the selection crossover."""
    return _gray(M=16, **kw)


@pytest.fixture(scope="module")
def mesh1():
    return Mesh(np.asarray(jax.devices()[:1]), ("x",))


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return Mesh(np.asarray(jax.devices()[:8]), ("x",))


def test_no_mesh_selects_plain_pallas_at_big_bh():
    cfg = _gray_big_bh()          # Bh = 8: plain-engine side
    tables, _, _ = transport.build_tables(cfg)
    eng = parallel.make_multichip_engine(cfg, tables, None,
                                         platform="tpu")
    assert isinstance(eng, PallasEngine)


def test_no_mesh_selects_packed_at_tiny_bh():
    cfg = _gray()                 # Bh = 2: packed-rows side
    tables, _, _ = transport.build_tables(cfg)
    eng = parallel.make_multichip_engine(cfg, tables, None,
                                         platform="tpu")
    assert isinstance(eng, HaloPallasEngine)
    assert eng.Kx == 1


def test_tiny_bh_untruncatable_falls_back_to_plain():
    cfg = _gray()
    tables, _, _ = transport.build_tables(cfg)
    eng = parallel.make_multichip_engine(cfg, tables, None, scan_tol=0.0,
                                         platform="tpu")
    assert isinstance(eng, PallasEngine)


def test_one_device_mesh_selects_plain_pallas(mesh1):
    cfg = _gray_big_bh()
    tables, _, _ = transport.build_tables(cfg)
    # Halo-only kwargs must be dropped for the plain engine, not raise.
    eng = parallel.make_multichip_engine(cfg, tables, mesh1,
                                         steps_per_launch=4,
                                         platform="tpu")
    assert isinstance(eng, PallasEngine)


def test_single_pin(mesh8):
    cfg = _gray()
    tables, _, _ = transport.build_tables(cfg)
    eng = parallel.make_multichip_engine(cfg, tables, mesh8,
                                         engine="single")
    assert isinstance(eng, PallasEngine)


def test_multi_device_truncatable_selects_halo(mesh8):
    cfg = _gray()
    tables, _, _ = transport.build_tables(cfg)
    eng = parallel.make_multichip_engine(cfg, tables, mesh8, block=32,
                                         platform="tpu")
    assert isinstance(eng, HaloPallasEngine)


def test_multi_device_untruncatable_selects_fused(mesh8):
    # scan_tol=0 disables truncation -> the halo creep bound must reject
    # and auto must fall back to the single-exchange fused-cycle engine
    # for BDF2 (1 launch + 1 small all_gather per step vs the
    # per-substep engine's 4+4, parallel/fused_exchange.py).
    from radiative_transfer_tpu.parallel.fused_exchange import (
        FusedExchangeEngine,
    )

    cfg = _gray()
    tables, _, _ = transport.build_tables(cfg)
    eng = parallel.make_multichip_engine(cfg, tables, mesh8, block=32,
                                         scan_tol=0.0, platform="tpu")
    assert isinstance(eng, FusedExchangeEngine)


def test_multi_device_untruncatable_non_bdf2_selects_sharded(mesh8):
    # BE stepping has no fused-cycle variant: the per-substep engine
    # already runs one exchange per step there.
    cfg = _gray().replace(ts_method=1)
    tables, _, _ = transport.build_tables(cfg)
    eng = parallel.make_multichip_engine(cfg, tables, mesh8, block=32,
                                         scan_tol=0.0, platform="tpu")
    assert isinstance(eng, ShardedPallasEngine)


def test_cpu_platform_selects_fast_engines(mesh8):
    """Off-TPU the Pallas kernels would run the interpreter (2-3x slower
    than the XLA engine, benchmarks/results/suite_virtual.json) — auto
    must pick the fast engines there."""
    from radiative_transfer_tpu.ops.fast_sweep import FastEngine
    from radiative_transfer_tpu.parallel.sharded_fast import (
        ShardedFastEngine,
    )

    cfg = _gray()
    tables, _, _ = transport.build_tables(cfg)
    eng = parallel.make_multichip_engine(cfg, tables, None, platform="cpu")
    assert isinstance(eng, FastEngine)
    eng = parallel.make_multichip_engine(cfg, tables, mesh8,
                                         platform="cpu", scan_tol=1e-10)
    assert isinstance(eng, ShardedFastEngine)


def test_auto_solution_matches_pallas(mesh1):
    """auto at a 1-device mesh is exactly the plain engine's trajectory
    (big Bh picks the plain engine itself)."""
    cfg = _gray_big_bh(steps=3)
    tables, _, _ = transport.build_tables(cfg)
    ref = PallasEngine(cfg, tables).solve()
    eng = parallel.make_multichip_engine(cfg, tables, mesh1,
                                         platform="tpu")
    got = eng.solve()
    np.testing.assert_array_equal(np.asarray(got.e0), np.asarray(ref.e0))


def test_run_problem_engine_param():
    """transport.run_problem(engine=...) is the library-level entry to
    the perf engines: same diagnostics, documented f32 drift bar."""
    cfg = load_config(reference_deck("single_group.prm"), max_timesteps=10)
    a = transport.run_problem(cfg)
    b = transport.run_problem(cfg, engine="auto")
    c = transport.run_problem(cfg, engine="fast")
    pa = np.asarray(a.phi)
    assert np.abs(np.asarray(b.phi) - pa).max() / np.abs(pa).max() < 1e-5
    np.testing.assert_allclose(np.asarray(c.phi), pa, rtol=1e-12)
    with pytest.raises(ValueError, match="unknown engine"):
        transport.run_problem(cfg, engine="bogus")


def test_cli_auto_mesh_f64_uses_fast_engine(tmp_path):
    """auto must honor an explicit f64 request on a mesh by selecting the
    XLA engine (not noting the precision away and running f32)."""
    import io
    import os
    from contextlib import redirect_stdout

    from radiative_transfer_tpu import cli

    text = open(reference_deck("single_group.prm")).read()
    text = deck_edit(text, "max_timesteps=1000", "max_timesteps=2")
    deck = os.path.join(tmp_path, "deck.prm")
    open(deck, "w").write(text)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main([deck, "--outdir", str(tmp_path), "--engine", "auto",
                       "--mesh", "1x2", "--dtype", "float64"])
    assert rc == 0
    assert "auto engine: ShardedFastEngine" in buf.getvalue()


def test_auto_packed_solution_matches_pallas():
    """The packed-rows selection at tiny Bh matches the plain engine to
    kernel roundoff (FMA-grouping level, tests/test_halo_pallas.py)."""
    cfg = _gray(steps=3)
    tables, _, _ = transport.build_tables(cfg)
    peng = PallasEngine(cfg, tables, block=32)
    ref = np.asarray(peng.ends(peng.solve()))
    eng = parallel.make_multichip_engine(cfg, tables, None,
                                         platform="tpu")
    assert isinstance(eng, HaloPallasEngine)
    got = np.asarray(eng.ends(eng.solve()))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 2e-6


@pytest.mark.parametrize("dtype,wants", [
    # single_group.prm has Bh=1 -> the packed-rows selection for f32
    # where feasible (interpret mode); on a real TPU its N=100 has no
    # 128-multiple block, so the constructor refuses and auto falls back
    # to the plain engine — both are correct selections. The subprocess
    # inherits whatever platform is attached, so accept either.
    ("float32", ("auto engine: HaloPallasEngine (single chip)",
                 "auto engine: PallasEngine (single chip)",
                 # CPU-only hosts: interpret mode loses, auto picks XLA
                 "auto engine: FastEngine (single chip)")),
    ("float64", ("auto engine: fast (single chip, float64, off-TPU)",
                 # TPU hosts: the double-float kernel is the fast f64 path
                 "auto engine: df (single chip, double-float kernel)")),
])
def test_cli_auto_single_chip(tmp_path, dtype, wants):
    """cli --engine auto without a mesh runs the fastest single-chip
    engine for the requested precision (no mesh machinery)."""
    out = subprocess.run(
        [sys.executable, "-m", "radiative_transfer_tpu.cli",
         reference_deck("single_group.prm"), "--steps", "2",
         "--engine", "auto", "--dtype", dtype,
         "--outdir", str(tmp_path)],
        capture_output=True, text=True, timeout=600,
        env=None,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert any(w in out.stdout for w in wants), out.stdout[-2000:]
    assert "wrote 8 CSVs" in out.stdout


def test_indivisible_mesh_raises_clear_valueerror(mesh8):
    """No mesh engine can shard N=100 over 8 contiguous spatial shards;
    auto must surface a CLEAR ValueError (review finding: the engines
    used `assert`, so the guidance vanished under python -O and the
    auto fallback chain mixed exception types)."""
    cfg = _gray().replace(N=100)           # 100 % 8 != 0
    tables, _, _ = transport.build_tables(cfg)
    with pytest.raises(ValueError, match="split evenly"):
        parallel.make_multichip_engine(cfg, tables, mesh8, block=4,
                                       scan_tol=0.0, platform="tpu")
    with pytest.raises(ValueError, match="split evenly"):
        parallel.make_multichip_engine(cfg, tables, mesh8, block=4,
                                       scan_tol=0.0, platform="tpu",
                                       engine="fused")
