"""On-device CORRECTNESS CI (VERDICT r3 #5): solution-level regression
bars evaluated on real TPU hardware, not just compile checks.

tests/ validates numerics through the CPU interpret path; a TPU-only
numerics regression (e.g. in the truncated-scan bound, a Mosaic
lowering change, or the double-float freeze being optimised away by a
future Mosaic pass) would ship invisibly. This module re-asserts on the
chip:

  * GOLDEN parity of the f32 Pallas engine against the compiled
    reference binary's CSVs (binary runs on the host CPU, our solve on
    the TPU) for the gray and LLNL decks —
    tests/test_reference_parity.py's strongest check, device edition;
  * the documented f32 drift pins vs the f64 solve (tests/test_f32_drift
    bars, docs/PERFORMANCE.md "f32 accuracy");
  * the double-float engine's f64-grade drift pins (tests/test_df_sweep
    bars) — this is the test that fails if on-chip EFT exactness is ever
    broken by a compiler change (ops/df.make_freeze relies on Mosaic not
    duplicating+re-contracting the frozen values).
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from radiative_transfer_tpu.config.config import load_config
from radiative_transfer_tpu.models import transport
from radiative_transfer_tpu.ops.fast_sweep import FastEngine
from radiative_transfer_tpu.ops.pallas_sweep import PallasEngine
from radiative_transfer_tpu.ops.df_sweep import DFPallasEngine
from radiative_transfer_tpu.utils import io as io_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
SOURCES = [
    "src/main.cc", "src/solver.cpp", "src/correction.cpp", "src/Planck.cpp",
    "src/GLQuad.cpp", "src/ParameterHandler.cpp", "src/param.cpp",
]
FIELDS = ("phi", "phi_plus", "psi", "left_ends", "right_ends", "e_ave", "x")


@pytest.fixture(scope="session")
def transfer_binary(tmp_path_factory):
    """Compile the reference C++ against the Eigen shim (MUST be -O0:
    tests/test_reference_parity.py documents the -O2 param-library ODR
    landmine that silently defaults every deck key)."""
    if shutil.which("g++") is None:
        pytest.skip("no g++ toolchain")
    if not os.path.isdir(REF):
        pytest.skip("reference sources not mounted")
    build = tmp_path_factory.mktemp("refbuild")
    (build / "constants.h").write_text('#include "Constants.h"\n')
    (build / "var-config.h").write_text(f'#define TRANSFER_DIR "{REF}/"\n')
    out = build / "transfer"
    cmd = [
        "g++", "-O0", "-std=c++14",
        f"-I{REF}/include",
        f"-I{os.path.join(REPO, 'tests', 'eigen_shim')}",
        f"-I{build}",
        *[os.path.join(REF, s) for s in SOURCES],
        "-o", str(out),
    ]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        pytest.skip(f"reference build failed:\n{res.stderr[-2000:]}")
    return str(out)


def _deck_with_steps(src, steps, tmpdir):
    for name in os.listdir(os.path.join(REF, "prm")):
        if name.endswith(".txt"):
            shutil.copy(os.path.join(REF, "prm", name), tmpdir)
    lines = []
    for line in open(src).read().splitlines():
        if line.startswith("max_timesteps="):
            line = f"max_timesteps={steps}"
        lines.append(line)
    out = os.path.join(tmpdir, os.path.basename(src))
    open(out, "w").write("\n".join(lines) + "\n")
    return out


def _run_reference(binary, deck_path, workdir):
    rundir = os.path.join(workdir, "build")
    prmdir = os.path.join(workdir, "prm")
    os.makedirs(rundir, exist_ok=True)
    os.makedirs(prmdir, exist_ok=True)
    for name in os.listdir(os.path.join(REF, "prm")):
        if name.endswith(".txt"):
            shutil.copy(os.path.join(REF, "prm", name), prmdir)
    res = subprocess.run([binary, deck_path], cwd=rundir,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-500:]
    return rundir


def _write_engine_csvs(cfg, eng, outdir):
    _, grid, _ = transport.build_tables(cfg, dtype=jnp.float64)
    tables64, _, _ = transport.build_tables(cfg, dtype=jnp.float64)
    result = transport.result_from_ends(
        cfg, tables64, jnp.asarray(eng.ends(eng.solve()), jnp.float64))
    x = (np.arange(cfg.N) + 0.5) * cfg.dx
    io_mod.write_solution_csvs(outdir, result, x, np.asarray(grid.e_ave))
    return outdir


@pytest.mark.parametrize("deck,steps,tol", [
    ("single_group.prm", 100, 5e-5),
    ("llnl_slab_test.prm", 2, 2e-5),
])
def test_pallas_golden_parity_on_chip(transfer_binary, tmp_path, deck,
                                      steps, tol):
    """The Mosaic-compiled f32 engine's CSVs vs the reference binary."""
    deck_path = _deck_with_steps(
        os.path.join(REF, "prm", deck), steps, str(tmp_path))
    refdir = _run_reference(transfer_binary, deck_path, str(tmp_path))
    cfg = load_config(deck_path)
    tables, _, _ = transport.build_tables(cfg, dtype=jnp.float64)
    eng = PallasEngine(cfg, tables)
    assert not eng.interpret, "device suite must run the Mosaic compiler"
    ourdir = _write_engine_csvs(cfg, eng, str(tmp_path / "ours"))
    phi_scale = np.abs(np.loadtxt(os.path.join(refdir, "phi.csv"))).max()
    for name in FIELDS:
        a = np.loadtxt(os.path.join(refdir, name + ".csv"))
        b = np.loadtxt(os.path.join(ourdir, name + ".csv"))
        assert a.shape == b.shape, name
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-300)
        assert err < tol, f"{name}: {err:.3e}"
    # F ~ 0 at gray equilibrium: bound against the physical phi scale.
    F = np.loadtxt(os.path.join(ourdir, "F.csv"))
    Fref = np.loadtxt(os.path.join(refdir, "F.csv"))
    assert np.abs(F - Fref).max() / phi_scale < tol


def test_f32_drift_pins_on_chip():
    """docs/PERFORMANCE.md "f32 accuracy" bars re-asserted on hardware
    (tests/test_f32_drift.py pins the same transients on the CPU
    harness). On-chip the measured gray figure is 1.4e-5, not the CPU
    harness's 1.1e-6: BOTH f32 engines land on the identical value, so
    the difference is the f64 *reference* itself (emulated f64 on the
    TPU) — the bars carry ~7x headroom over the measured values."""
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    from f32_drift import run_deck

    cfg = load_config(os.path.join(REF, "prm", "single_group.prm"),
                      max_timesteps=100)
    rows = run_deck("gray", cfg, (100,))
    assert max(r["fast_f32"] for r in rows) < 1e-4
    assert max(r["pallas_f32"] for r in rows) < 1e-4

    cfg = load_config(os.path.join(REF, "prm", "llnl_slab_test.prm"))
    rows = run_deck("llnl2", cfg, (2,))
    assert max(r["fast_f32"] for r in rows) < 1e-5
    assert max(r["pallas_f32"] for r in rows) < 1e-5


def _df_drift(cfg, steps, K=2):
    tables, _, _ = transport.build_tables(cfg)
    fe64 = FastEngine(cfg, tables, dtype=jnp.float64)

    @jax.jit
    def run64(s):
        return lax.fori_loop(0, steps, lambda _, x: fe64.step(x), s)

    ref = np.asarray(fe64.ends(run64(fe64.init_state())))
    eng = DFPallasEngine(cfg, tables)
    assert not eng.interpret, "device suite must run the Mosaic compiler"
    st = eng.solve(num_steps=steps, steps_per_launch=K)
    got = np.asarray(eng.ends(st))
    return np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-300)


def _mesh1():
    from radiative_transfer_tpu.parallel.halo_pallas import Mesh

    return Mesh(np.asarray(jax.devices()[:1]), ("x",))


def test_mesh_engines_solution_parity_on_chip():
    """VERDICT r4 #6: the four f32 mesh engines previously had only
    compile/shape checks on chip — a shard_map x Mosaic lowering
    regression in their numerics would ship invisibly (the CPU
    interpret path compiles through XLA CPU, not Mosaic). Mesh-1x1
    solution parity vs the plain single-chip engine through real
    Mosaic + shard_map closes that: collectives degenerate to
    self-copies but every kernel, exchange fold and fixup runs."""
    from radiative_transfer_tpu.parallel.fused_exchange import (
        FusedExchangeEngine,
    )
    from radiative_transfer_tpu.parallel.halo_pallas import HaloPallasEngine
    from radiative_transfer_tpu.parallel.sharded_pallas import (
        ShardedPallasEngine,
    )

    steps = 6
    cfg = load_config(os.path.join(REF, "prm", "single_group.prm"),
                      M=8, N=2048, X=20.48, max_timesteps=steps,
                      psi_source=tuple((4.0931,) for _ in range(8)))
    tables, _, _ = transport.build_tables(cfg, dtype=jnp.float64)
    peng = PallasEngine(cfg, tables)
    assert not peng.interpret, "device suite must run the Mosaic compiler"
    ref = np.asarray(peng.ends(peng.solve(num_steps=steps)), np.float64)
    scale = np.abs(ref).max()
    mesh = _mesh1()

    for ctor, tol in ((ShardedPallasEngine, 2e-5),
                      (HaloPallasEngine, 2e-5),
                      (FusedExchangeEngine, 2e-5)):
        eng = ctor(cfg, tables, mesh)
        assert not eng.interpret, ctor.__name__
        got = np.asarray(eng.ends(eng.solve(num_steps=steps)), np.float64)
        err = np.abs(got - ref).max() / scale
        assert err < tol, f"{ctor.__name__}: {err:.3e}"


def test_df_halo_mesh_parity_on_chip():
    """The df halo engine's shard-owned cells are BIT-exact vs the
    single-chip df kernel (creep-bound argument, parallel/df_halo.py);
    re-asserted through real Mosaic + shard_map at mesh-1x1 (measured
    0.0 on 2026-08-20; the 1e-11 bar is the VERDICT r4 target and
    leaves room only for benign compiler-level reassociation)."""
    from radiative_transfer_tpu.parallel.df_halo import DFHaloEngine

    steps = 6
    cfg = load_config(os.path.join(REF, "prm", "single_group.prm"),
                      N=2048, X=20.48, max_timesteps=steps)
    tables, _, _ = transport.build_tables(cfg, dtype=jnp.float64)
    deng = DFPallasEngine(cfg, tables, block=256)
    assert not deng.interpret
    ref = np.asarray(deng.ends(deng.solve(num_steps=steps)), np.float64)

    heng = DFHaloEngine(cfg, tables, _mesh1(), block=256)
    assert not heng.interpret
    got = np.asarray(heng.ends(heng.solve(num_steps=steps)), np.float64)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-11


def test_df_halo_drift_on_chip():
    """f64-grade drift pin for the df HALO engine on hardware (the df
    single-chip pin is test_df_engine_f64_grade_on_chip): mesh-1x1
    trajectory vs the all-f64 XLA engine over a 100-step gray
    transient."""
    from radiative_transfer_tpu.parallel.df_halo import DFHaloEngine

    steps = 100
    cfg = load_config(os.path.join(REF, "prm", "single_group.prm"),
                      M=8, N=2048, X=20.48, max_timesteps=steps,
                      psi_source=tuple((4.0931,) for _ in range(8)))
    tables, _, _ = transport.build_tables(cfg, dtype=jnp.float64)
    fe64 = FastEngine(cfg, tables, dtype=jnp.float64)

    @jax.jit
    def run64(s):
        return lax.fori_loop(0, steps, lambda _, x: fe64.step(x), s)

    ref = np.asarray(fe64.ends(run64(fe64.init_state())))
    heng = DFHaloEngine(cfg, tables, _mesh1())
    got = np.asarray(heng.ends(heng.solve(num_steps=steps)))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-10


def test_df_engine_f64_grade_on_chip():
    """Double-float engine drift pins on hardware: the regression alarm
    for on-chip EFT exactness (Mosaic contraction/duplication would
    surface here, nowhere else). Measured: gray 1.1e-12 at 100 steps,
    LLNL 3.9e-13 at 20 steps — bars carry ~30x headroom but sit 5-6
    orders below the f32 engines' drift."""
    cfg = load_config(os.path.join(REF, "prm", "single_group.prm"),
                      M=8, N=256, X=2.56, max_timesteps=100)
    assert _df_drift(cfg, 100, K=4) < 1e-10

    cfg = load_config(os.path.join(REF, "prm", "llnl_slab_test.prm"),
                      max_timesteps=20)
    assert _df_drift(cfg, 20, K=2) < 1e-10
