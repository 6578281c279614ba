"""Double-float halo-overlap engine == single-chip double-float engine.

The df halo engine (parallel/df_halo.py) runs the SAME double-float
kernel math (base scan + output-based residual + correction scan,
ops/df_sweep.py) over an overlapping decomposition whose creep bound
hard-caps the zero-seed influence — so the shard-owned cells are
BIT-EXACTLY what the single-chip df kernel computes at the same block
size (measured 0.0 in interpret mode). The assertions use 1e-11
relative on the f64-converted ends, far below f64-grade drift and far
above any compiler-level reassociation noise, matching the VERDICT r4
bar ("virtual-8-mesh trajectories match single-chip df to <=1e-11").

Decks run at N=2048 with X scaled to keep dx at the reference decks'
physical 0.01 cm: the df creep bound needs N_loc >= S*R cells per shard
with R = 2^(npass+1) + 2^(npass_c+1) + 2 (two truncated scans per
sub-step; df_halo module doc).
"""

import conftest  # noqa: F401
from conftest import reference_deck

import jax
import numpy as np
import pytest

from radiative_transfer_tpu import load_config
from radiative_transfer_tpu.models import transport
from radiative_transfer_tpu.ops import df_sweep
from radiative_transfer_tpu.parallel import df_halo

TOL = 1e-11


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return df_halo.Mesh(np.asarray(jax.devices()[:8]), ("x",))


@pytest.fixture(scope="module")
def mesh2x4():
    assert len(jax.devices()) >= 8
    arr = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return df_halo.Mesh(arr, ("g", "x"))


def _relerr(got, ref):
    scale = np.max(np.abs(ref)) + 1e-300
    return np.max(np.abs(got - ref)) / scale


def _compare(cfg, mesh, num_steps, block=32, tol=TOL, **halo_kw):
    tables, _, _ = transport.build_tables(cfg)

    deng = df_sweep.DFPallasEngine(cfg, tables, block=block)
    assert deng.interpret, "tests must run the interpreter (CPU)"
    dst = deng.solve(num_steps=num_steps)

    heng = df_halo.DFHaloEngine(cfg, tables, mesh, block=block, **halo_kw)
    assert heng.interpret
    hst = heng.solve(num_steps=num_steps)

    assert _relerr(
        np.asarray(heng.ends(hst)), np.asarray(deng.ends(dst))
    ) < tol
    if cfg.ts_method == 3:
        prev, half = heng.prev_half_ends(hst)
        rprev, rhalf = deng.prev_half_ends(dst)
        assert _relerr(np.asarray(prev), np.asarray(rprev)) < tol
        assert _relerr(np.asarray(half), np.asarray(rhalf)) < tol
    return heng


def _gray(**ov):
    ov.setdefault("N", 2048)
    ov.setdefault("X", 20.48)
    return load_config(reference_deck("single_group.prm"), **ov)


@pytest.mark.parametrize("ts_method", [1, 2, 3])
def test_gray_deck(mesh8, ts_method):
    cfg = _gray(max_timesteps=5, ts_method=ts_method)
    heng = _compare(cfg, mesh8, 5)
    # the launch fusion must actually engage (this is the engine's point)
    assert heng.K_launch >= 2


def test_multigroup_correction(mesh8):
    cfg = load_config(reference_deck("multi_group_equilibrium.prm"),
                      max_timesteps=3, N=2048, X=20.48)
    _compare(cfg, mesh8, 3)


@pytest.mark.parametrize("bc_left,bc_right", [(0, 0), (1, 1), (2, 0)])
def test_bc_combinations(mesh8, bc_left, bc_right):
    cfg = _gray(max_timesteps=3, bc_left_indicator=bc_left,
                bc_right_indicator=bc_right)
    _compare(cfg, mesh8, 3)


def test_2d_mesh_gray(mesh2x4):
    """(g=2, x=4) mesh: batch rows sharded; the reflective fixup's df
    record flip crosses the group shards (all_gather over 'g')."""
    cfg = _gray(max_timesteps=3, M=8,
                psi_source=tuple((4.0931,) for _ in range(8)))
    _compare(cfg, mesh2x4, 3)


def test_tail_launch_group(mesh8):
    """num_steps not divisible by K_launch exercises the tail-K kernel."""
    cfg = _gray(max_timesteps=5)
    tables, _, _ = transport.build_tables(cfg)
    heng = df_halo.DFHaloEngine(cfg, tables, mesh8, block=32)
    assert heng.K_launch == 2  # 5 = 2*2 + 1 tail
    _compare(cfg, mesh8, 5)


def test_steps_per_launch_cap(mesh8):
    cfg = _gray(max_timesteps=4)
    heng = _compare(cfg, mesh8, 4, steps_per_launch=1)
    assert heng.K_launch == 1


def test_untruncated_regime_raises(mesh8):
    """The LLNL deck at its shipped dt is too optically thin per cell to
    truncate the scan: the df creep bound is unsatisfiable and the engine
    must refuse with the f64 XLA guidance."""
    cfg = load_config(reference_deck("llnl_slab_test.prm"), N=64)
    tables, _, _ = transport.build_tables(cfg)
    with pytest.raises(ValueError, match="float64"):
        df_halo.DFHaloEngine(cfg, tables, mesh8, block=8)


def test_llnl_benchmark_dt_accepted(mesh8):
    """The real LLNL 124-group deck at the benchmark (Courant-0.4) dt
    truncates both scans and the creep bound ADMITS the workload at
    reference precision — the f64-grade analogue of BASELINE.md's
    north-star decomposed multigroup run."""
    C = 299.79245800  # Constants.h:13
    N = 4096
    cfg0 = load_config(reference_deck("llnl_slab_test.prm"))
    cfg = load_config(reference_deck("llnl_slab_test.prm"), N=N,
                      max_timesteps=2, dt=0.4 * (cfg0.X / N) / C)
    heng = _compare(cfg, mesh8, 2, block=128)
    assert max(heng.scan_npass.values()) <= 4


def test_halo_exceeds_shard_raises(mesh8):
    """Feasible truncation but N_loc too small for even a 1-step halo."""
    cfg = _gray(N=256, X=2.56)  # N_loc=32 < 4*reach
    tables, _, _ = transport.build_tables(cfg)
    with pytest.raises(ValueError, match="N_loc"):
        df_halo.DFHaloEngine(cfg, tables, mesh8, block=32)


def test_from_ends_roundtrip(mesh8):
    """Checkpoint-style restart at full df grade: solve(3)+solve(3) ==
    solve(6) through the global-f64 export/import."""
    cfg = _gray(max_timesteps=6)
    tables, _, _ = transport.build_tables(cfg)
    heng = df_halo.DFHaloEngine(cfg, tables, mesh8, block=32)

    mid = heng.solve(num_steps=3)
    prev, half = heng.prev_half_ends(mid)
    st2 = heng.from_ends(np.asarray(heng.ends(mid), np.float64),
                         np.asarray(prev, np.float64),
                         np.asarray(half, np.float64))
    final = heng.solve(st2, num_steps=3)
    one = heng.solve(num_steps=6)
    assert _relerr(
        np.asarray(heng.ends(final)), np.asarray(heng.ends(one))
    ) < 1e-12


def test_mesh_1x1():
    """Single-device mesh (what bench runs on one chip): the halo is
    zero-filled + reset-skipped and the reflective fixup self-permutes."""
    mesh1 = df_halo.Mesh(np.asarray(jax.devices()[:1]), ("x",))
    cfg = _gray(max_timesteps=4)
    _compare(cfg, mesh1, 4)


def test_drift_vs_f64_general(mesh8):
    """End-to-end f64-grade check, not just kernel-vs-kernel: the df
    halo trajectory tracks the all-f64 XLA general engine at the same
    ~1e-13/step grade the single-chip df engine holds
    (tests/test_df_sweep.py)."""
    from radiative_transfer_tpu.ops import fast_sweep as fs

    cfg = _gray(max_timesteps=6)
    tables, _, _ = transport.build_tables(cfg)
    fe = fs.FastEngine(cfg, tables, dtype=np.float64)
    fst = fe.solve(num_steps=6)
    ref = np.asarray(fe.ends_pair(fst.e0, fst.e1), np.float64)

    heng = df_halo.DFHaloEngine(cfg, tables, mesh8, block=32)
    got = np.asarray(heng.ends(heng.solve(num_steps=6)), np.float64)
    assert _relerr(got, ref) < 1e-12


def test_influence_hard_cap_df():
    """The df creep bound's foundation, tested directly on the
    single-chip df kernel: a point perturbation cannot influence cells
    beyond S*R downstream after a fused K-step launch, with
    R = 2^(npass+1) + 2^(npass_c+1) + 2 (df_halo module doc: base scan
    + residual lookback + correction scan). Downstream-beyond-reach
    must be BIT-identical in BOTH hi and lo components."""
    cfg = _gray(max_timesteps=4)
    tables, _, _ = transport.build_tables(cfg)
    deng = df_sweep.DFPallasEngine(cfg, tables, block=32)
    K = 2
    npass_max = max(deng.scan_npass.values())
    npass_c_max = max(deng.corr_npass.values())
    reach = (1 << (npass_max + 1)) + (1 << (npass_c_max + 1)) + 2
    S = 4 * K  # BDF2 sub-steps per launch
    j0 = 512

    st = deng.init_state()
    e0p = st.hi.e0.at[:, :, j0].multiply(1.5)
    stp = st._replace(hi=st.hi._replace(e0=e0p))
    out = deng.multi_step(st, K)
    outp = deng.multi_step(stp, K)

    for comp in ("hi", "lo"):
        for name in ("e0", "e1", "h0", "h1"):
            d = np.abs(
                np.asarray(getattr(getattr(out, comp), name))
                - np.asarray(getattr(getattr(outp, comp), name)))
            touched = np.nonzero(d.max(axis=(0, 1)))[0]
            assert touched.size, f"{comp}.{name}: no effect"
            assert touched.max() > j0, f"{comp}.{name}"
            assert touched.max() <= j0 + S * reach, (
                f"{comp}.{name}: influence reached "
                f"{touched.max() - j0} cells downstream, cap {S * reach}")


def test_checkpointed_solve(mesh8, tmp_path):
    """The engine-agnostic checkpoint layer drives the df halo engine:
    interrupted run + resume == uninterrupted run at df grade."""
    from radiative_transfer_tpu.utils import checkpoint as ckpt

    cfg = _gray(max_timesteps=6)
    tables, _, _ = transport.build_tables(cfg)
    heng = df_halo.DFHaloEngine(cfg, tables, mesh8, block=32)

    ckpt.solve_with_checkpoints_engine(
        heng, cfg, str(tmp_path), every=2, num_steps=4)
    st2 = ckpt.solve_with_checkpoints_engine(
        heng, cfg, str(tmp_path), every=2, num_steps=6)[0]  # resumes at 4
    one = heng.solve(num_steps=6)
    assert _relerr(
        np.asarray(heng.ends(st2)), np.asarray(heng.ends(one))
    ) < 1e-12


def test_make_multichip_engine_df_halo(mesh8):
    """parallel.make_multichip_engine(engine='df_halo') constructs the
    df halo engine (the dryrun and f64 mesh routes pin it by name)."""
    from radiative_transfer_tpu import parallel

    cfg = _gray(max_timesteps=2)
    tables, _, _ = transport.build_tables(cfg)
    eng = parallel.make_multichip_engine(cfg, tables, mesh8,
                                         engine="df_halo", block=32)
    assert isinstance(eng, df_halo.DFHaloEngine)


def test_ensemble_stacked_df_mesh(mesh8):
    """solve_ensemble_stacked(engine='df') with a mesh rides the df halo
    engine (ADVICE r4: it used to die on 'unknown multi-chip engine');
    members agree with the single-chip df stacked path."""
    from radiative_transfer_tpu import ensemble

    cfg = _gray(max_timesteps=2, G=2)
    tables, _, _ = transport.build_tables(cfg)
    params = {"kappa": np.asarray([0.8, 1.0, 1.25, 2.0])}
    ref = ensemble.solve_ensemble_stacked(
        cfg, tables, params, num_steps=2, engine="df", block=32)
    got = ensemble.solve_ensemble_stacked(
        cfg, tables, params, num_steps=2, mesh=mesh8, engine="df",
        block=32)
    assert _relerr(np.asarray(got.ends, np.float64),
                   np.asarray(ref.ends, np.float64)) < TOL


def test_cli_df_mesh(tmp_path):
    """cli --engine df --mesh runs the df halo engine end-to-end; the
    infeasible (untruncatable) case exits with the f64-XLA guidance."""
    import io
    import os
    from contextlib import redirect_stdout

    from conftest import deck_edit
    from radiative_transfer_tpu import cli

    text = open(reference_deck("single_group.prm")).read()
    text = deck_edit(text, "max_timesteps=1000", "max_timesteps=2")
    text = deck_edit(text, "N=100", "N=2048")
    text = deck_edit(text, "X=1.", "X=20.48")
    deck = os.path.join(tmp_path, "deck.prm")
    open(deck, "w").write(text)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main([deck, "--outdir", str(tmp_path), "--engine", "df",
                       "--mesh", "1x2"])
    assert rc == 0
    assert "wrote 8 CSVs" in buf.getvalue()

    # Untruncatable deck (the shipped LLNL deck, run in place so its
    # auxiliary group tables resolve): clear SystemExit guidance, not a
    # crash.
    with pytest.raises(SystemExit, match="infeasible"):
        with redirect_stdout(io.StringIO()):
            cli.main([reference_deck("llnl_slab_test.prm"),
                      "--outdir", str(tmp_path), "--engine", "df",
                      "--mesh", "1x2"])


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_vs_single_chip(mesh8, seed):
    """Randomized shapes/BCs/integrators/physics: df halo == single-chip
    df wherever the creep bound admits the workload; infeasible draws
    must raise the documented guidance (never silently degrade)."""
    from radiative_transfer_tpu.config.config import Config

    rng = np.random.default_rng(5200 + seed)
    M = int(rng.choice([2, 4]))
    G = int(rng.integers(1, 3))
    N = 2048
    cfg = Config(
        M=M, G=G, N=N,
        X=float(N * 10.0 ** rng.uniform(-2.2, -1.6)),
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
        max_timesteps=3,
        include_validation=False,
        bdf2_symmetric_half=bool(rng.integers(0, 2)),
    )
    tables, _, _ = transport.build_tables(cfg)
    try:
        heng = df_halo.DFHaloEngine(cfg, tables, mesh8, block=32)
    except ValueError as e:
        assert "float64" in str(e) or "N_loc" in str(e)
        return
    deng = df_sweep.DFPallasEngine(cfg, tables, block=32)
    dst = deng.solve(num_steps=3)
    hst = heng.solve(num_steps=3)
    assert _relerr(
        np.asarray(heng.ends(hst)), np.asarray(deng.ends(dst))
    ) < TOL
