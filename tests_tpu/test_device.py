"""Real-TPU Mosaic compile + parity checks for every Pallas engine.

Each test builds an engine with interpret=False (the default on a TPU
backend), runs a short multigroup BDF2 solve — the kind that exercises
all three sub-step kernels (BE/CN/BDF), the reflective half coupling,
and the K-step fusion — and asserts agreement with the XLA fast engine
at f32 tolerance. Shapes are kept small so the whole module runs in
about a minute of device time (first Mosaic compile dominates).

The reference problem definition is src/solver.cpp:590-823 (time loop)
with the v/c correction source of src/correction.cpp:372-401.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radiative_transfer_tpu.config.config import Config
from radiative_transfer_tpu.models import transport
from radiative_transfer_tpu.ops.fast_sweep import FastEngine
from radiative_transfer_tpu.ops.pallas_sweep import PallasEngine

C_LIGHT = 299.79245800  # cm/sh, Constants.h:13


def _cfg(M=8, G=4, N=4096, steps=12, ts_method=3, bc_left=2, bc_right=1,
         courant=0.4, **over):
    dt = courant * (1.0 / N) / C_LIGHT
    base = dict(
        M=M, G=G, N=N, X=1.0,
        bc_left_indicator=bc_left, bc_right_indicator=bc_right,
        psi_source=tuple(tuple(4.0931 for _ in range(G)) for _ in range(M)),
        rho=1.0, kappa_grey=1.0, T=1.0, V=1.0, use_correction=True,
        ts_method=ts_method, dt=dt, max_timesteps=steps,
        include_validation=False,
    )
    base.update(over)
    return Config(**base)


def _relerr(got, ref):
    scale = np.max(np.abs(ref)) + 1e-300
    return np.max(np.abs(np.asarray(got) - np.asarray(ref))) / scale


@pytest.fixture(scope="module")
def workload():
    cfg = _cfg()
    tables, _, _ = transport.build_tables(cfg, dtype=jnp.float32)
    feng = FastEngine(cfg, tables, dtype=jnp.float32)
    ref = np.asarray(feng.ends(feng.solve(num_steps=cfg.max_timesteps)))
    return cfg, tables, ref


@pytest.mark.parametrize("ts_method", [1, 2, 3])
def test_pallas_engine_compiles_all_integrators(ts_method):
    cfg = _cfg(ts_method=ts_method, steps=10)
    tables, _, _ = transport.build_tables(cfg, dtype=jnp.float32)
    feng = FastEngine(cfg, tables, dtype=jnp.float32)
    ref = feng.ends(feng.solve(num_steps=cfg.max_timesteps))

    eng = PallasEngine(cfg, tables)
    assert not eng.interpret, "device suite must run the Mosaic compiler"
    st = eng.solve(num_steps=cfg.max_timesteps)
    assert _relerr(eng.ends(st), ref) < 1e-5


def test_sharded_pallas_engine_compiles(workload):
    from radiative_transfer_tpu.parallel.sharded_pallas import (
        Mesh, ShardedPallasEngine,
    )

    cfg, tables, ref = workload
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("x",))
    eng = ShardedPallasEngine(cfg, tables, mesh)
    assert not eng.interpret
    st = eng.solve(num_steps=cfg.max_timesteps)
    assert _relerr(eng.ends(st), ref) < 1e-5


def test_halo_pallas_engine_compiles(workload):
    from radiative_transfer_tpu.parallel.halo_pallas import (
        HaloPallasEngine, Mesh,
    )

    cfg, tables, ref = workload
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("x",))
    eng = HaloPallasEngine(cfg, tables, mesh)
    assert not eng.interpret
    st = eng.solve(num_steps=cfg.max_timesteps)
    assert _relerr(eng.ends(st), ref) < 1e-5


def test_auto_packed_selection_compiles_on_chip():
    """The shape-aware auto selection at tiny Bh (the packed-rows kernel
    at a 1-device mesh) must Mosaic-compile and match the XLA engine —
    this is what `--engine auto` actually runs for S_2..S_8 gray decks
    at production resolutions (parallel/__init__.py)."""
    from radiative_transfer_tpu import parallel
    from radiative_transfer_tpu.parallel.halo_pallas import HaloPallasEngine

    cfg = _cfg(M=2, G=1, steps=10)          # Bh = 1
    tables, _, _ = transport.build_tables(cfg, dtype=jnp.float32)
    feng = FastEngine(cfg, tables, dtype=jnp.float32)
    ref = feng.ends(feng.solve(num_steps=cfg.max_timesteps))

    eng = parallel.make_multichip_engine(cfg, tables, None)
    assert isinstance(eng, HaloPallasEngine) and eng.Kx == 1
    assert not eng.interpret
    st = eng.solve(num_steps=cfg.max_timesteps)
    assert _relerr(eng.ends(st), ref) < 1e-5


def test_equilibrium_preserved_on_chip():
    """The GrayTest invariant (tests/test_gray.cpp:89-98) on hardware:
    a gray slab at the equilibrium intensity keeps max|F| small after
    100 BDF2 steps through the fused kernel."""
    cfg = _cfg(M=8, G=1, N=4096, steps=100, V=0.0, use_correction=True)
    tables, _, _ = transport.build_tables(cfg, dtype=jnp.float32)
    # equilibrium boundary source: psi = B everywhere
    B = float(np.asarray(tables.B)[0])
    cfg = cfg.replace(
        psi_source=tuple(tuple(B for _ in range(1)) for _ in range(8)))
    tables, _, _ = transport.build_tables(cfg, dtype=jnp.float32)

    eng = PallasEngine(cfg, tables)
    st = eng.solve(num_steps=cfg.max_timesteps)
    psi = transport.psi_from_ends(jnp.asarray(eng.ends(st), jnp.float64))
    F = transport.compute_F(psi, tables.mu, tables.wt)
    assert float(jnp.max(jnp.abs(F))) < 1e-4  # f32 engine; f64 bar is 1e-9


def test_stacked_ensemble_on_chip():
    """ensemble.solve_ensemble_stacked through the real Mosaic-compiled
    fused kernel: K kappa members as one G'=K*G problem, each member
    matching its own single-problem FastEngine solve at f32 tolerance."""
    from radiative_transfer_tpu import ensemble

    cfg = _cfg(M=4, G=2, N=4096, steps=8)
    tables, _, _ = transport.build_tables(cfg)
    rng = np.random.default_rng(9)
    K = 4
    kappas = np.asarray(tables.kappa) * rng.uniform(0.5, 2.0, (K, cfg.G))

    got = ensemble.solve_ensemble_stacked(
        cfg, tables, {"kappa": kappas}, num_steps=cfg.max_timesteps,
        engine="single")
    assert got.ends.shape == (K, cfg.M, cfg.G, cfg.N, 2)
    for k in range(K):
        tab_k = ensemble._host_member_tables(
            cfg, tables, {"kappa": kappas[k]})
        feng = FastEngine(cfg, tab_k, dtype=jnp.float32)
        ref = feng.ends(feng.solve(num_steps=cfg.max_timesteps))
        assert _relerr(got.ends[k], ref) < 1e-5


def test_fused_exchange_engine_compiles(workload):
    """The single-exchange fused-cycle mesh engine (the untruncatable-
    regime fallback, parallel/fused_exchange.py) through real Mosaic:
    one launch + one exchange per BDF2 step at a 1-device mesh."""
    from radiative_transfer_tpu.parallel.fused_exchange import (
        FusedExchangeEngine, Mesh,
    )

    cfg, tables, ref = workload
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("x",))
    eng = FusedExchangeEngine(cfg, tables, mesh)
    assert not eng.interpret
    st = eng.solve(num_steps=cfg.max_timesteps)
    assert _relerr(eng.ends(st), ref) < 1e-5
    prev, half = eng.prev_half_ends(st)
    assert np.isfinite(np.asarray(prev)).all()
    assert np.isfinite(np.asarray(half)).all()


def test_pallas_adjoint_grads_on_chip():
    """The analytic reverse kernel through real Mosaic: value + kappa/
    psi_source gradients of a short solve match the f64 XLA adjoint at
    f32-grade bars (ops/pallas_adjoint.py, VERDICT r3 #6)."""
    from radiative_transfer_tpu import adjoint
    from radiative_transfer_tpu.config.config import Config
    from radiative_transfer_tpu.ops import pallas_adjoint as pa

    cfg = _cfg(M=4, G=2, N=1024, steps=3, bc_left=1)
    tables, _, _ = transport.build_tables(cfg)
    sf_fast = adjoint.make_diff_solve_fast(cfg, tables, num_steps=3)
    sf_pal = pa.make_diff_solve_pallas(cfg, tables, num_steps=3)

    params = dict(
        kappa=jnp.asarray(np.full(cfg.G, cfg.kappa_grey), jnp.float64),
        psi_source=jnp.asarray(np.asarray(cfg.psi_source, np.float64)),
    )

    def loss(solve):
        return lambda p: jnp.sum(solve(p, None).ends ** 2) * 1e-2

    vf, gf = jax.value_and_grad(loss(sf_fast))(params)
    vp, gp = jax.value_and_grad(loss(sf_pal))(params)
    assert abs(float(vp) - float(vf)) / abs(float(vf)) < 1e-5
    for k in params:
        a, b = np.asarray(gf[k]), np.asarray(gp[k])
        scale = np.abs(a).max() + 1e-300
        assert np.abs(a - b).max() / scale < 2e-3, k


def test_kfused_adjoint_on_chip():
    """Round-5 K-fused differentiable launches through real Mosaic
    (DiffPallasStepK): the fused forward must BIT-match the production
    multi_step on hardware, and K-fused gradients must match the K=1
    kernel chain (the CPU suite proves interpret-mode equivalence; this
    catches a Mosaic-only lowering difference)."""
    from radiative_transfer_tpu.ops import pallas_adjoint as pa
    from radiative_transfer_tpu.ops import pallas_sweep as ps

    cfg = _cfg(M=4, G=2, N=1024, steps=9, bc_left=2)
    tables, _, _ = transport.build_tables(cfg)
    eng = ps.PallasEngine(cfg, tables, block=256)
    assert not eng.interpret
    st = eng.init_state()
    ref = eng.multi_step(st, 4)
    dk = pa.DiffPallasStepK(eng, 4)
    o0, o1, h0, h1, p0, p1 = dk.step(st.e0, st.e1, eng.coef[1],
                                     eng.coef[2], eng.coef[3], eng.bc)
    for got, want in ((o0, ref.e0), (o1, ref.e1), (h0, ref.h0),
                      (h1, ref.h1), (p0, ref.p0), (p1, ref.p1)):
        assert np.array_equal(np.asarray(got), np.asarray(want))

    params = dict(
        psi_source=jnp.asarray(np.asarray(cfg.psi_source, np.float64)))

    def gradof(k):
        solve = pa.make_diff_solve_pallas(cfg, tables, num_steps=9,
                                          steps_per_launch=k)
        return jax.grad(
            lambda p: jnp.sum(solve(p, None).ends ** 2) * 1e-2)(params)

    g1 = gradof(1)
    g4 = gradof(4)                 # 2 fused launches + 1 tail step
    a, b = np.asarray(g1["psi_source"]), np.asarray(g4["psi_source"])
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-300) < 1e-4
