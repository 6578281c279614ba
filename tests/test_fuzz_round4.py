"""Randomized sweeps for the round-4 engines: the double-float kernel
vs the straight-loop oracle at the F64 bar, the single-exchange fused
mesh engine vs the single-chip kernel, and kernel-rate gradients vs the
f64 adjoint — over seeded random shapes, BCs, integrators, and physics
(the same generator family as tests/test_fuzz.py)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from radiative_transfer_tpu.config.config import Config
from radiative_transfer_tpu.models import transport
from radiative_transfer_tpu.ops import df_sweep, fast_sweep, pallas_sweep
from oracle import Oracle


def _random_cfg(rng, ts_choices=(1, 2, 3), n_choices=(17, 32, 50, 96)):
    M = int(rng.choice([2, 4, 8]))
    G = int(rng.integers(1, 5))
    N = int(rng.choice(n_choices))
    return Config(
        M=M, G=G, N=N,
        X=float(rng.uniform(0.2, 2.0)),
        efirst=0.1, elast=10.0,
        bc_left_indicator=int(rng.choice([0, 1, 2])),
        bc_right_indicator=int(rng.choice([0, 1, 2])),
        psi_source=tuple(
            tuple(float(rng.uniform(0, 5)) for _ in range(G))
            for _ in range(M)
        ),
        rho=float(rng.uniform(0.5, 2.0)),
        kappa_grey=float(10.0 ** rng.uniform(-1, 2)),
        T=float(rng.uniform(0.5, 2.0)),
        V=float(rng.uniform(0.0, 3.0)),
        use_correction=bool(rng.integers(0, 2)),
        ts_method=int(rng.choice(ts_choices)),
        dt=float(10.0 ** rng.uniform(-6, -4)),
        max_timesteps=int(rng.integers(2, 6)),
        include_validation=False,
    )


def _oracle_solve(cfg, tables, ct):
    o = Oracle(
        M=cfg.M, G=cfg.G, N=cfg.N, dx=cfg.dx, dt=cfg.dt,
        mu=np.asarray(tables.mu), wt=np.asarray(tables.wt),
        rho=np.asarray(tables.rho), kappa=np.asarray(tables.kappa),
        B=np.asarray(ct.B), psi_source=np.asarray(tables.psi_source),
        bc_left=cfg.bc_left_indicator, bc_right=cfg.bc_right_indicator,
        use_correction=cfg.use_correction,
        cor1=ct.cor1, cor2=ct.cor2, cor3=ct.cor3, beta=cfg.beta,
    )
    o.run(cfg.ts_method, cfg.max_timesteps)
    return o


@pytest.mark.parametrize("seed", range(8))
def test_df_engine_matches_oracle_at_f64_bar(seed):
    """The double-float kernel holds the F64 engines' oracle bar (1e-11)
    on random problems — not the f32 engines' 1e-5."""
    rng = np.random.default_rng(4000 + seed)
    cfg = _random_cfg(rng)
    tables, _, ct = transport.build_tables(cfg)
    oracle = _oracle_solve(cfg, tables, ct)
    scale = np.abs(oracle.ends).max() + 1e-300

    eng = df_sweep.DFPallasEngine(cfg, tables)
    st = eng.solve(num_steps=cfg.max_timesteps)
    d = np.abs(np.asarray(eng.ends(st)) - oracle.ends).max() / scale
    assert d < 1e-11, f"df engine diverged ({d:.2e}, {cfg})"


@pytest.mark.parametrize("seed", range(6))
def test_fused_exchange_matches_single_chip(seed):
    """The single-exchange fused mesh engine == the single-chip kernel
    at f32 roundoff on random BDF2 problems over a random mesh split."""
    from radiative_transfer_tpu.parallel import fused_exchange

    rng = np.random.default_rng(5000 + seed)
    cfg = _random_cfg(rng, ts_choices=(3,), n_choices=(32, 64, 96))
    K = int(rng.choice([2, 4]))
    while cfg.N % K:
        K //= 2
    mesh = fused_exchange.Mesh(np.asarray(jax.devices()[:K]), ("x",))
    tables, _, _ = transport.build_tables(cfg)

    peng = pallas_sweep.PallasEngine(cfg, tables, block=16)
    ref = np.asarray(peng.ends(peng.solve(num_steps=cfg.max_timesteps)))
    feng = fused_exchange.FusedExchangeEngine(cfg, tables, mesh, block=16)
    got = np.asarray(feng.ends(feng.solve(num_steps=cfg.max_timesteps)))
    scale = np.abs(ref).max() + 1e-300
    d = np.abs(got - ref).max() / scale
    assert d < 1e-5, f"fused engine diverged ({d:.2e}, K={K}, {cfg})"


@pytest.mark.parametrize("seed", range(4))
def test_pallas_adjoint_grads_random(seed):
    """Kernel-rate gradients track the f64 adjoint at f32-grade bars on
    random problems (a fixed non-equilibrium source keeps the kappa
    sensitivity O(1) — see tests/test_pallas_adjoint.py)."""
    from radiative_transfer_tpu import adjoint
    from radiative_transfer_tpu.ops import pallas_adjoint as pa

    rng = np.random.default_rng(6000 + seed)
    cfg = _random_cfg(rng, n_choices=(32, 64))
    cfg = cfg.replace(
        psi_source=tuple(
            tuple(float(rng.uniform(1.0, 4.0)) for _ in range(cfg.G))
            for _ in range(cfg.M)),
        bc_right_indicator=1,
    )
    tables, _, _ = transport.build_tables(cfg)
    steps = cfg.max_timesteps
    sf_fast = adjoint.make_diff_solve_fast(cfg, tables, num_steps=steps)
    sf_pal = pa.make_diff_solve_pallas(cfg, tables, num_steps=steps)
    params = dict(
        kappa=jnp.asarray(np.asarray(tables.kappa, np.float64)),
        psi_source=jnp.asarray(np.asarray(cfg.psi_source, np.float64)),
    )

    def loss(solve):
        return lambda p: jnp.mean(solve(p, None).ends ** 2)

    gf = jax.grad(loss(sf_fast))(params)
    gp = jax.grad(loss(sf_pal))(params)
    for k in params:
        a, b = np.asarray(gf[k]), np.asarray(gp[k])
        scale = np.abs(a).max() + 1e-300
        d = np.abs(a - b).max() / scale
        assert d < 5e-3, (k, d, cfg)
