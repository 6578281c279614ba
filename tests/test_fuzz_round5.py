"""Round-5 randomized sweeps: the K-fused differentiable launches
(ops/pallas_adjoint.DiffPallasStepK) against the K=1 kernel chain on
random BDF2 configurations — BCs, correction physics, odd step counts
(forcing tail launches), and both half-snapshot conventions. The df
halo engine has its own fuzz (tests/test_df_halo.py)."""

import conftest  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radiative_transfer_tpu.config.config import Config
from radiative_transfer_tpu.models import transport
from radiative_transfer_tpu.ops import pallas_adjoint as pa


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_kfused_grads_match_k1(seed):
    rng = np.random.default_rng(6200 + seed)
    M = int(rng.choice([2, 4]))
    G = int(rng.integers(1, 3))
    N = 256
    steps = int(rng.integers(5, 10))       # odd counts force tails
    cfg = Config(
        M=M, G=G, N=N,
        X=float(N * 10.0 ** rng.uniform(-2.2, -1.8)),
        efirst=0.1, elast=10.0,
        bc_left_indicator=int(rng.choice([1, 2])),
        bc_right_indicator=1,
        psi_source=tuple(
            tuple(float(rng.uniform(0.5, 3.0)) for _ in range(G))
            for _ in range(M)
        ),
        rho=float(rng.uniform(0.5, 2.0)),
        kappa_grey=float(10.0 ** rng.uniform(-0.2, 1.0)),
        T=float(rng.uniform(0.8, 1.5)),
        V=float(rng.uniform(0.0, 2.0)),
        use_correction=bool(rng.integers(0, 2)),
        ts_method=3,
        dt=float(10.0 ** rng.uniform(-6, -5)),
        max_timesteps=steps,
        include_validation=False,
        bdf2_symmetric_half=bool(rng.integers(0, 2)),
    )
    tables, _, _ = transport.build_tables(cfg)
    params = dict(
        T=jnp.asarray(cfg.T, jnp.float64),
        psi_source=jnp.asarray(np.asarray(cfg.psi_source, np.float64)),
    )

    def gradof(k):
        solve = pa.make_diff_solve_pallas(cfg, tables, num_steps=steps,
                                          steps_per_launch=k)
        return jax.grad(lambda p: jnp.sum(solve(p, None).ends ** 2)
                        * 1e-2)(params)

    g1 = gradof(1)
    g4 = gradof(4)
    for key in params:
        a, b = np.asarray(g1[key]), np.asarray(g4[key])
        scale = np.abs(a).max() + 1e-300
        assert np.abs(a - b).max() / scale < 2e-4, (key, seed)
