"""Double-float Pallas engine == float64 general engine (interpret mode).

The DF engine (ops/df_sweep.py) promises reference-grade (f64-equivalent)
results from f32 Pallas kernels via in-kernel iterative refinement with an
output-based residual. These tests pin its drift against the f64 XLA fast
engine at ~1e-12, i.e. 5-6 orders below the f32 engines' 1e-6..3e-5 — on
every integrator, every reference deck, fused launches (K>1), multi-block
decompositions, and all boundary-condition kinds.

They run through the real pallas_call interpret path UNDER JIT — the
configuration that historically broke the EFT algebra (XLA CPU fusion
duplication + FMA contraction; see ops/df.make_freeze). A passing suite
here is the regression guard for that whole class of compiler hazards.
"""

import conftest  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from radiative_transfer_tpu import load_config
from radiative_transfer_tpu.models import transport
from radiative_transfer_tpu.ops import df, df_sweep, fast_sweep


def _f64_ends(cfg, steps):
    tables, _, _ = transport.build_tables(cfg)
    eng = fast_sweep.FastEngine(cfg, tables, dtype=jnp.float64)

    @jax.jit
    def run(s):
        return lax.fori_loop(0, steps, lambda _, x: eng.step(x), s)

    return tables, np.asarray(eng.ends(run(eng.init_state())))


def _drift(cfg, steps, K=1, tol=1e-11, **kw):
    """Global-scale relative drift of the DF engine vs the f64 engine.

    Global (not pointwise) normalisation: the LLNL deck's thick groups
    decay to ~0 where pointwise relative error is meaningless — the f64
    engine itself is the only anchor at those magnitudes."""
    tables, ref = _f64_ends(cfg, steps)
    eng = df_sweep.DFPallasEngine(cfg, tables, **kw)
    assert eng.interpret, "tests must run the interpreter (CPU)"
    st = eng.solve(num_steps=steps, steps_per_launch=K)
    got = np.asarray(eng.ends(st))
    d = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-300)
    assert d < tol, f"DF drift {d:.3e} >= {tol:g}"
    return d


@pytest.mark.parametrize("ts_method", [1, 2, 3])
def test_gray_deck_kinds(ts_method):
    cfg = load_config(
        conftest.reference_deck("single_group.prm"),
        M=8, N=128, X=1.28, ts_method=ts_method, max_timesteps=4,
    )
    _drift(cfg, 4)


@pytest.mark.parametrize("K", [2, 4])
def test_gray_fused_launches(K):
    cfg = load_config(
        conftest.reference_deck("single_group.prm"),
        M=8, N=128, X=1.28, max_timesteps=8,
    )
    _drift(cfg, 8, K=K)


def test_gray_multi_block():
    cfg = load_config(
        conftest.reference_deck("single_group.prm"),
        M=8, N=256, X=2.56, max_timesteps=4,
    )
    d_one = _drift(cfg, 4, block=256)
    d_four = _drift(cfg, 4, block=64)
    assert d_four < 1e-11 and d_one < 1e-11


def test_multigroup_correction_deck():
    # G=4, use_correction + mg_equilib: the c1*psi source capture path.
    cfg = load_config(
        conftest.reference_deck("multi_group_equilibrium.prm"),
        N=64, max_timesteps=4,
    )
    _drift(cfg, 4)


def test_llnl_deck():
    # 124 groups, kappa spanning [2e-2, 1e6], non-power-of-two N=50:
    # the optically-thick regime that exposed the captured-error
    # formulation's fusion-duplication fragility (ops/df_sweep.py doc).
    cfg = load_config(conftest.reference_deck("llnl_slab_test.prm"),
                     max_timesteps=2)
    _drift(cfg, 2)


@pytest.mark.parametrize("bc_left", [0, 1, 2])
def test_boundary_kinds(bc_left):
    # Reflective left (2) exercises the corrected-outflow df inflow;
    # 0/1 the loaded psi_source path (vacuum-falls-through-to-source
    # reference quirk, solver.cpp:667-671).
    cfg = load_config(
        conftest.reference_deck("single_group.prm"),
        M=8, N=128, X=1.28, ts_method=1, max_timesteps=3,
        bc_left_indicator=bc_left,
    )
    _drift(cfg, 3)


def test_long_march_drift_pin():
    # VERDICT r3 #1 acceptance bar: drift <= 1e-10 over >= 1000 BDF2
    # steps. CPU-sized spatially; the dt and step count match the
    # reference GrayTest transient (tests/test_gray.cpp).
    cfg = load_config(
        conftest.reference_deck("single_group.prm"),
        N=128, X=1.28, max_timesteps=1000,
    )
    _drift(cfg, 1000, K=4, tol=1e-10)


def test_from_ends_round_trip():
    cfg = load_config(
        conftest.reference_deck("single_group.prm"),
        M=8, N=128, X=1.28, max_timesteps=2,
    )
    tables, _ = _f64_ends(cfg, 2)
    eng = df_sweep.DFPallasEngine(cfg, tables)
    rng = np.random.default_rng(7)
    shape = (cfg.M, cfg.G, cfg.N, 2)
    ends = rng.uniform(0.5, 4.0, shape)
    prev = rng.uniform(0.5, 4.0, shape)
    half = rng.uniform(0.5, 4.0, shape)
    st = eng.from_ends(jnp.asarray(ends), jnp.asarray(prev),
                       jnp.asarray(half))
    # hi+lo reproduces the f64 input to double-float accuracy
    back = np.asarray(eng.ends(st))
    assert np.max(np.abs(back - ends)) < 1e-12
    # and the state still steps (one to make sure `one` plumbing holds)
    eng.step(st)


def test_state_one_is_runtime_parameter():
    """The EFT freeze's opaque 1.0 must enter jit as a parameter.

    If `one` ever becomes a trace-time constant, XLA folds x*1.0 away
    and the captured errors silently corrupt (bit-identical results
    with and without the freeze were the round-4 symptom). Poisoning
    `one` must change the answer — proof the freeze is live on the
    compiled path."""
    cfg = load_config(
        conftest.reference_deck("single_group.prm"),
        M=8, N=128, X=1.28, ts_method=1, max_timesteps=2,
    )
    tables, ref = _f64_ends(cfg, 2)
    eng = df_sweep.DFPallasEngine(cfg, tables)
    st = eng.init_state()
    good = np.asarray(eng.ends(eng.solve(st, num_steps=2)))
    poisoned = st._replace(one=jnp.full((1, 1), 1.25, jnp.float32))
    bad = np.asarray(eng.ends(eng.solve(poisoned, num_steps=2)))
    assert not np.array_equal(good, bad), (
        "freeze multiplier had no effect — it has been constant-folded"
    )
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(good - ref)) / scale < 1e-11


def test_eft_primitives_exact():
    """two_sum / split / prod_err error-free contracts, under jit."""
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(-4, 4, 512).astype(np.float32))
    b = jnp.asarray(rng.uniform(-4, 4, 512).astype(np.float32))

    @jax.jit
    def eft(a, b):
        s, e = df.two_sum(a, b)
        h, l = df.split(a)
        p, pe = df.two_prod(a, b)
        return s, e, h, l, p, pe

    s, e, h, l, p, pe = [np.asarray(x, np.float64) for x in eft(a, b)]
    a64 = np.asarray(a, np.float64)
    b64 = np.asarray(b, np.float64)
    assert np.array_equal(s + e, a64 + b64)
    assert np.array_equal(h + l, a64)
    # split parts multiply exactly in f32
    assert np.array_equal(
        np.float32(h) * np.float32(h), np.float64(h) * np.float64(h))
    assert np.max(np.abs((p + pe) - a64 * b64)) == 0.0


def test_np_df_packing():
    x = np.array([np.pi, 1e6 + 0.123456789, 2e-2], np.float64)
    hi, lo = df.np_df(x)
    assert np.max(np.abs(hi.astype(np.float64) + lo.astype(np.float64) - x)
                  / np.abs(x)) < 1e-14
