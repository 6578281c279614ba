"""Direct steady-state solves: the t -> infinity limit in ONE sweep.

The reference can only reach steady state by time-marching (its longest
documented transient, the LLNL slab, needs ~2e4 BDF2 steps through six
decades of non-normal growth before settling — docs/QUIRKS.md #15,
benchmarks/soak.py). But the problem class is LINEAR with frozen
material state (T, rho, kappa are per-group constants, never updated:
reference solver.cpp:154-157, SURVEY §2 "state arrays"), so the steady
state is directly computable — no reference analogue exists because a
time-marching C++ loop nest has no cheap way to express it, while here
it is one more use of the same affine sweep machinery.

Derivation (why ONE modified BE substep is exact):

The backward-Euler cell update solves  M x = r(x_old, carry)  with
M = [[T0, q], [-q, T0]],  T0 = 0.5*((1 + c dt rho kappa) dx + w),
q = 0.5 w, w = c dt |mu|, r = S + k_ee*x_old + w*carry (ops/
fast_sweep._kind_coeff_fields, mirroring reference solver.cpp:319-404).
At a fixed point x_new = x_old = x the k_ee*x term moves to the left:
(T0 - k_ee) x0 + q x1 = S + w*carry, and EVERY term of that system is
proportional to c*dt — dividing it out leaves the dt-FREE system

    T0s = 0.5*(rho kappa dx + |mu|),  qs = 0.5|mu|,  ws = |mu|,
    Ss  = 0.5 dx rho kappa B_g (+ the v/c correction source with the
                                same 0.5 dx scale),
    k_ee = k_p = 0,  s = 1,

which is exactly the steady discrete transport equation
mu dpsi/dx + rho kappa psi = rho kappa B (diamond-difference form).
The same elimination applied to the CN and BDF2 fixed points (their
split upwind terms w*shift(p1) + w*carry recombine once p = e) yields
the identical system, so this object is the common t->infinity limit
of ALL three integrators — the 4-phase BDF2 cycle's fixed point has
every phase fixed, collapsing the half/prev snapshots.

Implementation: feed the dt-free coefficients to the UNCHANGED
FastEngine BE substep (ops/fast_sweep.py — tiled layout, two-level
associative scan, folded boundary inflow incl. the reflective-left
coupling of solver.cpp:679-683). Without the v/c correction the system
is state-independent (k_ee = 0, c1 = 0): one substep returns the exact
steady state. With use_correction the source keeps its pointwise
linear psi term (S += c1*psi, reference correction.cpp:382-399), an
O(beta) contraction — a short fixed-point iteration converges to
roundoff in a handful of sweeps.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import constants
from .config.config import Config
from .models import transport
from .ops import fast_sweep as fs


def _steady_fields(cfg: Config, mu: np.ndarray, rk, B, cor1, cor2, cor3):
    """dt-free steady coefficient algebra (module doc). `mu` is host
    numpy; the material/emission arrays may be jnp tracers (the
    differentiable path), mirroring fast_sweep._kind_coeff_fields."""
    G = cfg.G
    absmu = np.abs(mu)[:, None] * np.ones((1, G))          # (M, G)
    dx = cfg.dx

    w = absmu
    T0 = 0.5 * (rk * dx + w)
    q = 0.5 * w
    det = T0 * T0 + q * q
    a = q * w / det

    Sbase = 0.5 * dx * rk * B[None, :]
    sc = 0.5 * dx
    if cfg.use_correction:
        mb = mu[:, None] * cfg.beta
        c1 = sc * (cor1[None, :] * mb)
        c0 = sc * (cor2[None, :] * mb - cor3[None, :] * mb * mb)
    else:
        c1 = np.zeros((cfg.M, G))
        c0 = np.zeros((cfg.M, G))

    return dict(w=w, T0=T0, q=q, inv_det=1.0 / det, a=a, s=1.0,
                Sbase=Sbase, c1=c1, c0=c0,
                k_ee=np.zeros_like(w), k_p=np.zeros_like(w))


def build_steady_coeffs(cfg: Config, tables, dtype=jnp.float64
                        ) -> fs.KindCoeffs:
    """Host-side steady coefficient planes (host numpy, like
    fast_sweep.build_kind_coeffs — see models/transport.Tables on why)."""
    Mh, G = cfg.M // 2, cfg.G
    mu = np.asarray(tables.mu, dtype=np.float64)
    rk = np.asarray(tables.rhokap, dtype=np.float64)[None, :] \
        * np.ones((cfg.M, 1))
    fields = _steady_fields(
        cfg, mu, rk,
        np.asarray(tables.B, dtype=np.float64),
        np.asarray(tables.cor1, dtype=np.float64),
        np.asarray(tables.cor2, dtype=np.float64),
        np.asarray(tables.cor3, dtype=np.float64),
    )

    def plane(x):
        return np.asarray(
            fs._to_plane(np.broadcast_to(np.asarray(x, np.float64),
                                         (cfg.M, G)), Mh, G)[None, :, :, None],
            dtype=np.dtype(dtype),
        )

    return fs._fields_to_coeffs(fields, 0.0, plane)


class SteadyResult(NamedTuple):
    ends: jnp.ndarray       # (M, G, N, 2), f64
    iterations: int         # sweeps performed (1 unless use_correction)
    residual: float         # last relative update max|delta|/max|e|


def solve_steady(cfg: Config, tables=None, dtype=jnp.float64,
                 tol: Optional[float] = None, max_iters: int = 60,
                 chunk: int = 256) -> SteadyResult:
    """The steady-state `ends` array, directly.

    Without use_correction: exactly one sweep (the system is
    state-independent). With it: fixed-point iteration on the O(beta)
    psi-linear source, stopping at relative update < tol (default:
    50 machine epsilons of `dtype` — roundoff-grade)."""
    if tol is None:
        tol = 50.0 * float(jnp.finfo(dtype).eps)
    if tables is None:
        tables, _, _ = transport.build_tables(cfg, dtype=dtype)
    eng = fs.FastEngine(cfg, tables, dtype=dtype, chunk=chunk)
    kc = build_steady_coeffs(cfg, tables, dtype=dtype)

    @jax.jit
    def one(e0, e1):
        st = fs.FlatState(e0, e1, e0, e1, e0, e1)
        n0, n1 = eng.substep(fs.BE, st, kc=kc)
        d = jnp.maximum(jnp.max(jnp.abs(n0 - e0)), jnp.max(jnp.abs(n1 - e1)))
        m = jnp.maximum(jnp.max(jnp.abs(n0)), jnp.max(jnp.abs(n1)))
        return n0, n1, d / jnp.maximum(m, jnp.finfo(n0.dtype).tiny)

    st0 = eng.init_state()
    e0, e1, res = one(st0.e0, st0.e1)
    iters = 1
    if cfg.use_correction:
        for _ in range(max_iters - 1):
            r = float(res)
            if r < tol:
                break
            e0, e1, res = one(e0, e1)
            iters += 1
    ends = jnp.asarray(eng.ends_pair(e0, e1), jnp.float64)
    return SteadyResult(ends=ends, iterations=iters, residual=float(res))


def solve_steady_cycle(cfg: Config, tables=None, dtype=jnp.float64,
                       tol: Optional[float] = None, restart: int = 40,
                       maxiter: int = 200, chunk: int = 256
                       ) -> SteadyResult:
    """The exact fixed point of the MARCHED time-step map, directly.

    solve_steady returns the steady solution of the spatial
    discretization — the exact t->infinity limit of the BE and CN
    marches. The reference's BDF2 4-phase predictor-corrector is NOT
    steady-state-consistent with its own spatial scheme: its corrector
    evaluates streaming/absorption terms across the three time levels
    (solver.cpp:493-587) in a combination whose fixed point solves a
    slightly different spatial closure, biased by terms proportional to
    the within-cell edge jumps (docs/QUIRKS.md #16; dt- and
    dx-independent, measured 6e-8 gray / 6.4e-4 mg-equilibrium / 2.5%
    psi_max on the under-resolved LLNL benchmark where kappa*dx ~ 100).

    This function computes the exact fixed point of the FULL step map
    for the configured integrator — i.e. exactly where the reference's
    own time-marching settles, without marching there. One timestep is
    affine in the (e0, e1) planes: step(x) = L x + c, so the fixed
    point solves (I - L) x = c — matrix-free restarted GMRES where one
    matvec is ONE jitted engine timestep (the committed LLNL soak
    needed 20480 marched steps through a six-decade non-normal
    transient; GMRES reaches the same state in tens of matvecs).
    The BDF2 cycle's (e0, e1) fully determine the next state (prev is
    committed from e at phase 0; the half snapshot is rebuilt inside
    the cycle), so the reduced state is complete for every ts_method.
    """
    import scipy.sparse.linalg as spla

    if tol is None:
        tol = 1e-12 if dtype == jnp.float64 else 1e-5
    if tables is None:
        tables, _, _ = transport.build_tables(cfg, dtype=dtype)
    eng = fs.FastEngine(cfg, tables, dtype=dtype, chunk=chunk)
    shape = eng.init_state().e0.shape
    sz = int(np.prod(shape))

    @jax.jit
    def cycle_flat(v):
        e0 = v[:sz].reshape(shape)
        e1 = v[sz:].reshape(shape)
        out = eng.step(fs.FlatState(e0, e1, e0, e1, e0, e1))
        return jnp.concatenate([out.e0.ravel(), out.e1.ravel()])

    c = np.asarray(cycle_flat(jnp.zeros(2 * sz, dtype=dtype)))
    nmv = [0]

    def matvec(v):
        nmv[0] += 1
        lv = np.asarray(cycle_flat(jnp.asarray(v, dtype=dtype)),
                        np.float64) - c
        return v - lv

    A = spla.LinearOperator((2 * sz, 2 * sz), matvec=matvec,
                            dtype=np.float64)
    # Warm start from the one-sweep steady solution: GMRES then only has
    # to resolve the (usually small) cycle-vs-diamond bias.
    warm = solve_steady(cfg, tables, dtype=dtype,
                        tol=max(tol, 1e-13), chunk=chunk)
    st0 = eng.from_ends(warm.ends, warm.ends, warm.ends)
    x0 = np.concatenate([np.asarray(st0.e0, np.float64).ravel(),
                         np.asarray(st0.e1, np.float64).ravel()])
    sol, info = spla.gmres(A, c.astype(np.float64), x0=x0, rtol=tol,
                           atol=0.0, restart=restart, maxiter=maxiter)
    if info != 0:
        raise RuntimeError(
            f"steady-cycle GMRES did not converge (info={info}, "
            f"{nmv[0]} matvecs); loosen tol or raise maxiter/restart")
    # Residual in the fixed-point metric (not the GMRES one).
    g = np.asarray(cycle_flat(jnp.asarray(sol, dtype=dtype)), np.float64)
    res = float(np.max(np.abs(g - sol)) / max(np.max(np.abs(sol)),
                                              np.finfo(np.float64).tiny))
    e0 = jnp.asarray(sol[:sz].reshape(shape), dtype)
    e1 = jnp.asarray(sol[sz:].reshape(shape), dtype)
    ends = jnp.asarray(eng.ends_pair(e0, e1), jnp.float64)
    return SteadyResult(ends=ends, iterations=nmv[0], residual=res)


def run_steady_problem(cfg: Config, dtype=jnp.float64,
                       tol: Optional[float] = None,
                       max_iters: int = 60,
                       method: str = "direct"
                       ) -> Tuple[transport.SolveResult,
                                  SteadyResult]:
    """Setup -> steady solve -> the full main.cc:105-133 diagnostics set
    (same SolveResult the time-marching paths produce, so the CLI's CSV
    writers and the reference's plot scripts apply unchanged).

    method='direct' (default): the spatial discretization's steady
    solution (exact BE/CN march limit); method='cycle': the exact fixed
    point of the configured integrator's step map (where the
    reference's own BDF2 march settles — see solve_steady_cycle)."""
    tables, _, ct = transport.build_tables(cfg, dtype=jnp.float64)
    if cfg.include_validation:
        assert transport.validate_tables(cfg, ct), "Invalid Correction Terms"
    if method == "cycle":
        sr = solve_steady_cycle(cfg, tables, dtype=dtype, tol=tol)
    elif method == "direct":
        sr = solve_steady(cfg, tables, dtype=dtype, tol=tol,
                          max_iters=max_iters)
    else:
        raise ValueError(f"unknown steady method {method!r} "
                         "(direct/cycle)")
    return transport.result_from_ends(cfg, tables, sr.ends), sr
