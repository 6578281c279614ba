#!/usr/bin/env python
"""Convergence-equivalence study: do f32-grade kernel gradients reach
the SAME inverse-problem optimum as the f64 exact adjoint?

VERDICT r4 #5: reference-precision parameter estimation through the f64
XLA adjoint pays a ~34x rate tax vs the kernel-rate f32 analytic
reverse (ops/pallas_adjoint.py). This study measures whether that tax
buys anything: the inverse-opacity problem (examples/inverse_opacity.py
— recover a hidden per-group opacity spectrum from an f64-synthesized
flux profile) is solved twice with identical optimizer settings,

  * solver='general'  — the all-f64 exact discrete adjoint, and
  * solver='pallas'   — the f32 fused kernels with the analytic
                        K-fused reverse kernel (~1e-4-grade gradients),

and the report compares (a) each route's recovered spectrum against
the hidden truth and (b) the two ARGMINS against each other. The
optimum is a property of the forward model's fit, not of gradient
precision: as long as the f32 gradient field points downhill into the
same basin, both routes land on the same spectrum — which is what the
committed artifact (benchmarks/results/grad_convergence.json) shows:
cross-solver argmin distance orders of magnitude below the common
recovery error vs truth.

Usage: python benchmarks/grad_convergence.py [out.json]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import radiative_transfer_tpu as rt
from radiative_transfer_tpu import adjoint
from radiative_transfer_tpu.models import transport


def run_study(G=8, N=64, steps=6, iters=400, lr=0.05, seed=7):
    cfg = rt.Config(
        M=4, G=G, N=N, X=1.0, efirst=0.1, elast=10.0,
        bc_left_indicator=2, bc_right_indicator=1,
        psi_source=tuple(
            tuple(0.02 + 0.005 * g for g in range(G)) for _ in range(4)
        ),
        rho=1.0, kappa_grey=1.0, T=1.0, V=0.001,
        use_correction=True, ts_method=3, dt=5e-5,
        max_timesteps=steps, include_validation=False,
    )
    tables, _, _ = transport.build_tables(cfg)
    state0 = transport.initial_state(cfg, tables)
    wt = np.asarray(tables.wt)

    rng = np.random.default_rng(seed)
    k_true = np.asarray(tables.kappa) * rng.uniform(0.6, 1.6, size=G)
    solve_f64 = adjoint.make_diff_solve(cfg, tables, num_steps=steps)
    phi_target = transport.compute_phi(
        transport.psi_from_ends(
            solve_f64({"kappa": jnp.asarray(k_true)}, state0).ends), wt)

    def loss_of_state(final, params):
        phi = transport.compute_phi(
            transport.psi_from_ends(final.ends), wt)
        return jnp.mean((phi / phi_target - 1.0) ** 2)

    out = {"G": G, "N": N, "steps": steps, "iters": iters, "lr": lr,
           "k_true": k_true.tolist()}
    fits = {}
    for solver in ("general", "pallas"):
        params0 = {"kappa": jnp.asarray(np.asarray(tables.kappa))}
        params, hist = adjoint.fit_params(
            cfg, tables, state0, loss_of_state, params0,
            num_steps=steps, learning_rate=lr, iterations=iters,
            solver=solver,
        )
        k_fit = np.asarray(params["kappa"], np.float64)
        fits[solver] = k_fit
        out[solver] = {
            "loss_first": float(hist[0]), "loss_last": float(hist[-1]),
            "k_fit": k_fit.tolist(),
            "err_vs_true": float(np.max(np.abs(k_fit / k_true - 1.0))),
        }
    out["argmin_distance"] = float(np.max(np.abs(
        fits["pallas"] / fits["general"] - 1.0)))
    return out


def main():
    out = run_study()
    print(json.dumps(out, indent=1))
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results",
        "grad_convergence.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\nerr vs true: general {out['general']['err_vs_true']:.3e}, "
          f"pallas {out['pallas']['err_vs_true']:.3e}; "
          f"cross-solver argmin distance {out['argmin_distance']:.3e}")


if __name__ == "__main__":
    main()
