#!/usr/bin/env python
"""Example 5: inverse opacity estimation via the exact discrete adjoint.

A capability the serial C++ reference cannot offer: because the solve
is a pure JAX program, `jax.grad` differentiates THROUGH the full
implicit time integration — every BE/CN/BDF2 sweep, the relativistic
correction tables, the boundary coupling — giving exact gradients of
any observable with respect to the group opacities.

Scenario: a "measured" steady flux profile was produced by an unknown
opacity spectrum. Starting from the deck's nominal kappas, recover the
true spectrum by gradient descent on the profile mismatch. The forward
model is the same discrete scheme the CLI runs (models/transport.py);
the adjoint is its exact transpose (radiative_transfer_tpu/adjoint.py).

    python examples/inverse_opacity.py [--groups 8] [--iters 400]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import radiative_transfer_tpu as rt
from radiative_transfer_tpu import adjoint
from radiative_transfer_tpu.models import transport


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--steps", type=int, default=6, help="timesteps per solve")
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--lr", type=float, default=0.05)
    args = ap.parse_args()

    G = args.groups
    cfg = rt.Config(
        M=4, G=G, N=64, X=1.0, efirst=0.1, elast=10.0,
        bc_left_indicator=2, bc_right_indicator=1,
        psi_source=tuple(
            tuple(0.02 + 0.005 * g for g in range(G)) for _ in range(4)
        ),
        rho=1.0, kappa_grey=1.0, T=1.0, V=0.001,
        use_correction=True, ts_method=3, dt=5e-5,
        max_timesteps=args.steps, include_validation=False,
    )
    tables, _, _ = transport.build_tables(cfg)
    state0 = transport.initial_state(cfg, tables)
    wt = np.asarray(tables.wt)

    # Synthesize the "measured" data from a hidden opacity spectrum.
    rng = np.random.default_rng(7)
    k_true = np.asarray(tables.kappa) * rng.uniform(0.6, 1.6, size=G)
    solve_fn = adjoint.make_diff_solve(cfg, tables, num_steps=args.steps)
    phi_target = transport.compute_phi(
        transport.psi_from_ends(
            solve_fn({"kappa": jnp.asarray(k_true)}, state0).ends), wt)

    def loss_of_state(final, params):
        phi = transport.compute_phi(
            transport.psi_from_ends(final.ends), wt)
        return jnp.mean((phi / phi_target - 1.0) ** 2)

    params0 = {"kappa": jnp.asarray(np.asarray(tables.kappa))}
    params, hist = adjoint.fit_params(
        cfg, tables, state0, loss_of_state, params0,
        num_steps=args.steps, learning_rate=args.lr, iterations=args.iters,
    )

    k_fit = np.asarray(params["kappa"])
    print(f"loss: {hist[0]:.3e} -> {hist[-1]:.3e} "
          f"({args.iters} Adam iterations)")
    print(f"{'g':>3} {'true':>10} {'recovered':>10} {'rel err':>9}")
    for g in range(G):
        rel = abs(k_fit[g] - k_true[g]) / k_true[g]
        print(f"{g:>3} {k_true[g]:>10.5f} {k_fit[g]:>10.5f} {rel:>9.2e}")
    worst = float(np.max(np.abs(k_fit / k_true - 1.0)))
    print(f"worst relative error: {worst:.2e}")
    if worst < 0.05:
        print("PASS: opacity spectrum recovered within 5%")
    else:
        print("NOTE: not converged — raise --iters")


if __name__ == "__main__":
    main()
