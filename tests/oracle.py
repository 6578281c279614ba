"""Straight-loop NumPy oracle for the S_N slab transport sub-steps.

An intentionally naive, sequential, per-cell implementation of the same
discretisation the framework implements with batched associative scans
(spec: reference src/solver.cpp:319-587 integrators, 590-823 time loop).
Used by tests to validate the vectorised/scan-parallel JAX code path on
every integrator, boundary condition, and direction sign.

Written for clarity, not speed: explicit 2x2 solves, explicit direction
and group loops, explicit upwind carries.
"""

from __future__ import annotations

import numpy as np

C = 299.79245800  # speed of light, cm/sh (keV-shake-jerk-cm system)


def solve_2x2(T0, q, rhs0, rhs1):
    """Solve [[T0, q], [-q, T0]] @ x = rhs."""
    det = T0 * T0 + q * q
    x0 = (T0 * rhs0 - q * rhs1) / det
    x1 = (q * rhs0 + T0 * rhs1) / det
    return x0, x1


class Oracle:
    """Holds the mutable arrays exactly like the reference Solver does."""

    def __init__(self, M, G, N, dx, dt, mu, wt, rho, kappa, B,
                 psi_source, bc_left, bc_right, use_correction=False,
                 cor1=None, cor2=None, cor3=None, beta=0.0):
        self.M, self.G, self.N = M, G, N
        self.dx, self.dt = dx, dt
        self.mu, self.wt = np.asarray(mu), np.asarray(wt)
        self.rho, self.kappa = np.asarray(rho), np.asarray(kappa)
        self.B = np.asarray(B)
        self.psi_source = np.asarray(psi_source)
        self.bc_left, self.bc_right = bc_left, bc_right
        self.use_correction = use_correction
        self.cor1, self.cor2, self.cor3 = cor1, cor2, cor3
        self.beta = beta

        self.psi = np.zeros((M, G, N))
        self.ends = np.zeros((M, G, N, 2))
        self.prev_ends = np.zeros((M, G, N, 2))
        self.half_ends = np.zeros((M, G, N, 2))
        for g in range(G):
            self.psi[:, g, :] = B[g]
            self.ends[:, g, :, :] = B[g]
        self.total_correction = np.zeros((M, G, N))

    # -- physics source ----------------------------------------------------
    def compute_correction(self):
        """total_correction = (cor1*psi + cor2)*mu*beta - cor3*mu^2*beta^2."""
        if not self.use_correction:
            return
        for m in range(self.M):
            mb = self.mu[m] * self.beta
            for g in range(self.G):
                for j in range(self.N):
                    val = (self.cor1[g] * self.psi[m, g, j] + self.cor2[g]) * mb
                    val -= self.cor3[g] * mb * mb
                    self.total_correction[m, g, j] = val

    def _S(self, m, g, j, ts):
        val = 0.5 * C * ts * self.dx * self.rho[g] * self.kappa[g] * self.B[g]
        if self.use_correction:
            val += 0.5 * C * ts * self.dx * self.total_correction[m, g, j]
        return val

    # -- per-cell integrators ----------------------------------------------
    def backward_euler(self, cell, m, g, ts, mu, carry):
        const_A = 1.0 + C * ts * self.rho[g] * self.kappa[g]
        const_B = C * ts * mu
        S = self._S(m, g, cell, ts)
        e0, e1 = self.ends[m, g, cell]
        if mu < 0:
            T0 = (const_A * self.dx - const_B) / 2.0
            rhs0 = S + self.dx * e0 / 2.0
            rhs1 = S - const_B * carry["local"] + self.dx * e1 / 2.0
            r0, r1 = solve_2x2(T0, const_B / 2.0, rhs0, rhs1)
            carry["local"] = r0
        else:
            T0 = (const_A * self.dx + const_B) / 2.0
            rhs0 = S + const_B * carry["local"] + self.dx * e0 / 2.0
            rhs1 = S + self.dx * e1 / 2.0
            r0, r1 = solve_2x2(T0, const_B / 2.0, rhs0, rhs1)
            carry["local"] = r1
        self.psi[m, g, cell] = 0.5 * (r0 + r1)
        self.ends[m, g, cell] = (r0, r1)

    def crank_nicolson(self, cell, m, g, ts, mu, carry):
        tv = 0.5 * C * ts * self.rho[g] * self.kappa[g]
        cA = 0.5 * C * mu * ts
        cB, cC = 1.0 + tv, 1.0 - tv
        S = self._S(m, g, cell, ts)
        e0, e1 = self.ends[m, g, cell]
        if mu < 0:
            T0 = 0.5 * (cB * self.dx - cA)
            rhs0 = S + 0.5 * (cC * self.dx + cA) * e0 - 0.5 * cA * e1
            rhs1 = (S + 0.5 * cA * e0 + 0.5 * (cC * self.dx + cA) * e1
                    - cA * (carry["prev"] + carry["half"]))
            r0, r1 = solve_2x2(T0, 0.5 * cA, rhs0, rhs1)
            carry["prev"] = self.prev_ends[m, g, cell, 0]
            carry["half"] = r0
        else:
            T0 = 0.5 * (cA + cB * self.dx)
            rhs0 = (S + 0.5 * (cC * self.dx - cA) * e0 - 0.5 * cA * e1
                    + cA * (carry["prev"] + carry["half"]))
            rhs1 = S + 0.5 * cA * e0 + 0.5 * (cC * self.dx - cA) * e1
            r0, r1 = solve_2x2(T0, 0.5 * cA, rhs0, rhs1)
            carry["prev"] = self.prev_ends[m, g, cell, 1]
            carry["half"] = r1
        self.psi[m, g, cell] = 0.5 * (r0 + r1)
        self.ends[m, g, cell] = (r0, r1)

    def bdf(self, cell, m, g, ts, mu, carry):
        # NOTE: the transport coupling uses the FULL dt (spec:
        # solver.cpp:501) while the relaxation uses ts = dt/2.
        tv = C * self.rho[g] * self.kappa[g] * ts / 6.0
        cA = 1.0 + tv
        cB = C * mu * self.dt / 6.0
        cC = 1.0 - 4.0 * tv
        cD = tv
        S = self._S(m, g, cell, ts)
        h0, h1 = self.half_ends[m, g, cell]
        p0, p1 = self.prev_ends[m, g, cell]
        if mu < 0:
            T0 = 0.5 * (cA * self.dx - cB)
            rhs0 = (S + 0.5 * (cC * self.dx + 4 * cB) * h0 - 2 * cB * h1
                    + 0.5 * (cB - cD * self.dx) * p0 - 0.5 * cB * p1)
            rhs1 = (S + 2 * cB * h0 + 0.5 * (cC * self.dx + 4 * cB) * h1
                    + 0.5 * cB * p0 + 0.5 * (cB - cD * self.dx) * p1
                    - cB * (carry["local"] + 4 * carry["half"] + carry["prev"]))
            r0, r1 = solve_2x2(T0, 0.5 * cB, rhs0, rhs1)
            carry["local"] = r0
            carry["half"] = self.half_ends[m, g, cell, 0]
            carry["prev"] = self.prev_ends[m, g, cell, 0]
        else:
            T0 = 0.5 * (cA * self.dx + cB)
            rhs0 = (S + 0.5 * (cC * self.dx - 4 * cB) * h0 - 2 * cB * h1
                    - 0.5 * (cB + cD * self.dx) * p0 - 0.5 * cB * p1
                    + cB * (carry["local"] + 4 * carry["half"] + carry["prev"]))
            rhs1 = (S + 2 * cB * h0 + 0.5 * (cC * self.dx - 4 * cB) * h1
                    + 0.5 * cB * p0 - 0.5 * (cB + cD * self.dx) * p1)
            r0, r1 = solve_2x2(T0, 0.5 * cB, rhs0, rhs1)
            carry["local"] = r1
            carry["half"] = self.half_ends[m, g, cell, 1]
            carry["prev"] = self.prev_ends[m, g, cell, 1]
        self.psi[m, g, cell] = 0.5 * (r0 + r1)
        self.ends[m, g, cell] = (r0, r1)

    # -- sweeps --------------------------------------------------------------
    def _bdry(self, m, g, mu):
        if mu < 0:
            if self.bc_right == 1:
                return self.psi_source[m, g]
            return 0.0  # vacuum / (unimplemented) reflective
        else:
            if self.bc_left == 2:
                m_neg = (self.M // 2) - 1 - (m - self.M // 2)
                return self.ends[m_neg, g, 0, 0]
            # vacuum falls through to source in the reference
            return self.psi_source[m, g]

    def sweep(self, integrator, ts):
        """One sub-step over all (direction, group) with fresh carries."""
        for m in range(self.M):
            mu = self.mu[m]
            for g in range(self.G):
                bc = self._bdry(m, g, mu)
                carry = {"local": bc, "half": bc, "prev": bc}
                for j in range(self.N):
                    cell = self.N - 1 - j if mu < 0 else j
                    integrator(cell, m, g, ts, mu, carry)

    # -- time stepping -------------------------------------------------------
    def step_be(self):
        self.prev_ends = self.ends.copy()
        self.compute_correction()
        self.sweep(self.backward_euler, self.dt)

    def step_cn(self):
        self.prev_ends = self.ends.copy()
        self.compute_correction()
        self.sweep(self.crank_nicolson, self.dt)

    def step_bdf2(self):
        """One full BDF2 step = BE, CN, BE, BDF sub-steps of dt/2.

        half_ends snapshot quirk: the reference's `half_ends = ends` copy
        at phase 1 sits only in the mu<0 branch of the cell loop
        (solver.cpp:733; absent from the mu>0 dispatch at 784-787), so its
        LAST execution happens before any mu>0 direction runs CN. The
        snapshot therefore holds the CN output for the mu<0 half but the
        phase-0 BE-predictor output for the mu>0 half. Verified against
        the reference binary (shim build) on all three decks; replicated
        here and in every engine."""
        half = self.dt / 2.0
        Mh = self.M // 2
        self.prev_ends = self.ends.copy()
        self.compute_correction()
        self.sweep(self.backward_euler, half)
        ends_phase0 = self.ends.copy()
        self.compute_correction()
        self.sweep(self.crank_nicolson, half)
        self.half_ends = self.ends.copy()
        self.half_ends[Mh:] = ends_phase0[Mh:]
        self.compute_correction()
        self.sweep(self.backward_euler, half)
        self.compute_correction()
        self.sweep(self.bdf, half)

    def run(self, ts_method, n_steps):
        step = {1: self.step_be, 2: self.step_cn, 3: self.step_bdf2}[ts_method]
        for _ in range(n_steps):
            step()

    # -- diagnostics -----------------------------------------------------------
    def phi(self):
        return np.einsum("m,mgn->gn", self.wt, self.psi)

    def F(self):
        return np.einsum("m,mgn->gn", self.mu * self.wt, self.psi)
