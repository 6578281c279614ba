"""CSV writers matching the reference output conventions.

The reference dumps Eigen objects with `operator<<` (reference:
src/main.cc:37-57): matrices as whitespace-separated rows, vectors one
value per line, and the rank-3 psi tensor (column-major) as M rows whose
columns interleave groups fastest — column index n*G + g (consumed as
`psi_arr_m[g::num_G]` by scripts/plot_results.py:98-101). These writers
reproduce those shapes so the reference's own plot scripts work on our
output unmodified (at full float64 precision rather than Eigen's default
6 significant digits).
"""

from __future__ import annotations

import os

import numpy as np

FMT = "%.17g"


def _native():
    """The C++ writer backend when built (native/rtio.cc, byte-identical
    output), else None. The big psi dumps are ~20x faster native."""
    from .. import native

    return native if native.available() else None


def write_vector(path: str, v) -> None:
    """One value per line (Eigen VectorXd print)."""
    nat = _native()
    if nat is not None:
        nat.write_vector(path, v)
        return
    v = np.asarray(v).reshape(-1)
    with open(path, "w") as fh:
        for val in v:
            fh.write(FMT % val + "\n")


def write_matrix(path: str, m) -> None:
    """Whitespace-separated rows (Eigen MatrixXd print)."""
    nat = _native()
    if nat is not None:
        nat.write_matrix(path, m)
        return
    m = np.atleast_2d(np.asarray(m))
    with open(path, "w") as fh:
        for row in m:
            fh.write(" ".join(FMT % val for val in row) + "\n")


def write_psi(path: str, psi) -> None:
    """(M, G, N) -> M rows with columns ordered n*G + g (column-major
    Eigen Tensor print, see module doc)."""
    psi = np.asarray(psi)
    nat = _native()
    if nat is not None:
        nat.write_psi(path, psi)
        return
    M, G, N = psi.shape
    rows = psi.transpose(0, 2, 1).reshape(M, N * G)
    write_matrix(path, rows)


def write_solution_csvs(outdir: str, result, x, e_ave, prefix: str = "") -> dict:
    """The 8 files of the reference driver (src/main.cc:117-133)."""
    os.makedirs(outdir, exist_ok=True)

    def p(name):
        return os.path.join(outdir, prefix + name)

    write_matrix(p("phi.csv"), result.phi)
    write_matrix(p("phi_plus.csv"), result.phi_plus)
    write_psi(p("psi.csv"), result.psi)
    write_vector(p("x.csv"), x)
    write_matrix(p("F.csv"), result.F)
    write_vector(p("e_ave.csv"), e_ave)
    write_vector(p("left_ends.csv"), result.left_ends)
    write_vector(p("right_ends.csv"), result.right_ends)
    return {n: p(n + ".csv") for n in
            ("phi", "phi_plus", "psi", "x", "F", "e_ave", "left_ends", "right_ends")}
