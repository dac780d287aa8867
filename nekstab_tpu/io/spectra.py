"""Spectrum files and ASCII time-series logs, reference-format-compatible.

Reference: outpost_ks writes Spectre_H<op>.dat (Ritz multipliers),
Spectre_NS<op>.dat (log-mapped NS eigenvalues) and _conv.dat (converged
only), plus the run-metadata Spectre_<op>.info (core/eigensolvers.f:508-721),
and the residu*.dat convergence series (core/newton_krylov.f:46-49 etc.).
Keeping the column layout (Re, Im, residual) lets the reference's plot
scripts (examples/cylinder/stability/p_spec.py) consume our outputs.
"""

from __future__ import annotations

import os
import time

import numpy as np


def write_spectre(directory: str, op: str, mults: np.ndarray,
                  evals_ns: np.ndarray, residuals: np.ndarray,
                  tol: float) -> dict:
    """Write Spectre_H{op}.dat, Spectre_NS{op}.dat, Spectre_NS{op}_conv.dat.
    Returns the paths."""
    os.makedirs(directory, exist_ok=True)
    paths = {}
    p = os.path.join(directory, f"Spectre_H{op}.dat")
    np.savetxt(p, np.column_stack([mults.real, mults.imag, residuals]),
               fmt="%.10e")
    paths["H"] = p
    p = os.path.join(directory, f"Spectre_NS{op}.dat")
    np.savetxt(p, np.column_stack([evals_ns.real, evals_ns.imag, residuals]),
               fmt="%.10e")
    paths["NS"] = p
    conv = residuals < tol
    p = os.path.join(directory, f"Spectre_NS{op}_conv.dat")
    np.savetxt(p, np.column_stack([evals_ns.real[conv], evals_ns.imag[conv]]),
               fmt="%.10e")
    paths["conv"] = p
    return paths


def write_run_info(directory: str, op: str, **params):
    """Run metadata (the reference's Spectre_<op>.info,
    core/eigensolvers.f:674-717)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"Spectre_{op}.info")
    with open(path, "w") as f:
        f.write(f"# nekstab_tpu run info — {time.strftime('%Y-%m-%d %H:%M:%S')}\n")
        for k, v in params.items():
            f.write(f"{k} = {v}\n")
    return path


class AsciiSeries:
    """Append-mode ASCII series (residu.dat and friends)."""

    def __init__(self, path: str, header: str | None = None):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        if header and not os.path.exists(path):
            with open(path, "w") as f:
                f.write(f"# {header}\n")

    def append(self, *values):
        with open(self.path, "a") as f:
            f.write(" ".join(f"{float(v):.7e}" for v in values) + "\n")
