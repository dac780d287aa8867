"""Gauss-Lobatto-Legendre quadrature, derivative and interpolation matrices.

Host-side (numpy, float64) construction of the 1D spectral building blocks used
by the tensor-product SEM operators. The reference obtains these from Nek5000's
`speclib` (not mounted); here they are rebuilt from standard formulas.

All arrays returned are float64 numpy; the solver layer casts once to the
configured device dtype.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
from numpy.polynomial import legendre as npleg


def legendre_poly(p: int, x: np.ndarray) -> np.ndarray:
    """Evaluate Legendre polynomial L_p at points x."""
    c = np.zeros(p + 1)
    c[p] = 1.0
    return npleg.legval(x, c)


def gll_points_weights(n: int) -> tuple[np.ndarray, np.ndarray]:
    """n Gauss-Lobatto-Legendre points/weights on [-1, 1] (poly degree p=n-1).

    Points are the roots of (1-x^2) L'_p(x); weights w_i = 2/(p(p+1) L_p(x_i)^2).
    """
    if n < 2:
        raise ValueError("GLL rule needs at least 2 points")
    p = n - 1
    if p == 1:
        x = np.array([-1.0, 1.0])
    else:
        c = np.zeros(p + 1)
        c[p] = 1.0
        dc = npleg.legder(c)
        interior = npleg.legroots(dc)
        x = np.concatenate(([-1.0], np.sort(interior), [1.0]))
    w = 2.0 / (p * (p + 1) * legendre_poly(p, x) ** 2)
    return x, w


def gll_diff_matrix(x: np.ndarray) -> np.ndarray:
    """Differentiation matrix D with (D u)_i = u'(x_i) for u in P_p on GLL nodes.

    D[i, j] = l_j'(x_i) with l_j the Lagrange basis on the GLL nodes.
    """
    n = len(x)
    p = n - 1
    L = legendre_poly(p, x)
    D = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            if i != j:
                D[i, j] = L[i] / (L[j] * (x[i] - x[j]))
    D[0, 0] = -p * (p + 1) / 4.0
    D[-1, -1] = p * (p + 1) / 4.0
    return D


def lagrange_interp_matrix(x_from: np.ndarray, x_to: np.ndarray) -> np.ndarray:
    """Interpolation matrix J with (J u)_i = u(x_to[i]) for u in P on x_from nodes.

    Barycentric Lagrange interpolation (Berrut & Trefethen 2004).
    """
    n = len(x_from)
    # barycentric weights
    wb = np.ones(n)
    for j in range(n):
        for k in range(n):
            if k != j:
                wb[j] /= x_from[j] - x_from[k]
    J = np.zeros((len(x_to), n))
    for i, xt in enumerate(x_to):
        diff = xt - x_from
        hit = np.isclose(diff, 0.0, atol=1e-14)
        if hit.any():
            J[i, np.argmax(hit)] = 1.0
        else:
            terms = wb / diff
            J[i, :] = terms / terms.sum()
    return J


def gauss_points_weights(n: int) -> tuple[np.ndarray, np.ndarray]:
    """n Gauss-Legendre points/weights on [-1, 1] (for over-integration)."""
    return npleg.leggauss(n)


@dataclass(frozen=True)
class Basis1D:
    """1D GLL basis: nodes, weights, differentiation on the reference segment."""

    n: int                 # points per direction (= poly order + 1, Nek lx1)
    x: np.ndarray          # (n,) GLL nodes in [-1, 1]
    w: np.ndarray          # (n,) GLL quadrature weights
    D: np.ndarray          # (n, n) differentiation matrix

    @property
    def p(self) -> int:
        return self.n - 1


@lru_cache(maxsize=None)
def make_basis(n: int) -> Basis1D:
    x, w = gll_points_weights(n)
    return Basis1D(n=n, x=x, w=w, D=gll_diff_matrix(x))


@dataclass(frozen=True)
class Dealias1D:
    """Over-integration rule: interpolate GLL(n) -> Gauss(m), m ~ 3n/2."""

    m: int
    xg: np.ndarray         # (m,) Gauss nodes
    wg: np.ndarray         # (m,) Gauss weights
    J: np.ndarray          # (m, n) interpolation GLL -> Gauss


@lru_cache(maxsize=None)
def make_dealias(n: int, m: int | None = None) -> Dealias1D:
    if m is None:
        m = (3 * n + 1) // 2
    basis = make_basis(n)
    xg, wg = gauss_points_weights(m)
    return Dealias1D(m=m, xg=xg, wg=wg, J=lagrange_interp_matrix(basis.x, xg))
