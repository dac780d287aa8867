import numpy as np

from nekstab_tpu.quadrature import (gll_points_weights, gll_diff_matrix,
                                    lagrange_interp_matrix, make_basis,
                                    make_dealias)


def test_gll_weights_sum():
    for n in range(2, 12):
        x, w = gll_points_weights(n)
        assert np.isclose(w.sum(), 2.0, atol=1e-13)
        assert np.isclose(x[0], -1) and np.isclose(x[-1], 1)
        assert np.all(np.diff(x) > 0)


def test_gll_quadrature_exactness():
    # GLL with n points integrates polynomials up to degree 2n-3 exactly
    n = 6
    x, w = gll_points_weights(n)
    for deg in range(2 * n - 2):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        assert np.isclose(np.dot(w, x ** deg), exact, atol=1e-13), deg


def test_diff_matrix_exact_on_polynomials():
    n = 7
    x, _ = gll_points_weights(n)
    D = gll_diff_matrix(x)
    for deg in range(n):
        u = x ** deg
        du = deg * x ** (deg - 1) if deg > 0 else np.zeros_like(x)
        assert np.allclose(D @ u, du, atol=1e-11), deg


def test_diff_matrix_rowsum_zero():
    b = make_basis(8)
    assert np.allclose(b.D @ np.ones(8), 0.0, atol=1e-11)


def test_interp_exact_on_polynomials():
    n = 6
    b = make_basis(n)
    xt = np.linspace(-1, 1, 17)
    J = lagrange_interp_matrix(b.x, xt)
    for deg in range(n):
        assert np.allclose(J @ b.x ** deg, xt ** deg, atol=1e-12)


def test_dealias_rule():
    d = make_dealias(6)
    assert d.m == 9
    # Gauss rule integrates degree 2m-1; interpolation of x^5 then quadrature
    b = make_basis(6)
    u = b.x ** 5
    v = b.x ** 4
    # integral of x^9 over [-1,1] = 0; of x^8 = 2/9 via product x^4*x^4
    assert np.isclose(d.wg @ ((d.J @ u) * (d.J @ v)), 0.0, atol=1e-13)
    assert np.isclose(d.wg @ ((d.J @ v) * (d.J @ v)), 2.0 / 9.0, atol=1e-13)
