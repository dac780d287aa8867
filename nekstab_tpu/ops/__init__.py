from .context import SemContext, make_context
from .tensorprod import (deriv_r, deriv_s, deriv_r_t, deriv_s_t, grad, mass,
                         weak_laplacian, weak_div, strong_div)
from .gather_scatter import (assemble, scatter, dssum, dsavg, glsum, glsc3,
                             glmax, glmin)

__all__ = [
    "SemContext", "make_context",
    "deriv_r", "deriv_s", "deriv_r_t", "deriv_s_t", "grad", "mass",
    "weak_laplacian", "weak_div", "strong_div",
    "assemble", "scatter", "dssum", "dsavg", "glsum", "glsc3",
    "glmax", "glmin",
]
