"""nekstab_tpu: TPU-native global linear stability & bifurcation analysis.

A from-scratch JAX/XLA/Pallas framework with the capabilities of nekStab
(matrix-free time-stepper stability analysis on a spectral-element
incompressible Navier-Stokes solver). See SURVEY.md for the capability map.
"""

__version__ = "0.1.0"

from . import mesh, quadrature  # noqa: F401
