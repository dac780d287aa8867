from .cg import solve_spd
from .stepper import (NSState, CaseFields, initial_state, make_step,
                      make_advance, zero_case_fields)
from .linearized import (make_linear_step, make_linear_propagator,
                         make_adjoint_propagator, make_forced_response,
                         make_adjoint_forced_response)
from .orbit import (FourierOrbit, compress_orbit, reconstruct_orbit,
                    orbit_at, compression_ratio)

__all__ = [
    "solve_spd", "NSState", "CaseFields", "initial_state", "make_step",
    "make_advance", "zero_case_fields", "make_linear_step",
    "make_linear_propagator", "make_adjoint_propagator",
    "make_forced_response", "make_adjoint_forced_response",
    "FourierOrbit", "compress_orbit", "reconstruct_orbit", "orbit_at",
    "compression_ratio",
]
