from .arnoldi import ArnoldiSpace, arnoldi_factorization
from .eigensolve import (eig_hessenberg, krylov_schur, log_transform,
                         power_iteration)
from .gmres import gmres
from .newton import newton_krylov
from .upo import UPOResult, newton_upo
from .fixed_point import (BoostConvState, StabilizerResult, boostconv, sfd,
                          sfd_params, tdf)

__all__ = [
    "ArnoldiSpace", "arnoldi_factorization", "eig_hessenberg", "krylov_schur",
    "log_transform", "power_iteration", "gmres", "newton_krylov", "newton_upo", "UPOResult", "sfd",
    "sfd_params", "boostconv", "tdf", "BoostConvState", "StabilizerResult",
]
