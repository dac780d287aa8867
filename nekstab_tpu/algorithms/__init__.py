from .arnoldi import ArnoldiSpace, arnoldi_factorization
from .block_arnoldi import (block_arnoldi_factorization, block_krylov_schur,
                            block_ritz_residuals)
from .eigensolve import (eig_hessenberg, krylov_schur, log_transform,
                         power_iteration)
from .gmres import gmres
from .newton import newton_krylov
from .upo import UPOResult, newton_upo
from .fixed_point import (BoostConvState, StabilizerResult, boostconv, sfd,
                          sfd_params, tdf)

__all__ = [
    "ArnoldiSpace", "arnoldi_factorization", "block_arnoldi_factorization",
    "block_krylov_schur", "block_ritz_residuals",
    "eig_hessenberg", "krylov_schur",
    "log_transform", "power_iteration", "gmres", "newton_krylov", "newton_upo", "UPOResult", "sfd",
    "sfd_params", "boostconv", "tdf", "BoostConvState", "StabilizerResult",
]
