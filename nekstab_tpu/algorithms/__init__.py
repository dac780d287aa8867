from .arnoldi import ArnoldiSpace, arnoldi_factorization
from .eigensolve import eig_hessenberg, krylov_schur, power_iteration
from .gmres import gmres
from .newton import newton_krylov
from .fixed_point import sfd, boostconv, BoostConvState

__all__ = [
    "ArnoldiSpace", "arnoldi_factorization", "eig_hessenberg", "krylov_schur",
    "power_iteration", "gmres", "newton_krylov", "sfd", "boostconv",
    "BoostConvState",
]
