"""End-to-end eigensolver pipeline on a small lid-driven cavity.

The decisive internal consistency check (cf. BASELINE.md direct/adjoint gap
~2e-5 for the reference): with the exact discrete adjoint, the direct and
adjoint Ritz spectra of exp(tau L) must agree to solver tolerance."""

import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_tpu.algorithms import krylov_schur, log_transform
from nekstab_tpu.config import ArnoldiConfig, NSConfig
from nekstab_tpu.driver import FlowSystem
from nekstab_tpu.mesh import box_mesh, dirichlet_values
from nekstab_tpu.solver.stepper import CaseFields
from nekstab_tpu.utils import add_noise

NSTEPS = 60


@pytest.fixture(scope="module")
def sys_():
    mesh = box_mesh(5, 3, 3, 0.0, 1.0, 0.0, 1.0,
                    bc_fn=lambda x, y, nrm: "V")
    cfg = NSConfig(re=300.0, dt=5e-3, vtol=1e-11, ptol=1e-10)
    s = FlowSystem(mesh, cfg, None)

    def lid(x, y):
        on = np.isclose(y, 1.0)
        return np.where(on, 16.0 * x ** 2 * (1 - x) ** 2, 0.0), \
            np.zeros_like(x)

    u_bc = jnp.asarray(dirichlet_values(mesh, {"V": lid}), s.ctx.dtype)
    z2 = jnp.zeros_like(u_bc)
    s.case = CaseFields(u_bc=u_bc, f=z2, sponge=jnp.zeros_like(s.ctx.bm),
                        sponge_ref=z2)
    return s


@pytest.fixture(scope="module")
def base(sys_):
    res = sys_.newton_base_flow(sys_.case.u_bc + 0.0, nsteps=NSTEPS,
                                tol=1e-10, k_dim=25, maxiter=15,
                                logger=lambda *a, **k: None)
    assert res.converged
    return res.q


def _eigs(sys_, base, space_builder, k=20):
    space = space_builder(base, NSTEPS)
    v0 = add_noise(sys_.ctx, seed=11)
    cfg = ArnoldiConfig(k_dim=k, eigen_tol=1e-7, schur_tgt=4,
                        max_restarts=10)
    res = krylov_schur(space, v0, cfg, logger=lambda *a, **kk: None)
    lam = res.evals[res.residuals < 1e-7]
    tau = NSTEPS * sys_.cfg.dt
    return np.sort_complex(log_transform(lam, tau))


def test_direct_adjoint_spectra_agree(sys_, base):
    lam_d = _eigs(sys_, base, sys_.direct_space)
    lam_a = _eigs(sys_, base, sys_.adjoint_space)
    # compare the leading (rightmost) converged eigenvalues
    lead_d = lam_d[np.argsort(-lam_d.real)][:3]
    lead_a = lam_a[np.argsort(-lam_a.real)][:3]
    assert len(lead_d) >= 1 and len(lead_a) >= 1
    for d, a in zip(lead_d, lead_a):
        assert abs(d - a) < 1e-6, (lead_d, lead_a)
    # strongly damped cavity at this size: spectrum in the left half plane
    assert np.all(lam_d.real < 0)


def test_transient_growth_gain_real_positive(sys_, base):
    space = sys_.transient_growth_space(base, NSTEPS)
    v0 = add_noise(sys_.ctx, seed=13)
    cfg = ArnoldiConfig(k_dim=12, eigen_tol=1e-6, schur_tgt=2,
                        max_restarts=8)
    res = krylov_schur(space, v0, cfg, logger=lambda *a, **kk: None)
    conv = res.evals[res.residuals < 1e-6]
    assert len(conv) >= 1
    # L*L is self-adjoint PSD: converged Ritz values real and positive
    assert np.all(np.abs(conv.imag) < 1e-8)
    assert np.all(conv.real > 0)
