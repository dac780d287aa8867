"""Host sparse-direct solve path (hostsolve/direct.py) vs the CG path.

The direct mode swaps only the inner SPD solves (pressure Poisson, velocity
Helmholtz) for factorized SuperLU callbacks — the discretization is the same
code, so states must agree to (tight) CG tolerance, and the exact-transpose
adjoint property must hold unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_tpu.models.cylinder import cylinder_system, freestream_ic
from nekstab_tpu.ops.gather_scatter import glsc3
from nekstab_tpu.solver import initial_state
from nekstab_tpu.utils import add_noise

KW = dict(n=5, dt=2e-3, nq=6, n_ring=4, nx_left=4, nx_right=8, ny_side=4,
          vtol=1e-12, ptol=1e-11, dealias=True)


@pytest.fixture(scope="module")
def systems():
    sys_cg = cylinder_system(**KW)
    sys_di = cylinder_system(**KW, host_direct=True)
    assert sys_di.ctx.hsolve is not None and sys_di.ctx.gs2_plan is None
    return sys_cg, sys_di


def test_nonlinear_step_parity(systems):
    sys_cg, sys_di = systems
    u0 = freestream_ic(sys_cg)
    st_cg, _ = sys_cg.nonlinear_advance(5)(sys_cg.case,
                                           initial_state(sys_cg.ctx, u0))
    st_di, _ = sys_di.nonlinear_advance(5)(sys_di.case,
                                           initial_state(sys_di.ctx, u0))
    err = float(jnp.max(jnp.abs(st_cg.u - st_di.u)))
    assert err < 1e-8, err


def test_linear_propagator_parity_and_adjoint(systems):
    sys_cg, sys_di = systems
    base = freestream_ic(sys_cg)
    v = add_noise(sys_cg.ctx, seed=3)
    w = add_noise(sys_cg.ctx, seed=4)
    Lv_cg = sys_cg.direct_space(base, 4).matvec(v)
    Lv_di = sys_di.direct_space(base, 4).matvec(v)
    assert float(jnp.max(jnp.abs(Lv_cg - Lv_di))) < 1e-8

    # exact discrete adjoint in direct mode: <Lv, w>_B = <v, L*w>_B
    ctx = sys_di.ctx
    Ltw = sys_di.adjoint_space(base, 4).matvec(w)
    a = float(glsc3(ctx, Lv_di, ctx.bm, w))
    b = float(glsc3(ctx, v, ctx.bm, Ltw))
    assert abs(a - b) < 1e-11 * max(1.0, abs(a))


def test_newton_jvp_through_direct_solves(systems):
    # custom_linear_solve's jvp rule must reuse the factorized solve
    _, sys_di = systems
    ctx = sys_di.ctx
    adv = sys_di.nonlinear_advance(3)
    case = sys_di.case

    def phi(q):
        st, _ = adv(case, initial_state(ctx, q))
        return st.u

    q = freestream_ic(sys_di)
    v = add_noise(ctx, seed=5)
    _, jv = jax.jvp(phi, (q,), (v,))
    eps = 1e-6
    fd = (phi(q + eps * v) - phi(q - eps * v)) / (2 * eps)
    num = float(jnp.max(jnp.abs(jv - fd)))
    den = float(jnp.max(jnp.abs(jv))) + 1e-30
    assert num / den < 1e-5, (num, den)
