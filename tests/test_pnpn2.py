"""PN/PN-2 projection scheme (solver/proj.py) — the reference benchmark
cases' discretization family (lx2 = lx1-2, e.g.
reference examples/cylinder/stability/direct/SIZE)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_tpu.models.channel import channel_system, kovasznay_exact
from nekstab_tpu.models.cylinder import cylinder_system, freestream_ic
from nekstab_tpu.ops.gather_scatter import glsc3
from nekstab_tpu.solver.proj import div2, div2_t
from nekstab_tpu.utils import add_noise


def test_div_grad_transpose_exact():
    sys_ = channel_system(n=6, nelx=3, nely=3, scheme="pnpn2",
                          host_direct=True)
    ctx = sys_.ctx
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((2,) + ctx.bm.shape))
    p = jnp.asarray(rng.standard_normal((ctx.bm.shape[0],
                                         ctx.n - 2, ctx.n - 2)))
    a = float(jnp.vdot(div2(ctx, u), p))
    b = float(jnp.vdot(u, div2_t(ctx, p)))
    assert abs(a - b) < 1e-13 * abs(a)


def test_kovasznay_steady_and_exact_divergence():
    """The stepper's fixed point approximates the analytic Kovasznay flow,
    and the velocity is discretely divergence-free to machine precision
    after every step (the property the split PnPn scheme lacks)."""
    sys_ = channel_system(n=7, re=40.0, dt=2e-3, scheme="pnpn2",
                          host_direct=True)
    ctx = sys_.ctx
    ue = sys_.steady_state_from(lambda x, y: kovasznay_exact(40.0, x, y))
    st, _ = sys_.nonlinear_advance(100)(sys_.case, sys_.initial_state(ue))
    assert float(jnp.max(jnp.abs(st.u - ue))) < 2e-5
    assert float(jnp.max(jnp.abs(div2(ctx, st.u)))) < 1e-14


@pytest.fixture(scope="module")
def cyl2():
    return cylinder_system(n=5, dt=2e-3, nq=6, n_ring=4, nx_left=4,
                           nx_right=8, ny_side=4, dealias=True,
                           scheme="pnpn2", host_direct=True)


def test_pnpn2_adjoint_identity(cyl2):
    ctx = cyl2.ctx
    base = freestream_ic(cyl2)
    v = add_noise(ctx, seed=3)
    w = add_noise(ctx, seed=4)
    Lv = cyl2.direct_space(base, 4).matvec(v)
    Ltw = cyl2.adjoint_space(base, 4).matvec(w)
    a = float(glsc3(ctx, Lv, ctx.bm, w))
    b = float(glsc3(ctx, v, ctx.bm, Ltw))
    assert abs(a - b) < 1e-12 * max(abs(a), 1e-30)


def test_pnpn2_jvp(cyl2):
    ctx = cyl2.ctx
    adv = cyl2.nonlinear_advance(3)
    base = freestream_ic(cyl2)
    v = add_noise(ctx, seed=5)

    def phi(q):
        st, _ = adv(cyl2.case, cyl2.initial_state(q))
        return st.u

    _, jv = jax.jvp(phi, (base,), (v,))
    eps = 1e-6
    fd = (phi(base + eps * v) - phi(base - eps * v)) / (2 * eps)
    assert float(jnp.max(jnp.abs(jv - fd)) / jnp.max(jnp.abs(jv))) < 1e-6


def test_pnpn2_iterative_matches_direct():
    """The Jacobi-CG E-solve path (device path) reproduces the splu path."""
    kw = dict(n=5, nelx=3, nely=3, re=30.0, dt=2e-3, scheme="pnpn2")
    s_it = channel_system(**kw, vtol=1e-12, ptol=1e-12)
    s_di = channel_system(**kw, host_direct=True)
    ue = s_it.steady_state_from(lambda x, y: kovasznay_exact(30.0, x, y))
    st_it, _ = s_it.nonlinear_advance(5)(s_it.case, s_it.initial_state(ue))
    st_di, _ = s_di.nonlinear_advance(5)(s_di.case, s_di.initial_state(ue))
    assert float(jnp.max(jnp.abs(st_it.u - st_di.u))) < 1e-8
