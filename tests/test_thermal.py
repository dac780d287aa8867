"""Boussinesq/thermal subsystem: conduction decay vs analytic, buoyancy
coupling sign, thermal adjoint exactness, thermosyphon mesh/model."""

import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_tpu.config import NSConfig
from nekstab_tpu.driver import FlowSystem
from nekstab_tpu.mesh import annulus_mesh, box_mesh
from nekstab_tpu.ops import dsavg, glsc3
from nekstab_tpu.solver import initial_state


@pytest.fixture(scope="module")
def thermal_box():
    mesh = box_mesh(7, 3, 3, 0.0, 1.0, 0.0, 1.0,
                    bc_fn=lambda x, y, nrm: "W")
    cfg = NSConfig(re=1.0, dt=1e-3, vtol=1e-12, ptol=1e-11,
                   boussinesq=True, pr=2.0, gvec=(0.0, 0.0))
    return FlowSystem(mesh, cfg, None)


def test_conduction_decay(thermal_box):
    # u=0, gvec=0: pure conduction. T = sin(pi x) sin(pi y) decays at
    # rate kappa*2*pi^2 with kappa = nu/pr = 0.5
    sys_ = thermal_box
    ctx = sys_.ctx
    x, y = np.asarray(ctx.xcoord), np.asarray(ctx.ycoord)
    q0 = np.zeros(ctx.mask_vel.shape)
    q0[2] = np.sin(np.pi * x) * np.sin(np.pi * y)
    nsteps = 100
    st, _ = sys_.nonlinear_advance(nsteps)(sys_.case,
                                           initial_state(ctx, jnp.asarray(q0)))
    t_end = nsteps * sys_.cfg.dt
    kappa = sys_.cfg.nu / sys_.cfg.pr
    exact = q0[2] * np.exp(-kappa * 2 * np.pi ** 2 * t_end)
    err = np.abs(np.asarray(st.u[2]) - exact).max()
    assert err < 5e-5, err  # temporal (BDF ramp) limited
    # velocity stays identically zero without buoyancy
    assert float(jnp.abs(st.u[:2]).max()) < 1e-13


def test_buoyancy_drives_flow():
    mesh = box_mesh(5, 2, 2, 0.0, 1.0, 0.0, 1.0,
                    bc_fn=lambda x, y, nrm: "W")
    cfg = NSConfig(re=1.0, dt=1e-3, vtol=1e-10, ptol=1e-9,
                   boussinesq=True, pr=1.0, gvec=(0.0, 10.0))
    sys_ = FlowSystem(mesh, cfg, None)
    ctx = sys_.ctx
    x, y = np.asarray(ctx.xcoord), np.asarray(ctx.ycoord)
    q0 = np.zeros(ctx.mask_vel.shape)
    # hot blob in the centre -> rising plume (v > 0 above the blob)
    q0[2] = np.exp(-50 * ((x - 0.5) ** 2 + (y - 0.4) ** 2))
    st, _ = sys_.nonlinear_advance(50)(sys_.case,
                                       initial_state(ctx, jnp.asarray(q0)))
    v = np.asarray(st.u[1])
    centre = (np.abs(x - 0.5) < 0.15) & (np.abs(y - 0.45) < 0.2)
    assert v[centre].mean() > 1e-6


def test_thermal_adjoint_identity(thermal_box):
    sys_ = thermal_box
    ctx = sys_.ctx
    rng = np.random.default_rng(0)

    def clean(seed):
        w = jnp.asarray(np.random.default_rng(seed)
                        .normal(size=ctx.mask_vel.shape))
        return ctx.mask_vel * dsavg(ctx, w)

    base = clean(1) * 0.5
    v, w = clean(2), clean(3)
    nsteps = 4
    lv, _ = sys_.linear_propagator(nsteps)(base, sys_.sponge_fun, v)
    lw, _ = sys_.adjoint_propagator(nsteps)(base, sys_.sponge_fun, w)
    a = float(glsc3(ctx, lv, ctx.bm, w))
    b = float(glsc3(ctx, v, ctx.bm, lw))
    assert a == pytest.approx(b, rel=1e-10)


def test_thermosyphon_model_builds():
    from nekstab_tpu.models import conduction_ic, thermosyphon_system
    sys_ = thermosyphon_system(n=4, n_theta=8, n_r=2, dt=1e-3)
    assert sys_.mesh.nelem == 16
    # periodic annulus: no boundary faces except the two walls
    tags = {f.tag for f in sys_.mesh.bc_faces}
    assert tags == {"W"}
    q0 = conduction_ic(sys_)
    assert q0.shape[0] == 3
    st, en = sys_.nonlinear_advance(5)(sys_.case, initial_state(sys_.ctx, q0))
    assert bool(jnp.all(jnp.isfinite(st.u)))
