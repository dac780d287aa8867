"""Multi-device (8 virtual CPU devices) SPMD correctness: element-sharded
propagation must match single-device bitwise-closely, and the discrete
adjoint identity must survive the psum/all_gather communication paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_tpu.models.cavity import cavity_system
from nekstab_tpu.mesh import box_mesh, dirichlet_values
from nekstab_tpu.config import NSConfig
from nekstab_tpu.parallel import ShardedFlowSystem
from nekstab_tpu.driver import FlowSystem
from nekstab_tpu.solver import initial_state
from nekstab_tpu.solver.stepper import CaseFields
from nekstab_tpu.utils import add_noise

NSTEPS = 3


def _mk(shard: bool):
    mesh = box_mesh(5, 4, 4, 0.0, 1.0, 0.0, 1.0,
                    bc_fn=lambda x, y, nrm: "V")
    cfg = NSConfig(re=500.0, dt=2e-3, vtol=1e-12, ptol=1e-11)
    if shard:
        sys_ = ShardedFlowSystem(mesh, cfg, None, ndev=8)
    else:
        sys_ = FlowSystem(mesh, cfg, None)
    ctx = sys_.ctx

    def lid(x, y):
        on = np.isclose(y, 1.0)
        return np.where(on, 16.0 * x ** 2 * (1 - x) ** 2, 0.0), \
            np.zeros_like(x)

    u_bc = jnp.asarray(dirichlet_values(mesh, {"V": lid}), ctx.dtype)
    z2 = jnp.zeros_like(u_bc)
    sys_.case = CaseFields(u_bc=u_bc, f=z2, sponge=jnp.zeros_like(ctx.bm),
                           sponge_ref=z2)
    return sys_


@pytest.fixture(scope="module")
def systems():
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    return _mk(False), _mk(True)


def test_sharded_nonlinear_matches_single(systems):
    single, sharded = systems
    st0 = initial_state(single.ctx, single.case.u_bc + 0.0)
    s1, e1 = single.nonlinear_advance(NSTEPS)(single.case, st0)
    s2, e2 = sharded.nonlinear_advance(NSTEPS)(sharded.case, st0)
    assert np.allclose(np.asarray(s1.u), np.asarray(s2.u), atol=1e-12)
    assert np.allclose(np.asarray(e1), np.asarray(e2), rtol=1e-12)


def test_sharded_linear_matches_single(systems):
    single, sharded = systems
    base = add_noise(single.ctx, seed=3, amp=0.5)
    sponge = jnp.zeros_like(single.ctx.bm)
    v = add_noise(single.ctx, seed=4)
    u1, p1 = single.linear_propagator(NSTEPS)(base, sponge, v)
    u2, p2 = sharded.linear_propagator(NSTEPS)(base, sponge, v)
    assert np.allclose(np.asarray(u1), np.asarray(u2), atol=1e-12)


def test_sharded_adjoint_identity(systems):
    _, sharded = systems
    ctx = sharded.ctx
    base = add_noise(ctx, seed=5, amp=0.5)
    sponge = jnp.zeros_like(ctx.bm)
    v = add_noise(ctx, seed=6)
    w = add_noise(ctx, seed=7)
    lv, _ = sharded.linear_propagator(NSTEPS)(base, sponge, v)
    lw, _ = sharded.adjoint_propagator(NSTEPS)(base, sponge, w)
    a = float(jnp.sum(lv * ctx.bm * w))
    b = float(jnp.sum(v * ctx.bm * lw))
    assert a == pytest.approx(b, rel=1e-10)


def test_sharded_floquet_matches_single(systems):
    single, sharded = systems
    rng = np.random.default_rng(8)
    orbit = jnp.asarray(rng.normal(size=(NSTEPS, 2) + single.ctx.bm.shape)) * 0.3
    sponge = jnp.zeros_like(single.ctx.bm)
    v = add_noise(single.ctx, seed=9)
    u1, _ = single.linear_propagator(NSTEPS)(orbit, sponge, v)
    u2, _ = sharded.linear_propagator(NSTEPS)(orbit, sponge, v)
    assert np.allclose(np.asarray(u1), np.asarray(u2), atol=1e-12)
