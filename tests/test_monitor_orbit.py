"""Run monitor (CFL watchdog) and Fourier orbit compression tests.

Reference capabilities: nekStab_comment CFL>10 kill switch
(core/usr_extra.f:292-354) and the fourier.f orbit compressor
(core/fourier.f:23-88, energy-ranked mode selection).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_tpu.analysis import RunMonitor, WatchdogError, cfl
from nekstab_tpu.config import NSConfig
from nekstab_tpu.mesh import box_mesh
from nekstab_tpu.ops import dsavg, make_context
from nekstab_tpu.solver import (FourierOrbit, compress_orbit,
                                compression_ratio, initial_state,
                                make_linear_propagator, orbit_at,
                                reconstruct_orbit)


@pytest.fixture(scope="module")
def setup():
    m = box_mesh(5, 2, 2, 0.0, 1.0, 0.0, 1.0, bc_fn=lambda x, y, n: "W")
    return m, make_context(m)


def test_cfl_value(setup):
    """Uniform unit velocity on a unit box of 2x2 elements: CFL should be
    dt * 1 / (h_min) with h_min = 0.5 * min GLL spacing."""
    m, ctx = setup
    u = jnp.stack([jnp.ones_like(ctx.bm), jnp.zeros_like(ctx.bm)])
    from nekstab_tpu.quadrature import make_basis
    dxi = float(np.min(np.diff(make_basis(ctx.n).x)))
    dt = 0.01
    c = float(cfl(ctx, u, dt))
    # |u . grad r| = 1/0.25 per element half-width mapping (element size 0.5
    # maps [-1,1] -> rx = 2/0.5 = 4)
    assert c == pytest.approx(dt * 4.0 / dxi, rel=1e-12)


def test_watchdog_raises(setup):
    m, ctx = setup
    mon = RunMonitor(ctx, dt=0.01, total_steps=100, logger=None)
    huge = 1e4 * jnp.ones((2,) + ctx.bm.shape)
    with pytest.raises(WatchdogError):
        mon.check(huge)
    mon2 = RunMonitor(ctx, dt=0.01, total_steps=100, logger=None)
    with pytest.raises(WatchdogError):
        mon2.check(jnp.zeros((2,) + ctx.bm.shape), energy=np.nan)


def test_watchdog_passes_and_logs(setup):
    m, ctx = setup
    lines = []
    mon = RunMonitor(ctx, dt=0.001, total_steps=20, logger=lines.append,
                     tag="T")
    u = 0.1 * jnp.ones((2,) + ctx.bm.shape)
    c = mon.check(u, energy=1.0, nsteps_chunk=10)
    assert c < 10.0 and len(lines) == 1 and "CFL" in lines[0]


def test_fourier_orbit_roundtrip():
    """A 3-harmonic synthetic orbit compresses losslessly (>99% energy in 3
    modes) and reconstructs to machine precision."""
    nsteps = 64
    rng = np.random.default_rng(0)
    shape = (2, 3, 5, 5)
    amp = [rng.normal(size=shape) for _ in range(4)]
    j = np.arange(nsteps)
    orbit = (amp[0][None]
             + np.einsum("t,...->t...", np.cos(2 * np.pi * j / nsteps), amp[1])
             + np.einsum("t,...->t...", np.sin(2 * np.pi * 3 * j / nsteps), amp[2])
             + np.einsum("t,...->t...", np.cos(2 * np.pi * 5 * j / nsteps), amp[3]))
    fo = compress_orbit(jnp.asarray(orbit), energy=0.999)
    assert set(np.asarray(fo.k_idx)) == {1, 3, 5}
    rec = np.asarray(reconstruct_orbit(fo, nsteps))
    assert np.max(np.abs(rec - orbit)) < 1e-12
    assert compression_ratio(fo, nsteps) > 9.0


def test_floquet_fourier_vs_replay(setup):
    """The Floquet propagator about a compressed orbit must match the full
    orbit replay when the compression is lossless."""
    m, ctx = setup
    cfg = NSConfig(re=50.0, dt=5e-3, vtol=1e-12, ptol=1e-12,
                   vmaxit=300, pmaxit=300)
    nsteps = 8
    rng = np.random.default_rng(1)
    mean = ctx.mask_vel * dsavg(ctx, jnp.asarray(
        rng.normal(size=(2,) + ctx.bm.shape))) * 0.3
    osc = ctx.mask_vel * dsavg(ctx, jnp.asarray(
        rng.normal(size=(2,) + ctx.bm.shape))) * 0.1
    j = jnp.arange(nsteps)
    wave = jnp.cos(2 * jnp.pi * j / nsteps)
    orbit = mean[None] + wave[:, None, None, None, None] * osc[None]
    fo = compress_orbit(orbit, energy=0.999999)
    rec = np.asarray(reconstruct_orbit(fo, nsteps))
    assert np.max(np.abs(rec - np.asarray(orbit))) < 1e-12

    prop = jax.jit(make_linear_propagator(ctx, cfg, m.has_outflow, nsteps))
    v0 = ctx.mask_vel * dsavg(ctx, jnp.asarray(
        rng.normal(size=(2,) + ctx.bm.shape)))
    sponge = jnp.zeros_like(ctx.bm)
    u_replay, _ = prop(orbit, sponge, v0)
    u_fourier, _ = prop(fo, sponge, v0)
    assert np.max(np.abs(np.asarray(u_replay - u_fourier))) < 1e-9
