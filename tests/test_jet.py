"""Axisymmetric pulsed-jet model tests (reference examples/tpjet).

Coarse-resolution machinery tests: the physical case (Re=2005, thin shear
layer) needs TPU-scale resolution; here the same pipeline runs on a tiny mesh
at low Re to validate the model wiring (axisym mesh + pulsed inlet + TDF
forced-orbit loop + Floquet propagator on the stored orbit).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_tpu.models.jet import (jet_ic, jet_system, pulse_wave,
                                    rjet_profile)


def small_jet(re=100.0, dt=0.02):
    return jet_system(n=5, re=re, dt=dt, L=10.0, R=4.0, nx=5, nr=4,
                      sponge_xr=3.0, vtol=1e-10, ptol=1e-9, dealias=True)


def test_profile():
    r = np.array([0.0, 0.5, 5.0])
    u = rjet_profile(r)
    assert u[0] == pytest.approx(1.0)
    assert u[1] == pytest.approx(0.5)      # shear-layer midpoint at r = 0.5
    assert u[2] < 1e-8


def test_jet_dns_runs():
    sys = small_jet()
    assert sys.mesh.axisym and sys.mesh.has_outflow
    adv = sys.nonlinear_advance(25)
    from nekstab_tpu.solver import initial_state
    st, energy = adv(sys.case, initial_state(sys.ctx, jet_ic(sys)))
    e = np.asarray(energy)
    assert np.all(np.isfinite(e))
    # inflow keeps feeding momentum: energy stays within sane bounds
    assert 0.01 < e[-1] < 100.0


def test_jet_pulsed_tdf_forced_orbit():
    """TDF with the pulsed inlet converges to the forced periodic orbit; the
    orbit responds at the forcing frequency (reference tpjet mode 1.4)."""
    from nekstab_tpu.algorithms.fixed_point import tdf
    from nekstab_tpu.solver import initial_state

    sys = small_jet(re=50.0, dt=0.025)
    st_freq = 0.4
    period = 1.0 / st_freq
    st0 = initial_state(sys.ctx, jet_ic(sys))
    # settle transient first
    st0, _ = sys.nonlinear_advance(40)(sys.case, st0)
    res = tdf(sys.ctx, sys.cfg, sys.case, sys.mesh.has_outflow, st0,
              period=period, tol=2.5e-3, max_periods=45,
              bc_wave=pulse_wave(st_freq), logger=lambda *a: None)
    assert res.converged, res.residuals[-20:]
    orbit = res.aux["orbit"]
    # the forced orbit is genuinely time-periodic and non-steady: the inlet
    # pulsing must show up as an O(amplitude) oscillation of the orbit
    amp = float(jnp.max(jnp.abs(orbit[0] - orbit[len(orbit) // 2])))
    assert amp > 1e-4
