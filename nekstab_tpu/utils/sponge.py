"""Box sponge (absorbing layer) ramp function.

Reference: spng_init/spng_set/mth_stepf, core/utils.f:205-342 (KTH-toolbox
style box sponge). The ramp rises smoothly from 0 over an "acceleration"
fraction of each sponge width and then stays at 1 up to the domain boundary;
per-dimension ramps are combined with max. The nonlinear stepper uses
strength * ramp * (u_ref - u); the linearized equations always use unit
strength (-ramp * u', core/utils.f:164-177), and the eigensolver inner-product
weight is zeroed wherever ramp > 0 (bm1s, core/usr_extra.f:104-128).
"""

from __future__ import annotations

import numpy as np


def step_smooth(x: np.ndarray) -> np.ndarray:
    """Smooth step: 0 for x<=0, 1 for x>=1, C-infinity ramp between
    (mth_stepf, core/utils.f:330-342)."""
    x = np.clip(x, 1e-3, 0.999)
    arg = np.clip(1.0 / (x - 1.0) + 1.0 / x, -500.0, 500.0)
    val = 1.0 / (1.0 + np.exp(arg))
    return np.where(x <= 1e-3, 0.0, np.where(x >= 0.999, 1.0, val))


def sponge_fun_box(x: np.ndarray, y: np.ndarray, *, xl: float = 0.0,
                   xr: float = 0.0, yl: float = 0.0, yr: float = 0.0,
                   acc: float = 1.0 / 3.0) -> np.ndarray:
    """Sponge ramp in [0,1] on node coordinates x, y (any shape).

    xl/xr/yl/yr: sponge widths from the left/right domain edge in x/y.
    acc: fraction of each width used for the smooth rise (acc_spg, default
    1/3 as the reference, core/usr_extra.f:43).
    """
    fun = np.zeros_like(x)
    for coord, wl, wr in ((x, xl, xr), (y, yl, yr)):
        cmin, cmax = coord.min(), coord.max()
        if wl > 0:
            # constant 1 in [cmin, cmin+(1-acc)*wl], falls to 0 at cmin+wl
            x0 = cmin + wl          # end of sponge (interior side)
            rise = acc * wl
            arg = (x0 - coord) / rise
            fun = np.maximum(fun, step_smooth(arg))
        if wr > 0:
            x0 = cmax - wr
            rise = acc * wr
            arg = (coord - x0) / rise
            fun = np.maximum(fun, step_smooth(arg))
    return fun
