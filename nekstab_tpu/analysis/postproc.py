"""Post-processing: vortex criteria, monitors, statistics, forces, budgets.

Reference: core/postproc.f (vortex_core dispatch :2-29, Q :150-177,
Delta :179-212, swirling strength :214-308, Omega :31-106, nekStab_avg
:529-653, stability_energy_budget :657-746) and core/usr_extra.f monitors
(energy :404-437, enstrophy :439-476, torque :478-639, zero_crossing
:657-728). 2D specializations of the criteria.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..ops.context import SemContext
from ..ops.gather_scatter import glsc3, glsum
from ..ops.tensorprod import grad


def velocity_gradients(ctx: SemContext, u: jnp.ndarray):
    """(du/dx, du/dy, dv/dx, dv/dy) of a stacked velocity (2, E, n, n)."""
    ux, uy = grad(ctx, u[0])
    vx, vy = grad(ctx, u[1])
    return ux, uy, vx, vy


def vorticity(ctx: SemContext, u: jnp.ndarray) -> jnp.ndarray:
    """2D vorticity omega = dv/dx - du/dy."""
    _, uy, vx, _ = velocity_gradients(ctx, u)
    return vx - uy


def q_criterion(ctx: SemContext, u: jnp.ndarray) -> jnp.ndarray:
    """Q = (|Omega|^2 - |S|^2)/2 (reference core/postproc.f:150-177)."""
    ux, uy, vx, vy = velocity_gradients(ctx, u)
    s11, s22 = ux, vy
    s12 = 0.5 * (uy + vx)
    w12 = 0.5 * (uy - vx)
    s2 = s11 ** 2 + s22 ** 2 + 2 * s12 ** 2
    o2 = 2 * w12 ** 2
    return 0.5 * (o2 - s2)


def delta_criterion(ctx: SemContext, u: jnp.ndarray) -> jnp.ndarray:
    """Delta = (Q/3)^3 + (det(grad u)/2)^2 > 0 inside vortices
    (core/postproc.f:179-212)."""
    ux, uy, vx, vy = velocity_gradients(ctx, u)
    q = q_criterion(ctx, u)
    det = ux * vy - uy * vx
    return (q / 3.0) ** 3 + (det / 2.0) ** 2


def swirling_strength(ctx: SemContext, u: jnp.ndarray) -> jnp.ndarray:
    """lambda_ci: imaginary part of the complex eigenvalue pair of grad u
    (core/postproc.f:214-308). 2D: eigenvalues of [[ux,uy],[vx,vy]]."""
    ux, uy, vx, vy = velocity_gradients(ctx, u)
    tr = ux + vy
    det = ux * vy - uy * vx
    disc = (tr / 2.0) ** 2 - det
    return jnp.sqrt(jnp.maximum(-disc, 0.0))


def omega_criterion(ctx: SemContext, u: jnp.ndarray,
                    eps_rel: float = 1e-3) -> jnp.ndarray:
    """Liu et al. Omega criterion: |Omega|^2/(|Omega|^2+|S|^2+eps)
    (core/postproc.f:31-106)."""
    ux, uy, vx, vy = velocity_gradients(ctx, u)
    s2 = ux ** 2 + vy ** 2 + 0.5 * (uy + vx) ** 2
    o2 = 0.5 * (uy - vx) ** 2
    eps = eps_rel * jnp.max(o2 + s2)
    return o2 / (o2 + s2 + eps)


def kinetic_energy(ctx: SemContext, u: jnp.ndarray):
    """Total 0.5 int |u|^2 (monitor total_energy.dat,
    core/usr_extra.f:404-437)."""
    return 0.5 * glsc3(ctx, u, ctx.bm, u)


def enstrophy(ctx: SemContext, u: jnp.ndarray):
    """Total 0.5 int omega^2 (core/usr_extra.f:439-476)."""
    om = vorticity(ctx, u)
    return 0.5 * glsc3(ctx, om, ctx.bm, om)


def _traction(ctx: SemContext, wall_wn: jnp.ndarray, u: jnp.ndarray,
              p: jnp.ndarray, nu: float):
    """Pointwise traction (-p n + 2 nu S n) with the surface-quadrature
    weights folded in (wall_wn = w ds n from mesh.surface_weights)."""
    ux, uy, vx, vy = velocity_gradients(ctx, u)
    tx = -p * wall_wn[0] + nu * (2 * ux * wall_wn[0] + (uy + vx) * wall_wn[1])
    ty = -p * wall_wn[1] + nu * ((uy + vx) * wall_wn[0] + 2 * vy * wall_wn[1])
    return tx, ty


def drag_lift(ctx: SemContext, wall_wn: jnp.ndarray, u: jnp.ndarray,
              p: jnp.ndarray, nu: float):
    """Force on the wall faces: F_i = surf_int(-p n_i + 2 nu S_ij n_j)
    (the reference's torque_calc adaptation, core/usr_extra.f:478-639).
    wall_wn: surface_weights(mesh, ('W',)) as device array (2, E, n, n).
    Per-object forces: build wall_wn per object with the `region` filter of
    surface_weights (reference nekStab_define_obj, core/usr_extra.f:641-655)."""
    tx, ty = _traction(ctx, wall_wn, u, p, nu)
    return glsum(ctx, tx), glsum(ctx, ty)


def torque(ctx: SemContext, wall_wn: jnp.ndarray, u: jnp.ndarray,
           p: jnp.ndarray, nu: float, x0: float = 0.0, y0: float = 0.0):
    """Torque (moment) about (x0, y0) on the wall faces:
    T_z = surf_int (r - r0) x t  (nekStab_torque, core/usr_extra.f:478-639;
    the reference reports dragx/dragy/torque per object)."""
    tx, ty = _traction(ctx, wall_wn, u, p, nu)
    rx = ctx.xcoord - x0
    ry = ctx.ycoord - y0
    return glsum(ctx, rx * ty - ry * tx)


def forces_and_torque(ctx: SemContext, wall_wn: jnp.ndarray, u: jnp.ndarray,
                      p: jnp.ndarray, nu: float, x0: float = 0.0,
                      y0: float = 0.0):
    """(Fx, Fy, Tz) in one pass — the per-object monitor row the reference
    appends to its torque file (core/usr_extra.f:585-612)."""
    tx, ty = _traction(ctx, wall_wn, u, p, nu)
    rx = ctx.xcoord - x0
    ry = ctx.ycoord - y0
    return (glsum(ctx, tx), glsum(ctx, ty),
            glsum(ctx, rx * ty - ry * tx))


def energy_budget(ctx: SemContext, base_u: jnp.ndarray, mode_re: jnp.ndarray,
                  mode_im: jnp.ndarray, nu: float) -> dict:
    """Perturbation kinetic-energy budget of a complex global mode
    (stability_energy_budget, core/postproc.f:657-746): four production
    fields -Re(u_i* u_j) dU_i/dx_j and the dissipation field, plus their
    integrals. Returns {name: (field, integral)}."""
    bux, buy, bvx, bvy = velocity_gradients(ctx, base_u)
    # Re(a conj(a)) etc for complex mode u' = mode_re + i mode_im
    def re_prod(ar, ai, br, bi):
        return ar * br + ai * bi

    uu = re_prod(mode_re[0], mode_im[0], mode_re[0], mode_im[0])
    uv = re_prod(mode_re[0], mode_im[0], mode_re[1], mode_im[1])
    vv = re_prod(mode_re[1], mode_im[1], mode_re[1], mode_im[1])
    prod = {
        "prod_uu_dudx": -uu * bux,
        "prod_uv_dudy": -uv * buy,
        "prod_uv_dvdx": -uv * bvx,
        "prod_vv_dvdy": -vv * bvy,
    }
    # dissipation: -nu * |grad u'|^2 (Re + Im parts)
    diss = 0.0
    for m in (mode_re, mode_im):
        gx0, gy0 = grad(ctx, m[0])
        gx1, gy1 = grad(ctx, m[1])
        diss = diss + gx0 ** 2 + gy0 ** 2 + gx1 ** 2 + gy1 ** 2
    out = {}
    for k, f in prod.items():
        out[k] = (f, float(glsum(ctx, f * ctx.bm)))
    dfield = -nu * diss
    out["dissipation"] = (dfield, float(glsum(ctx, dfield * ctx.bm)))
    total = sum(v[1] for v in out.values())
    out["total"] = (None, total)
    return out


@dataclass
class RunningStats:
    """Running mean / rms / cross statistics (nekStab_avg,
    core/postproc.f:529-653)."""

    mean: jnp.ndarray | None = None
    sq: jnp.ndarray | None = None
    cross: jnp.ndarray | None = None   # <u v>
    nsamples: int = 0

    def update(self, u: jnp.ndarray):
        k = self.nsamples
        if self.mean is None:
            self.mean = u * 0.0
            self.sq = u * 0.0
            self.cross = u[0] * 0.0
        w = 1.0 / (k + 1)
        self.mean = self.mean + w * (u - self.mean)
        self.sq = self.sq + w * (u * u - self.sq)
        self.cross = self.cross + w * (u[0] * u[1] - self.cross)
        self.nsamples = k + 1

    @property
    def rms(self):
        return jnp.sqrt(jnp.maximum(self.sq - self.mean ** 2, 0.0))


@dataclass
class ZeroCrossing:
    """Probe-based period detection via rising zero crossings of a signal
    (zero_crossing, core/usr_extra.f:657-728). Feed (t, value) samples;
    crossing times are linearly interpolated, and the period estimate is
    the diff of consecutive crossings."""

    t_prev: float = 0.0
    v_prev: float = 0.0
    crossings: list = field(default_factory=list)
    started: bool = False

    def update(self, t: float, v: float):
        if self.started and self.v_prev < 0.0 <= v:
            frac = -self.v_prev / (v - self.v_prev)
            self.crossings.append(self.t_prev + frac * (t - self.t_prev))
        self.t_prev, self.v_prev, self.started = t, v, True

    @property
    def periods(self) -> np.ndarray:
        return np.diff(np.asarray(self.crossings))
