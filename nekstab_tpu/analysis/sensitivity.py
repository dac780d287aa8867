"""Sensitivity suite: wavemaker, base-flow sensitivity, steady-force
sensitivity, pointwise eigenvalue-drift maps.

Reference: core/sensitivity.f (wave_maker :7-81 [Giannetti & Luchini 2007],
bf_sensitivity :93-284 [Marquet, Sipp & Jacquin 2008],
ts_steady_force_sensitivity :296-369, biorthogonalize :428-504,
delta_forcing :506-568). Complex global modes are passed as (re, im) pairs
of stacked velocity fields (2, E, n, n).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.context import SemContext
from ..ops.gather_scatter import glsc3
from ..ops.tensorprod import grad
from .postproc import velocity_gradients


def _ip(ctx, a, b):
    return float(glsc3(ctx, a, ctx.bm, b))


def biorthogonalize(ctx: SemContext, d_re, d_im, a_re, a_im):
    """Normalize the direct mode to unit energy norm and rescale the adjoint
    mode so the complex inner product <adj, dir>_B = 1 (reference
    core/sensitivity.f:428-504). Returns (d_re, d_im, a_re, a_im)."""
    nrm = np.sqrt(_ip(ctx, d_re, d_re) + _ip(ctx, d_im, d_im))
    d_re, d_im = d_re / nrm, d_im / nrm
    gamma = _ip(ctx, a_re, d_re) + _ip(ctx, a_im, d_im)   # Re <a, d>
    delta = _ip(ctx, a_re, d_im) - _ip(ctx, a_im, d_re)   # Im <a, d>
    den = gamma ** 2 + delta ** 2
    new_re = (gamma * a_re - delta * a_im) / den
    new_im = (gamma * a_im + delta * a_re) / den
    return d_re, d_im, new_re, new_im


def wavemaker(ctx: SemContext, d_re, d_im, a_re, a_im) -> jnp.ndarray:
    """Structural sensitivity |u_hat| * |u_hat_adj| after biorthonormalization
    (wave_maker, core/sensitivity.f:7-81)."""
    d_re, d_im, a_re, a_im = biorthogonalize(ctx, d_re, d_im, a_re, a_im)
    mag_d = jnp.sqrt(sum(d_re[c] ** 2 + d_im[c] ** 2 for c in range(2)))
    mag_a = jnp.sqrt(sum(a_re[c] ** 2 + a_im[c] ** 2 for c in range(2)))
    return mag_d * mag_a


def bf_sensitivity(ctx: SemContext, d_re, d_im, a_re, a_im) -> dict:
    """Base-flow sensitivity of the eigenvalue (bf_sensitivity,
    core/sensitivity.f:93-284): transport term -(grad u_hat)^H u_adj and
    production term (grad u_adj)^H-type contraction with u_hat, each with
    real/imag parts, plus their sums (the reference's tr_/ti_/pr_/pi_/sr_/si_
    outputs). Returns dict of (2, E, n, n) fields."""
    d_re, d_im, a_re, a_im = biorthogonalize(ctx, d_re, d_im, a_re, a_im)

    def grads(u):
        # g[i][j] = d u_i / d x_j
        return [list(grad(ctx, u[c])) for c in range(2)]

    gd_re, gd_im = grads(d_re), grads(d_im)
    ga_re, ga_im = grads(a_re), grads(a_im)

    # transport: tr_j = - sum_i [aRe_i * d(dRe_i)/dx_j + aIm_i * d(dIm_i)/dx_j]
    tr = [-sum(a_re[i] * gd_re[i][j] + a_im[i] * gd_im[i][j]
               for i in range(2)) for j in range(2)]
    ti = [sum(a_re[i] * gd_im[i][j] - a_im[i] * gd_re[i][j]
              for i in range(2)) for j in range(2)]
    # production: pr_j = sum_i [dRe_i * d(aRe_j)/dx_i + dIm_i * d(aIm_j)/dx_i]
    pr = [sum(d_re[i] * ga_re[j][i] + d_im[i] * ga_im[j][i]
              for i in range(2)) for j in range(2)]
    pi = [sum(d_re[i] * ga_im[j][i] - d_im[i] * ga_re[j][i]
              for i in range(2)) for j in range(2)]
    tr = jnp.stack(tr)
    ti = jnp.stack(ti)
    pr = jnp.stack(pr)
    pi = jnp.stack(pi)
    return dict(transport_re=tr, transport_im=ti, production_re=pr,
                production_im=pi, total_re=tr + pr, total_im=ti + pi)


def steady_force_sensitivity(sys_, base_u, s_field, nsteps: int,
                             k_dim: int = 64, rtol: float = 1e-6,
                             logger=print):
    """Sensitivity of the eigenvalue to a steady force: solve
        -(I - exp(tau L^dagger)) x = int_0^tau exp((tau-s) L^dagger) s ds
    by time-stepper GMRES (ts_steady_force_sensitivity,
    core/sensitivity.f:296-369; matvec = ts_force_sensitivity_map,
    core/matvec.f:357-374). `s_field` is the (real or imag) total base-flow
    sensitivity from bf_sensitivity. `sys_` is a FlowSystem."""
    import jax

    from ..algorithms.arnoldi import ArnoldiSpace
    from ..algorithms.gmres import gmres
    from ..solver.linearized import make_adjoint_forced_response

    ctx = sys_.ctx
    aresp = sys_._get(
        ("aresp", nsteps),
        lambda: jax.jit(make_adjoint_forced_response(
            ctx, sys_.cfg, sys_.mesh.has_outflow, nsteps)))
    rhs = aresp(base_u, sys_.sponge_fun, s_field)
    adj = sys_.adjoint_propagator(nsteps)

    def matvec(v):
        return adj(base_u, sys_.sponge_fun, v)[0] - v

    space = ArnoldiSpace(matvec=matvec, dot=sys_.dot_full)
    x, info = gmres(space, rhs, ksize=k_dim, rtol=rtol, logger=logger)
    return x, info


def delta_forcing(ctx: SemContext, fs_re, fs_im) -> jnp.ndarray:
    """Pointwise eigenvalue variation map induced by a unit steady point
    force (delta_forcing, core/sensitivity.f:506-568, eq. 5.1 of Marquet et
    al. 2008): component 0 = growth-rate drift magnitude |fs_re|, component
    1 = frequency drift magnitude |fs_im| at each point."""
    mag_re = jnp.sqrt(sum(fs_re[c] ** 2 for c in range(2)))
    mag_im = jnp.sqrt(sum(fs_im[c] ** 2 for c in range(2)))
    return jnp.stack([mag_re, mag_im])
