"""outpost_ks analog: spectra files + reconstructed mode fields on disk.

Reference: core/eigensolvers.f:508-721 — after Krylov-Schur convergence it
writes Spectre_H/NS/_conv.dat, reconstructs up to `maxmodes` Ritz modes,
unit-normalizes them, and outposts `<op>Re/<op>Im` velocity fields plus a
`<op>Rv` vorticity field; for transient growth it additionally applies one
forward matvec to the leading optimal perturbation to obtain the optimal
RESPONSE ('ore'/'orv' files, :644-659). Here the fields are written as Nek
'#std' .f files (io/nekfile.py), so the reference's own toolchain and plot
scripts can read them directly.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..algorithms.eigensolve import KrylovSchurResult, log_transform
from ..io.nekfile import write_fld
from ..io.spectra import write_run_info, write_spectre
from .postproc import vorticity


def _bnorm(sys, a, b):
    return float(sys.dot(a, a) + sys.dot(b, b)) ** 0.5


def outpost_ks(sys, ks: KrylovSchurResult, nsteps: int, which: str = "d",
               directory: str = ".", session: str = "mode",
               maxmodes: int = 8, tol: float = 1e-6,
               response_space=None, logger=print) -> dict:
    """Write spectra + mode fields for a converged Krylov-Schur result.

    which: 'd' direct, 'a' adjoint, 'p' transient growth (reference op tags).
    response_space: for transient growth, the FORWARD propagator space —
    the leading mode is propagated once to produce the optimal response
    (reference 'ore'/'orv').
    Returns {paths, evals, gains}.
    """
    ctx = sys.ctx
    tau = nsteps * sys.cfg.dt
    lam = log_transform(ks.evals, tau)
    paths = write_spectre(directory, which, ks.evals, lam, ks.residuals, tol)
    write_run_info(directory, which, k_dim=ks.H.shape[1], tau=tau,
                   nsteps=nsteps, nelem=sys.mesh.nelem, n=ctx.n,
                   n_outer=ks.n_outer, tol=tol)
    x = np.asarray(ctx.xcoord)
    y = np.asarray(ctx.ycoord)
    # one representative per conjugate pair, leading growth rate first
    order = [int(i) for i in np.argsort(-lam.real) if lam[i].imag >= 0.0]
    out = dict(paths=paths, evals=[], gains=[])
    for rank, i in enumerate(order[:maxmodes]):
        re, im = ks.reconstruct_mode(i)
        nrm = _bnorm(sys, re, im)
        re, im = re / nrm, im / nrm
        out["evals"].append(complex(lam[i]))
        fre = os.path.join(directory,
                           f"{which}Re{session}0.f{rank + 1:05d}")
        fim = os.path.join(directory,
                           f"{which}Im{session}0.f{rank + 1:05d}")
        frv = os.path.join(directory,
                           f"{which}Rv{session}0.f{rank + 1:05d}")
        write_fld(fre, x=x, y=y, u=np.asarray(re[0]), v=np.asarray(re[1]),
                  time=lam[i].real)
        write_fld(fim, x=x, y=y, u=np.asarray(im[0]), v=np.asarray(im[1]),
                  time=abs(lam[i].imag))
        # vorticity of the complex mode: Re part in u-slot, Im part in v-slot
        write_fld(frv, x=x, y=y, u=np.asarray(vorticity(ctx, re)),
                  v=np.asarray(vorticity(ctx, im)))
        logger(f"[outpost_ks] mode {rank + 1}: sigma={lam[i].real:+.6e} "
               f"omega={lam[i].imag:+.6e} -> {os.path.basename(fre)}")
        if response_space is not None and rank == 0:
            # transient growth: optimal response = forward matvec of the
            # optimal perturbation; gain = amplification over tau
            wre = response_space.matvec(re)
            wim = response_space.matvec(im)
            gain = _bnorm(sys, wre, wim)
            out["gains"].append(gain)
            fo = os.path.join(directory, f"ore{session}0.f{rank + 1:05d}")
            fv = os.path.join(directory, f"orv{session}0.f{rank + 1:05d}")
            write_fld(fo, x=x, y=y, u=np.asarray(wre[0] / gain),
                      v=np.asarray(wre[1] / gain), time=gain)
            write_fld(fv, x=x, y=y,
                      u=np.asarray(vorticity(ctx, wre / gain)),
                      v=np.asarray(vorticity(ctx, wim / gain)))
            logger(f"[outpost_ks] optimal response: gain G(tau)={gain:.6e} "
                   f"-> {os.path.basename(fo)}")
    return out
