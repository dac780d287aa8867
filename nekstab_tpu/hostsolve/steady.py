"""Assembled steady Jacobian: direct Newton + shift-invert eigensolves (2D).

"Matrix mode" for the PN/PN-2 discretization: the steady linearized operator
is assembled as a sparse matrix and factorized (SuperLU), giving

  * `steady_newton` — Newton on the coupled steady NS saddle system with an
    EXACT sparse-direct Jacobian solve per iteration (quadratic convergence
    to the f64 floor; no time-stepper GMRES, hence immune to the
    exp(tauL)-I near-null clustering that stalls restarted GMRES — the r4
    pnpn2 gold-chain blocker, out/gold/pnpn2_dt1em2.log), and
  * `leading_eigs` — shift-invert Arnoldi (ARPACK) on the generalized
    problem  lambda M v = L v,  D v = 0  for the leading global modes at
    f64 precision in seconds.

The reference has no such path (its Jacobian exists only as a time
propagator, core/matvec.f:64-154); on 2D meshes this both cross-validates
the time-stepper chain and outruns it by orders of magnitude. The PN/PN-2
stepper's fixed point satisfies exactly these coupled equations
(solver/proj.py module docstring), so the `steady_newton` solution IS the
time-stepper fixed point, verified by |Phi_tau(q*) - q*| after the solve.

Correctness strategy: the convection/sponge blocks are NOT hand-derived —
they are extracted column-by-column from the very jitted `convect` code the
stepper runs (one vmapped basis sweep per element; elements are independent
blocks), so dealiasing, curvilinear metrics and sign conventions are
inherited, not re-implemented. Validated against the code path by
`tests/test_steady.py`.
"""

from __future__ import annotations

import numpy as np


def _as_np(x):
    return np.asarray(x, np.float64)


def local_linear_blocks(sys_, base_u, sponge=None, include_sponge=True):
    """Per-element dense blocks of the local linearized advection+sponge
    operator  v -> bm * (convect(U, v) + convect(v, U) + sponge * v),
    shape (E, 2*n*n, 2*n*n) with row/col index c*n*n + i*n + j."""
    import jax
    import jax.numpy as jnp
    from ..solver.stepper import convect

    ctx = sys_.ctx
    n = ctx.n
    nn = n * n
    E = ctx.bm.shape[0]
    if sponge is None:
        sponge = sys_.sponge_fun

    def apply_op(v):
        return ctx.bm * (convect(ctx, base_u, v) + convect(ctx, v, base_u)
                         + (sponge * v if include_sponge else 0.0))

    # basis sweep: basis vector b = (c, i, j) set to 1 in EVERY element at
    # once (the operator is element-block-diagonal)
    eye = jnp.eye(2 * nn, dtype=ctx.dtype)
    basis = eye.reshape(2 * nn, 2, n, n)
    basis = jnp.broadcast_to(basis[:, :, None, :, :], (2 * nn, 2, E, n, n))
    cols = jax.vmap(apply_op)(basis)          # (b=2nn, c', E, i', j')
    # blocks[e, row, col] with row = (c', i', j'), col = b = (c, i, j)
    blocks = np.transpose(_as_np(cols), (2, 1, 3, 4, 0)) \
        .reshape(E, 2 * nn, 2 * nn)
    return blocks


def assemble_vel_op(sys_, blocks) -> "scipy.sparse.csr_matrix":
    """Assemble per-element velocity-space blocks into the (2G, 2G) global
    matrix via the mesh numbering (duplicated dofs sum — the dssum)."""
    import scipy.sparse as sp

    mesh = sys_.mesh
    E = mesh.nelem
    nn = mesh.n * mesh.n
    G = mesh.nglobal
    gid = mesh.gid.reshape(E, nn)
    # global index of local (c, k): c * G + gid
    gl = np.concatenate([gid, G + gid], axis=1)        # (E, 2nn)
    rows = np.repeat(gl, 2 * nn, axis=1).ravel()
    cols = np.tile(gl, (1, 2 * nn)).ravel()
    A = sp.coo_matrix((blocks.ravel(), (rows, cols)),
                      shape=(2 * G, 2 * G)).tocsr()
    A.sum_duplicates()
    return A


def steady_matrices(sys_, base_u, sponge=None):
    """(L, M, D, free) of the assembled linearized steady system on free
    velocity dofs:  lambda M v = L v - D^T q,  D v = 0.

    L = -(Conv_U + Sponge) - nu A   (free x free, 2G-indexed then sliced)
    M = diag(bmg) ; D = pnpn2 weak divergence (P x 2G, free cols).
    sponge: ramp entering the LINEARIZED operator (defaults to the
    unit-strength ramp, matching the time-stepper's lstep and the
    reference's perturbation branch, core/utils.f:174-177)."""
    import scipy.sparse as sp

    hs = sys_.ctx.hsolve
    if hs is None or not hasattr(hs, "D_sp"):
        raise RuntimeError("steady_matrices needs host_direct=True and "
                           "scheme='pnpn2'")
    G = sys_.mesh.nglobal
    nu = sys_.cfg.nu
    blocks = local_linear_blocks(sys_, base_u, sponge=sponge)
    C = assemble_vel_op(sys_, blocks)
    A2 = sp.block_diag([hs.A, hs.A]).tocsr()       # weak Laplacian per comp
    L = (-C - nu * A2).tocsr()
    M = sp.diags(np.concatenate([hs.bmg, hs.bmg]))
    D = hs.D_sp.tocsr()
    free = np.concatenate([hs._hfree[0], G + hs._hfree[1]])
    return L, M, D, free


def _saddle(Lf, Df, scale=1.0):
    import scipy.sparse as sp
    P = Df.shape[0]
    return sp.bmat([[Lf, -scale * Df.T], [Df, None]], format="csc")


def leading_eigs(sys_, base_u, shift, k=8, sponge=None, tol=1e-10,
                 ncv=None):
    """Leading eigenvalues of the linearized steady operator near `shift`
    (complex), via ARPACK shift-invert on the saddle system. Returns
    (eigenvalues, velocity eigenvectors on free dofs). tol=1e-10 (not
    ARPACK's machine-precision default): the factorized solve dominates
    wall time and 1e-10 on the shift-inverted eigenvalue is far below the
    1e-6 gold bar."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    L, M, D, free = steady_matrices(sys_, base_u, sponge=sponge)
    Lf = L[free][:, free]
    Df = D[:, free]
    # drop empty pressure rows (pnpn2 D has none, but keep it safe)
    Asys = _saddle(Lf, Df).astype(np.complex128)
    nf = free.size
    P = Df.shape[0]
    bmf = M.diagonal()[free]
    Msys = sp.diags(np.concatenate([bmf, np.zeros(P)])).tocsc() \
        .astype(np.complex128)
    lam, vecs = spla.eigs(Asys, k=k, M=Msys, sigma=complex(shift),
                          which="LM", tol=tol,
                          ncv=ncv if ncv is not None else max(40, 2 * k + 1))
    order = np.argsort(-lam.real)
    return lam[order], vecs[:nf, order], free


def steady_residual_fn(sys_):
    """jitted local steady residual pieces: (u, q) -> (Rv_g_free, Rq)."""
    import jax
    import jax.numpy as jnp
    from ..ops.gather_scatter import assemble
    from ..ops.tensorprod import weak_laplacian
    from ..solver.proj import div2, div2_t
    from ..solver.stepper import convect

    ctx = sys_.ctx
    cfg = sys_.cfg
    case = sys_.case
    nu = cfg.nu

    @jax.jit
    def resid(u, q):
        ncur = (-convect(ctx, u, u) + case.f
                + case.sponge * (case.sponge_ref - u))
        rv_loc = ctx.bm * ncur - nu * weak_laplacian(ctx, u) \
            - div2_t(ctx, q)
        rv = ctx.maskg_vel[:2] * assemble(ctx, rv_loc)
        return rv, div2(ctx, u)

    return resid


def steady_newton(sys_, u0, tol=1e-11, maxiter=12, logger=print,
                  callback=None, ptc_dtau=None):
    """Direct Newton for the coupled steady PN/PN-2 system. u0: velocity
    field (2, E, n, n) satisfying the Dirichlet BCs. Returns (u, q, hist).

    ptc_dtau: initial pseudo-time step for pseudo-transient continuation
    (Kelley & Keyes SER): the velocity block is augmented with -M/dtau and
    dtau grows as |R| falls, blending implicit-Euler marching into full
    Newton. Use for seeds outside the pure-Newton basin (the BFS Re=500
    recirculation: pure damped Newton oscillated at |R|~3e-3 and a
    floor-accepted bad step destroyed the iterate — out/bfs_matrix_base.log
    round 5). None = pure Newton (cylinder converges quadratically)."""
    import jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    from ..ops.gather_scatter import scatter

    ctx = sys_.ctx
    G = sys_.mesh.nglobal
    resid = steady_residual_fn(sys_)
    u = jnp.asarray(u0, ctx.dtype)
    q = jnp.zeros((ctx.bm.shape[0], ctx.n - 2, ctx.n - 2), ctx.dtype)
    hist = []
    dtau = ptc_dtau
    for it in range(1, maxiter + 1):
        rv, rq = resid(u, q)
        rv = _as_np(rv)
        rq = _as_np(rq)
        # free-dof restriction (same masks as the Helmholtz solve)
        hs = ctx.hsolve
        free = np.concatenate([hs._hfree[0], G + hs._hfree[1]])
        r = np.concatenate([rv.reshape(2 * G)[free], rq.ravel()])
        rnorm = float(np.linalg.norm(r))
        if hist and dtau is not None:
            # SER: grow the pseudo-step by the realized reduction
            dtau = min(dtau * max(hist[-1] / max(rnorm, 1e-300), 0.1), 1e12)
        hist.append(rnorm)
        logger(f"[steady_newton] iter={it} |R|={rnorm:.6e}"
               + (f" dtau={dtau:.2e}" if dtau is not None else ""))
        if callback is not None:
            callback(it, u, q, rnorm)
        if rnorm < tol:
            return u, q, hist
        # Jacobian about u: d(Rv)/du = L (with the NONLINEAR sponge
        # strength), d(Rv)/dq = -D^T, d(Rq)/du = D
        L, M, D, free = steady_matrices(
            sys_, u, sponge=sys_.sponge_strength * sys_.sponge_fun)
        Lf = L[free][:, free]
        if dtau is not None:
            Lf = (Lf - sp.diags(M.diagonal()[free] / dtau)).tocsr()
        Asys = _saddle(Lf, D[:, free])
        lu = spla.splu(Asys)
        dx = lu.solve(r)
        nf = free.size
        dvg = np.zeros(2 * G)
        dvg[free] = dx[:nf]
        du = scatter(ctx, jnp.asarray(dvg.reshape(2, G), ctx.dtype))
        dq = jnp.asarray(dx[nf:].reshape(rq.shape), ctx.dtype)
        # damped fallback for rough seeds; NEVER accept a worse iterate —
        # keep the best trial (a floor-accepted bad step at s=1/16
        # destroyed the r5 BFS run)
        s, best = 1.0, None
        for _ in range(6):
            ut, qt = u - s * du, q - s * dq
            rv_t, rq_t = resid(ut, qt)
            rt = float(np.sqrt(
                np.sum(_as_np(rv_t).reshape(2 * G)[free] ** 2)
                + np.sum(_as_np(rq_t) ** 2)))
            if np.isfinite(rt) and (best is None or rt < best[2]):
                best = (ut, qt, rt)
            if np.isfinite(rt) and rt < rnorm:
                break
            logger(f"[steady_newton]   damp: |R({s:g})|={rt:.3e}")
            s *= 0.5
        if best[2] >= rnorm:
            logger("[steady_newton]   no improving step — keeping iterate"
                   + ("" if dtau is None else " (shrinking dtau)"))
            if dtau is not None:
                dtau = max(dtau * 0.2, 1e-6)
            continue
        u, q = best[0], best[1]
    rv, rq = resid(u, q)
    r = float(np.sqrt(float(np.vdot(_as_np(rv), _as_np(rv)))
                      + float(np.vdot(_as_np(rq), _as_np(rq)))))
    hist.append(r)
    return u, q, hist
