"""High-level driver: wires mesh + config + case into stability operators.

The TPU-native replacement for the reference's `nekStab()` mode dispatcher
(core/usr_extra.f:134-242) — but inverted (SURVEY.md §1): the framework owns
the time loop; a case is data (mesh, config, CaseFields) and the analyses are
function calls:

    sys = FlowSystem(mesh, cfg, case, sponge_fun=...)
    bf  = sys.newton_base_flow(q0, tau=1.0)              # uparam 2.0
    res = krylov_schur(sys.direct_space(bf, nsteps), v0, acfg)   # 3.1
    res = krylov_schur(sys.adjoint_space(bf, nsteps), v0, acfg)  # 3.2
    res = krylov_schur(sys.transient_growth_space(...), ...)     # 3.3

All heavy operators are jitted once per (nsteps) and cached.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import NSConfig
from .mesh import Mesh2D
from .ops.context import SemContext, make_context
from .ops.gather_scatter import glsc3
from .solver.linearized import (make_adjoint_propagator,
                                make_linear_propagator)
from .solver.stepper import (CaseFields, NSState, initial_state, make_advance,
                             timestep_coeffs, zero_case_fields)
from .algorithms.arnoldi import ArnoldiSpace
from .algorithms.newton import NewtonResult, newton_krylov


class FlowSystem:
    """A discretized flow problem plus cached jitted propagators."""

    def __init__(self, mesh: Mesh2D, cfg: NSConfig, case: CaseFields | None,
                 *, dtype=jnp.float64, axis_name: str | None = None,
                 sponge_fun: np.ndarray | None = None,
                 sponge_strength: float = 0.0, dealias: bool | int = False,
                 host_direct: bool = False,
                 pressure_precond: bool | str = True, n_deflate: int = 128,
                 scheme: str = "pnpn"):
        self.mesh = mesh
        self.cfg = cfg
        self.scheme = scheme
        self.ctx: SemContext = make_context(
            mesh, dtype=dtype, axis_name=axis_name, sponge_ramp=sponge_fun,
            nscalars=1 if cfg.boussinesq else 0, dealias=dealias,
            host_direct=host_direct, pressure_precond=pressure_precond,
            n_deflate=n_deflate, scheme=scheme)
        # unit-strength ramp for the linearized equations
        # (core/utils.f:174-177: perturbation sponge strength always 1)
        if sponge_fun is None:
            self.sponge_fun = jnp.zeros_like(self.ctx.bm)
        else:
            self.sponge_fun = jnp.asarray(sponge_fun, self.ctx.dtype)
        self.sponge_strength = sponge_strength
        self.case = case if case is not None else zero_case_fields(self.ctx)
        if sponge_strength != 0.0 and case is not None:
            # nonlinear sponge term strength*ramp*(u_ref - u)
            self.case = dataclasses.replace(
                case, sponge=sponge_strength * self.sponge_fun)
        self._cache = {}
        # optional (state_shardings, vel_sharding) asserted inside scan
        # bodies; set by parallel.ShardedFlowSystem
        self._shard = None

    # ------------------------------------------------------------------
    # inner product (mass-weighted, sponge-masked — the reference's
    # krylov_inner_product over bm1s, core/krylov_subspace.f:24-56)
    # ------------------------------------------------------------------
    @property
    def dot(self):
        ctx = self.ctx
        return lambda a, b: glsc3(ctx, a, ctx.bm_eig, b)

    @property
    def dot_full(self):
        """Full-mass inner product (no sponge masking)."""
        ctx = self.ctx
        return lambda a, b: glsc3(ctx, a, ctx.bm, b)

    @property
    def dot64(self):
        """Mass-weighted inner product accumulated in float64 regardless of
        the field dtype — the mixed-precision TPU orthogonalization path
        (SURVEY §7 hard part 4): the stepper stays f32 while CGS2
        coefficients and Ritz algebra run at f64 (XLA emulates f64
        elementwise/reduction on TPU; measured exact vs host numpy).

        Requires jax_enable_x64: without it `astype(float64)` silently
        truncates to f32 (the BENCH_r02 failure, VERDICT Weak #3), so this
        property refuses to build the dead path."""
        if not jax.config.jax_enable_x64:
            raise RuntimeError(
                "dot64 requires jax.config.update('jax_enable_x64', True): "
                "without it the f64 accumulation silently truncates to f32 "
                "(keep field arrays f32 — only the reductions run at f64)")
        ctx = self.ctx
        w = ctx.bm_eig

        def d(a, b):
            s = jnp.sum(a.astype(jnp.float64) * w.astype(jnp.float64)
                        * b.astype(jnp.float64))
            if ctx.axis_name is not None:
                s = jax.lax.psum(s, ctx.axis_name)
            return s

        return d

    @property
    def dot64_full(self):
        """Full-mass (unmasked) inner product with f64 accumulation — the
        mixed-precision analog of dot_full, for the transient-growth space
        on TPU (same x64 requirement as dot64)."""
        if not jax.config.jax_enable_x64:
            raise RuntimeError("dot64_full requires jax_enable_x64")
        ctx = self.ctx
        w = ctx.bm

        def d(a, b):
            s = jnp.sum(a.astype(jnp.float64) * w.astype(jnp.float64)
                        * b.astype(jnp.float64))
            if ctx.axis_name is not None:
                s = jax.lax.psum(s, ctx.axis_name)
            return s

        return d

    # ------------------------------------------------------------------
    # propagators
    # ------------------------------------------------------------------
    def _get(self, key, builder):
        if key not in self._cache:
            self._cache[key] = builder()
        return self._cache[key]

    @property
    def _builders(self):
        """(make_advance, make_linear_propagator, make_adjoint_propagator)
        for the configured scheme (pnpn splitting / pnpn2 projection)."""
        if self.scheme == "pnpn2":
            from .solver.proj import (make_adjoint_propagator2,
                                      make_advance2,
                                      make_linear_propagator2)
            return make_advance2, make_linear_propagator2, \
                make_adjoint_propagator2
        return make_advance, make_linear_propagator, make_adjoint_propagator

    def initial_state(self, u0, p0=None):
        """Scheme-appropriate initial NSState/NSState2."""
        if self.scheme == "pnpn2":
            from .solver.proj import initial_state2
            return initial_state2(self.ctx, u0, p0)
        from .solver.stepper import initial_state
        return initial_state(self.ctx, u0, p0)

    def nonlinear_advance(self, nsteps: int, collect: bool = False):
        """Jitted nonlinear advance: (case, state) -> (state', aux)."""
        if self._can_chunk(nsteps):
            from .solver.stepper import make_advance_chunk
            kw = {} if self._shard is None else {"shard": self._shard}
            chunk_fn = self._get(("advchunk", collect), lambda: jax.jit(
                make_advance_chunk(self.ctx, self.cfg,
                                   self.mesh.has_outflow, collect=collect,
                                   **kw)))
            pieces = self._chunk_pieces(nsteps)

            def advance(case, state, bcw_seq=None):
                assert bcw_seq is None, "bcw_seq: use chunk_steps=None"
                es, trs = [], []
                for ab, eb in pieces:
                    state, aux = chunk_fn(case, state, ab, eb)
                    if collect:
                        es.append(aux[0])
                        trs.append(aux[1])
                    else:
                        es.append(aux)
                if collect:
                    return state, (jnp.concatenate(es),
                                   jnp.concatenate(trs))
                return state, jnp.concatenate(es)

            return self._get(("advchunked", nsteps, collect),
                             lambda: advance)
        mk_adv = self._builders[0]
        kw = {} if self._shard is None else {"shard": self._shard}
        return self._get(("adv", nsteps, collect), lambda: jax.jit(
            mk_adv(self.ctx, self.cfg, self.mesh.has_outflow, nsteps,
                   collect=collect, **kw)))

    # chunk size for the chunked propagator composition (pnpn scheme,
    # steady base flow): one compiled chunk executable serves every chunk
    # position and every nsteps — compile time stops scaling with the
    # sampling period (the 549 s BENCH_r03 monolithic compile). None/0
    # disables chunking (monolithic scan, e.g. for linear_transpose users).
    chunk_steps: int | None = 25

    def _chunk_pieces(self, nsteps: int):
        """Per-chunk (ab, eb) coefficient arrays for the full ramp-correct
        nsteps sequence, split into pieces of <= chunk_steps."""
        c = self.chunk_steps
        ab, eb = timestep_coeffs(nsteps, self.cfg.torder, np.float64)
        ab = jnp.asarray(ab, self.ctx.dtype)
        eb = jnp.asarray(eb, self.ctx.dtype)
        return [(ab[i:i + c], eb[i:i + c]) for i in range(0, nsteps, c)]

    def _linear_chunk_fn(self):
        """The jitted shared chunk executable (solver/linearized.
        make_linear_chunk), cached once per FlowSystem."""
        from .solver.linearized import make_linear_chunk
        kw = {} if self._shard is None else {"shard": self._shard}
        return self._get(("linchunk",), lambda: jax.jit(make_linear_chunk(
            self.ctx, self.cfg, self.mesh.has_outflow, **kw)))

    def _can_chunk(self, nsteps: int) -> bool:
        return (bool(self.chunk_steps) and self.scheme == "pnpn"
                and nsteps > self.chunk_steps)

    def linear_propagator(self, nsteps: int):
        if self._can_chunk(nsteps):
            from .solver.linearized import zero_pstate
            chunk_fn = self._linear_chunk_fn()
            pieces = self._chunk_pieces(nsteps)
            ctx = self.ctx

            c = self.chunk_steps

            def prop(base_u, sponge, u0, p0=None):
                from .solver.orbit import FourierOrbit
                fourier = isinstance(base_u, FourierOrbit)
                orbit = (not fourier) and base_u.ndim == 5
                st = zero_pstate(ctx, u0)
                if p0 is not None:
                    st = st._replace(p=p0)
                for k, (ab, eb) in enumerate(pieces):
                    if fourier:
                        j = jnp.arange(k * c, k * c + ab.shape[0])
                        st = chunk_fn(base_u, sponge, st, ab, eb, j, nsteps)
                    elif orbit:
                        bu = jax.lax.slice_in_dim(base_u, k * c,
                                                  k * c + ab.shape[0], axis=0)
                        st = chunk_fn(bu, sponge, st, ab, eb)
                    else:
                        st = chunk_fn(base_u, sponge, st, ab, eb)
                return st.u, st.p

            return self._get(("linchunked", nsteps), lambda: prop)
        mk_lin = self._builders[1]
        kw = {} if self._shard is None else {"shard": self._shard}
        return self._get(("lin", nsteps), lambda: jax.jit(
            mk_lin(self.ctx, self.cfg, self.mesh.has_outflow, nsteps, **kw)))

    def _adjoint_chunk_fn(self):
        """Jitted transpose of the shared linear chunk: the chunked adjoint
        composes these in reverse (transpose of a composition)."""
        from .solver.linearized import make_linear_chunk
        kw = {} if self._shard is None else {"shard": self._shard}
        chunk = make_linear_chunk(self.ctx, self.cfg, self.mesh.has_outflow,
                                  **kw)

        def adj_chunk(base_u, sponge, ct, ab, eb):
            f = lambda s: chunk(base_u, sponge, s, ab, eb)
            (s,) = jax.linear_transpose(f, ct)(ct)
            return s

        return self._get(("adjchunk",), lambda: jax.jit(adj_chunk))

    def adjoint_propagator(self, nsteps: int):
        if self._can_chunk(nsteps):
            from .ops.gather_scatter import dssum
            from .solver.stepper import NSState
            adj_chunk = self._adjoint_chunk_fn()
            pieces = self._chunk_pieces(nsteps)
            ctx = self.ctx
            bmw = ctx.bm if ctx.bm_adj is None else ctx.bm_adj

            def adj(base_u, sponge, v):
                if (hasattr(base_u, "ndim") and base_u.ndim == 5) \
                        or not hasattr(base_u, "ndim"):
                    return self._get(("adj", nsteps), build_mono)(
                        base_u, sponge, v)
                # transpose of extract(u): cotangent state with u-slot only
                z2 = jnp.zeros((2,) + v.shape, v.dtype)
                zcc = jnp.zeros((2, 2) + v.shape[1:], v.dtype)
                ct = NSState(u=bmw * v, p=jnp.zeros_like(ctx.bm),
                             ulag=z2, nlag=z2, cclag=zcc)
                for ab, eb in reversed(pieces):
                    ct = adj_chunk(base_u, sponge, ct, ab, eb)
                # transpose of inject(u0) = (u, ulag=[u0, u0])
                w = ct.u + ct.ulag[0] + ct.ulag[1]
                u_adj = dssum(ctx, w) / dssum(ctx, bmw)
                return u_adj, jnp.zeros_like(ctx.bm)

            def build_mono():
                kw = {} if self._shard is None else {"shard": self._shard}
                return jax.jit(self._builders[2](
                    self.ctx, self.cfg, self.mesh.has_outflow, nsteps, **kw))

            return self._get(("adjchunked", nsteps), lambda: adj)
        mk_adj = self._builders[2]
        kw = {} if self._shard is None else {"shard": self._shard}
        return self._get(("adj", nsteps), lambda: jax.jit(
            mk_adj(self.ctx, self.cfg, self.mesh.has_outflow, nsteps, **kw)))

    # ------------------------------------------------------------------
    # Arnoldi operator spaces (uparam 3.x dispatch, core/matvec.f:124-151)
    # ------------------------------------------------------------------
    def direct_space(self, base_u, nsteps: int,
                     dot64: bool = False) -> ArnoldiSpace:
        prop = self.linear_propagator(nsteps)
        sp = self.sponge_fun
        return ArnoldiSpace(matvec=lambda v: prop(base_u, sp, v)[0],
                            dot=self.dot64 if dot64 else self.dot)

    def adjoint_space(self, base_u, nsteps: int,
                      dot64: bool = False) -> ArnoldiSpace:
        adj = self.adjoint_propagator(nsteps)
        sp = self.sponge_fun
        return ArnoldiSpace(matvec=lambda v: adj(base_u, sp, v)[0],
                            dot=self.dot64 if dot64 else self.dot)

    def linear_propagator_block(self, nsteps: int):
        """vmap-batched linearized propagator: (base_u, sponge, V (b, ...))
        -> (b, ...). On TPU the b perturbations share every kernel launch
        and collective — the block-Arnoldi matvec (the reference cannot do
        this: npert forced to 1, core/matvec.f:10-14)."""
        if self._can_chunk(nsteps):
            from .solver.linearized import make_linear_chunk
            kw = {} if self._shard is None else {"shard": self._shard}
            pieces = self._chunk_pieces(nsteps)
            ctx = self.ctx

            def build_chunkb():
                chunk = make_linear_chunk(self.ctx, self.cfg,
                                          self.mesh.has_outflow, **kw)
                return jax.jit(jax.vmap(chunk,
                                        in_axes=(None, None, 0, None, None)))

            chunkb = self._get(("linchunkb",), build_chunkb)

            def propb(base_u, sponge, V):
                from .solver.stepper import NSState
                b = V.shape[0]
                st = NSState(
                    u=V, p=jnp.zeros((b,) + ctx.bm.shape, V.dtype),
                    ulag=jnp.stack([V, V], axis=1),
                    nlag=jnp.zeros((b, 2) + V.shape[1:], V.dtype),
                    cclag=jnp.zeros((b, 2, 2) + V.shape[2:], V.dtype))
                for ab, eb in pieces:
                    st = chunkb(base_u, sponge, st, ab, eb)
                return st.u

            return self._get(("linbchunked", nsteps), lambda: propb)

        def build():
            kw = {} if self._shard is None else {"shard": self._shard}
            prop = self._builders[1](self.ctx, self.cfg,
                                     self.mesh.has_outflow, nsteps, **kw)
            return jax.jit(jax.vmap(lambda bu, sp, v: prop(bu, sp, v)[0],
                                    in_axes=(None, None, 0)))
        return self._get(("linb", nsteps), build)

    def direct_space_block(self, base_u, nsteps: int, dot64: bool = False):
        """(ArnoldiSpace, matvec_block) for algorithms.block_krylov_schur."""
        propb = self.linear_propagator_block(nsteps)
        sp = self.sponge_fun

        def mv1(v):
            w = propb(base_u, sp, jax.tree.map(lambda x: x[None], v))
            return jax.tree.map(lambda x: x[0], w)

        space = ArnoldiSpace(matvec=mv1,
                             dot=self.dot64 if dot64 else self.dot)
        return space, lambda V: propb(base_u, sp, V)

    def transient_growth_space(self, base_u, nsteps: int,
                               dot64: bool = False) -> ArnoldiSpace:
        """Direct-adjoint composition exp(tau L)* exp(tau L): optimal-gain
        (transient growth) eigenproblem (transient_growth_map,
        core/matvec.f:332-349)."""
        prop = self.linear_propagator(nsteps)
        adj = self.adjoint_propagator(nsteps)
        sp = self.sponge_fun

        def matvec(v):
            w, _ = prop(base_u, sp, v)
            return adj(base_u, sp, w)[0]

        return ArnoldiSpace(matvec=matvec,
                            dot=self.dot64_full if dot64 else self.dot_full)

    # ------------------------------------------------------------------
    # Newton-Krylov base flow (uparam 2.0; core/newton_krylov.f:5-167)
    # ------------------------------------------------------------------
    def newton_base_flow(self, u0, tau: float | None = None,
                         nsteps: int | None = None, tol: float = 1e-9,
                         k_dim: int = 64, maxiter: int = 30,
                         exact_jacobian: bool = True, callback=None,
                         logger=print) -> NewtonResult:
        """Solve Phi_tau(q) - q = 0 for a steady state.

        exact_jacobian=True differentiates the nonlinear propagator with
        jax.jvp (exact Jacobian along the trajectory); False freezes the base
        flow like the reference's newton_linearized_map (core/matvec.f:381-475).
        """
        if nsteps is None:
            nsteps = int(round(tau / self.cfg.dt))
        adv = self.nonlinear_advance(nsteps)
        ctx, case = self.ctx, self.case

        def phi(q):
            st, _ = adv(case, self.initial_state(q))
            return st.u

        def residual(q):
            return phi(q) - q

        chunked = self._can_chunk(nsteps)
        if exact_jacobian:
            # chunked advance: adv is already a composition of jitted chunk
            # executables — re-jitting it would compile the whole nsteps
            # program monolithically (the exact cost chunking avoids), so
            # keep the host-side composition and let jvp trace through the
            # jitted chunks (each chunk's jvp compiles once, cached).
            resid_jit = residual if chunked else self._get(
                ("newton_res", nsteps), lambda: jax.jit(residual))

            def jac_mv(q):
                if chunked:
                    # one jitted jvp-of-chunk executable, shared across all
                    # chunk positions, Newton iterations and sampling
                    # periods (cached under a nsteps-independent key)
                    from .solver.stepper import (NSState, initial_state,
                                                 make_advance_chunk)
                    kw = ({} if self._shard is None
                          else {"shard": self._shard})

                    def build_jvpc():
                        raw = make_advance_chunk(
                            self.ctx, self.cfg, self.mesh.has_outflow, **kw)
                        return jax.jit(lambda cs, st, ts, ab, eb: jax.jvp(
                            lambda s: raw(cs, s, ab, eb)[0], (st,), (ts,)))

                    jvpc = self._get(("advjvpchunk",), build_jvpc)
                    pieces = self._chunk_pieces(nsteps)
                    st0 = initial_state(ctx, q)

                    def mv(v):
                        z2 = jnp.zeros((2,) + v.shape, v.dtype)
                        zcc = jnp.zeros((2, 2) + v.shape[1:], v.dtype)
                        st, ts = st0, NSState(
                            u=v, p=jnp.zeros_like(ctx.bm),
                            ulag=jnp.stack([v, v]), nlag=z2, cclag=zcc)
                        for ab, eb in pieces:
                            st, ts = jvpc(case, st, ts, ab, eb)
                        return ts.u - v

                    return mv
                jvp_fn = self._get(
                    ("newton_jvp", nsteps),
                    lambda: jax.jit(
                        lambda qq, v: jax.jvp(residual, (qq,), (v,))[1]))
                return partial(jvp_fn, q)
        else:
            prop = self.linear_propagator(nsteps)
            sp = self.sponge_fun
            resid_jit = residual if chunked else self._get(
                ("newton_res", nsteps), lambda: jax.jit(residual))

            def jac_mv(q):
                return lambda v: prop(q, sp, v)[0] - v

        return newton_krylov(resid_jit, jac_mv, self.dot_full, u0, tol=tol,
                             maxiter=maxiter, k_dim=k_dim, callback=callback,
                             logger=logger)

    # ------------------------------------------------------------------
    def steady_state_from(self, u_fn) -> jnp.ndarray:
        """Velocity field (2,E,n,n) from a function (x, y) -> (u, v)."""
        x, y = np.asarray(self.ctx.xcoord), np.asarray(self.ctx.ycoord)
        u, v = u_fn(x, y)
        return jnp.asarray(np.stack([np.broadcast_to(u, x.shape),
                                     np.broadcast_to(v, x.shape)]),
                           self.ctx.dtype)
