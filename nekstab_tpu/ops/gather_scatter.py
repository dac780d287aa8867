"""Direct-stiffness summation (gather-scatter) and global reductions.

TPU-native replacement for Nek5000's gslib `dssum/dsavg` and the global
reduction wrappers `glsum/glsc3` the reference uses everywhere
(core/utils.f:391-405, core/krylov_subspace.f:37-44). Implementation:
segment-sum into the global dof vector (XLA scatter-add) and gather back;
under `shard_map` (elements sharded over `ctx.axis_name`) the global vector is
psum'd over ICI, which is both the assembly and the halo exchange in one
collective. All ops are linear, so `jax.linear_transpose` of the propagator
transposes them correctly (scatter <-> gather are mutual transposes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .context import SemContext
from .gslib import qcopy, qsum


def _assemble_global(ctx: SemContext, u: jnp.ndarray) -> jnp.ndarray:
    """Sum duplicated dofs into the global vector; u is (..., E, n, n).
    Gather-only (ops/gslib.py) — no XLA scatter in forward or transpose."""
    lead = u.shape[:-3]
    flat = u.reshape(lead + (-1,))
    g = qsum(flat, ctx.gs_idx, ctx.gid_flat)
    if ctx.axis_name is not None:
        g = lax.psum(g, ctx.axis_name)
        # re-mark as device-varying so downstream mixes with sharded arrays
        # satisfy shard_map's VMA checking (the value is in fact replicated)
        g = lax.pvary(g, ctx.axis_name)
    return g


def assemble(ctx: SemContext, u: jnp.ndarray) -> jnp.ndarray:
    """Assemble local functionals into the global dof vector (..., nglobal):
    the Q^T (scatter-add) half of direct stiffness. Transpose of `scatter`."""
    return _assemble_global(ctx, u)


def scatter(ctx: SemContext, g: jnp.ndarray) -> jnp.ndarray:
    """Gather a global dof vector back to element-local layout (..., E, n, n):
    the Q (copy) half of direct stiffness. Transpose of `assemble`."""
    loc = qcopy(g, ctx.gs_idx, ctx.gid_flat)
    return loc.reshape(g.shape[:-1] + ctx.bm.shape[-3:])


def _shard_anchor(ctx: SemContext, x: jnp.ndarray) -> jnp.ndarray:
    """Re-assert the element-block sharding on a local field (..., E, n, n)
    under GSPMD (no-op otherwise): the slice-exchange dssum's seam slices
    otherwise make SPMD propagation flip-flop inside CG while-loops and fall
    back to full rematerialization (MULTICHIP_r02/r03 warning tails)."""
    if ctx.shard_hint is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec
    dmesh, ax = ctx.shard_hint
    spec = PartitionSpec(*((None,) * (x.ndim - 3)), ax, None, None)
    return lax.with_sharding_constraint(x, NamedSharding(dmesh, spec))


def dssum(ctx: SemContext, u: jnp.ndarray) -> jnp.ndarray:
    """Direct-stiffness sum: duplicated dofs receive the sum over all copies.
    Uses the structured slice-exchange path (ops/gslib2.py) when the mesh has
    block metadata — no XLA gathers — else the index-table fallback."""
    if ctx.gs2_plan is not None:
        from .gslib2 import dssum2
        return _shard_anchor(ctx, dssum2(_shard_anchor(ctx, u),
                                         ctx.gs2_plan, ctx.gs2_rv,
                                         shard_hint=ctx.shard_hint))
    return scatter(ctx, _assemble_global(ctx, u))


def halo_rows(ctx: SemContext, u: jnp.ndarray) -> jnp.ndarray:
    """Width-one halo exchange: (..., E, n, n) -> (..., E, 4, n-2) holding
    each side neighbour's edge-adjacent interior row (corner nodes excluded;
    0 at physical boundaries). Side order matches
    ops/precond.build_halo_gids: 0 = i- , 1 = i+, 2 = j-, 3 = j+.

    Implemented entirely through `dssum` (no new topology code): every
    element writes its own interior row onto the shared edge, the
    direct-stiffness sum combines the two copies, and subtracting the own
    contribution leaves exactly the neighbour's row. Edge-interior dofs have
    multiplicity <= 2 on a conforming quad mesh, so the subtraction is
    exact; strip ends (vertex dofs, multiplicity > 2) are excluded."""
    z = jnp.zeros_like(u)
    z = z.at[..., 0, 1:-1].set(u[..., 1, 1:-1])
    z = z.at[..., -1, 1:-1].set(u[..., -2, 1:-1])
    z = z.at[..., 1:-1, 0].set(u[..., 1:-1, 1])
    z = z.at[..., 1:-1, -1].set(u[..., 1:-1, -2])
    h = dssum(ctx, z) - z
    return jnp.stack([h[..., 0, 1:-1], h[..., -1, 1:-1],
                      h[..., 1:-1, 0], h[..., 1:-1, -1]], axis=-2)


def halo_rows_t(ctx: SemContext, h: jnp.ndarray) -> jnp.ndarray:
    """Exact transpose of `halo_rows`: (..., E, 4, n-2) -> (..., E, n, n).
    Scatters halo-strip functionals back into the neighbour rows they were
    read from (the R_e^T of overlapping Schwarz)."""
    n = ctx.n
    shp = h.shape[:-2] + (n, n)
    w = jnp.zeros(shp, h.dtype)
    w = w.at[..., 0, 1:-1].set(h[..., 0, :])
    w = w.at[..., -1, 1:-1].set(h[..., 1, :])
    w = w.at[..., 1:-1, 0].set(h[..., 2, :])
    w = w.at[..., 1:-1, -1].set(h[..., 3, :])
    s = dssum(ctx, w) - w
    z = jnp.zeros(shp, h.dtype)
    # all .add: the write targets overlap pairwise at the four (1,1)-type
    # near-corner nodes, which source two different edge strips
    z = z.at[..., 1, 1:-1].add(s[..., 0, 1:-1])
    z = z.at[..., -2, 1:-1].add(s[..., -1, 1:-1])
    z = z.at[..., 1:-1, 1].add(s[..., 1:-1, 0])
    z = z.at[..., 1:-1, -2].add(s[..., 1:-1, -1])
    return z


def dsavg(ctx: SemContext, u: jnp.ndarray) -> jnp.ndarray:
    """Average duplicated dofs (multiplicity-weighted), cf. Nek dsavg."""
    return dssum(ctx, u) * ctx.multinv


def glsum(ctx: SemContext, u: jnp.ndarray) -> jnp.ndarray:
    """Global sum of all (local) entries across devices."""
    s = jnp.sum(u)
    if ctx.axis_name is not None:
        s = lax.psum(s, ctx.axis_name)
    return s


def glmax(ctx: SemContext, u: jnp.ndarray) -> jnp.ndarray:
    """Global max of all (local) entries across devices (reference glmax)."""
    s = jnp.max(u)
    if ctx.axis_name is not None:
        s = lax.pmax(s, ctx.axis_name)
    return s


def glmin(ctx: SemContext, u: jnp.ndarray) -> jnp.ndarray:
    """Global min (reference glmin)."""
    s = jnp.min(u)
    if ctx.axis_name is not None:
        s = lax.pmin(s, ctx.axis_name)
    return s


def glsc3(ctx: SemContext, a: jnp.ndarray, w: jnp.ndarray,
          b: jnp.ndarray) -> jnp.ndarray:
    """Weighted global dot sum(a * w * b) — the reference's glsc3. With w the
    unassembled mass bm there is no double counting at shared dofs: each copy
    carries only its own element's quadrature weight."""
    return glsum(ctx, a * w * b)
