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
                                         ctx.gs2_plan, ctx.gs2_rv))
    return scatter(ctx, _assemble_global(ctx, u))


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
