"""Seed-vector generators for Arnoldi/power iterations.

Reference: add_noise / add_symmetric_seed, core/utils.f:345-455 — there a
hash-based pseudo-random field, face-averaged with dssum and Dirichlet-masked.
Here: numpy Generator noise, made C0-continuous with dsavg and masked, which
serves the same purpose (a reproducible, BC-compatible broadband seed).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.context import SemContext
from ..ops.gather_scatter import dsavg


def add_noise(ctx: SemContext, seed: int = 1234, amp: float = 1.0):
    """Continuous, Dirichlet-masked random velocity perturbation (2, E, n, n)."""
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=ctx.mask_vel.shape), ctx.dtype)
    return amp * ctx.mask_vel * dsavg(ctx, u)


def symmetric_seed(ctx: SemContext, axis_y: float = 0.0, seed: int = 1234,
                   amp: float = 1.0, antisymmetric: bool = False):
    """Seed with enforced (anti)symmetry about the line y = axis_y
    (reference add_symmetric_seed, core/utils.f:410-455): the field is made an
    even/odd function of (y - axis_y) per component, so Arnoldi stays in one
    symmetry subspace. u is mirrored evenly and v oddly for 'symmetric'
    perturbations (swap for antisymmetric)."""
    rng = np.random.default_rng(seed)
    x = np.asarray(ctx.xcoord)
    y = np.asarray(ctx.ycoord) - axis_y
    # smooth deterministic function of |y| and x => automatically symmetric
    c = rng.normal(size=(4, 2))
    base_even = np.cos(c[0, 0] * x) * np.cos(c[0, 1] * np.abs(y)) \
        + 0.5 * np.sin(c[1, 0] * x) * np.cos(c[1, 1] * y * y)
    base_odd = np.sin(c[2, 0] * x) * y * np.cos(c[2, 1] * np.abs(y)) \
        + 0.3 * np.cos(c[3, 0] * x) * y
    if antisymmetric:
        u = np.stack([base_odd, base_even])
    else:
        u = np.stack([base_even, base_odd])
    return amp * ctx.mask_vel * dsavg(ctx, jnp.asarray(u, ctx.dtype))
