"""Element-sharded SPMD execution over a device mesh (GSPMD).

TPU-native replacement for the reference's MPI domain decomposition
(SURVEY.md §2.4): spectral elements are block-sharded over a 1D device mesh
axis 'e' with `jax.sharding.NamedSharding`, and the XLA SPMD partitioner
inserts the collectives — the gather-scatter assembly (segment-sum into the
global dof vector, ops/gather_scatter.py) becomes the ICI communication, the
global dof vectors replicate, and everything element-local stays local. The
solver code is IDENTICAL to single-device (the scaling-book recipe: pick a
mesh, annotate shardings, let XLA partition) — where the reference needs
gslib+MPI plumbing (core/utils.f:391-405).

`jax.shard_map` was evaluated for a hand-scheduled variant but jax 0.9's
VMA checking has no rule for `custom_linear_solve` (our transposable CG),
so the explicit-collective path is deferred; GSPMD handles correctness and
lets `jax.linear_transpose` (the exact discrete adjoint) work unchanged.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import (Mesh as DeviceMesh, NamedSharding,
                          PartitionSpec as P)

from ..config import NSConfig
from ..driver import FlowSystem
from ..mesh import Mesh2D
from ..ops.context import SemContext
from ..solver.stepper import CaseFields, NSState


def make_device_mesh(ndev: int | None = None, axis: str = "e") -> DeviceMesh:
    devs = jax.devices()
    if ndev is None:
        ndev = len(devs)
    return DeviceMesh(np.array(devs[:ndev]), (axis,))


def context_specs(ctx: SemContext, axis: str = "e") -> SemContext:
    """SemContext-shaped pytree of PartitionSpecs: element-dim arrays sharded
    over `axis`, assembled global vectors and 1D operators replicated."""
    e3 = P(axis)            # (E, n, n) and (E, ...) leading-element arrays
    c4 = P(None, axis)      # (2, E, n, n)
    rep = P()
    return SemContext(
        n=ctx.n, nelem=ctx.nelem, nglobal=ctx.nglobal, axis_name=None,
        D=rep, rx=e3, ry=e3, sx=e3, sy=e3, jac=e3, bm=e3, bm_assembled=e3,
        g11=e3, g12=e3, g22=e3, diag_a=e3, mask_vel=c4, mask_p=e3,
        multinv=e3, maskg_vel=rep, maskg_p=rep, diag_ag=rep, bmg=rep,
        xcoord=e3, ycoord=e3, bm_eig=e3, gid=e3,
        gid_flat=P(axis), gs_idx=rep,
        p_schwarz=None if ctx.p_schwarz is None else e3,
        # deflation basis: element-sharded in local layout (m, E, n, n),
        # replicated in the global-dof fallback layout (m, G)
        p_defl_z=None if ctx.p_defl_z is None
        else (P(None, axis) if ctx.p_defl_z.ndim == 4 else rep),
        p_defl_c=None if ctx.p_defl_c is None else rep,
        # vertex coarse: small embed matrix + global vertex tables + dense
        # NV x NV inverse, all replicated (corner slot values cross shards
        # through the qsum gather, which GSPMD lowers to one small gather)
        p_vfem=None if ctx.p_vfem is None else (rep, rep, rep, rep),
        # overlap-Schwarz patch inverses (E, P, P): element-sharded; the
        # halo exchange rides the same dssum collectives as everything else
        p_oschwarz=None if ctx.p_oschwarz is None else e3,
        gs2_plan=ctx.gs2_plan,
        gs2_rv=None if ctx.gs2_rv is None else (rep, rep),
        jd=None if ctx.jd is None else rep,
        wd=None if ctx.wd is None else rep,
        dmet=None if ctx.dmet is None else c4,
        axdiag=None if ctx.axdiag is None else e3,
        rinv=None if ctx.rinv is None else e3,
        bm_adj=None if ctx.bm_adj is None else e3,
        bwn=c4)


def case_specs(axis: str = "e") -> CaseFields:
    return CaseFields(u_bc=P(None, axis), f=P(None, axis), sponge=P(axis),
                      sponge_ref=P(None, axis))


def state_specs(axis: str = "e") -> NSState:
    lag = P(None, None, axis)
    return NSState(u=P(None, axis), p=P(axis), ulag=lag, nlag=lag, cclag=lag)


def vel_spec(axis: str = "e") -> P:
    return P(None, axis)


def _put(tree, spec_tree, dmesh):
    def put(x, s):
        return jax.device_put(x, NamedSharding(dmesh, s))

    return jax.tree.map(put, tree, spec_tree)


class ShardedFlowSystem(FlowSystem):
    """FlowSystem whose arrays are element-sharded over a device mesh; the
    XLA SPMD partitioner distributes every propagator automatically.

    Requires mesh.nelem % ndev == 0 (block element partition)."""

    def __init__(self, mesh: Mesh2D, cfg: NSConfig, case, *, ndev: int,
                 axis: str = "e", **kw):
        if mesh.nelem % ndev != 0:
            raise ValueError(f"nelem={mesh.nelem} not divisible by ndev={ndev}")
        self.axis = axis
        self.dmesh = make_device_mesh(ndev, axis)
        super().__init__(mesh, cfg, case, axis_name=None, **kw)
        self._cspecs = context_specs(self.ctx, axis)
        self.ctx = _put(self.ctx, self._cspecs, self.dmesh)
        import dataclasses as _dc
        self.ctx = _dc.replace(self.ctx, shard_hint=(self.dmesh, axis))
        # assert the element sharding on scan carries / Floquet orbit slices
        # every step: without it GSPMD's propagation drifts inside the CG
        # while-loops and falls back to full rematerialization on small
        # tensors (the MULTICHIP_r02/r03 warning tails)
        to_ns = lambda tree: jax.tree.map(
            lambda s: NamedSharding(self.dmesh, s), tree,
            is_leaf=lambda x: isinstance(x, P))
        self._shard = (to_ns(state_specs(axis)),
                       NamedSharding(self.dmesh, vel_spec(axis)))
        self.sponge_fun = jax.device_put(
            self.sponge_fun, NamedSharding(self.dmesh, P(axis)))
        self.case = self._case  # re-run the sharding setter

    # -- placement helpers -------------------------------------------------
    def shard_state(self, state: NSState) -> NSState:
        return _put(state, state_specs(self.axis), self.dmesh)

    def shard_vel(self, u):
        return jax.device_put(u, NamedSharding(self.dmesh,
                                               vel_spec(self.axis)))

    @property
    def case(self):
        return self._case

    @case.setter
    def case(self, value):
        # models assign sys.case after construction; keep it sharded
        if value is not None and hasattr(self, "dmesh"):
            value = _put(value, case_specs(self.axis), self.dmesh)
        self._case = value
