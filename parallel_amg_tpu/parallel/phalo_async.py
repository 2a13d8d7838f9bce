"""Guaranteed comm/compute-overlap halo SpMV via Pallas async remote DMA.

This is the guaranteed-overlap variant of ``ShardedStencil.matvec``
(SURVEY.md §2.6 "Point-to-point" row; BASELINE.json:5 "ghost-row/halo vector
exchange ... overlapped with on-diagonal compute").  The XLA path in
``pstencil.py`` merely *permits* overlap (boundary-correction formulation
leaves the scheduler free to hide the ``ppermute``); this kernel *enforces*
it by construction:

    1. neighbor barrier (`pltpu.get_barrier_semaphore`)
    2. START async remote copies of the h boundary planes to both
       neighbors (`pltpu.make_async_remote_copy`, ICI RDMA)
    3. compute the ENTIRE interior stencil contribution   <-- overlap window
    4. WAIT on the DMA recv semaphores
    5. apply the O(h·surface) boundary corrections that consume the halos

The DMA engines run step 2's transfers concurrently with step 3's vector
compute *by hardware construction* — no scheduler heuristics involved.  The
reference stack achieves the same with MPI_Isend/Irecv + local SpMV + Wait
(PartitionedArrays' Exchanger; SURVEY.md §2.6).

Correctness is validated against the ppermute path on the 8-device CPU mesh
using the Pallas TPU *interpret* machine (``pltpu.InterpretParams``), which
simulates multi-device remote DMAs + semaphores (and can detect races).

Whole-slab kernel: the local slab, weights, and halos live in VMEM, so this
path covers slabs up to ~VMEM/3 bytes (≈ 256³/8-shard 3D problems in f32).
The XLA path remains the default and handles arbitrary sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from parallel_amg_tpu.parallel.mesh import ROW_AXIS
from parallel_amg_tpu.parallel.pstencil import ShardedStencil


def _interior_stencil(W, xl, offsets, h):
    """Interior contribution: stencil apply with zero halo on axis 0."""
    nd = xl.ndim
    pads = [(h, h)] + [
        (max(0, -min(o[i] for o in offsets)),
         max(0, max(o[i] for o in offsets)))
        for i in range(1, nd)
    ]
    xp = jnp.pad(xl, pads)
    y = jnp.zeros_like(xl)
    local = xl.shape
    for d, off in enumerate(offsets):
        start = (h + off[0],) + tuple(pads[i][0] + off[i] for i in range(1, nd))
        y = y + W[d] * jax.lax.dynamic_slice(xp, start, local)
    return y, pads


def _boundary_correction(y, W, lhalo, rhalo, offsets, pads, h, m0, rest):
    """Add the boundary-row terms that read neighbor halo planes."""
    lp = jnp.pad(lhalo, [(0, 0)] + pads[1:])
    rp = jnp.pad(rhalo, [(0, 0)] + pads[1:])
    for d, off in enumerate(offsets):
        o0 = off[0]
        if o0 == 0:
            continue
        sub = tuple(
            slice(pads[i][0] + off[i], pads[i][0] + off[i] + rest[i - 1])
            for i in range(1, len(offsets[0]))
        )
        if o0 < 0:
            L = -o0
            src = lp[(slice(h + o0, h),) + sub]
            y = y.at[:L].add(W[d][:L] * src)
        else:
            src = rp[(slice(0, o0),) + sub]
            y = y.at[m0 - o0:].add(W[d][m0 - o0:] * src)
    return y


def _halo_matvec_kernel(
    W_ref, xl_ref, y_ref, lhalo_ref, rhalo_ref, send_sem, recv_sem,
    *, offsets, h, S,
):
    my = jax.lax.axis_index(ROW_AXIS)
    m0 = xl_ref.shape[0]
    rest = tuple(xl_ref.shape[1:])
    has_left = my > 0
    has_right = my < S - 1

    # -- 1. barrier with the neighbors that will RDMA into our scratch ----
    barrier = pltpu.get_barrier_semaphore()
    n_neighbors = jnp.int32(0)

    @pl.when(has_left)
    def _():
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=my - 1,
            device_id_type=pltpu.DeviceIdType.LOGICAL)

    @pl.when(has_right)
    def _():
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=my + 1,
            device_id_type=pltpu.DeviceIdType.LOGICAL)

    n_neighbors = has_left.astype(jnp.int32) + has_right.astype(jnp.int32)
    pltpu.semaphore_wait(barrier, n_neighbors)

    # -- 2. START the halo RDMAs (sem slot 0: rightward copy -> their
    #       lhalo; slot 1: leftward copy -> their rhalo) ------------------
    rdma_r = pltpu.make_async_remote_copy(
        src_ref=xl_ref.at[pl.ds(m0 - h, h)],
        dst_ref=lhalo_ref,
        send_sem=send_sem.at[0],
        recv_sem=recv_sem.at[0],
        device_id=my + 1,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma_l = pltpu.make_async_remote_copy(
        src_ref=xl_ref.at[pl.ds(0, h)],
        dst_ref=rhalo_ref,
        send_sem=send_sem.at[1],
        recv_sem=recv_sem.at[1],
        device_id=my - 1,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )

    @pl.when(has_right)
    def _():
        rdma_r.start()

    @pl.when(has_left)
    def _():
        rdma_l.start()

    # edge shards receive nothing: their halo is the zero Dirichlet ghost
    @pl.when(jnp.logical_not(has_left))
    def _():
        lhalo_ref[...] = jnp.zeros((h,) + rest, y_ref.dtype)

    @pl.when(jnp.logical_not(has_right))
    def _():
        rhalo_ref[...] = jnp.zeros((h,) + rest, y_ref.dtype)

    # -- 3. interior stencil — the DMA engines stream the halos over ICI
    #       while the VPU does this bulk O(m0·rest) work ------------------
    W = W_ref[...]
    y, pads = _interior_stencil(W, xl_ref[...], offsets, h)

    # -- 4. wait for halo arrival (and drain our own sends).  SPMD slot
    #       algebra: my recv_sem[0] is signaled by my LEFT neighbor's
    #       rightward copy (it runs the same rdma_r), so waiting "data
    #       from the left" is rdma_r.wait_recv(), and vice versa. --------
    @pl.when(has_left)
    def _():
        rdma_l.wait_send()     # our leftward send drained
        rdma_r.wait_recv()     # left neighbor's planes landed in lhalo

    @pl.when(has_right)
    def _():
        rdma_r.wait_send()
        rdma_l.wait_recv()     # right neighbor's planes landed in rhalo

    # -- 5. boundary corrections ------------------------------------------
    y_ref[...] = _boundary_correction(
        y, W, lhalo_ref[...], rhalo_ref[...], offsets, pads, h, m0, rest)


def async_halo_matvec(A, x, *, interpret=None):
    """y = A @ x with the guaranteed-overlap Pallas halo kernel.

    A: ShardedStencil; x: globally-sharded grid array (axis 0 on 'rows').
    ``interpret``: None = auto (interpret machine on the CPU mesh, compiled
    Mosaic on TPU); True/False or an ``InterpretParams`` to force.  The
    interpret machine simulates multi-device remote DMA + semaphores and
    can detect races.
    """
    offsets = A.offsets
    h = A.halo
    S = A.mesh.devices.size
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m0 = A.dims[0] // S
    if h == 0 or S == 1 or m0 <= h:
        # No exchange to overlap, or the halo spans the whole neighbor slab
        # (m0 <= h trips a pallas whole-ref-slice tracing bug and leaves no
        # interior to overlap with anyway) — use the plain XLA stencil path.
        return ShardedStencil.matvec(A.with_halo_mode("xla"), x)
    dims = A.dims
    rest = tuple(dims[1:])

    kern = functools.partial(
        _halo_matvec_kernel, offsets=offsets, h=h, S=S)

    def per_shard(W, xl):
        if interpret is True:
            interp = pltpu.InterpretParams(dma_execution_mode="eager")
        else:
            interp = interpret  # False or a caller-supplied InterpretParams
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(xl.shape, xl.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((h,) + rest, xl.dtype),   # left halo landing zone
                pltpu.VMEM((h,) + rest, xl.dtype),   # right halo landing zone
                pltpu.SemaphoreType.DMA((2,)),        # send sems
                pltpu.SemaphoreType.DMA((2,)),        # recv sems
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                collective_id=7,
            ),
            interpret=interp,
        )(W, xl)

    return jax.shard_map(
        per_shard,
        mesh=A.mesh,
        in_specs=(P(None, ROW_AXIS), P(ROW_AXIS)),
        out_specs=P(ROW_AXIS),
        check_vma=False,
    )(A.weights, x)
