"""Pod-scale halo exchange as a Pallas remote-DMA kernel.

``halo.pull_left_halo`` uses ``lax.ppermute``, which is the right tool at
small scale but synchronizes through XLA's collective scheduler.  At pod
scale the kernel-level form — ``pltpu.make_async_remote_copy`` straight
over ICI with per-neighbor semaphores — lets the halo ride the interconnect
while the compute kernel keeps running (SURVEY.md §5; the same neighbor-
permute pattern ring collectives use).

``pull_left_halo_pallas`` is a drop-in replacement for
``halo.pull_left_halo`` inside ``shard_map``: every shard sends its trailing
``halo`` samples to its RIGHT neighbor (non-circular), so each shard
receives its LEFT neighbor's tail — the overlap-save halo of streaming
FIR/discriminator stages.  Shard 0 receives ``left_edge`` (the global
streaming carry) or zeros.

The kernel addresses its neighbor with the dict/MESH ``device_id`` form
(``{axis_name: my_id + 1}``), so it works on multi-axis meshes — other mesh
axes implicitly keep their own index, making the exchange non-circular
*within* each row of e.g. a (dp, sp) mesh.

Falls back to the ppermute implementation when the mesh devices cannot run
the Mosaic kernel (CPU test meshes).  Whether the mesh is TPU-backed must be
decided by the *caller* from the actual mesh devices (``on_tpu=``) — the
default backend is only a last-resort guess and is wrong for CPU fallback
meshes created while a TPU backend is default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_sdr.parallel import halo as _halo


def _halo_kernel(axis_name: str, tail_ref, out_ref, send_sem, recv_sem):
    """Send my tail to my right neighbor; receive from my left.

    Grid-less single-step kernel run under shard_map.  Edge shards: the
    rightmost shard sends nothing, shard 0 waits on nothing (its output is
    overwritten by the caller with ``left_edge``).
    """
    my_id = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)

    # Zero the output first so shard 0 (no left neighbor) is deterministic.
    out_ref[:] = jnp.zeros_like(out_ref)

    copy = pltpu.make_async_remote_copy(
        src_ref=tail_ref,
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        # Dict form: unnamed mesh axes keep their own index, so on a
        # (dp, sp) mesh the shift stays within each dp row.
        device_id={axis_name: my_id + 1},
        device_id_type=pltpu.DeviceIdType.MESH,
    )

    @pl.when(my_id < n - 1)
    def _():
        copy.start()
        copy.wait_send()

    @pl.when(my_id > 0)
    def _():
        copy.wait_recv()


def _collective_params(axis_name: str, collective_id: int):
    """Mosaic wants a collective_id (barrier) only for true multi-device
    launches; a 1-shard axis must leave it unset."""
    multi = lax.axis_size(axis_name) > 1  # static mesh extent
    return pltpu.CompilerParams(
        has_side_effects=True,
        collective_id=collective_id if multi else None)


def _pull_left_halo_remote_dma(x: jax.Array, halo: int, axis_name: str,
                               interpret=False):
    tail = x[x.shape[0] - halo:].reshape(1, halo)
    try:
        out_shape = jax.ShapeDtypeStruct((1, halo), x.dtype,
                                         vma=frozenset({axis_name}))
    except TypeError:  # older JAX without vma tracking
        out_shape = jax.ShapeDtypeStruct((1, halo), x.dtype)
    out = pl.pallas_call(
        partial(_halo_kernel, axis_name),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=_collective_params(axis_name, 13),
        interpret=interpret,
    )(tail)
    return out.reshape(halo)


def pull_left_halo_pallas(x: jax.Array, halo: int, axis_name: str,
                          left_edge: jax.Array | None = None,
                          on_tpu: bool | None = None,
                          force: bool = False,
                          force_kernel: bool = False) -> jax.Array:
    """Left-neighbor tail via Pallas remote DMA (ppermute fallback off-TPU).

    Must be called inside ``shard_map`` over ``axis_name``.  Semantics match
    :func:`tpu_sdr.parallel.halo.pull_left_halo`.

    ``on_tpu`` says whether the *mesh the caller shard_maps over* is made of
    TPU devices; pass it explicitly (e.g. ``mesh.devices.flat[0].platform ==
    'tpu'``).  When None, falls back to inspecting the default backend —
    which can be wrong for CPU fallback meshes under a TPU-default process.
    ``force=True`` runs the kernel even off-TPU (under the Pallas TPU
    interpreter; used by tests).  ``force_kernel=True`` launches the kernel
    even on a 1-shard axis (where the exchange is vacuous and normally
    short-circuited to zeros) so single-chip environments still compile and
    execute the Mosaic remote-copy program.
    """
    if on_tpu is None:
        on_tpu = jax.default_backend() == "tpu"
    if not force and not on_tpu:
        return _halo.pull_left_halo(x, halo, axis_name, left_edge)
    n_shards = lax.axis_size(axis_name)
    if n_shards == 1 and not force_kernel:
        received = jnp.zeros((halo,), x.dtype)
    else:
        received = _pull_left_halo_remote_dma(
            x, halo, axis_name,
            interpret=False if on_tpu else pltpu.InterpretParams())
    if left_edge is not None:
        idx = lax.axis_index(axis_name)
        received = jnp.where(idx == 0, left_edge, received)
    return received


def _ring_kernel(axis_name: str, src_ref, out_ref, send_sem, recv_sem):
    """Circular neighbor shift: every shard sends to (me + 1) % n and
    receives from its left neighbor.  Unlike the halo kernel, every shard
    both sends and receives, so the DMA fires even on a 1-shard axis (a
    remote copy addressed to self — the degenerate ring)."""
    my_id = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    copy = pltpu.make_async_remote_copy(
        src_ref=src_ref,
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id={axis_name: (my_id + 1) % n},
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    copy.start()
    copy.wait_send()
    copy.wait_recv()


def ring_shift_pallas(x: jax.Array, axis_name: str,
                      interpret=False) -> jax.Array:
    """Circular shard shift via remote DMA: shard i's ``x`` lands on shard
    ``(i + 1) % n`` (each shard returns its LEFT neighbor's data, wrapping).

    Must be called inside ``shard_map`` over ``axis_name``.  Equivalent to
    ``lax.ppermute(x, axis_name, [(i, (i+1) % n) ...])`` but expressed as a
    Mosaic ``make_async_remote_copy`` over ICI.  On a 1-shard axis the ring
    degenerates to a DMA self-copy (out == x) — the single-chip smoke the
    TPU hardware tier uses to prove the remote-copy program compiles and
    the DMA engine executes it.
    """
    flat = x.reshape(1, -1)
    try:
        out_shape = jax.ShapeDtypeStruct(flat.shape, flat.dtype,
                                         vma=frozenset({axis_name}))
    except TypeError:  # older JAX without vma tracking
        out_shape = jax.ShapeDtypeStruct(flat.shape, flat.dtype)
    out = pl.pallas_call(
        partial(_ring_kernel, axis_name),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=_collective_params(axis_name, 14),
        interpret=interpret,
    )(flat)
    return out.reshape(x.shape)
