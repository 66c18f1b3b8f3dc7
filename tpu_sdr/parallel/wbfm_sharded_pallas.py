"""Multi-chip WBFM with the fused Pallas kernel as the per-shard compute.

Same (dp, sp) topology as ``wbfm_sharded`` — stations over ``dp``, time
over ``sp`` with overlap-save halos over ICI — but each shard's heavy
front-end (u8 unpack -> fs/4 rotate -> split-bf16 MXU FIR decimation ->
discriminator) is the single fused Pallas kernel (ops/pallas_fm) instead of
the XLA op chain.  The halos become the kernel's *initial carry state*:

Each shard decodes+rotates only its own trailing samples (a 128-sample
tail, negligible) and builds from them the full ``pallas_fm`` carry block
it would hand a hypothetical next chunk — FIR history in rows 0/1, its own
last decimated output (one 72-tap dot on the tail) in rows 2/3 lane 127.
That *end-of-shard carry* is exactly what the RIGHT neighbor must start
from, so the whole (stations, STATE_ROWS, 128) block ships right in ONE
halo exchange and lands as the neighbor's initial kernel state.  Shard 0
starts from the global streaming carry (zeros + discriminator prev (1, 0),
matching the serial QuadState init).

On a TPU mesh the exchange is the Pallas ``make_async_remote_copy``
neighbor DMA (parallel/pallas_halo — the pod-scale form, SURVEY.md §5);
on CPU test meshes it falls back to the ``lax.ppermute`` halo.  Which one
runs is decided from the mesh's actual devices, not the process default
backend (a TPU-default process can still build CPU fallback meshes).

The audio resampler reuses ``wbfm_sharded.resample_shard`` (global-phase
closed forms, left halos over ICI).

Constraints: ``filter_mode='fir'`` geometry only; the per-shard complex
count must be a multiple of the kernel chunk (spec.chunk_complex = 65280).
Input is the int16 one-sample-per-element view (``pallas_fm.view_u8_as_i16``
layout), produced host-side with a zero-copy numpy view.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_sdr.models.wbfm import WbfmConfig, make_params
from tpu_sdr.ops import pallas_fm
from tpu_sdr.parallel.halo import pull_left_halo
from tpu_sdr.parallel.pallas_halo import pull_left_halo_pallas
from tpu_sdr.parallel.wbfm_sharded import ShardedWbfm, resample_shard

_TAIL = 128  # decoded tail samples per shard (>= L-1 + decim + 1)


def _decode_rotate_tail(d16_tail: jax.Array,
                        host_rotated: bool = False
                        ) -> tuple[jax.Array, jax.Array]:
    """Last ``_TAIL`` int16 samples -> rotated (re, im) at the kernel's x255
    integer scale.  The tail starts at local index n_loc - _TAIL, which is
    0 mod 4 (n_loc and _TAIL are), so the rotation pattern is position%4.

    ``host_rotated``: input bytes were pre-rotated by the host byte map
    (rot_impl='host'), so decoding alone yields the rotated values."""
    v = d16_tail.astype(jnp.int32)
    re = (v & 0xFF).astype(jnp.float32) * 2.0 - 255.0
    im = ((v >> 8) & 0xFF).astype(jnp.float32) * 2.0 - 255.0
    if host_rotated:
        return re, im
    k = jnp.arange(_TAIL, dtype=jnp.int32)[None, :] % 4
    rre = jnp.where(k == 0, re, jnp.where(k == 1, -im, jnp.where(k == 2, -re, im)))
    rim = jnp.where(k == 0, im, jnp.where(k == 1, re, jnp.where(k == 2, -im, -re)))
    return rre, rim


def make_sharded_wbfm_pallas(mesh: Mesh, config: WbfmConfig | None = None,
                             interpret: bool | None = None,
                             halo_impl: str = "auto",
                             chunks_per_step: int | None = None,
                             carry_io: bool = False,
                             rot_impl: str = "broadcast") -> ShardedWbfm:
    """Build the jitted Pallas-front-end sharded chain for ('dp','sp').

    ``interpret``: run the fused kernel under the Pallas interpreter;
    defaults to whether the mesh's devices are NOT TPUs (the default
    backend is irrelevant — the mesh decides where the kernel runs).
    ``halo_impl``: 'auto' (remote DMA on TPU meshes, ppermute otherwise),
    'dma', 'ppermute', or 'none' — 'none' skips the carry exchange
    entirely and seeds every shard from the global edge; it is CORRECT
    ONLY on a 1-shard sp axis (where the left halo IS the edge) and
    exists so the halo-overhead benchmark can difference {dma, none} on
    one chip (benchmarks/bench_halo_overhead.py).
    ``carry_io``: block-to-block streaming.  The jitted fn becomes
    ``fn(x, kernel_edge, rs_edge) -> (audio, counts, kernel_end, rs_end)``
    where ``kernel_edge`` (stations, STATE_ROWS, 128) seeds shard 0's
    kernel state, ``rs_edge`` (stations, T-1) seeds shard 0's resampler
    halo, and the ``*_end`` outputs are the LAST time shard's end-of-block
    values — feed them back as the next block's edges and the sharded
    chain is sample-exact with one serial stream across blocks (the same
    ``(carry, block)`` discipline as every serial streamer; emission
    phase continuity is automatic because shard lengths are multiples of
    ``down``).  Use :func:`initial_carry` for a fresh stream.
    ``rot_impl='host'``: input must be PRE-ROTATED by the host byte map
    (``pallas_fm.host_rotate_fs4_u8`` / the C++ feeder's
    ``tsdr_rotate_fs4_u8``) — the kernel then runs rotation-free with the
    bf16 pre-matmul pipeline, the round-5 production front (-12% and
    -5.5% interleaved A/Bs); ``sharded_wbfm_pallas_apply(..., rotate=
    True)`` applies the byte map for you.
    """
    config = config or WbfmConfig(filter_mode="fir")
    assert config.filter_mode == "fir", "pallas front-end is FIR-mode only"
    assert rot_impl in ("broadcast", "host"), rot_impl
    unpack_impl = "dcfold_bf16" if rot_impl == "host" else "dcfold"
    params = make_params(config)
    spec = (pallas_fm.default_spec(config) if chunks_per_step is None
            else pallas_fm.default_spec(config,
                                        chunks_per_step=chunks_per_step))
    w_hi, w_lo, _v = pallas_fm.make_kernel_params(config)
    L = spec.num_taps
    Lm1 = L - 1
    on_tpu = mesh.devices.flat[0].platform == "tpu"
    if interpret is None:
        interpret = not on_tpu
    assert halo_impl in ("auto", "dma", "ppermute", "none"), halo_impl
    if halo_impl == "none":
        assert mesh.shape["sp"] == 1, (
            "halo_impl='none' (measurement only) is valid only on sp=1")
    use_dma = (on_tpu and not interpret) if halo_impl == "auto" else (
        halo_impl == "dma")

    taps_rev = jnp.asarray(np.asarray(params.decim_taps)[::-1].copy())
    ROWS = pallas_fm.STATE_ROWS
    T = config.resample_taps_per_phase

    def shard_fn(d16_loc, kernel_edge=None, rs_edge=None):
        """d16_loc: int16 (stations_loc, n_loc) — one complex per element."""
        st, n_loc = d16_loc.shape
        assert n_loc % spec.chunk_complex == 0, (
            f"local shard of {n_loc} complex samples must be a multiple of "
            f"the kernel chunk ({spec.chunk_complex})")

        # --- my end-of-shard kernel carry, from the decoded tail ----------
        rre_t, rim_t = _decode_rotate_tail(d16_loc[:, n_loc - _TAIL:],
                                           host_rotated=rot_impl == "host")
        # my last decimated output: window X[m*d - (L-1) .. m*d] ends at
        # local index n_loc - decim, i.e. tail slice [-(L+decim-1+1) ...]
        w0 = _TAIL - spec.decim - Lm1
        end_state = jnp.zeros((st, ROWS, 128), jnp.float32)
        end_state = end_state.at[:, 0, :Lm1].set(rre_t[:, _TAIL - Lm1:])
        end_state = end_state.at[:, 1, :Lm1].set(rim_t[:, _TAIL - Lm1:])
        end_state = end_state.at[:, 2, 127].set(
            rre_t[:, w0:w0 + L] @ taps_rev / 255.0)   # kernel-normalized
        end_state = end_state.at[:, 3, 127].set(
            rim_t[:, w0:w0 + L] @ taps_rev / 255.0)

        # --- one halo exchange ships the whole carry block right ----------
        # Global left edge: the injected streaming carry, or the fresh
        # stream init (zero history, discriminator prev = 1 + 0j).
        if kernel_edge is None:
            edge = jnp.zeros((st, ROWS, 128),
                             jnp.float32).at[:, 2, 127].set(1.0)
        else:
            edge = kernel_edge
        flat = end_state.reshape(-1)
        if halo_impl == "none":
            recv = edge.reshape(-1) + 0.0 * flat[:1]  # keep carry traced
        elif use_dma:
            # Explicit halo_impl="dma" launches the kernel even on a 1-shard
            # sp axis (single-chip proof that the Mosaic remote-copy program
            # compiles/executes); "auto" keeps the vacuous-exchange shortcut.
            recv = pull_left_halo_pallas(flat, flat.shape[0], "sp",
                                         edge.reshape(-1), on_tpu=on_tpu,
                                         force=not on_tpu,
                                         force_kernel=halo_impl == "dma")
        else:
            recv = pull_left_halo(flat, flat.shape[0], "sp", edge.reshape(-1))
        states = recv.reshape(st, ROWS, 128)

        # --- fused kernel over the whole local shard -----------------------
        data = d16_loc.reshape(st, n_loc // spec.chunk_complex, spec.rows,
                               spec.row_width)
        phases = jnp.zeros(st, jnp.int32)  # shard lengths are 0 mod 4
        z, _ = pallas_fm._front_pallas(
            data, phases, states, w_hi, w_lo, spec, "poly6", interpret,
            rot_impl=rot_impl, unpack_impl=unpack_impl)
        demod = z.reshape(st, n_loc // spec.decim)

        if not carry_io:
            return resample_shard(demod, config, params, "sp")
        audio, counts = resample_shard(demod, config, params, "sp",
                                       left_edge=rs_edge)
        # End-of-block carries: the LAST time shard's end state + demod
        # tail, broadcast to every sp rank (psum of a one-hot mask — on
        # real hardware a single tiny all-reduce riding ICI).
        last = (jax.lax.axis_index("sp")
                == mesh.shape["sp"] - 1).astype(jnp.float32)
        kernel_end = jax.lax.psum(end_state * last, "sp")
        rs_end = jax.lax.psum(demod[:, n_loc // spec.decim - (T - 1):]
                              * last, "sp")
        return audio, counts, kernel_end, rs_end

    if carry_io:
        in_specs = (P("dp", "sp"), P("dp", None, None), P("dp", None))
        out_specs = (P("dp", "sp"), P("sp"), P("dp", None, None),
                     P("dp", None))
    else:
        in_specs = P("dp", "sp")
        out_specs = (P("dp", "sp"), P("sp"))
    sharded = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,  # the pallas interpret machinery trips the checker
    )
    fn = jax.jit(sharded)
    return ShardedWbfm(
        mesh=mesh, config=config, fn=fn,
        in_sharding=NamedSharding(mesh, P("dp", "sp")),
    )


def initial_carry(stations: int, config: WbfmConfig | None = None):
    """Fresh-stream ``(kernel_edge, rs_edge)`` for a ``carry_io`` chain:
    zero FIR/resampler history, discriminator prev = 1 + 0j (the serial
    QuadState init)."""
    config = config or WbfmConfig(filter_mode="fir")
    kernel_edge = jnp.zeros((stations, pallas_fm.STATE_ROWS, 128),
                            jnp.float32).at[:, 2, 127].set(1.0)
    rs_edge = jnp.zeros((stations, config.resample_taps_per_phase - 1),
                        jnp.float32)
    return kernel_edge, rs_edge


class ShardedPallasStreamer:
    """Streaming host wrapper around the ``carry_io`` sharded chain: a
    multi-chip receiver with the same ``(carry, block)`` discipline —
    and the same checkpoint surface — as the serial streamers.

    ``demodulate`` consumes (stations, bytes) u8 blocks whose per-shard
    slice is a whole number of kernel chunks, returns the assembled
    audio, and carries the stream across calls (sample-exact with one
    serial stream; see the carry_io tests).  The carry attributes are
    named ``states``/``resamp_hists`` so ``stream.checkpoint``'s generic
    save/load captures a mid-stream receiver unchanged.
    """

    def __init__(self, mesh: Mesh, stations: int,
                 config: WbfmConfig | None = None,
                 rot_impl: str = "host", **chain_kwargs):
        self.config = config or WbfmConfig(filter_mode="fir")
        self.rot_impl = rot_impl
        self.chain = make_sharded_wbfm_pallas(
            mesh, self.config, carry_io=True, rot_impl=rot_impl,
            **chain_kwargs)
        self.states, self.resamp_hists = initial_carry(stations, self.config)
        self._sp = mesh.shape["sp"]

    def demodulate(self, blocks: np.ndarray) -> np.ndarray:
        blocks = np.ascontiguousarray(blocks, dtype=np.uint8)
        if self.rot_impl == "host":
            from tpu_sdr.native import rotate_fs4_u8

            blocks = rotate_fs4_u8(blocks.reshape(-1)).reshape(blocks.shape)
        x = jax.device_put(view_blocks_as_i16(blocks),
                           self.chain.in_sharding)
        audio, counts, self.states, self.resamp_hists = self.chain.fn(
            x, self.states, self.resamp_hists)
        return self.chain.assemble(audio, counts)

    def reset(self) -> None:
        self.states, self.resamp_hists = initial_carry(
            self.states.shape[0], self.config)


def view_blocks_as_i16(blocks: np.ndarray) -> np.ndarray:
    """(stations, bytes) u8 -> (stations, n_complex) int16 zero-copy view."""
    blocks = np.ascontiguousarray(blocks, dtype=np.uint8)
    return blocks.view("<i2")


def sharded_wbfm_pallas_apply(chain: ShardedWbfm, blocks: np.ndarray,
                              rotate: bool = False):
    """Place (stations, bytes) u8 blocks on the mesh and run the chain.

    ``rotate``: apply the host fs/4 byte map first (for chains built with
    ``rot_impl='host'``; row lengths are multiples of 4 samples so one
    flat pass keeps every row's pattern)."""
    if rotate:
        from tpu_sdr.native import rotate_fs4_u8

        blocks = np.ascontiguousarray(blocks, dtype=np.uint8)
        blocks = rotate_fs4_u8(blocks.reshape(-1)).reshape(blocks.shape)
    x = jax.device_put(view_blocks_as_i16(blocks), chain.in_sharding)
    return chain(x)
