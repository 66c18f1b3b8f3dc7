"""Fused PFB channelizer as a Pallas TPU kernel.

The XLA form (tpu_sdr.ops.channelizer.pfb_analyze) lowers the fused
branch-filter + channel-DFT to a multi-channel convolution; this kernel
instead streams raw u8 I/Q straight from HBM and runs the whole analysis in
VMEM: u8 unpack -> overlapping frame windows (sublane rolls, no gathers) ->
two split-precision bfloat16 MXU matmuls against the packed complex
analysis matrix.  HBM traffic is the u8 input once plus the channelized
output.

Math (ref channelizer.pfb_mxu_matrices): with input frames X[m] of width K
and the (rows*K, K) complex analysis matrix M,

    Y[m] = X_win[m] @ M,   X_win[m, t*K + p] = X[m - t, p]

Real arithmetic packs M2 = [M_re | M_im] (rows*K, 2K) so that

    Y_re = (Xw_re @ M2)[:, :K] - (Xw_im @ M2)[:, K:]
    Y_im = (Xw_re @ M2)[:, K:] + (Xw_im @ M2)[:, :K]

— two N=2K matmuls per split-precision term (full MXU lanes for K=64).
The u8 samples x255 are exact 9-bit integers (lossless bf16); the x255 and
u8 centering fold into M2's hi+lo bf16 pair.

Output gain/scaling matches pfb_analyze exactly (tests assert agreement).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_sdr.ops import channelizer as chan


class PallasPfbSpec(NamedTuple):
    num_channels: int      # K (input frame width = total channels)
    branch_rows: int       # taps_per_branch + 1
    frames_per_chunk: int  # C
    # Output channels this kernel instance produces (column slice of the
    # analysis matrix).  < num_channels under channel-parallel sharding:
    # every device frames the full input but computes only its K/n columns.
    local_channels: int | None = None

    @property
    def out_channels(self) -> int:
        return self.local_channels or self.num_channels

    @property
    def chunk_complex(self) -> int:
        return self.frames_per_chunk * self.num_channels

    @property
    def chunk_bytes(self) -> int:
        return 2 * self.chunk_complex

    def validate(self) -> None:
        assert self.num_channels % 2 == 0
        assert 2 * self.out_channels <= 512, "packed lanes beyond one matmul"
        assert self.frames_per_chunk % 8 == 0, "sublane alignment"
        assert self.branch_rows - 1 <= self.frames_per_chunk
        # The kernel's window construction sublane-rolls the (C+H, K)
        # extended block; Mosaic's compiler crashes (remote_compile 500,
        # measured round 3 on v5e at C+H=260) when that height is not a
        # multiple of the 8-row sublane tile.  H = taps_per_branch.
        assert (self.frames_per_chunk + self.branch_rows - 1) % 8 == 0, (
            "taps_per_branch must be a multiple of 8 (Mosaic sublane roll)")


def make_packed_matrices(h_poly: np.ndarray, scale: float = 255.0,
                         channel_slice: slice | None = None):
    """(M2_hi, M2_lo) bf16 pair of the packed [M_re | M_im] analysis matrix,
    folding the x255 integer sample scale.  ``channel_slice`` selects a
    column block (for channel-parallel sharding)."""
    M_re, M_im = chan.pfb_mxu_matrices(h_poly)
    if channel_slice is not None:
        M_re = M_re[:, channel_slice]
        M_im = M_im[:, channel_slice]
    M2 = np.concatenate([M_re, M_im], axis=1).astype(np.float64) / scale
    M2_hi = np.asarray(jnp.asarray(M2, dtype=jnp.bfloat16))
    M2_lo = np.asarray(jnp.asarray(
        M2 - np.asarray(M2_hi, dtype=np.float64), dtype=jnp.bfloat16))
    return jnp.asarray(M2_hi), jnp.asarray(M2_lo)


def _kernel(spec: PallasPfbSpec, data_ref, m2_hi_ref, m2_lo_ref,
            state_in_ref, out_ref, state_out_ref, carry):
    """Grid (nchunks,): carry holds the last rows-1 input frames
    (re rows then im rows), seeded from state_in at chunk 0."""
    K = spec.num_channels
    R = spec.branch_rows
    H = R - 1                     # history frames
    C = spec.frames_per_chunk
    i = pl.program_id(0)
    n_prog = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        carry[:] = state_in_ref[:]

    # u8 unpack (int16 = one complex sample), x255 integer scale
    v = data_ref[0].astype(jnp.int32)  # (C, K)
    re = (v & 0xFF).astype(jnp.float32) * 2.0 - 255.0
    im = ((v >> 8) & 0xFF).astype(jnp.float32) * 2.0 - 255.0

    xe_re = jnp.concatenate([carry[:H], re], axis=0)       # (C+H, K)
    xe_im = jnp.concatenate([carry[H:], im], axis=0)

    def windows(xe):
        # X_win[m, t*K+p] = xe[(m+H) - t, p]; each shifted slice is
        # sublane-rolled back to offset 0 before the lane concat (circular
        # roll, so the negative shift t-H wraps to t-H mod (C+H)).
        parts = [pltpu.roll(xe, (t - H) % (C + H), 0)[:C] for t in range(R)]
        return jnp.concatenate(parts, axis=1)              # (C, R*K)

    xw_re = windows(xe_re).astype(jnp.bfloat16)
    xw_im = windows(xe_im).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    def matmul2(xw):
        return (
            jax.lax.dot_general(xw, m2_hi_ref[:], dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(xw, m2_lo_ref[:], dn,
                                  preferred_element_type=jnp.float32)
        )  # (C, 2K)

    yr = matmul2(xw_re)
    yi = matmul2(xw_im)
    Ko = spec.out_channels
    y_re = yr[:, :Ko] - yi[:, Ko:]
    y_im = yr[:, Ko:] + yi[:, :Ko]
    out_ref[:] = jnp.concatenate([y_re, y_im], axis=1).reshape(1, C, 2 * Ko)

    carry[:H] = pltpu.roll(xe_re, H, 0)[:H]   # last H frames, offset 0
    carry[H:] = pltpu.roll(xe_im, H, 0)[:H]

    @pl.when(i == n_prog - 1)
    def _():
        state_out_ref[:] = carry[:]


def default_spec(num_channels: int = 64, taps_per_branch: int = 8,
                 frames_per_chunk: int = 256) -> PallasPfbSpec:
    spec = PallasPfbSpec(num_channels, taps_per_branch + 1, frames_per_chunk)
    spec.validate()
    return spec


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


@partial(jax.jit, static_argnames=("spec", "interpret"))
def channelize_fused(data_i16: jax.Array, state: jax.Array,
                     m2_hi: jax.Array, m2_lo: jax.Array,
                     spec: PallasPfbSpec, interpret: bool = False):
    """(nchunks, C, K) int16 + (2(R-1), K) carry -> ((nchunks*C, K) re,
    (nchunks*C, K) im, new carry).  Matches channelizer.pfb_analyze on the
    same stream (u8 centered at 127.5, scale 1/127.5... the x255 integer
    scale divides out through M2)."""
    K, C = spec.num_channels, spec.frames_per_chunk
    Ko = spec.out_channels
    H = spec.branch_rows - 1
    nchunks = data_i16.shape[0]
    out, new_state = pl.pallas_call(
        partial(_kernel, spec),
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((1, C, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(m2_hi.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(m2_lo.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * H, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, 2 * Ko), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * H, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nchunks, C, 2 * Ko), jnp.float32),
            jax.ShapeDtypeStruct((2 * H, K), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2 * H, K), jnp.float32)],
        interpret=interpret,
    )(data_i16, m2_hi, m2_lo, state)
    flat = out.reshape(nchunks * C, 2 * Ko)
    return flat[:, :Ko], flat[:, Ko:], new_state


def view_u8_as_i16(buf: np.ndarray, spec: PallasPfbSpec) -> np.ndarray:
    """u8 I/Q block -> (nchunks, C, K) int16 frames (zero-copy view)."""
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    assert buf.size % spec.chunk_bytes == 0
    return buf.view("<i2").reshape(-1, spec.frames_per_chunk,
                                   spec.num_channels)


class PallasPfbStreamer:
    """Streaming host wrapper mirroring the XLA channelizer's PfbState.

    Output scale matches ``pfb_analyze`` fed with samples in the normalized
    (u8 - 127.5)/127.5 convention: the kernel's x255 integer samples divide
    back out through M2 = M/255 (255 * x_norm @ M/255 == x_norm @ M).
    """

    def __init__(self, num_channels: int = 64, taps_per_branch: int = 8,
                 frames_per_chunk: int = 256, interpret: bool | None = None):
        self.spec = default_spec(num_channels, taps_per_branch,
                                 frames_per_chunk)
        self.h_poly = chan.design_pfb(num_channels, taps_per_branch)
        self.m2_hi, self.m2_lo = make_packed_matrices(self.h_poly)
        self.interpret = _interpret_default() if interpret is None else interpret
        H = self.spec.branch_rows - 1
        self.state = jnp.zeros((2 * H, num_channels), jnp.float32)
        self._pending = np.zeros(0, dtype=np.uint8)

    def channelize(self, buf: np.ndarray):
        data = np.concatenate([self._pending, np.asarray(buf, np.uint8)])
        usable = len(data) - (len(data) % self.spec.chunk_bytes)
        self._pending = data[usable:]
        if usable == 0:
            K = self.spec.num_channels
            z = np.zeros((0, K), np.float32)
            return z, z
        d16 = view_u8_as_i16(data[:usable], self.spec)
        y_re, y_im, self.state = channelize_fused(
            jnp.asarray(d16), self.state, self.m2_hi, self.m2_lo, self.spec,
            interpret=self.interpret)
        return np.asarray(y_re), np.asarray(y_im)
