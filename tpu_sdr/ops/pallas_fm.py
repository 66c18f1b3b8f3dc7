"""Fused WBFM demodulation front-end as a Pallas TPU kernel.

The XLA chain (tpu_sdr.models.wbfm) materializes the banded-matmul frames
and every inter-stage array in HBM.  This kernel runs the bandwidth- and
FLOP-dominant part of the receive chain — u8 unpack -> fs/4 rotate ->
banded MXU FIR decimation (split-precision bfloat16) -> quadrature
discriminator — inside VMEM, one time-chunk per grid step, with the
streaming carries (FIR history, discriminator previous sample) living in
VMEM scratch across the sequential TPU grid.  HBM traffic is the u8 input
once plus the 6x-decimated discriminator output; Pallas double-buffers the
input DMA against compute automatically.  The final audio resampler stays
in XLA as the aligned frame matmul (tpu_sdr.ops.fm.aligned_resample,
round-4 tuned: HIGH precision + 4-frame N-lane packing + row-view
windows); a Pallas version exists (resamp_impl='pallas') but measured no
faster — the epilogue is MXU-pass-bound, not materialization-bound
(NEXT.md).  Non-default kernel variants (prev_impl='matmul',
z_impl='i16', rot_impl='select', unpack_impl='scale'/'dcfold_bf16',
atan_mode variants) are measured negative-or-neutral results kept
available and equivalence-tested.

Chain semantics mirror the reference ``simple_fm`` data plane
(/root/reference/examples/simple_fm.rs:256-426) in the FIR-quality form;
tests assert >=80 dB agreement with the f32 XLA chain.

Geometry (defaults): decim d=6, taps L=72, one chunk = 128*down*d = 65280
complex samples = 130560 bytes, emitting 128*down decimated samples;
requires gcd(down, 128) == 1 (so blocks stay resampler-aligned), L-1 <=
128*d, T-1 <= down.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_sdr.ops import fm as F


class PallasWbfmSpec(NamedTuple):
    """Static geometry for the fused kernel."""

    decim: int
    num_taps: int
    up: int
    down: int
    taps_per_phase: int  # resampler T
    # Chunks folded into one grid step: multiplies the matmul M dimension
    # (2*down*chunks_per_step rows) and divides the per-step overhead.
    chunks_per_step: int = 1

    @property
    def m_chunk(self) -> int:  # decimated samples per grid step
        return 128 * self.down * self.chunks_per_step

    @property
    def chunk_complex(self) -> int:
        return self.m_chunk * self.decim

    @property
    def chunk_bytes(self) -> int:
        return 2 * self.chunk_complex

    @property
    def rows(self) -> int:  # frame rows per grid step
        return self.down * self.chunks_per_step

    @property
    def row_width(self) -> int:  # complex samples per frame row
        return 128 * self.decim

    @property
    def audio_per_chunk(self) -> int:
        return 128 * self.up * self.chunks_per_step

    def validate(self) -> None:
        assert math.gcd(self.down, 128) == 1, "down must be coprime with 128"
        assert self.num_taps - 1 <= self.row_width, "FIR history exceeds one row"
        assert self.taps_per_phase - 1 <= self.down, "resampler history exceeds down"


# Minimax polynomial for atan(t) = t * P(t^2) on t in [0,1]; max abs error
# 3e-9 (below f32 resolution).  Mosaic has no atan2 primitive, so the kernel
# evaluates this range-reduced polynomial on the VPU instead.
_ATAN_COEFFS = (
    9.9999999977e-01, -3.3333315712e-01, 1.9999061227e-01, -1.4269564759e-01,
    1.0978886061e-01, -8.4776801616e-02, 5.9162933141e-02, -3.2315759306e-02,
    1.1493400941e-02, -1.9162792005e-03,
)


# 6-term equioscillating fit of atan(t)/t over t in [0, 1]: max error
# 9.9e-6 rad (~107 dB vs exact — comfortably past the 80 dB kernel floor)
# for 4 fewer VPU Horner steps than the f32-accurate 10-term ladder.
# Default since round 3: an interleaved on-chip A/B (benchmarks/ab_kernel,
# 6 reps, spread <1%) measured poly6 3.2% faster than the 10-term ladder
# and, combined with the broadcast rotation, 6.5% overall
# (0.248 -> 0.232 ms/block).
_ATAN6_COEFFS = (
    9.9999125472e-01, -3.3295015732e-01, 1.9558953030e-01, -1.2155903309e-01,
    5.8200158710e-02, -1.3883453812e-02,
)


def _atan2_poly(y: jax.Array, x: jax.Array,
                coeffs: tuple = _ATAN_COEFFS,
                rcp: bool = False) -> jax.Array:
    """Full-quadrant atan2 from the reduced polynomial (f32-accurate).

    ``rcp``: replace the range-reduction divide with the VPU's approx
    reciprocal plus one Newton step (~2^-24 relative — above the poly's
    own 1e-5 error floor) — a candidate for fewer VPU passes than the
    exact divide."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    den = jnp.where(hi == 0, 1.0, hi)
    if rcp:
        r0 = pl.reciprocal(den, approx=True)
        r = r0 * (2.0 - den * r0)  # one Newton-Raphson refinement
        t = lo * r
    else:
        t = lo / den
    s = t * t
    p = jnp.float32(coeffs[-1])
    for c in coeffs[-2::-1]:
        p = p * s + jnp.float32(c)
    r = p * t
    r = jnp.where(ay > ax, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, jnp.float32(np.pi) - r, r)
    r = jnp.where(y < 0, -r, r)
    return jnp.where((x == 0) & (y == 0), 0.0, r)


# Kernel carry: one (4, 128) f32 array.
#   row 0: FIR history re (L-1 entries), row 1: FIR history im,
#   row 2/3: the previous chunk's last decimated row (re/im) — only lane
#   127 (the discriminator's previous sample) is meaningful, but carrying
#   the whole row keeps every kernel access a vector op (Mosaic supports
#   neither scalar VMEM stores nor two-axis broadcasts).
STATE_ROWS = 4


def pack_state(state, spec: PallasWbfmSpec) -> jax.Array:
    """WbfmState -> (4, 128) f32 kernel carry (FIR history in x255 scale)."""
    Lm1 = spec.num_taps - 1
    s = jnp.zeros((STATE_ROWS, 128), jnp.float32)
    s = s.at[0, :Lm1].set(state.fir.hist_re * 255.0)
    s = s.at[1, :Lm1].set(state.fir.hist_im * 255.0)
    s = s.at[2, 127].set(state.quad.pre_re)
    s = s.at[3, 127].set(state.quad.pre_im)
    return s


def unpack_state(s: jax.Array, rot_phase, resamp_state, spec: PallasWbfmSpec):
    """(4, 128) carry (+ rotator phase, resampler state) -> WbfmState."""
    from tpu_sdr.models import wbfm as M

    Lm1 = spec.num_taps - 1
    return M.WbfmState(
        F.RotatorState(rot_phase),
        F.FirState(s[0, :Lm1] / 255.0, s[1, :Lm1] / 255.0),
        F.QuadState(s[2, 127], s[3, 127]),
        resamp_state,
        F.boxcar_resample_init(),
        F.deemph_init(),
    )


def _kernel(spec: PallasWbfmSpec, atan_mode: str, rot_impl: str,
            unpack_impl: str, prev_impl: str, z_impl: str, phase_ref,
            data_ref, w_hi_ref, w_lo_ref, corr_ref, state_in_ref, z_ref,
            state_out_ref, carry):
    """Grid (stations, chunks): chunks iterate innermost (sequentially on
    TPU), so the VMEM carry streams within a station and re-seeds from
    ``state_in`` when a new station's chunk 0 arrives.

    ``prev_impl='matmul'`` computes the discriminator's one-sample-delayed
    operand ``b`` as a second banded matmul (weights ``[W_y | W_prev]``
    stacked to 256 columns, same two MXU dots) instead of the VPU
    roll/concat/select shuffle of ``'shift'`` — trading ~6 full-width VPU
    ops for a wider (cheap) MXU pass.  Frames carry ``L-1+d`` history
    columns so the delayed window of the chunk's first sample is complete;
    the extra ``d`` history lanes ride the spare carry lanes
    ``[L-1, L-1+d)`` (external (4,128) state contract unchanged — packers
    that leave them zero only affect the seeded element (0,0), which the
    ``i==0`` patch recomputes from carry rows 2/3 like 'shift' mode).
    """
    d = spec.decim
    L = spec.num_taps
    Lm1 = L - 1
    prev_mm = prev_impl == "matmul"
    H = Lm1 + d if prev_mm else Lm1   # frame history columns
    rows = spec.rows              # 85
    width = spec.row_width        # 768
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_prog = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        carry[:] = state_in_ref[0]

    # ---- u8 unpack: one int16 = one complex sample (I low byte, Q high
    # byte, little-endian), so no lane interleaving is needed ----
    dc = unpack_impl in ("dcfold", "dcfold_bf16")
    # dcfold_bf16 runs the whole pre-matmul pipeline in bf16: raw bytes
    # (0..255) are exact, and the +-1/0 rotation only selects/negates —
    # it never ADDS two nonzero terms — so every intermediate stays an
    # exact <=8-bit integer.  Packed bf16 doubles VPU elementwise
    # throughput and the frames need no final cast.
    cdtype = jnp.bfloat16 if unpack_impl == "dcfold_bf16" else jnp.float32

    v = data_ref[0, 0].astype(jnp.int32)  # (rows, width)
    if dc:
        # DC-fold: rotate the RAW byte values (0..255) and fold the
        # x2-255 normalization through the linear FIR — the matmul output
        # is corrected as y = 2*y_raw - corr[phase], where corr is the
        # (tiny, precomputed) response of the decimator to the rotated
        # -255 DC pattern.  Saves 4 full-width VPU ops per chunk.
        assert rot_impl in ("broadcast", "host"), (
            "dcfold requires broadcast (or host pre-) rotation")
        re = (v & 0xFF).astype(cdtype)
        im = ((v >> 8) & 0xFF).astype(cdtype)
    else:
        # x255 scale (2u - 255: exact 9-bit integers)
        re = (v & 0xFF).astype(jnp.float32) * 2.0 - 255.0
        im = ((v >> 8) & 0xFF).astype(jnp.float32) * 2.0 - 255.0

    # ---- fs/4 rotation: multiply sample k by j**(k+phase); width % 4 == 0
    # so the pattern depends only on the column ----
    if rot_impl == "host":
        # Input bytes were pre-rotated ON THE HOST (the reference's own
        # placement, simple_fm.rs:276-334: negation is the byte complement
        # 255-u, so the rotation is a pure byte map — SIMD-trivial in the
        # C++ feeder, off the device's critical path).  The kernel's
        # full-width rotation ops vanish; in dcfold mode the DC pattern
        # collapses to the CONSTANT 255 (every lane is "phase 0"), so the
        # correction is phase-independent too.
        rre, rim = re, im
    elif rot_impl == "broadcast":
        # Build the +-1/0 cos/sin rows once at (1, width) and rotate by
        # broadcast multiply: the select work shrinks by the row count and
        # the full-size ops become 4 mults + 2 adds.
        kcol = (jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
                + phase_ref[b]) % 4
        cosr = jnp.where(kcol == 0, 1.0,
                         jnp.where(kcol == 2, -1.0, 0.0)).astype(re.dtype)
        sinr = jnp.where(kcol == 1, 1.0,
                         jnp.where(kcol == 3, -1.0, 0.0)).astype(re.dtype)
        rre = re * cosr - im * sinr
        rim = im * cosr + re * sinr
    else:
        kmod = (jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
                + phase_ref[b]) % 4
        rre = jnp.where(kmod == 0, re,
                        jnp.where(kmod == 1, -im,
                                  jnp.where(kmod == 2, -re, im)))
        rim = jnp.where(kmod == 0, im,
                        jnp.where(kmod == 1, re,
                                  jnp.where(kmod == 2, -im, -re)))

    # ---- banded MXU FIR decimation (split bf16) ----
    # frame r covers x[r*width - H : r*width + 128*d - d], i.e. [last H of
    # row r-1 | row r[: 128*d - d + 1]]; samples (x255 scale or raw
    # rotated bytes) are exact <=9-bit integers, so the bf16 cast of the
    # data is lossless.  H = L-1 ('shift') or L-1+d ('matmul': the
    # delayed window of the chunk's first sample needs d more history).
    row_len = 128 * d - d + 1 + H  # 834 shift / 840 matmul

    def hist_asc(c_row):
        # Carry lanes [0, L-1) hold samples -(L-1)..-1 (the external
        # contract); 'matmul' parks the deep d samples -(H)..-L in spare
        # lanes [L-1, H).  Reassemble ascending-time order for the frame.
        if not prev_mm:
            return c_row[0:1, :Lm1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        asc = jnp.where(lane < d, pltpu.roll(c_row, 128 - Lm1, 1),
                        pltpu.roll(c_row, d, 1))
        return asc[0:1, :H]

    def fir_store_row(asc128):
        # Inverse of hist_asc: ascending (1, 128) tail row (lanes >= H
        # don't-care) -> contract layout (lanes >= H again don't-care).
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        return jnp.where(lane < Lm1, pltpu.roll(asc128, 128 - d, 1),
                         pltpu.roll(asc128, Lm1, 1))

    def frames_of(x, hist_row, tail):
        # left column block = [history | tails of rows 0..r-2], all at lane
        # offset 0 — Mosaic cannot concatenate operands whose lane offsets
        # differ, so tails are pre-rolled to offset 0 by the caller.
        left = jnp.concatenate([hist_row, tail[:-1]], axis=0)
        return jnp.concatenate([left, x[:, : row_len - H]], axis=1)

    if dc:
        # The carry keeps FIR history in the x255 scale (external
        # semantics unchanged); convert to/from the raw rotated space at
        # the seam.  History/tail lane k sits at frame column k, i.e.
        # sample index k - H: one +-1 DC pattern serves the inbound
        # conversion, the outbound tail store, and the tail rotation.
        # Raw-space values are exact <=8-bit integers, so every cdtype
        # cast is lossless.
        # Patterns built (1, 128) wide; lanes >= H are don't-care (they
        # pair with don't-care tail lanes in 'matmul' mode).
        if rot_impl == "host":
            # pre-rotated input: x = 2u - 255 uniformly, no phase pattern
            ones = jnp.ones((1, 128), jnp.float32)
            cos_t, sin_t = ones, jnp.zeros((1, 128), jnp.float32)
            p_re = p_im = ones * 255.0
        else:
            kt = (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                  + (4 - H % 4) + phase_ref[b]) % 4
            cos_t = jnp.where(kt == 0, 1.0, jnp.where(kt == 2, -1.0, 0.0))
            sin_t = jnp.where(kt == 1, 1.0, jnp.where(kt == 3, -1.0, 0.0))
            p_re = (cos_t - sin_t) * 255.0
            p_im = (cos_t + sin_t) * 255.0
        hist_re = ((hist_asc(carry[0:1, :]) + p_re[:, :H]) * 0.5
                   ).astype(cdtype)
        hist_im = ((hist_asc(carry[1:2, :]) + p_im[:, :H]) * 0.5
                   ).astype(cdtype)
        # Tails from ONE 32-bit roll of the packed source (Mosaic has no
        # 16-bit roll, and this replaces the two full-width f32 rolls):
        # unpack + rotate only the (rows, H) tail slice.
        tail_vf = pltpu.roll(v, H, 1)
        tail_v = tail_vf[:, :H]
        t_re = (tail_v & 0xFF).astype(cdtype)
        t_im = ((tail_v >> 8) & 0xFF).astype(cdtype)
        if rot_impl == "host":
            tail_re, tail_im = t_re, t_im
        else:
            cos_tc = cos_t[:, :H].astype(cdtype)
            sin_tc = sin_t[:, :H].astype(cdtype)
            tail_re = t_re * cos_tc - t_im * sin_tc
            tail_im = t_im * cos_tc + t_re * sin_tc
    else:
        hist_re = hist_asc(carry[0:1, :])
        hist_im = hist_asc(carry[1:2, :])
        # tail[r] = x[r, width-H:], lane-rolled to offset 0
        tail_re = pltpu.roll(rre, H, 1)[:, :H]
        tail_im = pltpu.roll(rim, H, 1)[:, :H]

    if prev_mm:
        # (1, 128) ascending last-tail row for fir_store_row (no lane
        # concat: a sublane-offset slice cannot feed a Mosaic concat);
        # lanes >= H are don't-care.
        if dc:
            nf_v = pltpu.roll(tail_vf, 1, 0)[0:1, :128]
            nr = (nf_v & 0xFF).astype(jnp.float32)
            ni = ((nf_v >> 8) & 0xFF).astype(jnp.float32)
            cf = cos_t.astype(jnp.float32)
            sf = sin_t.astype(jnp.float32)
            new_fir_re = (nr * cf - ni * sf) * 2.0 - p_re
            new_fir_im = (ni * cf + nr * sf) * 2.0 - p_im
        else:
            new_fir_re = pltpu.roll(pltpu.roll(rre, H, 1), 1, 0)[0:1, :128]
            new_fir_im = pltpu.roll(pltpu.roll(rim, H, 1), 1, 0)[0:1, :128]
    else:
        new_fir_re = tail_re[rows - 1:rows]
        new_fir_im = tail_im[rows - 1:rows]
    fr = frames_of(rre, hist_re, tail_re)
    fi = frames_of(rim, hist_im, tail_im)
    frames = jnp.concatenate([fr, fi], axis=0)
    if frames.dtype != jnp.bfloat16:
        frames = frames.astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    def banded_dot(whi, wlo):
        return (
            jax.lax.dot_general(frames, whi, dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(frames, wlo, dn,
                                  preferred_element_type=jnp.float32)
        )  # (2*rows, 128); element [r*128+c] is decimated sample r*128+c

    if prev_mm:
        y = banded_dot(w_hi_ref[0], w_lo_ref[0])
        bm = banded_dot(w_hi_ref[1], w_lo_ref[1])
        b_re, b_im = bm[:rows], bm[rows:]
    else:
        y = banded_dot(w_hi_ref[:], w_lo_ref[:])
    y_re = y[:rows]
    y_im = y[rows:]
    if dc:
        # y_true = 2*y_raw - corr[phase]; corr rows 0-3 are the re
        # correction per phase, 4-7 the im correction (8-15: the W_prev
        # half's corrections in 'matmul' mode).
        p = phase_ref[b]

        def corr_sel(base):
            if rot_impl == "host":
                # phase-independent constant correction (all 4 phase rows
                # of corr are identical): no selects
                return corr_ref[base:base + 1], corr_ref[base + 4:base + 5]
            cr = corr_ref[base:base + 1]
            ci = corr_ref[base + 4:base + 5]
            for k in range(1, 4):
                cr = jnp.where(p == k, corr_ref[base + k:base + k + 1], cr)
                ci = jnp.where(p == k,
                               corr_ref[base + 4 + k:base + 5 + k], ci)
            return cr, ci

        corr_re, corr_im = corr_sel(0)
        y_re = 2.0 * y_re - corr_re
        y_im = 2.0 * y_im - corr_im
        if prev_mm:
            corr_bre, corr_bim = corr_sel(8)
            b_re = 2.0 * b_re - corr_bre
            b_im = 2.0 * b_im - corr_bim
        else:
            # ('matmul' already produced new_fir in the x255 scale above)
            new_fir_re = (2.0 * new_fir_re.astype(jnp.float32)
                          - p_re[:, :H])
            new_fir_im = (2.0 * new_fir_im.astype(jnp.float32)
                          - p_im[:, :H])

    # ---- quadrature discriminator: angle(x[k] * conj(x[k-1])) / pi ----
    def angle(ci, cr):
        if atan_mode == "fast":
            return F.fast_atan2_f32(ci, cr)
        if atan_mode == "poly6":
            return _atan2_poly(ci, cr, _ATAN6_COEFFS)
        if atan_mode == "poly6_rcp":
            return _atan2_poly(ci, cr, _ATAN6_COEFFS, rcp=True)
        return _atan2_poly(ci, cr)

    if not prev_mm:
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)

        def shift_one(x, prev_row):
            # prev of flat element r*128+c: x[r, c-1] for c>0, else the
            # lane-127 element of the row above (row above of row 0 = the
            # carried last row).
            rolled = pltpu.roll(x, 1, 1)
            ycat = jnp.concatenate([prev_row, x], axis=0)    # (rows+1, 128)
            col_prev = pltpu.roll(ycat, 1, 1)[:rows, 0:1]    # = ycat[r,127]
            return jnp.where(col == 0, col_prev, rolled)

        b_re = shift_one(y_re, carry[2:3, :])
        b_im = shift_one(y_im, carry[3:4, :])
    c_re = y_re * b_re + y_im * b_im
    c_im = y_im * b_re - y_re * b_im
    ang = angle(c_im, c_re)
    if z_impl == "i16":
        # z in [-1, 1] stored as Q15 fixed point: HALVES the kernel's
        # dominant HBM write (and the epilogue's read); quantization
        # 2^-15 of full scale ≈ 90+ dB — above the chain's 80 dB floor.
        # The resampler folds the 1/32767 back into V.
        zq = jnp.round(ang * jnp.float32(32767.0 / np.pi))
        z_ref[:] = zq.astype(jnp.int16).reshape(1, 1, rows, 128)
    else:
        z_ref[:] = (ang * jnp.float32(1.0 / np.pi)).reshape(1, 1, rows, 128)

    if prev_mm:
        # The matmul b of the launch's FIRST element came from the deep
        # history lanes, which external packers may leave unknown (zero);
        # recompute it against the carried previous sample (rows 2/3 lane
        # 127 — the same source 'shift' mode uses) and patch one lane.
        @pl.when(i == 0)
        def _():
            b0_re = carry[2:3, 127:128]
            b0_im = carry[3:4, 127:128]
            y0_re = y_re[0:1, 0:1]
            y0_im = y_im[0:1, 0:1]
            c0_re = y0_re * b0_re + y0_im * b0_im
            c0_im = y0_im * b0_re - y0_re * b0_im
            a0 = angle(c0_im, c0_re)
            if z_impl == "i16":
                a0 = jnp.round(a0 * jnp.float32(32767.0 / np.pi)
                               ).astype(jnp.int16)
            else:
                a0 = a0 * jnp.float32(1.0 / np.pi)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            z_ref[0, 0, 0:1, :] = jnp.where(
                lane == 0, jnp.broadcast_to(a0, (1, 128)),
                z_ref[0, 0, 0:1, :])

    # ---- update carries (2-D vector stores; Mosaic rejects scalar stores
    # to VMEM) ----
    if prev_mm:
        carry[0:1, :] = fir_store_row(new_fir_re)
        carry[1:2, :] = fir_store_row(new_fir_im)
    else:
        carry[0:1, :Lm1] = new_fir_re
        carry[1:2, :Lm1] = new_fir_im
    carry[2:3, :] = y_re[rows - 1:rows, :]
    carry[3:4, :] = y_im[rows - 1:rows, :]

    @pl.when(i == n_prog - 1)
    def _():
        state_out_ref[0] = carry[:]


def default_spec(config=None, chunks_per_step: int = 1) -> PallasWbfmSpec:
    """Spec from a WbfmConfig (defaults to the standard broadcast chain)."""
    if config is None:
        from tpu_sdr.models import wbfm as M

        config = M.WbfmConfig(filter_mode="fir")
    spec = PallasWbfmSpec(
        decim=config.decim,
        num_taps=config.decim * config.fir_taps_per_phase,
        up=config.resample_up,
        down=config.resample_down,
        taps_per_phase=config.resample_taps_per_phase,
        chunks_per_step=chunks_per_step,
    )
    spec.validate()
    return spec


def make_kernel_params(config=None, prev_impl: str = "shift",
                       frames_per_row: int = 4):
    """(W_hi, W_lo, V) device arrays for the fused chain.

    ``prev_impl='matmul'``: the weight pair is the stacked ``[W_y |
    W_prev]`` (row_len+decim, 256) banded matrix — column block 0 is the
    decimator shifted down ``decim`` rows (frames carry ``decim`` extra
    history columns), block 1 the same band one decimated sample earlier,
    so ONE dot emits both the FIR output and its one-sample delay.

    ``frames_per_row`` packs that many resampler frames per matmul row
    (N = frames_per_row*up MXU lanes).  It tightens the per-call block
    contract of demodulate_fused/_batch to multiples of
    ``down*frames_per_row`` discriminator samples; the kernel's own
    chunks (rows*128 = 32*340 z samples) always satisfy the default 4.
    External callers with custom chunk geometry that is only a multiple
    of ``down`` should pass ``frames_per_row=1``."""
    from tpu_sdr.models import wbfm as M
    from tpu_sdr.utils import firdes

    if config is None:
        config = M.WbfmConfig(filter_mode="fir")
    taps = firdes.decimating_lowpass(
        config.decim, taps_per_phase=config.fir_taps_per_phase,
        cutoff_frac=config.fir_cutoff_frac)
    W = F.make_banded_decim_matrix(taps, config.decim)
    if prev_impl == "matmul":
        d = config.decim
        row_len = W.shape[0] + d
        Wd = np.zeros((2, row_len, W.shape[1]), W.dtype)
        Wd[0, d:, :] = W                 # y: window ends at c*d
        Wd[1, : W.shape[0], :] = W       # b: one decimated sample earlier
        W = Wd
    W_hi, W_lo = F.make_split_bf16(W)  # folds the x255 sample scale
    h = firdes.resampler_taps(
        config.resample_up, config.resample_down,
        taps_per_phase=config.resample_taps_per_phase,
        cutoff_frac=config.resample_cutoff_frac)
    h_poly = F.make_polyphase(h, config.resample_up)
    # 4 frames per matmul row: N = 4*up = 64 MXU lanes instead of 16.
    # Interleaved on-chip A/B (round 4): 0.218 -> 0.182 ms/block whole
    # path (-16%); F=8/16 measured no further gain.  Kernel chunks are
    # always a multiple of 128*down samples, so the span constraint
    # (down*4) is free here (the generic XLA chain keeps F=1: its
    # streamer quantum only guarantees multiples of down).
    V = jnp.asarray(F.make_aligned_poly_matrix(
        h_poly, config.resample_up, config.resample_down,
        frames_per_row=frames_per_row))
    return W_hi, W_lo, V


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _dc_corr(w_hi: jax.Array, w_lo: jax.Array,
             spec: PallasWbfmSpec, prev_impl: str = "shift",
             host_rot: bool = False) -> jax.Array:
    """(8, 128) — or (16, 128) for ``prev_impl='matmul'`` (rows 8-15: the
    W_prev half's correction) — decimator response to the rotated -255 DC
    pattern, per fs/4 phase (rows 0-3: re frames, 4-7: im frames) — the
    correction the ``dcfold`` unpack subtracts after the matmul.  Computed
    in-graph from the traced split weights (one tiny constant matmul,
    fused by XLA).

    ``host_rot``: input bytes are pre-rotated on the host, so the DC
    pattern is the constant -255 on every column of both channels — all
    four phase rows come out identical (the kernel then skips its phase
    selects)."""
    prev_mm = prev_impl == "matmul"
    H = spec.num_taps - 1 + (spec.decim if prev_mm else 0)
    row_len = 128 * spec.decim - spec.decim + 1 + H
    assert w_hi.shape[-2] == row_len, (w_hi.shape, row_len)
    j = np.arange(row_len)
    rows_re, rows_im = [], []
    for phase in range(4):
        if host_rot:
            cos = np.ones(row_len)
            sin = np.zeros(row_len)
        else:
            kmod = (j - H + phase) % 4  # frame col j holds sample j - H
            cos = np.where(kmod == 0, 1.0, np.where(kmod == 2, -1.0, 0.0))
            sin = np.where(kmod == 1, 1.0, np.where(kmod == 3, -1.0, 0.0))
        rows_re.append(cos - sin)
        rows_im.append(cos + sin)
    P = jnp.asarray(np.stack(rows_re + rows_im) * 255.0, jnp.float32)
    W = w_hi.astype(jnp.float32) + w_lo.astype(jnp.float32)
    # HIGHEST: on TPU a default-precision f32 matmul runs as bf16 MXU
    # passes; the quantized correction then poisons the 2*y_raw - corr
    # cancellation (measured 41 dB vs >=100 dB, round 3 hardware tier).
    hp = jax.lax.Precision.HIGHEST
    if prev_mm:
        return jnp.concatenate(
            [jnp.matmul(P, W[0], precision=hp),
             jnp.matmul(P, W[1], precision=hp)], axis=0)
    return jnp.matmul(P, W, precision=hp)


def _front_pallas(data_i16, phase, states, w_hi, w_lo, spec, atan_mode,
                  interpret, rot_impl="broadcast", unpack_impl="dcfold",
                  prev_impl="shift", z_impl="f32"):
    """The Pallas front-end: (stations, nchunks, rows, width) int16 ->
    discriminator output z (stations, nchunks, rows, 128) + new carries."""
    rows, width = spec.rows, spec.row_width
    stations, nchunks = data_i16.shape[0], data_i16.shape[1]
    if (rot_impl not in ("broadcast", "host")
            and unpack_impl in ("dcfold", "dcfold_bf16")):
        # dcfold structurally requires the broadcast (or host pre-)
        # rotation — the DC correction is derived from the sign pattern;
        # callers selecting rot_impl="select" alone get the equivalent
        # 'scale' unpack instead of a kernel assert mid-trace.
        unpack_impl = "scale"
    if prev_impl == "matmul":
        assert w_hi.ndim == 3 and w_hi.shape[0] == 2, (
            "prev_impl='matmul' needs the stacked [W_y, W_prev] weights "
            "(make_kernel_params(prev_impl='matmul'))")
        w_spec = pl.BlockSpec((2, w_hi.shape[1], 128), lambda b, i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        corr_rows = 16
    else:
        assert w_hi.ndim == 2, (w_hi.shape, prev_impl)
        w_spec = pl.BlockSpec((w_hi.shape[0], 128), lambda b, i: (0, 0),
                              memory_space=pltpu.VMEM)
        corr_rows = 8
    if unpack_impl in ("dcfold", "dcfold_bf16"):
        corr = _dc_corr(w_hi, w_lo, spec, prev_impl,
                        host_rot=rot_impl == "host")
    else:
        corr = jnp.zeros((corr_rows, 128), jnp.float32)
    z_dtype = jnp.int16 if z_impl == "i16" else jnp.float32
    return pl.pallas_call(
        partial(_kernel, spec, atan_mode, rot_impl, unpack_impl, prev_impl,
                z_impl),
        grid=(stations, nchunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-station phases
            pl.BlockSpec((1, 1, rows, width), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            w_spec,
            pl.BlockSpec((corr_rows, 128), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, STATE_ROWS, 128), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, rows, 128), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, STATE_ROWS, 128), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((stations, nchunks, rows, 128), z_dtype),
            jax.ShapeDtypeStruct((stations, STATE_ROWS, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((STATE_ROWS, 128), jnp.float32)],
        interpret=interpret,
    )(phase, data_i16, w_hi, w_lo, corr, states)


@partial(jax.jit,
         static_argnames=("spec", "atan_mode", "interpret", "rot_impl",
                          "unpack_impl", "prev_impl", "resamp_impl",
                          "z_impl"))
def demodulate_fused(data_i16: jax.Array, phase: jax.Array,
                     state: jax.Array, resamp_hist: jax.Array,
                     w_hi: jax.Array, w_lo: jax.Array, v: jax.Array,
                     spec: PallasWbfmSpec, atan_mode: str = "poly6",
                     interpret: bool = False, rot_impl: str = "broadcast",
                     unpack_impl: str = "dcfold", prev_impl: str = "shift",
                     resamp_impl: str = "xla", z_impl: str = "f32"):
    """Fused kernel + XLA resampler over a whole block (one station).

    Defaults (round-3 on-chip A/B, benchmarks/ab_kernel): ``poly6`` atan
    (~107 dB of the 10-term ladder, 3.2% faster) + ``broadcast`` rotation
    (bit-identical to ``select``, 4.0% faster).

    ``data_i16``: (nchunks, rows, width) int16 view of the u8 I/Q block
    (see :func:`view_u8_as_i16`).  ``phase``: (1,) int32 fs/4 rotator phase
    of the first sample.  ``state``: (4, 128) f32 kernel carry
    (:func:`pack_state`); ``resamp_hist``: (T-1,) f32 resampler history.
    Returns (audio (nchunks*128*up,), new_state, new_resamp_hist).

    Block contract: the per-call discriminator sample count
    (nchunks*rows*128) must divide by ``down * frames_per_row`` of the
    ``v`` built by :func:`make_kernel_params` (default packing 4; the
    resampler asserts this at trace time).  Standard kernel chunks
    (rows=32 -> 4096 z/chunk) satisfy it for any ``down`` <= 1024.
    """
    z, new_states = _front_pallas(
        data_i16[None], phase, state[None], w_hi, w_lo, spec, atan_mode,
        interpret, rot_impl, unpack_impl, prev_impl, z_impl)
    if z_impl == "i16":
        # Q15 z: fold the 1/32767 into V (tiny trace-time op) and let the
        # i16->f32 cast fuse into the frame construction; the resampler
        # history stays f32 (the cast of 47 samples is free).
        v = v * jnp.float32(1.0 / 32767.0)
        z = z.astype(jnp.float32)
    if resamp_impl == "pallas":
        audio, new_hist = pallas_resample(
            z.reshape(-1), v, spec.up, spec.down, resamp_hist, interpret)
        return audio, new_states[0], new_hist
    audio, rs = F.aligned_resample(
        z.reshape(-1), v, spec.up, spec.down,
        F.AlignedResampleState(resamp_hist))
    return audio, new_states[0], rs.hist


@partial(jax.jit, static_argnames=("spec", "atan_mode", "interpret",
                                   "unpack_impl", "rot_impl"))
def demodulate_fused_batch(data_i16: jax.Array, phases: jax.Array,
                           states: jax.Array, resamp_hists: jax.Array,
                           w_hi: jax.Array, w_lo: jax.Array, v: jax.Array,
                           spec: PallasWbfmSpec, atan_mode: str = "poly6",
                           interpret: bool = False,
                           unpack_impl: str = "dcfold",
                           rot_impl: str = "broadcast"):
    """Multi-station fused chain: one kernel launch demodulates every
    station (grid = stations x chunks — the in-chip DP axis of
    wbfm_batched, BASELINE.json config #2).

    ``data_i16``: (stations, nchunks, rows, width) int16; ``phases``:
    (stations,) int32; ``states``: (stations, 4, 128); ``resamp_hists``:
    (stations, T-1).  Returns (audio (stations, nchunks*128*up), new_states,
    new_resamp_hists).
    """
    z, new_states = _front_pallas(
        data_i16, phases, states, w_hi, w_lo, spec, atan_mode, interpret,
        rot_impl=rot_impl, unpack_impl=unpack_impl)
    stations = data_i16.shape[0]

    def resample_one(zb, hist):
        audio, rs = F.aligned_resample(
            zb.reshape(-1), v, spec.up, spec.down,
            F.AlignedResampleState(hist))
        return audio, rs.hist

    audio, hists = jax.vmap(resample_one)(z, resamp_hists)
    return audio.reshape(stations, -1), new_states, hists


def _resample_kernel(vh_ref, vl_ref, left_ref, base_ref, out_ref):
    """One grid step: (RB, T-1) left halos + (RB, down) frame bodies ->
    (RB, up) audio.  Frames are built by a VMEM lane-concat (both inputs
    at lane offset 0); the matmul runs a manual 3-pass split-bf16
    (fh@vh + fh@vl + fl@vh, ~2^-18 relative ≈ 108 dB — Mosaic's only
    alternatives are DEFAULT's single pass at ~48 dB or HIGHEST's six),
    with no HBM frame materialization."""
    frames = jnp.concatenate([left_ref[:], base_ref[:]], axis=1)
    fh = frames.astype(jnp.bfloat16)
    fl = (frames - fh.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    out_ref[:] = (
        jax.lax.dot_general(fh, vh_ref[:], dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(fh, vl_ref[:], dn,
                              preferred_element_type=jnp.float32)
        + jax.lax.dot_general(fl, vh_ref[:], dn,
                              preferred_element_type=jnp.float32))


def pallas_resample(x: jax.Array, v: jax.Array, up: int, down: int,
                    hist: jax.Array, interpret: bool = False,
                    rows_per_step: int = 1024):
    """Pallas polyphase resampler: drop-in for ``F.aligned_resample`` on
    the fused path.  ``x`` flat f32 (multiple of ``down``); returns
    (audio (len(x)//down*up,), new_hist).

    The XLA frame matmul costs ~38% of the whole fused path (round-4
    measurement: 0.232 vs 0.142 ms/block kernel-only): HIGHEST-precision
    (6-pass) MXU plus an HBM-materialized (R, down+T-1) frame tensor.
    Here frames are assembled in VMEM per grid step and the matmul runs
    3-pass f32 (HIGH, ~f32-accurate); HBM traffic drops to the two row
    views + audio."""
    F_ = v.shape[1] // up  # frames packed per row (see make_aligned_poly_matrix)
    span = down * F_
    out_w = up * F_
    Tm1 = v.shape[0] - span
    n = x.shape[0]
    assert n % span == 0, f"block of {n} not divisible by span={span}"
    R = n // span
    rb = rows_per_step
    while R % rb:
        rb //= 2
    xe = jnp.concatenate([hist, x])  # (n + T - 1)
    base = xe[Tm1:].reshape(R, span)
    left = xe[: R * span].reshape(R, span)[:, :Tm1]
    v_hi = v.astype(jnp.bfloat16)
    v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    w_spec = pl.BlockSpec((v.shape[0], v.shape[1]), lambda s: (0, 0),
                          memory_space=pltpu.VMEM)
    audio = pl.pallas_call(
        _resample_kernel,
        grid=(R // rb,),
        in_specs=[
            w_spec,
            w_spec,
            pl.BlockSpec((rb, Tm1), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, span), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, out_w), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, out_w), jnp.float32),
        interpret=interpret,
    )(v_hi, v_lo, left, base)
    return audio.reshape(R * out_w), xe[xe.shape[0] - Tm1:]


def view_u8_as_i16(buf: np.ndarray, spec: PallasWbfmSpec) -> np.ndarray:
    """Host-side reinterpret of a u8 I/Q block as the kernel's int16 layout
    (one little-endian int16 per complex sample: I low byte, Q high byte).

    Zero-copy (numpy view); block length must be a multiple of
    ``spec.chunk_bytes``.
    """
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    assert buf.size % spec.chunk_bytes == 0, (
        f"block of {buf.size} bytes not a multiple of chunk {spec.chunk_bytes}")
    return buf.view("<i2").reshape(-1, spec.rows, spec.row_width)


def host_rotate_fs4_u8(buf: np.ndarray, phase: int = 0) -> np.ndarray:
    """fs/4 rotation as a pure byte map, applied on the host (for the
    kernel's ``rot_impl='host'`` variant).

    Multiplying centered sample x = 2u - 255 by j**(k+phase) only swaps
    and/or negates I/Q, and negation in byte space is the complement
    255 - u — the same trick the reference rotates with on its host
    thread (simple_fm.rs:276-334).  Per complex sample k with
    p = (k + phase) % 4:

        p=0: (I, Q)    p=1: (255-Q, I)    p=2: (255-I, 255-Q)
        p=3: (Q, 255-I)

    Requires ``len(buf) % 8 == 0`` (whole 4-sample pattern periods).
    Vectorized numpy (the C ABI runtime ships a SIMD equivalent in
    csrc/tpusdr_io.cpp for the feeder's conversion stage).
    """
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    assert buf.size % 8 == 0, (
        f"buffer of {buf.size} bytes must hold whole 4-sample periods")
    s = buf.reshape(-1, 4, 2)
    out = np.empty_like(s)
    ph = [(k + phase) % 4 for k in range(4)]
    for k in range(4):
        i_, q_ = s[:, k, 0], s[:, k, 1]
        if ph[k] == 0:
            out[:, k, 0], out[:, k, 1] = i_, q_
        elif ph[k] == 1:
            out[:, k, 0], out[:, k, 1] = 255 - q_, i_
        elif ph[k] == 2:
            out[:, k, 0], out[:, k, 1] = 255 - i_, 255 - q_
        else:
            out[:, k, 0], out[:, k, 1] = q_, 255 - i_
    return out.reshape(buf.shape)


def view_u8_as_i16_batch(bufs: np.ndarray, spec: PallasWbfmSpec) -> np.ndarray:
    """(stations, bytes) u8 -> (stations, nchunks, rows, width) int16."""
    bufs = np.ascontiguousarray(bufs, dtype=np.uint8)
    assert bufs.shape[1] % spec.chunk_bytes == 0
    return bufs.view("<i2").reshape(
        bufs.shape[0], -1, spec.rows, spec.row_width)


class PallasWbfmStreamer:
    """Streaming host wrapper around the fused kernel (chunk-aligned
    residual carry, like ``wbfm.WbfmStreamer``)."""

    def __init__(self, config=None, atan_mode: str = "poly6",
                 interpret: bool | None = None,
                 unpack_impl: str | None = None, prev_impl: str = "shift",
                 rot_impl: str = "host"):
        from tpu_sdr.models import wbfm as M

        self.config = config or M.WbfmConfig(filter_mode="fir")
        self.spec = default_spec(self.config)
        self.w_hi, self.w_lo, self.v = make_kernel_params(
            self.config, prev_impl=prev_impl)
        self.atan_mode = atan_mode
        # unpack default is rotation-placement-dependent: with the host
        # rotation the bf16 pre-matmul pipeline WINS (-5.5%, round-5
        # interleaved A/B, bit-identical output) because the 16-bit
        # layout work that made it 7% slower in round 4 was mostly the
        # in-kernel rotation; with in-kernel rotation dcfold(f32) stays
        # the measured winner.
        if unpack_impl is None:
            unpack_impl = "dcfold_bf16" if rot_impl == "host" else "dcfold"
        self.unpack_impl = unpack_impl
        self.prev_impl = prev_impl
        # 'host' (default): rotate in the streamer's host pass (native
        # SIMD byte map when built, numpy otherwise) and run the
        # rotation-free kernel — -12% device time (round-5 interleaved
        # A/B); 'broadcast'/'select' keep the rotation in the kernel for
        # callers whose bytes must not be touched on the host
        self.rot_impl = rot_impl
        self.interpret = _interpret_default() if interpret is None else interpret
        self.state = jnp.zeros((STATE_ROWS, 128), jnp.float32)
        self.state = self.state.at[2, 127].set(1.0)  # quad prev = 1+0j
        self.resamp_hist = jnp.zeros(self.spec.taps_per_phase - 1, jnp.float32)
        self.phase = 0
        self._pending = np.zeros(0, dtype=np.uint8)

    def demodulate(self, buf: np.ndarray) -> np.ndarray:
        data = np.concatenate([self._pending, np.asarray(buf, dtype=np.uint8)])
        usable = len(data) - (len(data) % self.spec.chunk_bytes)
        self._pending = data[usable:]
        if usable == 0:
            return np.zeros(0, dtype=np.float32)
        payload = data[:usable]
        kphase = self.phase
        if self.rot_impl == "host":
            from tpu_sdr.native import rotate_fs4_u8

            payload = rotate_fs4_u8(payload, phase=self.phase)
            kphase = 0  # rotation already applied; kernel runs phase-free
        d16 = view_u8_as_i16(payload, self.spec)
        audio, self.state, self.resamp_hist = demodulate_fused(
            jnp.asarray(d16), jnp.asarray([kphase], jnp.int32), self.state,
            self.resamp_hist, self.w_hi, self.w_lo, self.v, self.spec,
            atan_mode=self.atan_mode, interpret=self.interpret,
            rot_impl=self.rot_impl,
            unpack_impl=self.unpack_impl, prev_impl=self.prev_impl)
        self.phase = (self.phase + usable // 2) % 4
        return np.asarray(audio)


class PallasWbfmBatchStreamer:
    """Host wrapper mirroring ``wbfm_batched.WbfmBatchStreamer`` over the
    fused kernel: one launch demodulates the whole station batch."""

    def __init__(self, stations: int, config=None, atan_mode: str = "poly6",
                 interpret: bool | None = None,
                 rot_impl: str = "host", unpack_impl: str | None = None):
        from tpu_sdr.models import wbfm as M

        self.config = config or M.WbfmConfig(filter_mode="fir")
        self.spec = default_spec(self.config)
        self.w_hi, self.w_lo, self.v = make_kernel_params(self.config)
        self.atan_mode = atan_mode
        self.rot_impl = rot_impl  # same defaults as PallasWbfmStreamer
        if unpack_impl is None:
            unpack_impl = "dcfold_bf16" if rot_impl == "host" else "dcfold"
        self.unpack_impl = unpack_impl
        self.interpret = _interpret_default() if interpret is None else interpret
        self.stations = stations
        self.states = jnp.zeros((stations, STATE_ROWS, 128), jnp.float32
                                ).at[:, 2, 127].set(1.0)
        self.resamp_hists = jnp.zeros(
            (stations, self.spec.taps_per_phase - 1), jnp.float32)
        self.phases = np.zeros(stations, dtype=np.int32)
        self._pending = np.zeros((stations, 0), dtype=np.uint8)

    def demodulate(self, bufs: np.ndarray) -> np.ndarray:
        data = np.concatenate(
            [self._pending, np.asarray(bufs, dtype=np.uint8)], axis=1)
        usable = data.shape[1] - (data.shape[1] % self.spec.chunk_bytes)
        self._pending = data[:, usable:]
        if usable == 0:
            return np.zeros((self.stations, 0), dtype=np.float32)
        payload = data[:, :usable]
        kphases = self.phases
        if self.rot_impl == "host":
            # one flat byte-map pass rotates every station row: row
            # lengths are multiples of 4 samples, so the flattened
            # position keeps the within-row pattern — valid while all
            # stations share one phase (they start equal and advance
            # equally; reset() restores that invariant)
            assert (self.phases == self.phases[0]).all(), (
                "host rotation needs a common station phase")
            from tpu_sdr.native import rotate_fs4_u8

            payload = rotate_fs4_u8(
                np.ascontiguousarray(payload).reshape(-1),
                phase=int(self.phases[0])).reshape(payload.shape)
            kphases = np.zeros_like(self.phases)
        d16 = view_u8_as_i16_batch(payload, self.spec)
        audio, self.states, self.resamp_hists = demodulate_fused_batch(
            jnp.asarray(d16), jnp.asarray(kphases), self.states,
            self.resamp_hists, self.w_hi, self.w_lo, self.v, self.spec,
            atan_mode=self.atan_mode, interpret=self.interpret,
            rot_impl=self.rot_impl, unpack_impl=self.unpack_impl)
        self.phases = (self.phases + usable // 2) % 4
        return np.asarray(audio)
