"""Fused Pallas WBFM kernel vs the XLA chain.

Runs in interpreter mode on CPU (the TPU driver runs the same kernel
compiled); asserts numerical agreement with the f32 XLA chain well above
the 60 dB fidelity bound, streaming invariance across block splits, and
exact agreement of the carry state evolution.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_sdr.models import wbfm
from tpu_sdr.ops import pallas_fm
from tpu_sdr.utils import synth

SPEC = pallas_fm.default_spec()
CHUNK = SPEC.chunk_bytes  # 130560


def _snr_db(ref, got):
    err = got - ref
    return 10 * np.log10(np.mean(ref**2) / max(np.mean(err**2), 1e-30))


@pytest.fixture(scope="module")
def capture():
    u8, _ = synth.synth_wbfm_u8(2 * CHUNK // 2, capture_rate=1_020_000)
    u8 = np.asarray(u8, dtype=np.uint8)[: 2 * CHUNK]
    assert len(u8) == 2 * CHUNK
    return u8


def test_fused_matches_xla_chain(capture):
    config = wbfm.WbfmConfig(filter_mode="fir", mxu_precision="f32")
    xla = wbfm.WbfmStreamer(config)
    ref = xla.demodulate(capture)

    ps = pallas_fm.PallasWbfmStreamer(interpret=True)
    got = ps.demodulate(capture)

    assert got.shape == ref.shape
    snr = _snr_db(ref, got)
    assert snr >= 80.0, f"fused kernel vs f32 chain: {snr:.1f} dB"


def test_fused_streaming_invariance(capture):
    one = pallas_fm.PallasWbfmStreamer(interpret=True)
    full = one.demodulate(capture)

    two = pallas_fm.PallasWbfmStreamer(interpret=True)
    parts = [two.demodulate(capture[:CHUNK]), two.demodulate(capture[CHUNK:])]
    split = np.concatenate(parts)

    np.testing.assert_allclose(split, full, rtol=1e-5, atol=1e-6)


def test_fused_carries_rotator_phase(capture):
    """Feeding an odd number of chunks keeps the fs/4 phase aligned: state
    equals the XLA chain's rotator phase evolution."""
    ps = pallas_fm.PallasWbfmStreamer(interpret=True)
    ps.demodulate(capture[:CHUNK])
    assert ps.phase == (CHUNK // 2) % 4


def test_fast_atan_mode_close_to_exact(capture):
    exact = pallas_fm.PallasWbfmStreamer(atan_mode="exact", interpret=True)
    fast = pallas_fm.PallasWbfmStreamer(atan_mode="fast", interpret=True)
    a = exact.demodulate(capture)
    b = fast.demodulate(capture)
    # the reference's polynomial atan2 approximation: ~ -26 dB worst-case on
    # white phase, far better on narrowband FM audio
    assert _snr_db(a, b) >= 30.0


def test_view_u8_as_i16_is_little_endian():
    buf = np.array([1, 2, 3, 4] * (CHUNK // 4), dtype=np.uint8)
    d16 = pallas_fm.view_u8_as_i16(buf, SPEC)
    assert d16.dtype == np.int16
    v0, v1 = int(d16[0, 0, 0]), int(d16[0, 0, 1])
    assert (v0 & 0xFF) == 1 and ((v0 >> 8) & 0xFF) == 2  # I0, Q0
    assert (v1 & 0xFF) == 3 and ((v1 >> 8) & 0xFF) == 4  # I1, Q1


def test_fused_batch_matches_per_station(capture):
    """The batched grid must produce exactly the per-station results, with
    per-station streaming state evolving independently."""
    rng = np.random.default_rng(11)
    other = rng.integers(0, 256, size=len(capture), dtype=np.uint8)
    bufs = np.stack([capture, other])

    batch = pallas_fm.PallasWbfmBatchStreamer(2, interpret=True)
    got = batch.demodulate(bufs)

    for b, buf in enumerate(bufs):
        # both streamers default to the host rotation placement, so
        # batch and single feed bit-identical frames to the same kernel
        single = pallas_fm.PallasWbfmStreamer(interpret=True)
        exp = single.demodulate(buf)
        np.testing.assert_allclose(got[b], exp, rtol=1e-5, atol=1e-6)


def test_fused_batch_streaming_state(capture):
    bufs = np.stack([capture, capture[::-1].copy()])
    one = pallas_fm.PallasWbfmBatchStreamer(2, interpret=True)
    full = one.demodulate(bufs)
    two = pallas_fm.PallasWbfmBatchStreamer(2, interpret=True)
    split = np.concatenate(
        [two.demodulate(bufs[:, :CHUNK]), two.demodulate(bufs[:, CHUNK:])],
        axis=1)
    np.testing.assert_allclose(split, full, rtol=1e-5, atol=1e-6)


def test_state_handoff_xla_to_pallas(capture):
    """pack_state: an XLA streamer's mid-stream carries seed the fused
    kernel so a receiver can switch implementations without a glitch."""
    import jax.numpy as jnp

    config = wbfm.WbfmConfig(filter_mode="fir", mxu_precision="f32")
    xla = wbfm.WbfmStreamer(config)
    first = xla.demodulate(capture[:CHUNK])

    # hand off to the fused kernel
    ps = pallas_fm.PallasWbfmStreamer(interpret=True)
    ps.state = pallas_fm.pack_state(xla.state, ps.spec)
    ps.resamp_hist = xla.state.resamp.hist
    ps.phase = int(xla.state.rot.phase)
    second = ps.demodulate(capture[CHUNK:])

    ref = wbfm.WbfmStreamer(config)
    expected = np.concatenate(
        [ref.demodulate(capture[:CHUNK]), ref.demodulate(capture[CHUNK:])])
    got = np.concatenate([first, second])
    snr = _snr_db(expected, got)
    assert snr >= 80.0, f"handoff continuity: {snr:.1f} dB"

    # and back: unpack_state returns a usable WbfmState
    st = pallas_fm.unpack_state(
        ps.state, jnp.int32(ps.phase),
        xla.state.resamp._replace(hist=ps.resamp_hist), ps.spec)
    assert st.fir.hist_re.shape == xla.state.fir.hist_re.shape


def test_chunks_per_step_geometry_matches(capture):
    """Folding chunks into one grid step (bigger matmul M) must not change
    results."""
    one = pallas_fm.PallasWbfmStreamer(interpret=True)
    a = one.demodulate(capture)
    spec2 = pallas_fm.default_spec(chunks_per_step=2)
    two = pallas_fm.PallasWbfmStreamer(interpret=True)
    two.spec = spec2
    b = two.demodulate(capture)
    np.testing.assert_allclose(b, a[:len(b)], rtol=1e-5, atol=1e-6)


def test_kernel_variant_broadcast_rotation_bit_identical(capture):
    """The (1, width) broadcast-multiply rotation must produce bit-identical
    output to the full-size select rotation at every phase."""
    import jax.numpy as jnp

    d16 = jnp.asarray(pallas_fm.view_u8_as_i16(capture, SPEC))
    w_hi, w_lo, v = pallas_fm.make_kernel_params()
    state = jnp.zeros((pallas_fm.STATE_ROWS, 128), jnp.float32
                      ).at[2, 127].set(1.0)
    rh = jnp.zeros(SPEC.taps_per_phase - 1, jnp.float32)
    for ph in range(4):
        phase = jnp.asarray([ph], jnp.int32)
        a, _, _ = pallas_fm.demodulate_fused(
            d16, phase, state, rh, w_hi, w_lo, v, SPEC, interpret=True,
            rot_impl="select", unpack_impl="scale")
        b, _, _ = pallas_fm.demodulate_fused(
            d16, phase, state, rh, w_hi, w_lo, v, SPEC, interpret=True,
            rot_impl="broadcast", unpack_impl="scale")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kernel_variant_host_rotation_bit_identical(capture):
    """rot_impl='host' on host-pre-rotated bytes must match the in-kernel
    rotation: BIT-identical with the 'scale' unpack (both feed the exact
    same x255 integers to the matmul: negation in byte space is the
    complement, 2*(255-u) - 255 = -(2u - 255)), and >=100 dB with
    'dcfold' (same exact math, different matmul addend order)."""
    import jax.numpy as jnp

    w_hi, w_lo, v = pallas_fm.make_kernel_params()
    state = jnp.zeros((pallas_fm.STATE_ROWS, 128), jnp.float32
                      ).at[2, 127].set(1.0)
    rh = jnp.zeros(SPEC.taps_per_phase - 1, jnp.float32)
    d16 = jnp.asarray(pallas_fm.view_u8_as_i16(capture, SPEC))
    for ph in range(4):
        phase = jnp.asarray([ph], jnp.int32)
        rotated = pallas_fm.host_rotate_fs4_u8(capture, phase=ph)
        d16h = jnp.asarray(pallas_fm.view_u8_as_i16(rotated, SPEC))
        zero = jnp.asarray([0], jnp.int32)  # host mode ignores phase

        a, sa, _ = pallas_fm.demodulate_fused(
            d16, phase, state, rh, w_hi, w_lo, v, SPEC, interpret=True,
            rot_impl="broadcast", unpack_impl="scale")
        b, sb, _ = pallas_fm.demodulate_fused(
            d16h, zero, state, rh, w_hi, w_lo, v, SPEC, interpret=True,
            rot_impl="host", unpack_impl="scale")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))

        c, sc, _ = pallas_fm.demodulate_fused(
            d16h, zero, state, rh, w_hi, w_lo, v, SPEC, interpret=True,
            rot_impl="host", unpack_impl="dcfold")
        snr = _snr_db(np.asarray(a), np.asarray(c))
        assert snr >= 100.0, f"host dcfold vs scale @ phase {ph}: {snr:.1f} dB"
        np.testing.assert_allclose(np.asarray(sc), np.asarray(sa),
                                   rtol=1e-4, atol=1e-3)


def test_streamer_host_rotation_matches_default(capture):
    """PallasWbfmStreamer(rot_impl='host' — the default) — host byte-map
    rotation + the rotation-free kernel — must track the in-kernel
    broadcast-rotation streamer across split blocks (carry seam + phase
    bookkeeping)."""
    ref = pallas_fm.PallasWbfmStreamer(interpret=True, rot_impl="broadcast")
    expected = np.concatenate(
        [ref.demodulate(capture[:CHUNK]), ref.demodulate(capture[CHUNK:])])
    host = pallas_fm.PallasWbfmStreamer(interpret=True, rot_impl="host")
    got = np.concatenate(
        [host.demodulate(capture[:CHUNK]), host.demodulate(capture[CHUNK:])])
    snr = _snr_db(expected, got)
    assert snr >= 100.0, f"host-rotation streamer: {snr:.1f} dB"


def test_kernel_variant_dcfold_matches_scale(capture):
    """The DC-fold unpack (raw-byte rotation + post-matmul correction)
    must agree with the x255-scale unpack at every phase.  Not bit-exact
    (the matmul accumulates different addends) but far above the 100 dB
    bar."""
    import jax.numpy as jnp

    d16 = jnp.asarray(pallas_fm.view_u8_as_i16(capture, SPEC))
    w_hi, w_lo, v = pallas_fm.make_kernel_params()
    state = jnp.zeros((pallas_fm.STATE_ROWS, 128), jnp.float32
                      ).at[2, 127].set(1.0)
    rh = jnp.zeros(SPEC.taps_per_phase - 1, jnp.float32)
    for ph in range(4):
        phase = jnp.asarray([ph], jnp.int32)
        a, sa, _ = pallas_fm.demodulate_fused(
            d16, phase, state, rh, w_hi, w_lo, v, SPEC, interpret=True,
            unpack_impl="scale")
        b, sb, _ = pallas_fm.demodulate_fused(
            d16, phase, state, rh, w_hi, w_lo, v, SPEC, interpret=True,
            unpack_impl="dcfold")
        snr = _snr_db(np.asarray(a), np.asarray(b))
        assert snr >= 100.0, f"dcfold vs scale @ phase {ph}: {snr:.1f} dB"
        # the carry stays in x255 space under both unpack impls
        np.testing.assert_allclose(np.asarray(sb), np.asarray(sa),
                                   rtol=1e-4, atol=1e-3)


def test_kernel_variant_dcfold_bf16_bit_identical(capture):
    """dcfold_bf16 (pre-matmul pipeline in packed bf16) must be
    BIT-identical to dcfold: the +-1/0 rotation only selects/negates, so
    every pre-matmul intermediate is an exact <=8-bit integer in bf16 and
    the matmul receives identical frames."""
    import jax.numpy as jnp

    d16 = jnp.asarray(pallas_fm.view_u8_as_i16(capture, SPEC))
    w_hi, w_lo, v = pallas_fm.make_kernel_params()
    state = jnp.zeros((pallas_fm.STATE_ROWS, 128), jnp.float32
                      ).at[2, 127].set(1.0)
    rh = jnp.zeros(SPEC.taps_per_phase - 1, jnp.float32)
    for ph in range(4):
        phase = jnp.asarray([ph], jnp.int32)
        a, sa, _ = pallas_fm.demodulate_fused(
            d16, phase, state, rh, w_hi, w_lo, v, SPEC, interpret=True,
            unpack_impl="dcfold")
        b, sb, _ = pallas_fm.demodulate_fused(
            d16, phase, state, rh, w_hi, w_lo, v, SPEC, interpret=True,
            unpack_impl="dcfold_bf16")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))


def test_kernel_variant_dcfold_streaming_invariance(capture):
    """The dcfold carry seam (x255 <-> raw conversion each chunk) must
    keep the output invariant to block-boundary placement."""
    one = pallas_fm.PallasWbfmStreamer(interpret=True)
    one.unpack_impl = "dcfold"
    full = one.demodulate(capture)
    two = pallas_fm.PallasWbfmStreamer(interpret=True)
    two.unpack_impl = "dcfold"
    split = np.concatenate(
        [two.demodulate(capture[:CHUNK]), two.demodulate(capture[CHUNK:])])
    np.testing.assert_allclose(split, full, rtol=1e-5, atol=1e-6)


def test_kernel_variant_poly6_atan_quality(capture):
    """The 6-term atan ladder stays >=100 dB of the 10-term exact mode
    (floor for swapping it into the bench path)."""
    import jax.numpy as jnp

    d16 = jnp.asarray(pallas_fm.view_u8_as_i16(capture, SPEC))
    w_hi, w_lo, v = pallas_fm.make_kernel_params()
    state = jnp.zeros((pallas_fm.STATE_ROWS, 128), jnp.float32
                      ).at[2, 127].set(1.0)
    rh = jnp.zeros(SPEC.taps_per_phase - 1, jnp.float32)
    phase = jnp.asarray([0], jnp.int32)
    a, _, _ = pallas_fm.demodulate_fused(
        d16, phase, state, rh, w_hi, w_lo, v, SPEC, atan_mode="exact",
        interpret=True)
    b, _, _ = pallas_fm.demodulate_fused(
        d16, phase, state, rh, w_hi, w_lo, v, SPEC, atan_mode="poly6",
        interpret=True)
    snr = _snr_db(np.asarray(a), np.asarray(b))
    assert snr >= 100.0, f"poly6 vs exact: {snr:.1f} dB"


def test_kernel_variant_matmul_prev_matches_shift(capture):
    """prev_impl='matmul' (the stacked [W_y, W_prev] second banded matmul
    for the discriminator's delayed operand) must agree with the 'shift'
    VPU shuffle, including across launch boundaries (the i==0 first-
    element patch and the deep-history carry lanes).  Kept equivalence-
    tested although 'shift' stays the default: the interleaved on-chip
    A/B measured 'matmul' 26% SLOWER (0.289 vs 0.229 ms/block, 6/6 reps,
    round 4 — see NEXT.md)."""
    ref = pallas_fm.PallasWbfmStreamer(interpret=True).demodulate(capture)
    one = pallas_fm.PallasWbfmStreamer(interpret=True, prev_impl="matmul")
    got = one.demodulate(capture)
    assert got.shape == ref.shape
    assert _snr_db(ref, got) > 120.0

    # split across launches: the carried deep-history lanes must hand the
    # matmul-prev of the next launch exactly what it needs
    two = pallas_fm.PallasWbfmStreamer(interpret=True, prev_impl="matmul")
    split = np.concatenate([two.demodulate(capture[:CHUNK]),
                            two.demodulate(capture[CHUNK:])])
    np.testing.assert_array_equal(split, got)

    # scale-unpack leg of the variant
    sc = pallas_fm.PallasWbfmStreamer(interpret=True, prev_impl="matmul",
                                      unpack_impl="scale")
    assert _snr_db(ref, sc.demodulate(capture)) > 120.0


def test_kernel_variant_pallas_resampler_matches_xla(capture):
    """resamp_impl='pallas' (VMEM frame concat + manual 3-pass split-bf16
    matmul) must agree with the XLA aligned_resample epilogue, including
    the carried history.  Kept equivalence-tested although 'xla' stays
    the default: the on-chip A/B measured the kernel no faster (0.232 vs
    0.228 ms/block; the epilogue is MXU-pass-bound, not
    materialization-bound — see NEXT.md round 4)."""
    ref = pallas_fm.PallasWbfmStreamer(interpret=True)
    a = np.concatenate([ref.demodulate(capture[:CHUNK]),
                        ref.demodulate(capture[CHUNK:])])
    import jax.numpy as jnp

    d16a = jnp.asarray(pallas_fm.view_u8_as_i16(capture[:CHUNK], SPEC))
    d16b = jnp.asarray(pallas_fm.view_u8_as_i16(capture[CHUNK:], SPEC))
    w_hi, w_lo, v = pallas_fm.make_kernel_params()
    st = jnp.zeros((pallas_fm.STATE_ROWS, 128), jnp.float32
                   ).at[2, 127].set(1.0)
    rh = jnp.zeros(SPEC.taps_per_phase - 1, jnp.float32)
    outs = []
    for d16 in (d16a, d16b):
        audio, st, rh = pallas_fm.demodulate_fused(
            d16, jnp.asarray([0], jnp.int32), st, rh, w_hi, w_lo, v, SPEC,
            interpret=True, resamp_impl="pallas")
        outs.append(np.asarray(audio))
    b = np.concatenate(outs)
    assert b.shape == a.shape
    assert _snr_db(a, b) > 100.0


def test_kernel_variant_i16_z_output(capture):
    """z_impl='i16' (Q15 fixed-point discriminator output, halved kernel
    HBM write) must stay >=90 dB of the f32 chain.  Kept
    equivalence-tested although 'f32' stays the default: the on-chip A/B
    measured i16 2% SLOWER (0.168 vs 0.165 ms/block — the quantize ops
    plus the epilogue cast eat the bandwidth; see NEXT.md round 4)."""
    ref = pallas_fm.PallasWbfmStreamer(interpret=True).demodulate(capture)
    import jax.numpy as jnp

    d16 = jnp.asarray(pallas_fm.view_u8_as_i16(capture, SPEC))
    w_hi, w_lo, v = pallas_fm.make_kernel_params()
    st = jnp.zeros((pallas_fm.STATE_ROWS, 128), jnp.float32
                   ).at[2, 127].set(1.0)
    rh = jnp.zeros(SPEC.taps_per_phase - 1, jnp.float32)
    audio, _, _ = pallas_fm.demodulate_fused(
        d16, jnp.asarray([0], jnp.int32), st, rh, w_hi, w_lo, v, SPEC,
        interpret=True, z_impl="i16")
    got = np.asarray(audio)
    assert got.shape == ref.shape
    assert _snr_db(ref, got) > 90.0
