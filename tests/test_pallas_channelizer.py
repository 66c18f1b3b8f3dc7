"""Fused Pallas PFB channelizer vs the XLA conv-MXU reference
(channelizer.pfb_analyze), in interpreter mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_sdr.ops import channelizer as chan
from tpu_sdr.ops import pallas_channelizer as pc
from tpu_sdr.ops.fm import u8_to_f32


def _snr_db(ref, got):
    err = got - ref
    p = np.mean(np.abs(ref) ** 2)
    return 10 * np.log10(p / max(np.mean(np.abs(err) ** 2), 1e-30))


@pytest.fixture(scope="module")
def setup():
    K, T, C = 64, 8, 64
    spec = pc.default_spec(K, T, C)
    rng = np.random.default_rng(5)
    buf = rng.integers(0, 256, size=3 * spec.chunk_bytes, dtype=np.uint8)
    return spec, buf, K, T


def _xla_reference(buf, K, T):
    h_poly = jnp.asarray(chan.design_pfb(K, T))
    re, im = u8_to_f32(jnp.asarray(buf))
    st = chan.pfb_init(h_poly)
    y_re, y_im, _ = chan.pfb_analyze(re, im, h_poly, st)
    return np.asarray(y_re), np.asarray(y_im)


def test_fused_channelizer_matches_xla(setup):
    spec, buf, K, T = setup
    ref_re, ref_im = _xla_reference(buf, K, T)

    s = pc.PallasPfbStreamer(K, T, spec.frames_per_chunk, interpret=True)
    got_re, got_im = s.channelize(buf)

    assert got_re.shape == ref_re.shape
    snr = _snr_db(ref_re + 1j * ref_im, got_re + 1j * got_im)
    assert snr >= 80.0, f"fused channelizer vs XLA: {snr:.1f} dB"


def test_fused_channelizer_streaming_invariance(setup):
    spec, buf, K, T = setup
    one = pc.PallasPfbStreamer(K, T, spec.frames_per_chunk, interpret=True)
    full = np.stack(one.channelize(buf))

    two = pc.PallasPfbStreamer(K, T, spec.frames_per_chunk, interpret=True)
    a = np.stack(two.channelize(buf[: spec.chunk_bytes]))
    b = np.stack(two.channelize(buf[spec.chunk_bytes:]))
    np.testing.assert_allclose(np.concatenate([a, b], axis=1), full,
                               rtol=1e-5, atol=1e-5)


def test_misaligned_window_height_rejected():
    """taps_per_branch not a multiple of 8 makes the kernel's (C+H, K)
    sublane roll misaligned — Mosaic's compiler crashes on it (measured
    round 3), so the spec must reject it loudly up front."""
    with pytest.raises(AssertionError, match="taps_per_branch"):
        pc.default_spec(64, 4, 256)


def test_tone_lands_in_expected_channel(setup):
    spec, _, K, T = setup
    # complex tone at channel 5's center: f = 5 * fs / K
    n = 2 * spec.chunk_bytes // 2
    t = np.arange(n)
    ph = 2 * np.pi * 5 / K * t
    u8 = np.empty(2 * n, np.uint8)
    u8[0::2] = np.clip(np.round(127.5 + 120 * np.cos(ph)), 0, 255)
    u8[1::2] = np.clip(np.round(127.5 + 120 * np.sin(ph)), 0, 255)

    s = pc.PallasPfbStreamer(K, T, spec.frames_per_chunk, interpret=True)
    y_re, y_im = s.channelize(u8)
    power = np.mean(y_re**2 + y_im**2, axis=0)
    assert int(np.argmax(power)) == 5
    assert power[5] > 20 * np.partition(power, -2)[-2]
