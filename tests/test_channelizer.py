"""PFB channelizer tests: tone steering, adjacent-channel rejection,
streaming invariance, and an end-to-end channelized FM demod."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_sdr.ops import channelizer as CH
from tpu_sdr.ops import fm as F
from tpu_sdr.utils import synth


def _complex_tone(n, freq_cycles_per_sample, amp=1.0):
    t = np.arange(n)
    return amp * np.exp(2j * np.pi * freq_cycles_per_sample * t)


@pytest.mark.parametrize("k", [0, 3, 17, 33, 63])
def test_tone_lands_in_its_channel(k):
    K, T = 64, 8
    h = jnp.asarray(CH.design_pfb(K, T))
    n = K * 512
    x = _complex_tone(n, k / K)
    yr, yi, _ = CH.pfb_analyze(
        jnp.asarray(x.real.astype(np.float32)), jnp.asarray(x.imag.astype(np.float32)),
        h, CH.pfb_init(h),
    )
    power = np.mean(np.asarray(yr) ** 2 + np.asarray(yi) ** 2, axis=0)
    # skip filter transient frames
    power = np.mean(np.asarray(yr)[T:] ** 2 + np.asarray(yi)[T:] ** 2, axis=0)
    assert np.argmax(power) == k
    others = np.delete(power, k)
    rejection_db = 10 * np.log10(power[k] / (others.max() + 1e-12))
    assert rejection_db > 40, f"adjacent rejection only {rejection_db:.1f} dB"


def test_offset_tone_rejected_by_distant_channels():
    K, T = 64, 8
    h = jnp.asarray(CH.design_pfb(K, T))
    n = K * 512
    # tone inside channel 10's passband but off its exact center
    x = _complex_tone(n, 10.15 / K)
    yr, yi, _ = CH.pfb_analyze(
        jnp.asarray(x.real.astype(np.float32)), jnp.asarray(x.imag.astype(np.float32)),
        h, CH.pfb_init(h),
    )
    power = np.mean(np.asarray(yr)[T:] ** 2 + np.asarray(yi)[T:] ** 2, axis=0)
    assert np.argmax(power) == 10
    far = np.delete(power, [9, 10, 11])
    assert 10 * np.log10(power[10] / (far.max() + 1e-12)) > 55


def test_streaming_invariance():
    K, T = 32, 6
    h = jnp.asarray(CH.design_pfb(K, T))
    rng = np.random.default_rng(0)
    n = K * 300
    re = rng.standard_normal(n).astype(np.float32)
    im = rng.standard_normal(n).astype(np.float32)

    yr1, yi1, _ = CH.pfb_analyze(jnp.asarray(re), jnp.asarray(im), h, CH.pfb_init(h))

    st = CH.pfb_init(h)
    parts_r, parts_i = [], []
    for s in range(0, n, K * 100):
        r, i, st = CH.pfb_analyze(
            jnp.asarray(re[s : s + K * 100]), jnp.asarray(im[s : s + K * 100]), h, st
        )
        parts_r.append(np.asarray(r))
        parts_i.append(np.asarray(i))
    np.testing.assert_allclose(np.concatenate(parts_r), np.asarray(yr1), atol=1e-5)
    np.testing.assert_allclose(np.concatenate(parts_i), np.asarray(yi1), atol=1e-5)


def test_channelized_fm_station_demod():
    """Place a narrowband FM station at channel 5's center of a 16-channel
    bank and recover its audio tone from that channel alone."""
    K, T = 16, 8
    fs = 1_632_000.0  # channel rate = 102 kHz
    ch_rate = fs / K
    k = 5
    n = K * 8192

    # FM-modulate a 1 kHz tone with modest deviation, shifted to channel k
    t = np.arange(n) / fs
    audio = np.sin(2 * np.pi * 1000.0 * t)
    phase = 2 * np.pi * 25_000.0 * np.cumsum(audio) / fs
    base = np.exp(1j * phase) * np.exp(2j * np.pi * (k / K) * np.arange(n))

    h = jnp.asarray(CH.design_pfb(K, T))
    yr, yi, _ = CH.pfb_analyze(
        jnp.asarray(base.real.astype(np.float32)),
        jnp.asarray(base.imag.astype(np.float32)), h, CH.pfb_init(h),
    )
    chan_re = np.asarray(yr)[:, k]
    chan_im = np.asarray(yi)[:, k]

    y, _ = F.quadrature_demod(jnp.asarray(chan_re), jnp.asarray(chan_im), F.quad_init())
    got = np.asarray(y)
    snr = synth.tone_snr(got, 1000.0, ch_rate, skip=64)
    assert snr > 30, f"channelized FM tone SNR {snr:.1f} dB"
