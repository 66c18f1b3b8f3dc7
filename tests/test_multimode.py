"""AM / NBFM / USB / LSB narrowband modes (rtl_fm's -M capabilities,
which the reference dropped)."""

import numpy as np
import pytest

from tpu_sdr.models import multimode as MM
from tpu_sdr.utils import synth

FS = 1_020_000
QUANTUM = 2 * 6 * 85  # bytes


def _to_u8(baseband: np.ndarray) -> np.ndarray:
    """Complex baseband -> u8 I/Q at the -fs/4 capture offset."""
    n = len(baseband)
    k = np.arange(n) % 4
    offset = np.choose(k, [1 + 0j, -1j, -1 + 0j, 1j])
    sig = baseband * offset
    iq = np.empty(2 * n, np.float64)
    iq[0::2] = sig.real
    iq[1::2] = sig.imag
    return np.clip(np.round(iq * 127.0 + 127.5), 0, 255).astype(np.uint8)


def _n_samples(seconds: float) -> int:
    n = int(FS * seconds)
    return n - (n % (QUANTUM // 2))


def test_am_envelope_recovers_tone():
    n = _n_samples(0.4)
    t = np.arange(n) / FS
    bb = 0.45 * (1.0 + 0.8 * np.sin(2 * np.pi * 1_000.0 * t))
    s = MM.MultimodeStreamer(MM.MultimodeConfig(mode="am"))
    audio = s.demodulate(_to_u8(bb.astype(np.complex128)))
    snr = synth.tone_snr(audio.astype(np.float64), 1_000.0, 32_000, skip=400)
    assert snr >= 30.0, f"AM tone SNR {snr:.1f} dB"


def test_nbfm_recovers_tone():
    n = _n_samples(0.4)
    u8, _ = synth.synth_wbfm_u8(n, capture_rate=FS, audio_freq=900.0,
                                deviation=5_000.0)
    s = MM.MultimodeStreamer(MM.MultimodeConfig(mode="nbfm"))
    audio = s.demodulate(np.asarray(u8, np.uint8))
    snr = synth.tone_snr(audio.astype(np.float64), 900.0, 32_000, skip=400)
    assert snr >= 30.0, f"NBFM tone SNR {snr:.1f} dB"


def test_usb_selects_upper_sideband():
    n = _n_samples(0.4)
    t = np.arange(n) / FS
    bb = 0.7 * np.exp(2j * np.pi * 1_000.0 * t)  # tone in the UPPER sideband
    u8 = _to_u8(bb)
    usb = MM.MultimodeStreamer(MM.MultimodeConfig(mode="usb")).demodulate(u8)
    lsb = MM.MultimodeStreamer(MM.MultimodeConfig(mode="lsb")).demodulate(u8)
    snr_usb = synth.tone_snr(usb.astype(np.float64), 1_000.0, 32_000, skip=400)
    p_usb = np.mean(usb[400:] ** 2)
    p_lsb = np.mean(lsb[400:] ** 2)
    assert snr_usb >= 25.0, f"USB tone SNR {snr_usb:.1f} dB"
    # sideband rejection: the LSB demodulator must suppress the USB tone
    rej = 10 * np.log10(p_usb / max(p_lsb, 1e-30))
    assert rej >= 20.0, f"sideband rejection {rej:.1f} dB"


def test_streaming_invariance_am():
    n = _n_samples(0.3)
    t = np.arange(n) / FS
    bb = 0.45 * (1.0 + 0.8 * np.sin(2 * np.pi * 700.0 * t))
    u8 = _to_u8(bb.astype(np.complex128))
    one = MM.MultimodeStreamer(MM.MultimodeConfig(mode="usb"))
    full = one.demodulate(u8)
    two = MM.MultimodeStreamer(MM.MultimodeConfig(mode="usb"))
    cut = (len(u8) // 2) - ((len(u8) // 2) % QUANTUM)
    split = np.concatenate([two.demodulate(u8[:cut]), two.demodulate(u8[cut:])])
    np.testing.assert_allclose(split, full, rtol=1e-4, atol=1e-5)


def test_squelch_gates_on_channel_power():
    """Squelch (beyond-reference: the original rtl_fm's -l, which the port
    dropped): a threshold below the signal leaves the audio intact; one
    above it mutes every block."""
    n = _n_samples(0.4)
    t = np.arange(n) / FS
    bb = 0.45 * (1.0 + 0.8 * np.sin(2 * np.pi * 1_000.0 * t))
    u8 = _to_u8(bb.astype(np.complex128))

    open_ = MM.MultimodeStreamer(MM.MultimodeConfig(mode="am",
                                                    squelch_db=-40.0))
    audio = open_.demodulate(u8)
    snr = synth.tone_snr(audio.astype(np.float64), 1_000.0, 32_000, skip=400)
    assert snr >= 30.0, f"squelch open degraded audio: {snr:.1f} dB"

    closed = MM.MultimodeStreamer(MM.MultimodeConfig(mode="am",
                                                     squelch_db=0.0))
    muted = closed.demodulate(u8)
    assert muted.shape == audio.shape
    assert np.all(muted == 0.0)


def test_squelch_mutes_noise_only_capture():
    """Noise-only input stays below a modest threshold -> silence; the
    same capture passes with squelch off."""
    rng = np.random.default_rng(9)
    n = _n_samples(0.2)
    bb = (rng.normal(0, 0.003, n) + 1j * rng.normal(0, 0.003, n))
    u8 = _to_u8(bb)

    s = MM.MultimodeStreamer(MM.MultimodeConfig(mode="nbfm",
                                                squelch_db=-35.0))
    assert np.all(s.demodulate(u8) == 0.0)
    s_off = MM.MultimodeStreamer(MM.MultimodeConfig(mode="nbfm"))
    assert np.any(s_off.demodulate(u8) != 0.0)


def test_ssb_fine_tune_corrects_carrier_offset():
    """A USB signal whose carrier sits +300 Hz off nominal (PLL SDM
    error) demodulates with every audio tone shifted +300 Hz; with
    fine_tune_hz=300 the tone lands at its true frequency again."""
    n = _n_samples(0.4)
    t = np.arange(n) / FS
    off = 300.0
    bb = 0.7 * np.exp(2j * np.pi * (1_000.0 + off) * t)  # offset carrier
    u8 = _to_u8(bb)

    plain = MM.MultimodeStreamer(MM.MultimodeConfig(mode="usb"))
    tuned = MM.MultimodeStreamer(MM.MultimodeConfig(mode="usb",
                                                    fine_tune_hz=off))
    a0 = plain.demodulate(u8).astype(np.float64)
    a1 = tuned.demodulate(u8).astype(np.float64)
    # without correction the tone appears displaced by the offset
    snr_displaced = synth.tone_snr(a0, 1_000.0 + off, 32_000, skip=400)
    assert snr_displaced >= 25.0, f"{snr_displaced:.1f} dB"
    # with correction the tone is back at 1 kHz...
    snr_true = synth.tone_snr(a1, 1_000.0, 32_000, skip=400)
    assert snr_true >= 25.0, f"{snr_true:.1f} dB"
    # ...and NOT at the displaced frequency
    p_true = np.mean(a1[400:] ** 2)
    z = (a1[400:] * np.exp(-2j * np.pi * (1_000.0 + off) / 32_000
                           * np.arange(400, len(a1)))).mean()
    assert 2 * abs(z) ** 2 < 0.1 * p_true


def test_ssb_fine_tune_streaming_invariance():
    n = _n_samples(0.3)
    t = np.arange(n) / FS
    bb = 0.6 * np.exp(2j * np.pi * 1_150.0 * t)
    u8 = _to_u8(bb)
    one = MM.MultimodeStreamer(MM.MultimodeConfig(mode="usb",
                                                  fine_tune_hz=150.0))
    full = one.demodulate(u8)
    two = MM.MultimodeStreamer(MM.MultimodeConfig(mode="usb",
                                                  fine_tune_hz=150.0))
    cut = (len(u8) // 2) - ((len(u8) // 2) % QUANTUM)
    split = np.concatenate([two.demodulate(u8[:cut]),
                            two.demodulate(u8[cut:])])
    np.testing.assert_allclose(split, full, rtol=1e-4, atol=1e-5)


def test_nbfm_deemphasis_rolls_off_highs():
    """-E deemp parity: the 75 us single-pole de-emphasis attenuates a
    3 kHz program tone ~4x more than a 300 Hz one (|H| ratio ~11 dB),
    and streaming stays split-invariant with the IIR carry."""
    n = _n_samples(0.4)

    def run(audio_freq, tau):
        u8, _ = synth.synth_wbfm_u8(n, capture_rate=FS,
                                    audio_freq=audio_freq,
                                    deviation=5_000.0)
        s = MM.MultimodeStreamer(MM.MultimodeConfig(
            mode="nbfm", deemphasis_tau=tau))
        return s.demodulate(np.asarray(u8, np.uint8)).astype(np.float64)

    def tone_amp(a, f):
        t = np.arange(400, len(a)) / 32_000
        return 2 * abs((a[400:] * np.exp(-2j * np.pi * f * t)).mean())

    lo_plain = tone_amp(run(300.0, 0.0), 300.0)
    hi_plain = tone_amp(run(3_000.0, 0.0), 3_000.0)
    lo_de = tone_amp(run(300.0, 75e-6), 300.0)
    hi_de = tone_amp(run(3_000.0, 75e-6), 3_000.0)
    atten_lo = 20 * np.log10(lo_plain / lo_de)
    atten_hi = 20 * np.log10(hi_plain / hi_de)
    # |H(f)| = 1/sqrt(1+(2 pi f tau)^2): ~0.1 dB at 300 Hz, ~4.8 dB at 3 kHz
    assert atten_lo < 1.5, f"300 Hz attenuated {atten_lo:.1f} dB"
    assert 3.0 < atten_hi < 8.0, f"3 kHz attenuated {atten_hi:.1f} dB"

    # split invariance with the de-emphasis carry active
    u8, _ = synth.synth_wbfm_u8(n, capture_rate=FS, audio_freq=1_200.0,
                                deviation=5_000.0)
    u8 = np.asarray(u8, np.uint8)
    one = MM.MultimodeStreamer(MM.MultimodeConfig(mode="nbfm",
                                                  deemphasis_tau=75e-6))
    full = one.demodulate(u8)
    two = MM.MultimodeStreamer(MM.MultimodeConfig(mode="nbfm",
                                                  deemphasis_tau=75e-6))
    cut = (len(u8) // 2) - ((len(u8) // 2) % QUANTUM)
    split = np.concatenate([two.demodulate(u8[:cut]),
                            two.demodulate(u8[cut:])])
    np.testing.assert_allclose(split, full, rtol=1e-4, atol=1e-5)
