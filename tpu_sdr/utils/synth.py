"""Synthesis of WBFM test captures.

The reference validated end-to-end audio against a real off-air capture
(``capture.bin``) which is not distributed (Cargo.toml:10 excludes it).  We
synthesize equivalent captures instead: a known modulating audio signal is
FM-modulated, shifted to the -fs/4 offset the capture front end uses
(simple_fm.rs:195 ``capture_freq = freq + capture_rate/4``), and quantized
to interleaved u8 I/Q.  Because the modulating signal is known, demodulated
output can be scored with a real SNR (BASELINE.md target: >= 60 dB vs
reference output).
"""

from __future__ import annotations

import numpy as np


def synth_wbfm_u8(
    num_samples: int,
    capture_rate: float = 1_020_000.0,
    audio_freq: float = 1_000.0,
    deviation: float = 75_000.0,
    amplitude: float = 0.9,
    noise_std: float = 0.0,
    seed: int = 0,
    audio: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Generate ``num_samples`` complex samples of WBFM as interleaved u8 I/Q.

    Returns ``(iq_u8 of length 2*num_samples, modulating audio)``.  The
    carrier sits at -fs/4 so the standard rotate stage brings it to DC,
    exactly like a real offset-tuned capture.
    """
    t = np.arange(num_samples) / capture_rate
    if audio is None:
        audio = np.sin(2 * np.pi * audio_freq * t)
    else:
        assert len(audio) == num_samples
    phase = 2 * np.pi * deviation * np.cumsum(audio) / capture_rate
    baseband = np.exp(1j * phase)

    # Offset to -fs/4: multiply by exp(-j*2*pi*(fs/4)*t) = (-j)^k
    k = np.arange(num_samples) % 4
    offset = np.choose(k, [1 + 0j, -1j, -1 + 0j, 1j])
    sig = amplitude * baseband * offset

    if noise_std > 0:
        rng = np.random.default_rng(seed)
        sig = sig + noise_std * (
            rng.standard_normal(num_samples) + 1j * rng.standard_normal(num_samples)
        )

    iq = np.empty(2 * num_samples, dtype=np.float64)
    iq[0::2] = sig.real
    iq[1::2] = sig.imag
    u8 = np.clip(np.round(iq * 127.0 + 127.5), 0, 255).astype(np.uint8)
    return u8, audio


def snr_db(reference: np.ndarray, test: np.ndarray, skip: int = 0) -> float:
    """SNR of ``test`` against ``reference`` after optimal scalar gain fit.

    ``skip`` drops leading transient samples (filter group delay).  Both
    signals are mean-removed before fitting.
    """
    n = min(len(reference), len(test))
    r = np.asarray(reference[skip:n], dtype=np.float64)
    x = np.asarray(test[skip:n], dtype=np.float64)
    r = r - r.mean()
    x = x - x.mean()
    denom = np.dot(x, x)
    if denom == 0:
        return -np.inf
    g = np.dot(r, x) / denom
    err = r - g * x
    p_sig = np.dot(r, r)
    p_err = np.dot(err, err)
    if p_err == 0:
        return np.inf
    return float(10 * np.log10(p_sig / p_err))


def tone_snr(x: np.ndarray, freq: float, fs: float, skip: int = 0,
             harmonics: int = 1) -> float:
    """SNR of a recovered sinusoid with *fractional-delay-invariant* fitting.

    Projects ``x`` onto sin/cos at ``freq`` (and optionally its harmonics for
    a THD-excluded figure), so arbitrary filter group delay and gain do not
    count as error — unlike integer-lag alignment, which under-reports by up
    to ``pi*f/fs`` radians of phase mismatch.
    """
    x = np.asarray(x[skip:], dtype=np.float64)
    x = x - x.mean()
    n = len(x)
    t = np.arange(n) / fs
    cols = []
    for h in range(1, harmonics + 1):
        cols.append(np.sin(2 * np.pi * freq * h * t))
        cols.append(np.cos(2 * np.pi * freq * h * t))
    basis = np.stack(cols, axis=1)
    coef, *_ = np.linalg.lstsq(basis, x, rcond=None)
    fit = basis @ coef
    p_sig = np.dot(fit, fit)
    p_err = np.dot(x - fit, x - fit)
    if p_err == 0:
        return np.inf
    return float(10 * np.log10(p_sig / p_err))


def align_and_snr(reference: np.ndarray, test: np.ndarray, max_lag: int = 256,
                  skip: int = 0) -> tuple[float, int]:
    """Search integer lags and return the best SNR and its lag — filter
    group delays shift the fast path relative to the boxcar path."""
    best = (-np.inf, 0)
    for lag in range(-max_lag, max_lag + 1):
        if lag >= 0:
            s = snr_db(reference[lag:], test, skip=skip)
        else:
            s = snr_db(reference, test[-lag:], skip=skip)
        if s > best[0]:
            best = (s, lag)
    return best


def synth_multistation_u8(
    num_samples: int,
    capture_rate: float,
    station_freqs: list[float],
    audio_freqs: list[float],
    deviation: float = 75_000.0,
    amplitude: float | None = None,
    seed: int = 0,
    rds_bits: list | None = None,
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Wideband capture containing several WBFM stations at once.

    Station ``s`` is FM-modulated by a ``audio_freqs[s]`` tone and shifted
    to ``station_freqs[s]`` Hz relative to the capture center.  Returns
    ``(iq_u8 of length 2*num_samples, per-station modulating audio)`` —
    the input for the PFB-channelized multi-station receive path
    (BASELINE.json config #3; the reference can only tune one station per
    process).

    ``rds_bits``: optional per-station list; a non-None entry gives that
    station a standard pilot + 57 kHz RDS subcarrier (differentially
    encoded biphase BPSK, pilot-locked clock) so the per-station RDS
    decoders (multi_fm --rds) have something to lock to.
    """
    assert len(station_freqs) == len(audio_freqs)
    n_st = len(station_freqs)
    if rds_bits is None:
        rds_bits = [None] * n_st
    assert len(rds_bits) == n_st
    if amplitude is None:
        amplitude = 0.85 / n_st
    t = np.arange(num_samples) / capture_rate
    sig = np.zeros(num_samples, dtype=np.complex128)
    audios = []
    for f_c, f_a, bits in zip(station_freqs, audio_freqs, rds_bits):
        audio = np.sin(2 * np.pi * f_a * t)
        audios.append(audio)
        if bits is None:
            mod = audio
        else:
            b = np.asarray(bits, np.uint8)
            d = np.bitwise_xor.accumulate(b)
            tb = t * 1187.5
            k = np.minimum(tb.astype(int), len(b) - 1)
            frac = tb - tb.astype(int)
            sign = (np.where(d[k] == 0, 1.0, -1.0)
                    * np.where(frac < 0.5, 1.0, -1.0))
            mod = (0.6 * audio + 0.1 * np.cos(2 * np.pi * 19_000.0 * t)
                   + 0.06 * sign * np.cos(2 * np.pi * 57_000.0 * t))
        phase = 2 * np.pi * deviation * np.cumsum(mod) / capture_rate
        sig += amplitude * np.exp(1j * (phase + 2 * np.pi * f_c * t))
    iq = np.empty(2 * num_samples, dtype=np.float64)
    iq[0::2] = sig.real
    iq[1::2] = sig.imag
    u8 = np.clip(np.round(iq * 127.0 + 127.5), 0, 255).astype(np.uint8)
    return u8, audios


def synth_wbfm_stereo_u8(
    num_samples: int,
    capture_rate: float = 1_020_000.0,
    left_freq: float = 800.0,
    right_freq: float = 1_300.0,
    deviation: float = 75_000.0,
    rds_bits: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stereo WBFM capture: standard pilot-tone multiplex
    (0.4*(L+R) + 0.1*pilot@19k + 0.4*(L-R)*cos 38k [+ 0.06*RDS@57k]),
    FM-modulated at the -fs/4 capture offset.  Returns (iq_u8, left audio,
    right audio) — the test vector for the stereo/RDS decoders (beyond the
    reference's mono chain).  ``rds_bits`` adds the differentially-encoded
    biphase BPSK subcarrier at 3x pilot with the pilot-locked 1187.5 bps
    clock.
    """
    t = np.arange(num_samples) / capture_rate
    left = 0.5 * np.sin(2 * np.pi * left_freq * t)
    right = 0.5 * np.sin(2 * np.pi * right_freq * t)
    pilot = np.cos(2 * np.pi * 19_000.0 * t)
    sub = np.cos(2 * np.pi * 38_000.0 * t)  # phase-locked 2x pilot
    mpx = 0.45 * (left + right) + 0.1 * pilot + 0.45 * (left - right) * sub
    if rds_bits is not None:
        bits = np.asarray(rds_bits, np.uint8)
        d = np.bitwise_xor.accumulate(bits)
        tb = t * 1187.5
        k = np.minimum(tb.astype(int), len(bits) - 1)
        frac = tb - tb.astype(int)
        sign = np.where(d[k] == 0, 1.0, -1.0) * np.where(frac < 0.5, 1.0, -1.0)
        mpx = mpx + 0.06 * sign * np.cos(2 * np.pi * 57_000.0 * t)

    phase = 2 * np.pi * deviation * np.cumsum(mpx) / capture_rate
    baseband = np.exp(1j * phase)
    k = np.arange(num_samples) % 4
    offset = np.choose(k, [1 + 0j, -1j, -1 + 0j, 1j])
    sig = 0.9 * baseband * offset
    iq = np.empty(2 * num_samples, dtype=np.float64)
    iq[0::2] = sig.real
    iq[1::2] = sig.imag
    u8 = np.clip(np.round(iq * 127.0 + 127.5), 0, 255).astype(np.uint8)
    return u8, left, right
