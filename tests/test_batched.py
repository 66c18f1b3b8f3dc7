"""Batched (vmapped) multi-station chain vs per-station serial runs."""

import numpy as np

from tpu_sdr.models import wbfm, wbfm_batched
from tpu_sdr.utils import synth


def test_batched_matches_serial_per_station():
    config = wbfm.WbfmConfig(filter_mode="fir")
    stations = 4
    n_bytes = 2 * 6 * 85 * 128  # aligned
    blocks = np.stack([
        synth.synth_wbfm_u8(n_bytes // 2, capture_rate=1_020_000,
                            audio_freq=400.0 * (i + 1), seed=i)[0]
        for i in range(stations)
    ])

    batch = wbfm_batched.WbfmBatchStreamer(stations, config)
    got = batch.demodulate(blocks)
    got2 = batch.demodulate(blocks)  # second block: exercises stacked state

    for i in range(stations):
        s = wbfm.WbfmStreamer(config)
        exp1 = s.demodulate(blocks[i])
        exp2 = s.demodulate(blocks[i])
        np.testing.assert_allclose(got[i], exp1, atol=2e-5)
        np.testing.assert_allclose(got2[i], exp2, atol=2e-5)


def test_batched_16_stations_tone_recovery():
    config = wbfm.WbfmConfig(filter_mode="fir")
    stations = 16
    n_bytes = 2 * 6 * 85 * 256
    freqs = [300.0 + 100.0 * i for i in range(stations)]
    # one continuous 2-block capture per station, fed in two block calls
    full = np.stack([
        synth.synth_wbfm_u8(n_bytes, capture_rate=1_020_000,
                            audio_freq=freqs[i], seed=i)[0]
        for i in range(stations)
    ])
    batch = wbfm_batched.WbfmBatchStreamer(stations, config)
    audio = np.concatenate(
        [batch.demodulate(full[:, :n_bytes]), batch.demodulate(full[:, n_bytes:])],
        axis=1,
    )
    for i in range(stations):
        snr = synth.tone_snr(audio[i], freqs[i], config.rate_resample, skip=200)
        assert snr > 35, f"station {i}: SNR {snr:.1f} dB"
