"""Stereo WBFM decode: pilot-tone carrier recovery, channel separation,
streaming invariance.  (Capability beyond the reference's mono chain.)"""

import numpy as np
import pytest

from tpu_sdr.models import wbfm_stereo as ST
from tpu_sdr.utils import synth


def _tone_power_db(x, freq, fs, skip=400):
    x = np.asarray(x, np.float64)[skip:]
    x = x - x.mean()
    t = np.arange(len(x)) / fs
    c = np.abs(np.vdot(np.exp(2j * np.pi * freq * t), x)) / len(x)
    return 20 * np.log10(max(c, 1e-12))


@pytest.fixture(scope="module")
def decoded():
    config = ST.StereoConfig()
    quantum = 2 * config.base.decim * config.base.resample_down  # 1020 bytes
    n = (600_000 // (quantum // 2)) * (quantum // 2)
    u8, left, right = synth.synth_wbfm_stereo_u8(n, capture_rate=1_020_000)
    streamer = ST.WbfmStereoStreamer(config)
    audio = streamer.demodulate(u8)
    return config, audio


def test_stereo_channels_recovered(decoded):
    config, audio = decoded
    fs = config.base.rate_resample
    # left tone 800 Hz, right tone 1300 Hz
    l_in_l = _tone_power_db(audio[0], 800.0, fs)
    r_in_r = _tone_power_db(audio[1], 1300.0, fs)
    l_in_r = _tone_power_db(audio[1], 800.0, fs)
    r_in_l = _tone_power_db(audio[0], 1300.0, fs)
    sep_l = l_in_l - r_in_l
    sep_r = r_in_r - l_in_r
    assert sep_l >= 20.0, f"left separation {sep_l:.1f} dB"
    assert sep_r >= 20.0, f"right separation {sep_r:.1f} dB"


def test_stereo_streaming_invariance():
    config = ST.StereoConfig()
    n = 300_000 - (300_000 % 510)
    u8, _, _ = synth.synth_wbfm_stereo_u8(n, capture_rate=1_020_000)
    one = ST.WbfmStereoStreamer(config)
    full = one.demodulate(u8)
    two = ST.WbfmStereoStreamer(config)
    cut = (len(u8) // 2) - ((len(u8) // 2) % 1020)
    split = np.concatenate(
        [two.demodulate(u8[:cut]), two.demodulate(u8[cut:])], axis=1)
    np.testing.assert_allclose(split[:, :full.shape[1]], full, rtol=2e-3,
                               atol=2e-4)
