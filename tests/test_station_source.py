"""Frequency-aware simulator: StationSource synthesizes stations at
ABSOLUTE frequencies from the decoded register state, so retuning the
fake dongle genuinely changes what the receiver hears."""

import numpy as np
import pytest

from tpu_sdr import api
from tpu_sdr.control import fake

RATE = 1_020_000
F1, F2 = 94_900_000, 101_100_000  # two stations, far apart


@pytest.fixture
def dongle():
    fake.clear_fake_devices()
    fake.register_fake_device(fake.FakeDeviceSpec(
        serial="st000001",
        source_factory=lambda: fake.StationSource(
            [(F1, 1_000.0, 60_000.0), (F2, 1_500.0, 60_000.0)])))
    sdr = api.RtlSdr.open_with_index(0)
    sdr.set_sample_rate(RATE)
    yield sdr
    sdr.close()
    fake.clear_fake_devices()


def _peak_hz(sdr, nbytes=2 * 64 * 1024):
    from tpu_sdr.ops.spectrum import PsdStreamer

    sdr.reset_buffer()
    ps = PsdStreamer(1024)
    ps.accumulate(np.frombuffer(sdr.read_sync(nbytes), np.uint8))
    db = ps.finalize_db()
    rate = fake.decode_sample_rate(sdr._core.handle.handle)
    return (int(np.argmax(db)) - 512) / 1024 * rate, db


def test_station_appears_at_true_offset(dongle):
    """Tune capture_freq = F1 + rate/4 (the fs/4 offset convention):
    station 1 must appear at -rate/4; station 2 is out of span."""
    dongle.set_center_freq(F1 + RATE // 4)
    peak, db = _peak_hz(dongle)
    # WBFM energy spreads +-deviation around the carrier
    assert abs(peak - (-RATE / 4)) < 90_000, f"peak at {peak}"


def test_retune_switches_station(dongle):
    dongle.set_center_freq(F2 + RATE // 4)
    peak, _ = _peak_hz(dongle)
    assert abs(peak - (-RATE / 4)) < 90_000
    # and tuned into empty spectrum: no station-grade peak at all
    dongle.set_center_freq(F1 + 20_000_000)
    _, db = _peak_hz(dongle)
    assert db.max() - np.median(db) < 15, "phantom station in empty band"


F_HF = 7_100_000  # below xtal/2 = 14.4 MHz: direct-sampling territory


@pytest.fixture
def hf_dongle():
    fake.clear_fake_devices()
    fake.register_fake_device(fake.FakeDeviceSpec(
        serial="hf000001",
        source_factory=lambda: fake.StationSource(
            [(F_HF, 1_000.0, 5_000.0), (F1, 1_000.0, 60_000.0)])))
    sdr = api.RtlSdr.open_with_index(0)
    sdr.set_sample_rate(RATE)
    yield sdr
    sdr.close()
    fake.clear_fake_devices()


def test_direct_sampling_data_plane(hf_dongle):
    """Direct sampling bypasses the tuner: DDC-only tuning reaches the HF
    station (invisible to the tuner path), and OnSwap provably mirrors
    (conjugates) the spectrum — the I/Q swap of rtlsdr.rs:292-348
    reaching the served samples."""
    sdr = hf_dongle
    # tuner path first: the HF station must NOT be reachable (offset is
    # far outside any tuner capture span)
    sdr.set_center_freq(F1 + RATE // 4)
    peak, _ = _peak_hz(sdr)
    assert abs(peak - (-RATE / 4)) < 90_000

    sdr.set_direct_sampling(api.DirectSampleMode.ON)
    sdr.set_center_freq(F_HF + 100_000)  # DDC tune: station at -100 kHz
    peak, _ = _peak_hz(sdr)
    assert abs(peak - (-100_000)) < 25_000, f"ds-on peak at {peak}"

    sdr.set_direct_sampling(api.DirectSampleMode.ON_SWAP)
    sdr.set_center_freq(F_HF + 100_000)
    peak_sw, _ = _peak_hz(sdr)
    assert abs(peak_sw - 100_000) < 25_000, (
        f"on_swap must mirror the spectrum: peak at {peak_sw}")

    # back to the tuner path: HF gone, VHF station back.  NB the
    # reference leaves the DDC IF stale on ds-off with an R82xx (the
    # restore is commented out, rtlsdr.rs:327-331: "tuner init already
    # does all this" — it does not); the driver is bug-compatible, so a
    # rate reconfigure (whose r82xx branch rewrites the IF) is required,
    # exactly as real apps do after a mode switch.
    sdr.set_direct_sampling(api.DirectSampleMode.OFF)
    sdr.set_sample_rate(RATE)
    sdr.set_center_freq(F1 + RATE // 4)
    peak, _ = _peak_hz(sdr)
    assert abs(peak - (-RATE / 4)) < 90_000, f"post-ds retune peak {peak}"


def test_direct_sampling_register_decode(hf_dongle):
    sdr = hf_dongle
    backend = sdr._core.handle.handle
    assert fake.decode_direct_sampling(backend) == "off"
    sdr.set_direct_sampling(api.DirectSampleMode.ON)
    assert fake.decode_direct_sampling(backend) == "on"
    sdr.set_direct_sampling(api.DirectSampleMode.ON_SWAP)
    assert fake.decode_direct_sampling(backend) == "on_swap"
    sdr.set_direct_sampling(api.DirectSampleMode.OFF)
    assert fake.decode_direct_sampling(backend) == "off"


def test_simple_fm_device_mode_receives_right_station(dongle):
    """End to end: the WBFM receiver on the fake DEVICE path decodes
    station 1's 1 kHz program when tuned to F1, and station 2's 1.5 kHz
    program when tuned to F2 — the full control plane (PLL + DDC + ratio
    registers) feeding the frequency-aware antenna."""
    from tpu_sdr.models import wbfm
    from tpu_sdr.utils import synth

    for f_target, tone in ((F1, 1_000.0), (F2, 1_500.0)):
        dongle.set_center_freq(f_target + RATE // 4)
        dongle.reset_buffer()
        rx = wbfm.WbfmStreamer(wbfm.WbfmConfig(filter_mode="fir"))
        audio = []
        for _ in range(4):
            audio.append(rx.demodulate(
                np.frombuffer(dongle.read_sync(262_144), np.uint8)))
        pcm = np.concatenate(audio).astype(np.float64)
        snr = synth.tone_snr(pcm, tone, 32_000, skip=1500)
        assert snr > 20, f"station at {f_target}: tone {tone} Hz {snr:.1f} dB"


def test_blog_v4_r828d_end_to_end_receive():
    """A Blog-V4 fake (R828D at I2C 0x74, V4 input-select/notch paths in
    the driver) must receive a station end to end: the R828D PLL
    programming chain feeding the frequency-aware antenna, plus the
    rtl_tcp tuner-type identity."""
    from tpu_sdr.models import wbfm
    from tpu_sdr.utils import synth

    fake.clear_fake_devices()
    fake.register_fake_device(fake.FakeDeviceSpec(
        serial="v4000001", is_blog_v4=True,
        source_factory=lambda: fake.StationSource(
            [(F1, 1_000.0, 60_000.0)])))
    sdr = api.RtlSdr.open_with_index(0)
    try:
        assert sdr.get_tuner_id() == api.TunerId.R828D
        sdr.set_sample_rate(RATE)
        sdr.set_center_freq(F1 + RATE // 4)
        sdr.reset_buffer()
        rx = wbfm.WbfmStreamer(wbfm.WbfmConfig(filter_mode="fir"))
        audio = []
        for _ in range(4):
            audio.append(rx.demodulate(
                np.frombuffer(sdr.read_sync(262_144), np.uint8)))
        pcm = np.concatenate(audio).astype(np.float64)
        snr = synth.tone_snr(pcm, 1_000.0, 32_000, skip=1500)
        assert snr > 20, f"V4/R828D receive: {snr:.1f} dB"
    finally:
        sdr.close()
        fake.clear_fake_devices()
