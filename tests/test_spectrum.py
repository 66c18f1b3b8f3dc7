"""Spectrum estimation (ops/spectrum.py) + the rtl_power scanner CLI."""

import io
import sys

import numpy as np
import pytest

from tpu_sdr.ops import spectrum as S


def synth_tone_u8(n: int, freq_frac: float, amp: float = 100.0,
                  seed: int = 0) -> np.ndarray:
    """Complex tone at ``freq_frac`` of fs (in [-0.5, 0.5)) + light noise,
    quantized to interleaved u8 I/Q."""
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    ph = 2 * np.pi * freq_frac * t
    i = amp * np.cos(ph) + rng.normal(0, 1.0, n)
    q = amp * np.sin(ph) + rng.normal(0, 1.0, n)
    u8 = np.empty(2 * n, np.uint8)
    u8[0::2] = np.clip(np.round(127.5 + i), 0, 255)
    u8[1::2] = np.clip(np.round(127.5 + q), 0, 255)
    return u8


def test_psd_peak_at_tone_bin():
    n_fft = 1024
    frac = 0.125  # +fs/8
    ps = S.PsdStreamer(n_fft)
    ps.accumulate(synth_tone_u8(64 * n_fft, frac))
    db = ps.finalize_db()
    peak = int(np.argmax(db))
    expect = n_fft // 2 + int(round(frac * n_fft))
    assert abs(peak - expect) <= 1
    # tone stands well out of the noise floor
    floor = np.median(db)
    assert db[peak] - floor > 30


def test_psd_streaming_split_invariance():
    n_fft = 512
    buf = synth_tone_u8(40 * n_fft, -0.2, seed=3)
    one = S.PsdStreamer(n_fft)
    one.accumulate(buf)
    two = S.PsdStreamer(n_fft)
    cut = 2 * 7 * n_fft + 100  # not segment-aligned: exercises _pending
    two.accumulate(buf[:cut])
    two.accumulate(buf[cut:])
    assert one.segments == two.segments
    # one-call vs split accumulation sums the same segment powers in a
    # different f32 reduce order: identical to ~1e-5 dB, not bit-exact
    np.testing.assert_allclose(two.finalize_db(), one.finalize_db(),
                               rtol=0, atol=1e-4)


def test_psd_negative_frequency_side():
    n_fft = 256
    ps = S.PsdStreamer(n_fft)
    ps.accumulate(synth_tone_u8(32 * n_fft, -0.25, seed=5))
    db = ps.finalize_db()
    peak = int(np.argmax(db))
    assert abs(peak - n_fft // 4) <= 1  # -fs/4 lands at bin n/4 (shifted)


class _TextStdout(io.StringIO):
    pass


def _run_capture_text(main, argv):
    old = sys.stdout
    sys.stdout = out = _TextStdout()
    try:
        rc = main(argv)
    finally:
        sys.stdout = old
    return rc, out.getvalue()


def _parse_rows(text):
    rows = []
    for line in text.strip().splitlines():
        parts = [p.strip() for p in line.split(",")]
        hz_low, hz_high, step = int(parts[2]), int(parts[3]), float(parts[4])
        bins = [float(v) for v in parts[6:]]
        rows.append((hz_low, hz_high, step, bins))
    return rows


def test_rtl_power_file_mode(tmp_path):
    from tpu_sdr.apps.rtl_power import main

    rate, center = 1_024_000, 100_000_000
    path = tmp_path / "cap.bin"
    path.write_bytes(synth_tone_u8(300_000, 0.125, seed=7).tobytes())
    rc, text = _run_capture_text(
        main, ["-f", str(center), "-s", str(rate), "--file", str(path)])
    assert rc == 0
    rows = _parse_rows(text)
    assert len(rows) == 1
    hz_low, hz_high, step, bins = rows[0]
    assert hz_low == center - rate // 2 and hz_high == center + rate // 2
    peak_hz = hz_low + step * int(np.argmax(bins))
    assert abs(peak_hz - (center + rate / 8)) <= 2 * step


def test_rtl_power_device_scan_multi_hop():
    """Device scan across hops on a fake dongle synthesizing WBFM at
    -fs/4 from the tuned center: rows are cropped to the usable 80% of
    each hop (band-edge rolloff), tile [low, high), and each puts its
    peak near hop_center - fs/4."""
    from tpu_sdr.apps.rtl_power import HOP_CROP, hop_centers, main
    from tpu_sdr.control import fake

    rate = 1_020_000
    low, high = 94_000_000, 94_000_000 + 2 * rate
    centers = hop_centers(low, high, rate)
    fake.clear_fake_devices()
    fake.register_fake_device(fake.FakeDeviceSpec(
        serial="pw000001",
        source_factory=lambda: fake.SynthFmSource(capture_rate=rate)))
    try:
        rc, text = _run_capture_text(
            main, ["-f", f"{low}:{high}:4k", "-s", str(rate), "-b", "2"])
    finally:
        fake.clear_fake_devices()
    assert rc == 0
    rows = _parse_rows(text)
    assert len(rows) == len(centers)
    assert low <= rows[0][0] < low + rows[0][2]  # first bin at/just above low
    assert rows[-1][1] >= high
    usable = rate * HOP_CROP
    for center, (hz_low, hz_high, step, bins) in zip(centers, rows):
        # cropped to the usable fraction around the hop center
        assert hz_low >= center - usable / 2 - step
        assert hz_high <= min(high, center + usable / 2) + step
        # contiguous tiling of the scan range (no gaps between rows)
        peak_hz = hz_low + step * int(np.argmax(bins))
        # WBFM energy spreads +-deviation (75 kHz) around the carrier
        assert abs(peak_hz - (center - rate / 4)) < 90_000, (
            f"hop at {center}: peak {peak_hz}")
    for prev, nxt in zip(rows, rows[1:]):
        assert nxt[0] <= prev[1] + prev[2]


def test_rtl_power_multi_pass_waterfall():
    """-p N repeats the scan: N x hops rows (the waterfall time series)."""
    from tpu_sdr.apps.rtl_power import main
    from tpu_sdr.control import fake

    rate = 1_020_000
    fake.clear_fake_devices()
    fake.register_fake_device(fake.FakeDeviceSpec(
        serial="pw000002",
        source_factory=lambda: fake.SynthFmSource(capture_rate=rate)))
    from tpu_sdr.apps.rtl_power import hop_centers

    n_hops = len(hop_centers(94_000_000, 94_000_000 + rate, rate))
    try:
        rc, text = _run_capture_text(
            main, ["-f", f"94M:{94_000_000 + rate}:8k", "-s", str(rate),
                   "-b", "1", "-p", "3"])
    finally:
        fake.clear_fake_devices()
    assert rc == 0
    assert len(_parse_rows(text)) == 3 * n_hops  # hops x three passes


@pytest.mark.slow
def test_rtl_power_over_rtl_tcp():
    """Remote spectrum scan: hops ride the rtl_tcp command channel, with
    a settle block discarding the server-queued pre-hop samples.  The
    frequency-aware StationSource must put each hop's peak at the
    station's true offset."""
    import threading
    import time

    from tpu_sdr import api
    from tpu_sdr.apps.rtl_power import main
    from tpu_sdr.control import fake
    from tpu_sdr.stream.rtl_tcp_server import RtlTcpServer

    rate = 1_020_000
    f_st = 95_000_000
    fake.clear_fake_devices()
    fake.register_fake_device(fake.FakeDeviceSpec(
        serial="pwtcp001",
        source_factory=lambda: fake.StationSource(
            [(f_st, 1_000.0, 40_000.0)], noise_std=0.003)))
    sdr = api.RtlSdr.open_with_index(0)
    sdr.set_sample_rate(rate)
    # queue_limit=1 + --settle 6: the infinite-rate fake keeps its queue
    # full, so each hop's first reads lag by queue + sender-in-flight +
    # socket buffers; the settle must provably exceed that (real-time
    # servers drained by a keeping-up client lag ~0-1, the default 1)
    srv = RtlTcpServer(sdr, "127.0.0.1", 0, queue_limit=1)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    deadline = time.time() + 5
    while srv.bound_port is None and time.time() < deadline:
        time.sleep(0.01)
    assert srv.bound_port is not None
    try:
        low, high = 94_400_000, 94_400_000 + 2 * rate
        rc, text = _run_capture_text(
            main, ["-f", f"{low}:{high}:8k", "-s", str(rate), "-b", "2",
                   "--settle", "6",
                   "--tcp", f"127.0.0.1:{srv.bound_port}"])
    finally:
        srv.stop()
        t.join(timeout=3)
        sdr.close()
        fake.clear_fake_devices()
    assert rc == 0
    rows = _parse_rows(text)
    assert len(rows) >= 2
    # the station must appear in exactly the hop(s) whose span covers it,
    # at its absolute frequency
    hot = [(hz_low, step, bins) for hz_low, hz_high, step, bins in rows
           if hz_low <= f_st < hz_high]
    assert hot, "no hop covered the station"
    for hz_low, step, bins in hot:
        peak_hz = hz_low + step * int(np.argmax(bins))
        assert abs(peak_hz - f_st) < 60_000, f"peak at {peak_hz}"
