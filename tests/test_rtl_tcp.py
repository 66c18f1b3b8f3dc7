"""rtl_tcp server <-> client protocol tests over a fake device.

The reference has no automated rtl_tcp tests at all; here the full wire
protocol (handshake, commands, streaming, backpressure survival, client
reconnect) is exercised end-to-end through a loopback socket.
"""

import socket
import struct
import threading
import time

import pytest

from tpu_sdr import api
from tpu_sdr.control import fake
from tpu_sdr.stream.feeder import RtlTcpClientSource
from tpu_sdr.stream.rtl_tcp_server import RtlTcpServer


@pytest.fixture()
def server():
    fake.clear_fake_devices()
    fake.register_fake_device()
    sdr = api.RtlSdr.open_with_index(0)
    sdr.set_sample_rate(2_048_000)
    sdr.set_center_freq(100_000_000)
    sdr.reset_buffer()
    srv = RtlTcpServer(sdr, "127.0.0.1", 0, queue_limit=16)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    deadline = time.time() + 5
    while srv.bound_port is None and time.time() < deadline:
        time.sleep(0.01)
    assert srv.bound_port is not None
    yield srv
    srv.stop()
    t.join(timeout=3)
    sdr.close()
    fake.clear_fake_devices()


def test_handshake_and_stream(server):
    client = RtlTcpClientSource("127.0.0.1", server.bound_port)
    assert client.tuner_type == 5  # R820T (ref rtl_tcp.rs:699-708)
    assert client.gain_count == 29
    data = client.read_block(4096)
    assert data is not None and len(data) == 4096
    client.close()


def test_commands_applied(server):
    client = RtlTcpClientSource("127.0.0.1", server.bound_port)
    client.set_frequency(94_900_000)
    client.set_gain_mode(True)
    client.set_gain(297)
    client.set_test_mode(True)
    # drain some data so commands have certainly been processed
    for _ in range(4):
        assert client.read_block(4096) is not None
    deadline = time.time() + 3
    while server.sdr.get_center_freq() != 94_900_000 and time.time() < deadline:
        time.sleep(0.02)
    assert server.sdr.get_center_freq() == 94_900_000
    client.close()


def test_test_mode_counter_over_tcp(server):
    client = RtlTcpClientSource("127.0.0.1", server.bound_port)
    client.set_test_mode(True)
    time.sleep(0.3)  # let the mode flip between blocks
    data = client.read_block(65536)
    # find a counter run: consecutive bytes incrementing mod 256
    best = run = 0
    for i in range(1, len(data)):
        if data[i] == (data[i - 1] + 1) & 0xFF:
            run += 1
            best = max(best, run)
        else:
            run = 0
    assert best > 1000, f"no counter pattern seen (best run {best})"
    client.close()


def test_client_reconnect(server):
    c1 = RtlTcpClientSource("127.0.0.1", server.bound_port)
    assert c1.read_block(1024)
    c1.close()
    # server must survive the disconnect and accept a new client
    # (ref rtl_tcp.rs:100-126 re-enter accept loop)
    for _ in range(50):
        try:
            c2 = RtlTcpClientSource("127.0.0.1", server.bound_port)
            break
        except (ConnectionError, OSError):
            time.sleep(0.1)
    else:
        pytest.fail("server did not accept a second client")
    assert c2.read_block(1024)
    c2.close()


def test_unknown_command_ignored(server):
    client = RtlTcpClientSource("127.0.0.1", server.bound_port)
    client.command(0x7F, 123)  # not a real opcode
    assert client.read_block(1024) is not None  # stream still alive
    client.close()


def test_all_fourteen_opcodes_survive(server):
    """Every protocol opcode 0x01-0x0e (ref rtl_tcp.rs:659-677) must be
    accepted without killing the stream — including the reference's
    logged no-ops (IfGain/AgcMode/OffsetTuning/Xtal)."""
    client = RtlTcpClientSource("127.0.0.1", server.bound_port)
    cmds = [
        (0x01, 100_000_000),  # SetFrequency
        (0x02, 2_048_000),    # SetSampleRate
        (0x03, 1),            # SetGainMode manual
        (0x04, 297),          # SetGain
        (0x05, 10),           # SetFreqCorrection
        (0x06, 0x0102),       # SetIfGain (no-op)
        (0x07, 0),            # SetTestMode off
        (0x08, 1),            # SetAgcMode (no-op)
        (0x09, 0),            # SetDirectSampling off
        (0x0A, 1),            # SetOffsetTuning (no-op)
        (0x0B, 28_800_000),   # SetRtlXtal (no-op)
        (0x0C, 28_800_000),   # SetTunerXtal (no-op)
        (0x0D, 3),            # SetGainByIndex
        (0x0E, 0),            # SetBiasTee off
    ]
    for op, param in cmds:
        client.command(op, param)
    for _ in range(4):
        assert client.read_block(4096) is not None
    deadline = time.time() + 3
    while server.sdr.get_center_freq() != 100_000_000 and time.time() < deadline:
        time.sleep(0.02)
    assert server.sdr.get_center_freq() == 100_000_000
    assert server.sdr.get_sample_rate() == 2_048_000
    assert server.sdr.get_freq_correction() == 10
    client.close()
