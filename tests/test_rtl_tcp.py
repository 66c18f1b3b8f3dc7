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
    # commands apply on their own thread: wait for one that CHANGES state
    # (center_freq already equals the target, so it cannot be the barrier)
    deadline = time.time() + 3
    while server.sdr.get_freq_correction() != 10 and time.time() < deadline:
        time.sleep(0.02)
    assert server.sdr.get_center_freq() == 100_000_000
    assert server.sdr.get_sample_rate() == 2_048_000
    assert server.sdr.get_freq_correction() == 10
    client.close()


@pytest.fixture()
def fanout_server():
    fake.clear_fake_devices()
    fake.register_fake_device()
    sdr = api.RtlSdr.open_with_index(0)
    sdr.set_sample_rate(2_048_000)
    sdr.reset_buffer()
    srv = RtlTcpServer(sdr, "127.0.0.1", 0, queue_limit=8, max_clients=2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    deadline = time.time() + 5
    while srv.bound_port is None and time.time() < deadline:
        time.sleep(0.01)
    assert srv.bound_port is not None
    yield srv
    srv.stop()
    t.join(timeout=5)
    sdr.close()
    fake.clear_fake_devices()


def _counter_continuous(data: bytes) -> bool:
    return all(data[i + 1] == (data[i] + 1) % 256 for i in range(0, 512))


def test_fanout_two_clients_full_stream(fanout_server):
    """Both concurrent clients receive the complete continuous stream from
    the single acquisition loop."""
    a = RtlTcpClientSource("127.0.0.1", fanout_server.bound_port)
    b = RtlTcpClientSource("127.0.0.1", fanout_server.bound_port)
    assert a.tuner_type == 5 and b.tuner_type == 5
    a.set_test_mode(True)  # either client may command the shared device
    time.sleep(0.3)
    for client in (a, b):
        data = client.read_block(262144)
        assert len(data) == 262144
        assert _counter_continuous(bytes(data)), "gap in fanned-out stream"
    a.close()
    b.close()


def test_fanout_backpressure_isolated(fanout_server):
    """A stalled client fills only its own queue; its peer keeps reading a
    continuous stream and the stall is charged to the right session."""
    slow = RtlTcpClientSource("127.0.0.1", fanout_server.bound_port)
    fast = RtlTcpClientSource("127.0.0.1", fanout_server.bound_port)
    fast.set_test_mode(True)
    # never read from `slow`: its 8-block queue must overflow
    deadline = time.time() + 10
    while time.time() < deadline:
        with fanout_server._sessions_lock:
            drops = [s.drops for s in fanout_server._sessions]
        if any(d > 3 for d in drops):
            break
        data = fast.read_block(262144)
        assert _counter_continuous(bytes(data)), "fast client saw a gap"
    assert any(d > 3 for d in drops), f"no drops recorded: {drops}"
    slow.close()
    fast.close()


def test_fanout_refuses_extra_client(fanout_server):
    """A third connection beyond max_clients is closed, not served."""
    a = RtlTcpClientSource("127.0.0.1", fanout_server.bound_port)
    b = RtlTcpClientSource("127.0.0.1", fanout_server.bound_port)
    extra = socket.create_connection(("127.0.0.1",
                                      fanout_server.bound_port), timeout=3)
    extra.settimeout(3)
    got = b""
    try:
        while len(got) < 12:
            chunk = extra.recv(12 - len(got))
            if not chunk:
                break
            got += chunk
    except socket.timeout:
        pass
    assert len(got) < 12, "server handshook a client beyond max_clients"
    extra.close()
    a.close()
    b.close()


def test_fanout_client_leaves_and_slot_reopens(fanout_server):
    """Closing a client frees its slot for a new connection."""
    a = RtlTcpClientSource("127.0.0.1", fanout_server.bound_port)
    b = RtlTcpClientSource("127.0.0.1", fanout_server.bound_port)
    b.close()
    deadline = time.time() + 5
    while time.time() < deadline:
        with fanout_server._sessions_lock:
            if len(fanout_server._sessions) <= 1:
                break
        time.sleep(0.05)
    c = RtlTcpClientSource("127.0.0.1", fanout_server.bound_port)
    assert c.tuner_type == 5
    assert len(c.read_block(4096)) == 4096
    a.close()
    c.close()
