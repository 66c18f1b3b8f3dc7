"""Control-plane tests: register wire protocol, fake-device init, tuner
logic, API facade.

Mirrors the reference's test strategy (/root/reference/src/device/
device_test.rs) — the register encodings are asserted at the USB boundary —
but against the behavioral simulator instead of per-test mocks, which also
lets the *entire* init sequence run (something the reference never tests).
"""

import pytest

from tpu_sdr import api
from tpu_sdr.control import constants as C
from tpu_sdr.control import fake
from tpu_sdr.control.r82xx import R82xx, bit_reverse
from tpu_sdr.control.rtlsdr import DEFAULT_FIR, SdrCore, pack_fir
from tpu_sdr.control.transport import Device
from tpu_sdr.errors import DeviceNotFoundError, InvalidConfigError


@pytest.fixture(autouse=True)
def _clean_registry():
    fake.clear_fake_devices()
    yield
    fake.clear_fake_devices()


def make_device():
    backend = fake.FakeUsbBackend()
    return Device(backend), backend


# ---------------------------------------------------------------------------
# Wire protocol (ref device_test.rs:13-182)
# ---------------------------------------------------------------------------

def test_write_reg_u8_wire_format():
    dev, backend = make_device()
    dev.write_reg(C.BLOCK_SYS, C.GPO, 0xEF, 1)
    kind, value, index, data = backend.log[-1]
    assert (kind, value) == ("write", C.GPO)
    assert index == (C.BLOCK_SYS << 8) | 0x10  # write marker
    assert data == b"\xef"


def test_write_reg_u16_wire_format_big_endian():
    dev, backend = make_device()
    dev.write_reg(C.BLOCK_SYS, C.GPO, 0xEFAB, 2)
    _, _, index, data = backend.log[-1]
    assert index == (C.BLOCK_SYS << 8) | 0x10
    assert data == b"\xef\xab"  # big-endian on the wire


def test_read_reg_u16_little_endian():
    dev, backend = make_device()
    backend.sys_regs[(C.BLOCK_SYS, C.GPO)] = 0x0123
    assert dev.read_reg(C.BLOCK_SYS, C.GPO, 2) == 0x0123
    kind, value, index, length = backend.log[-1]
    assert (kind, value, index) == ("read", C.GPO, C.BLOCK_SYS << 8)


def test_demod_reg_roundtrip_and_addressing():
    dev, backend = make_device()
    dev.demod_write_reg(1, 0x15, 0x42, 1)
    # the write must carry (addr<<8)|0x20 and index 0x10|page, and be
    # followed by the page-0x0a readback (ref device/mod.rs:114-139)
    writes = [e for e in backend.log if e[0] == "write"]
    reads = [e for e in backend.log if e[0] == "read"]
    assert writes[-1][1] == (0x15 << 8) | 0x20
    assert writes[-1][2] == 0x10 | 1
    assert reads[-1][1] == (0x01 << 8) | 0x20 and reads[-1][2] == 0x0A
    assert dev.demod_read_reg(1, 0x15) == 0x42


def test_eeprom_read_protocol():
    dev, backend = make_device()
    backend.eeprom[10:14] = b"\x12\x34\x56\x78"
    data = dev.read_eeprom(10, 4)
    assert data == b"\x12\x34\x56\x78"


def test_eeprom_out_of_range_rejected():
    dev, _ = make_device()
    with pytest.raises(AssertionError):
        dev.read_eeprom(C.EEPROM_SIZE, 5)


# ---------------------------------------------------------------------------
# FIR packing (ref rtlsdr.rs:525-558)
# ---------------------------------------------------------------------------

def test_pack_fir_layout():
    # Example from the reference comment: fir 4b5, 7f8, 3e8, 619 ->
    # bytes 4b 57 f8 3e 86 19 (rtlsdr.rs:536-539)
    fir = list(DEFAULT_FIR[:8]) + [0x4B5, 0x7F8, 0x3E8, 0x619, 0, 0, 0, 0]
    packed = pack_fir(fir)
    assert packed[8:14] == bytes([0x4B, 0x57, 0xF8, 0x3E, 0x86, 0x19])
    assert len(packed) == 20


def test_pack_fir_bounds():
    bad = list(DEFAULT_FIR)
    bad[0] = 200  # out of i8
    with pytest.raises(InvalidConfigError):
        pack_fir(bad)
    bad = list(DEFAULT_FIR)
    bad[8] = 3000  # out of i12
    with pytest.raises(InvalidConfigError):
        pack_fir(bad)


# ---------------------------------------------------------------------------
# Full init against the simulator (the reference cannot test this)
# ---------------------------------------------------------------------------

def test_full_init_detects_r820t():
    dev, backend = make_device()
    core = SdrCore(dev)
    core.init()
    assert core.get_tuner_id() == "r820t"
    assert 0 in backend.claimed
    # baseband init wrote the USB sysctl register (rtlsdr.rs:416)
    assert backend.sys_regs[(C.BLOCK_USB, C.USB_SYSCTL)] == 0x09
    # FIR registers hold the packed default image (rtlsdr.rs:525-558)
    packed = pack_fir(DEFAULT_FIR)
    for i, b in enumerate(packed):
        assert backend.demod_regs[(1, 0x1C + i)] == b
    # I2C repeater left disabled after init (rtlsdr.rs:129)
    assert backend.demod_regs[(1, 0x01)] == 0x10


def test_init_reads_eeprom_hack_bits():
    spec = fake.FakeDeviceSpec()
    eeprom = spec.make_eeprom()
    eeprom[7] = 0x01  # IR bit 0 -> force_bt; remote bit 1 -> force_ds
    backend = fake.FakeUsbBackend(fake.dataclass_replace(spec, eeprom=bytes(eeprom)))
    core = SdrCore(Device(backend))
    core.init()
    assert core.force_bt is True
    assert core.force_ds is True


def test_set_sample_rate_programs_ratio():
    dev, backend = make_device()
    core = SdrCore(dev)
    core.init()
    core.set_sample_rate(2_048_000)
    # rsamp_ratio = (28.8e6 * 2^22 / 2.048e6) & ~3 (rtlsdr.rs:223-225)
    ratio = (28_800_000 * (1 << 22) // 2_048_000) & 0x0FFFFFFC
    assert backend.demod_regs[(1, 0x9F)] == (ratio >> 16) & 0xFFFF
    assert backend.demod_regs[(1, 0xA1)] == ratio & 0xFFFF
    assert core.get_sample_rate() == 2_048_000


@pytest.mark.parametrize("rate", [100_000, 225_000, 400_000, 900_000, 3_300_000])
def test_invalid_sample_rates_rejected(rate):
    dev, _ = make_device()
    core = SdrCore(dev)
    core.init()
    with pytest.raises(InvalidConfigError):
        core.set_sample_rate(rate)


def test_set_center_freq_tracks_and_programs_pll():
    dev, backend = make_device()
    core = SdrCore(dev)
    core.init()
    core.set_sample_rate(1_020_000)
    core.set_center_freq(94_900_000 + 255_000)
    assert core.get_center_freq() == 95_155_000
    assert isinstance(core.tuner, R82xx)
    assert core.tuner.has_lock


def test_testmode_register():
    dev, backend = make_device()
    core = SdrCore(dev)
    core.init()
    core.set_testmode(True)
    assert backend.demod_regs[(0, 0x19)] == 0x03
    core.set_testmode(False)
    assert backend.demod_regs[(0, 0x19)] == 0x05


def test_testmode_counter_pattern():
    dev, backend = make_device()
    core = SdrCore(dev)
    core.init()
    core.set_testmode(True)
    data = core.read_sync(16)
    assert list(data) == list(range(16))
    data = core.read_sync(4)
    assert list(data) == [16, 17, 18, 19]


def test_bias_tee_sets_gpio0():
    dev, backend = make_device()
    core = SdrCore(dev)
    core.init()
    core.set_bias_tee(True)
    assert backend.sys_regs[(C.BLOCK_SYS, C.GPO)] & 0x01
    core.set_bias_tee(False)
    assert not backend.sys_regs[(C.BLOCK_SYS, C.GPO)] & 0x01


def test_direct_sampling_modes():
    dev, backend = make_device()
    core = SdrCore(dev)
    core.init()
    core.set_direct_sampling("on_swap")
    assert backend.demod_regs[(0, 0x06)] == 0x90
    core.set_direct_sampling("off")
    assert backend.demod_regs[(0, 0x06)] == 0x80


# ---------------------------------------------------------------------------
# Tuner specifics
# ---------------------------------------------------------------------------

def test_bit_reverse():
    assert bit_reverse(0x01) == 0x80
    assert bit_reverse(0xF0) == 0x0F
    assert bit_reverse(bit_reverse(0xA7)) == 0xA7


def test_tuner_gain_table():
    dev, _ = make_device()
    core = SdrCore(dev)
    core.init()
    gains = core.get_tuner_gains()
    assert len(gains) == 29
    assert gains[0] == 0 and gains[-1] == 496  # r82xx.rs:53-56


def test_manual_gain_ladder_registers():
    dev, backend = make_device()
    core = SdrCore(dev)
    core.init()
    core.set_tuner_gain(297)  # tenth-dB
    tuner = core.tuner
    lna = tuner.read_cache_reg(0x05) & 0x0F
    mix = tuner.read_cache_reg(0x07) & 0x0F
    # ladder walk must produce a cumulative gain >= requested
    from tpu_sdr.control.r82xx import LNA_GAIN_STEPS, MIXER_GAIN_STEPS

    total = sum(LNA_GAIN_STEPS[1 : lna + 1]) + sum(MIXER_GAIN_STEPS[1 : mix + 1])
    assert total >= 297


def test_bandwidth_if_freq_math():
    """IF filter selection updates int_freq (r82xx.rs:543-604)."""
    dev, _ = make_device()
    core = SdrCore(dev)
    core.init()
    core.tuner.set_bandwidth(dev, 1_020_000, 1_020_000)
    # narrow path: int_freq = 2.3M (+hp corners) - real_bw/2
    assert 1_000_000 < core.tuner.get_if_freq() < 4_000_000


def test_blog_v4_detection_and_upconvert():
    spec = fake.FakeDeviceSpec(is_blog_v4=True)
    backend = fake.FakeUsbBackend(spec)
    core = SdrCore(Device(backend))
    core.init()
    # the V4 board's R828D is probed at 0x74 (the 0x34 probe NAKs) and
    # the USB strings mark it Blog V4, which keeps the 28.8 MHz xtal
    assert core.tuner.chip == "r828d" and core.tuner.is_blog_v4
    assert core.tuner_xtal == 28_800_000  # V4 keeps 28.8 MHz (rtlsdr.rs:97-100)


def test_blog_mod_env_flag(monkeypatch):
    """TPU_SDR_BLOG_MOD=1 (the CI analog of the reference's rtl_sdr_blog
    cargo feature) flips every api.open to the blog driver variants; an
    explicit blog_mod argument still wins."""
    fake.register_fake_device()
    monkeypatch.setenv("TPU_SDR_BLOG_MOD", "1")
    with api.RtlSdr.open_with_index(0) as sdr:
        assert sdr._core.blog_mod is True
        assert sdr._core.tuner.blog_mod is True
    monkeypatch.delenv("TPU_SDR_BLOG_MOD")
    with api.RtlSdr.open_with_index(0) as sdr:
        assert sdr._core.blog_mod is False
    monkeypatch.setenv("TPU_SDR_BLOG_MOD", "1")
    with api.RtlSdr.open(api.DeviceId.index(0), blog_mod=False) as sdr:
        assert sdr._core.blog_mod is False


# ---------------------------------------------------------------------------
# API facade + enumeration
# ---------------------------------------------------------------------------

def test_enumeration_and_open_by_index_and_serial():
    fake.register_fake_device()
    fake.register_fake_device()
    devices = api.list_devices()
    assert len(devices) == 2
    assert devices[0].index == 0 and devices[1].index == 1

    sdr = api.RtlSdr.open_with_index(0)
    assert sdr.get_tuner_id() == api.TunerId.R820T
    sdr.close()

    serial = devices[1].serial
    sdr = api.RtlSdr.open_with_serial(serial)
    sdr.close()

    assert api.get_device_serial(1) == serial
    with pytest.raises(DeviceNotFoundError):
        api.get_device_info(5)


def test_open_first_available_and_sensors():
    fake.register_fake_device()
    sdr = api.RtlSdr.open_first_available()
    sensors = sdr.list_sensors()
    assert len(sensors) == 3
    v = sdr.read_sensor(api.Sensor.TUNER_TYPE)
    assert v.value == "r820t"
    v = sdr.read_sensor(api.Sensor.FREQUENCY_CORRECTION_PPM)
    assert v.value == 0
    sdr.close()


def test_read_sync_streams_iq():
    fake.register_fake_device()
    sdr = api.RtlSdr.open_with_index(0)
    sdr.set_sample_rate(2_048_000)
    sdr.set_center_freq(100_000_000)
    sdr.reset_buffer()
    data = sdr.read_sync(4096)
    assert len(data) == 4096
    sdr.close()


def test_device_id_variants():
    assert api.DeviceId.index(0) == api.DeviceId("index", 0)
    assert api.DeviceId.fd(42) == api.DeviceId("fd", 42)
    assert api.DeviceId.index(0) != api.DeviceId.fd(42)


def test_parse_scaled_units():
    """k/M/G suffix parsing (ref rtl_tcp.rs:134-289 flag scaling)."""
    from tpu_sdr.utils.units import parse_scaled

    assert parse_scaled("94.9M") == 94_900_000
    assert parse_scaled("2048k") == 2_048_000
    assert parse_scaled("1.7G") == 1_700_000_000
    assert parse_scaled("170000") == 170_000


def test_open_errors_and_context_manager():
    """Negative paths of the public facade (ref open error semantics)."""
    from tpu_sdr import api
    from tpu_sdr.control import fake
    from tpu_sdr.errors import DeviceNotFoundError

    fake.clear_fake_devices()
    fake.register_fake_device()
    with pytest.raises(DeviceNotFoundError):
        api.RtlSdr.open_with_index(5)
    with pytest.raises(DeviceNotFoundError):
        api.RtlSdr.open_with_serial("nope")
    with pytest.raises(DeviceNotFoundError):
        api.RtlSdr.open_with_fd(10**6)  # not an open fd
    with api.RtlSdr.open_with_index(0) as sdr:  # context manager closes
        assert sdr.get_tuner_id() == "r820t"
    fake.clear_fake_devices()


def test_open_fd_reaches_libusb_wrap():
    """DeviceId.fd routes to libusb_wrap_sys_device (ref
    device_handle.rs:96-121): a non-USB fd (a pipe) must be REJECTED BY
    LIBUSB — the error carries libusb's code, proving the wrap was
    attempted rather than short-circuited."""
    import os

    from tpu_sdr import api
    from tpu_sdr.control.usb import LibusbBackend, _Libusb
    from tpu_sdr.errors import DeviceNotFoundError, UsbError

    try:
        usb = _Libusb.get()
    except (OSError, UsbError):
        pytest.skip("libusb-1.0 not loadable here")
    if not usb.has_wrap:
        pytest.skip("libusb < 1.0.23: no wrap_sys_device")

    r, w = os.pipe()
    try:
        with pytest.raises(UsbError, match="wrap_sys_device"):
            LibusbBackend.open_fd(r)
        # and through the public facade it surfaces as DeviceNotFound
        with pytest.raises(DeviceNotFoundError, match="Cannot open fd"):
            api.RtlSdr.open(api.DeviceId.fd(r))
    finally:
        os.close(r)
        os.close(w)


def test_sysfreq_sel_delivery_system_tables():
    """The full per-delivery-system AGC tables survive (ref
    r82xx.rs:809-964): ISDB-T raises the LNA detector threshold, hot
    DVB-T channels drop the charge-pump current and divider buffer, and
    the analog-TV path programs the 1 kHz AGC clock instead of 60 Hz."""
    dev, backend = make_device()
    core = SdrCore(dev)
    core.init()
    tuner = core.tuner
    core.set_i2c_repeater(True)
    try:
        tuner.sysfreq_sel(dev, 0, delivery_system="isdbt")
        assert backend.tuner_regs[0x0D] == 0x75
        tuner.sysfreq_sel(dev, 0, delivery_system="dvbt")
        assert backend.tuner_regs[0x0D] == 0x53
        assert (backend.tuner_regs[0x11] & 0x38) == 0x38  # cp auto
        tuner.sysfreq_sel(dev, 506_000_000, delivery_system="dvbt")
        assert (backend.tuner_regs[0x11] & 0x38) == 0x28  # hot channel cp
        assert (backend.tuner_regs[0x1C] & 0xF8) == (0x14 & 0xF8)  # mix top
        tuner.sysfreq_sel(dev, 0, tuner_type="analog_tv")
        assert (backend.tuner_regs[0x1A] & 0x30) == 0x00  # agc clk 1 kHz
        assert (backend.tuner_regs[0x1D] & 0x38) == (0xE5 & 0x38)  # LNA TOP
        tuner.sysfreq_sel(dev, 0)  # defaults = (digital_tv, dvbt)
        assert (backend.tuner_regs[0x1A] & 0x30) == 0x20  # agc clk 60 Hz
    finally:
        core.set_i2c_repeater(False)


# ---------------------------------------------------------------------------
# PLL register inversion (frequency-aware simulator ground truth)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("freq", [25_000_000, 100_000_000, 434_000_000,
                                  868_000_000, 1_200_000_000, 1_766_000_000])
def test_decode_tuned_freq_roundtrip(freq):
    """fake.decode_tuned_freq inverts the registers the REAL R82xx driver
    wrote: set_center_freq(f) across the tuning range round-trips through
    the PLL (mix_div/Nint/SDM) + DDC-IF register state to within the SDM
    quantization (<1 kHz)."""
    fake.clear_fake_devices()
    fake.register_fake_device()
    sdr = api.RtlSdr.open_with_index(0)
    try:
        sdr.set_center_freq(freq)
        backend = sdr._core.handle.handle
        got = fake.decode_tuned_freq(backend)
        assert abs(got - freq) < 1000, f"{freq} decoded as {got}"
    finally:
        sdr.close()
        fake.clear_fake_devices()


def test_decode_tuned_freq_tracks_retune():
    fake.clear_fake_devices()
    fake.register_fake_device()
    sdr = api.RtlSdr.open_with_index(0)
    try:
        backend = sdr._core.handle.handle
        for f in (94_900_000, 105_300_000, 162_550_000):
            sdr.set_center_freq(f)
            assert abs(fake.decode_tuned_freq(backend) - f) < 1000
    finally:
        sdr.close()
        fake.clear_fake_devices()


def test_decode_tuned_freq_blog_v4_r828d():
    """A Blog-V4 fake carries an R828D at I2C 0x74 (the R820T probe at
    0x34 NAKs, like real hardware), so the driver runs its R828D paths;
    the fake serves vco_fine_tune == R828D's vco_power_ref so the PLL
    inversion still round-trips exactly."""
    fake.clear_fake_devices()
    fake.register_fake_device(fake.FakeDeviceSpec(is_blog_v4=True))
    sdr = api.RtlSdr.open_with_index(0)
    try:
        assert sdr.get_tuner_id() == api.TunerId.R828D
        backend = sdr._core.handle.handle
        assert backend.tuner_i2c_addr == 0x74
        for f in (100_000_000, 434_000_000, 1_090_000_000):
            sdr.set_center_freq(f)
            got = fake.decode_tuned_freq(backend)
            assert abs(got - f) < 1000, f"{f} decoded as {got}"
    finally:
        sdr.close()
        fake.clear_fake_devices()
