"""device_list — enumeration and open-path demo.

Mirrors /root/reference/examples/device_list.rs: list devices, then exercise
each open path (first-available, by index, by serial, info, serial lookup).
"""

from __future__ import annotations

import sys

from tpu_sdr.api import RtlSdr, get_device_count, get_device_info, get_device_serial, list_devices


def main(argv=None) -> int:
    print("RTL-SDR Device Enumeration Example")
    print("===================================\n")

    count = get_device_count()
    print(f"Found {count} RTL-SDR device(s)\n")
    if count == 0:
        print("No RTL-SDR devices found. Please connect a device and try again.")
        print("(hint: set TPU_SDR_FAKE_DEVICES=1 for a simulated dongle)")
        return 0

    print("Device List:")
    print("-----------")
    devices = list_devices()
    for d in devices:
        print(f"Device #{d.index}:")
        print(f"  Manufacturer: {d.manufacturer}")
        print(f"  Product:      {d.product}")
        print(f"  Serial:       {d.serial}")
        print(f"  VID:PID:      {d.vendor_id:04x}:{d.product_id:04x}")
        print()

    print("Example 1: Opening first available device...")
    try:
        sdr = RtlSdr.open_first_available()
        print("+ Successfully opened first device")
        print(f"  Center Frequency: {sdr.get_center_freq()} Hz")
        print(f"  Sample Rate:      {sdr.get_sample_rate()} Hz")
        sdr.close()
    except Exception as e:
        print(f"- Failed to open device: {e}")
    print()

    print("Example 2: Opening device by index 0...")
    try:
        sdr = RtlSdr.open_with_index(0)
        print("+ Successfully opened device at index 0")
        print(f"  Center Frequency: {sdr.get_center_freq()} Hz")
        sdr.close()
    except Exception as e:
        print(f"- Failed to open device: {e}")
    print()

    if devices:
        serial = devices[0].serial
        print(f"Example 3: Opening device by serial number '{serial}'...")
        try:
            sdr = RtlSdr.open_with_serial(serial)
            print(f"+ Successfully opened device with serial '{serial}'")
            sdr.close()
        except Exception as e:
            print(f"- Failed to open device: {e}")
        print()

    print("Example 4: Getting device info for index 0...")
    try:
        info = get_device_info(0)
        print("+ Device information retrieved:")
        print(f"  Serial: {info.serial}")
        print(f"  Product: {info.product}")
    except Exception as e:
        print(f"- Failed to get device info: {e}")
    print()

    print("Example 5: Getting serial number for index 0...")
    try:
        print(f"+ Serial number: {get_device_serial(0)}")
    except Exception as e:
        print(f"- Failed to get serial: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
