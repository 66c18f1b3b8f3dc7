"""demo_device_id — the DeviceId open-path demo.

Mirrors /root/reference/examples/demo_device_id.rs: open by
``DeviceId.index``, by convenience function, and by fd (expected to fail
without a wrapped system device).
"""

from __future__ import annotations

import sys

from tpu_sdr.api import DeviceId, RtlSdr


def main(argv=None) -> int:
    print("RTL-SDR DeviceId Demo")
    print("================")

    print("1. Opening device using DeviceId.index(0):")
    try:
        RtlSdr.open(DeviceId.index(0))
        print("   + Successfully opened device with index 0")
    except Exception as e:
        print(f"   - Failed to open device: {e}")

    print("2. Opening device using convenience function open_with_index(0):")
    try:
        RtlSdr.open_with_index(0)
        print("   + Successfully opened device with index 0")
    except Exception as e:
        print(f"   - Failed to open device: {e}")

    print("3. Opening device using DeviceId.fd(42) - this will likely fail:")
    try:
        RtlSdr.open(DeviceId.fd(42))
        print("   + Successfully opened device with fd 42")
    except Exception as e:
        print(f"   - Failed to open device: {e}")

    print("4. Opening device using convenience function open_with_fd(42):")
    try:
        RtlSdr.open_with_fd(42)
        print("   + Successfully opened device with fd 42")
    except Exception as e:
        print(f"   - Failed to open device: {e}")

    print("\nDemo complete! The API supports index, serial, and fd opening.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
