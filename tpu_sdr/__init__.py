"""tpu-sdr — a TPU-native software-defined-radio framework.

Re-designs the capabilities of the ``rtl-sdr-rs`` reference
(/root/reference) TPU-first: host-side device control plane (USB register
protocol, R82xx tuner logic, enumeration) plus a JAX/XLA/Pallas DSP data
plane (WBFM receive chain, channelizers, sharded multi-chip streaming).

Public API mirrors the reference facade (/root/reference/src/lib.rs).
"""

DEFAULT_BUF_LENGTH = 16 * 16384  # bytes per sync-read block (ref src/lib.rs:25)

# Reliable platform pinning: the JAX_PLATFORMS env var still lets backend
# discovery initialize every registered PJRT plugin (a tunneled TPU plugin
# can block indefinitely); the config route skips discovery entirely.  Set
# TPU_SDR_PLATFORM=cpu to keep a process off the TPU.
import os as _os  # noqa: E402

if _os.environ.get("TPU_SDR_PLATFORM"):
    import jax as _jax  # noqa: E402

    _jax.config.update("jax_platforms", _os.environ["TPU_SDR_PLATFORM"])

from tpu_sdr.errors import (  # noqa: E402,F401
    DeviceNotFoundError,
    InvalidConfigError,
    PllError,
    RtlSdrError,
    UsbError,
)
from tpu_sdr.api import (  # noqa: E402,F401
    DeviceId,
    DirectSampleMode,
    RtlSdr,
    Sensor,
    SensorValue,
    TunerGain,
    TunerId,
    get_device_count,
    get_device_info,
    get_device_serial,
    list_devices,
)
from tpu_sdr.control.usb import DeviceDescriptor  # noqa: E402,F401
