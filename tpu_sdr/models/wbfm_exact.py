"""Reference-exact WBFM demodulator model (conformance path).

Composes the bit-exact integer ops in :mod:`tpu_sdr.ops.exact` into the full
receive chain of the reference's ``simple_fm`` example
(/root/reference/examples/simple_fm.rs:256-269)::

    u8 I/Q -> fs/4 rotate -> signed complex -> boxcar decimate
           -> FM discriminator -> boxcar audio resample -> s16 audio

The whole block transform is one jittable pure function of
``(state, block) -> (state, audio, count)``; streaming is just ``lax.scan``
or repeated calls.  Output arrays are padded to static maxima with a traced
valid count — the host trims (:class:`WbfmExactStreamer`).

``optimal_settings`` mirrors the reference's capture-rate/offset math
(simple_fm.rs:189-214).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_sdr.ops import exact


@dataclass(frozen=True)
class WbfmExactConfig:
    """Demodulation config (ref ``DemodConfig``, simple_fm.rs:179-185)."""

    rate_in: int = 170_000
    rate_out: int = 170_000
    rate_resample: int = 32_000
    downsample: int = 6
    output_scale: int = 42  # (1<<15)/(128*6); unused by the chain, kept for parity


@dataclass(frozen=True)
class RadioConfig:
    """Capture config (ref ``RadioConfig``, simple_fm.rs:172-176)."""

    capture_freq: int
    capture_rate: int


def optimal_settings(freq: int, rate: int, rate_resample: int = 32_000):
    """Derive capture + demod settings for a target frequency/rate
    (ref ``optimal_settings``, simple_fm.rs:189-214).

    ``capture_freq`` is offset by fs/4 — undone in the digital domain by the
    rotate stage.
    """
    downsample = (1_000_000 // rate) + 1
    capture_rate = downsample * rate
    capture_freq = freq + capture_rate // 4
    output_scale = max((1 << 15) // (128 * downsample), 1)
    radio = RadioConfig(capture_freq=capture_freq, capture_rate=capture_rate)
    demod = WbfmExactConfig(
        rate_in=rate,
        rate_out=rate,
        rate_resample=rate_resample,
        downsample=downsample,
        output_scale=output_scale,
    )
    return radio, demod


class WbfmExactState(NamedTuple):
    """Full streaming carry across blocks (ref Demod fields, simple_fm.rs:232-239)."""

    boxcar: exact.BoxcarState
    discr: exact.DiscriminatorState
    resamp: exact.ResamplerState


def init_state() -> WbfmExactState:
    return WbfmExactState(exact.boxcar_init(), exact.discriminator_init(), exact.resampler_init())


# Each stage is jitted separately rather than fusing the whole chain: the
# composed graph triggers pathological XLA-CPU compile times at large block
# shapes, and the exact path is a conformance oracle, not the throughput
# path (that is tpu_sdr.models.wbfm).
_rotate_convert = jax.jit(
    lambda buf: exact.u8_to_complex_i32(exact.rotate_90_u8(buf))
)
_boxcar = jax.jit(exact.boxcar_decimate, static_argnames=("downsample",))
_discriminate = jax.jit(exact.fm_discriminate)
_resample = jax.jit(
    exact.boxcar_resample, static_argnames=("rate_out", "rate_resample")
)


def _demodulate_block(
    buf: jax.Array,
    state: WbfmExactState,
    *,
    downsample: int,
    rate_out: int,
    rate_resample: int,
):
    re, im = _rotate_convert(buf)
    lp_re, lp_im, lp_count, boxcar_state = _boxcar(
        re, im, state.boxcar, downsample=downsample
    )
    demod, demod_count, discr_state = _discriminate(
        lp_re, lp_im, lp_count, state.discr
    )
    audio, audio_count, resamp_state = _resample(
        demod, demod_count, state.resamp, rate_out=rate_out, rate_resample=rate_resample
    )
    new_state = WbfmExactState(boxcar_state, discr_state, resamp_state)
    return audio, audio_count, new_state


def demodulate_block(buf: jax.Array, state: WbfmExactState, config: WbfmExactConfig):
    """One block of the full exact chain: ``(u8[n], state) -> (s16 audio
    padded, count, state)``.  ``n`` must be a multiple of 8."""
    return _demodulate_block(
        buf,
        state,
        downsample=config.downsample,
        rate_out=config.rate_out,
        rate_resample=config.rate_resample,
    )


class WbfmExactStreamer:
    """Host-side convenience wrapper: feed u8 blocks, get trimmed s16 audio.

    The stateful-object shape mirrors the reference's ``Demod`` struct
    (simple_fm.rs:232-269) but all compute stays in the jitted pure function.
    """

    def __init__(self, config: WbfmExactConfig | None = None):
        self.config = config or WbfmExactConfig()
        self.state = init_state()

    def demodulate(self, buf: np.ndarray) -> np.ndarray:
        buf = jnp.asarray(buf, dtype=jnp.uint8)
        audio, count, self.state = demodulate_block(buf, self.state, self.config)
        return np.asarray(audio)[: int(count)]
