"""Batched multi-station WBFM: N receivers demodulated in one device call.

BASELINE.json config #2 ("16 stations demodulated in parallel from one
wideband IQ block — vmapped chain").  Where the reference runs one station
per process, here the station axis is a vmapped batch dimension over the
fast chain: one compile, one launch, N stations; filter params are shared
(broadcast), per-station streaming state is stacked.

Two input shapes are supported:

* independent captures: (stations, bytes) u8 — e.g. N dongles / N files,
* one wideband capture fanned out by the PFB channelizer
  (tpu_sdr.ops.channelizer) whose per-channel outputs feed the same
  discriminator+resampler tail.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpu_sdr.models import wbfm


@partial(jax.jit, static_argnames=("config",))
def demodulate_batch(bufs: jax.Array, states, params: wbfm.WbfmParams,
                     config: wbfm.WbfmConfig):
    """(stations, bytes) u8 + stacked states -> (audio (stations, m), count,
    stacked states).  All stations share ``count`` (same block geometry)."""

    def one(buf, state):
        return wbfm.demodulate_block(buf, state, params, config)

    audio, counts, new_states = jax.vmap(one, in_axes=(0, 0))(bufs, states)
    return audio, counts[0], new_states


def init_batch_state(config: wbfm.WbfmConfig, stations: int):
    one = wbfm.init_state(config)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (stations,) + x.shape).copy(), one
    )


class WbfmBatchStreamer:
    """Host wrapper mirroring WbfmStreamer for a station batch."""

    def __init__(self, stations: int, config: wbfm.WbfmConfig | None = None):
        self.config = config or wbfm.WbfmConfig()
        self.params = wbfm.make_params(self.config)
        self.stations = stations
        self.state = init_batch_state(self.config, stations)
        self._pending = np.zeros((stations, 0), dtype=np.uint8)

    def demodulate(self, bufs: np.ndarray) -> np.ndarray:
        data = np.concatenate([self._pending, np.asarray(bufs, np.uint8)], axis=1)
        quantum = 2 * self.config.decim
        usable = data.shape[1] - (data.shape[1] % quantum)
        self._pending = data[:, usable:]
        if usable == 0:
            return np.zeros((self.stations, 0), np.float32)
        audio, count, self.state = demodulate_batch(
            jnp.asarray(data[:, :usable]), self.state, self.params, self.config
        )
        return np.asarray(audio)[:, : int(count)]
