"""Channel-parallel PFB channelizer with the fused Pallas kernel per chip.

The TP-analog topology of ``channelizer_sharded`` (each device computes a
contiguous block of output channels from the replicated wideband input),
but the per-device compute is the fused Pallas kernel
(ops/pallas_channelizer) with its analysis-matrix column slice — u8 unpack,
frame windows, and the packed split-bf16 matmuls all stay in VMEM on every
chip.  No collectives are needed in steady state: the input is replicated
by the host (or by an all-gather upstream) and channel outputs concatenate
along the sharded axis.

At pod scale this is how a 1024-channel analysis bank runs: frame width K
stays the full channel count (the input framing is shared), while each chip
multiplies against only 2*K/n analysis columns.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_sdr.ops import channelizer as chan
from tpu_sdr.ops import pallas_channelizer as pc


@dataclass(frozen=True)
class ShardedPallasPfb:
    mesh: Mesh
    spec: pc.PallasPfbSpec
    fn: callable
    data_sharding: NamedSharding

    def __call__(self, data_i16, state):
        return self.fn(data_i16, state)


def make_sharded_pfb_pallas(mesh: Mesh, num_channels: int = 64,
                            taps_per_branch: int = 8,
                            frames_per_chunk: int = 256,
                            axis: str = "sp",
                            interpret: bool | None = None) -> ShardedPallasPfb:
    """Build the jitted channel-parallel fused channelizer over ``axis``."""
    n_dev = mesh.shape[axis]
    assert num_channels % n_dev == 0
    k_loc = num_channels // n_dev
    spec = pc.PallasPfbSpec(num_channels, taps_per_branch + 1,
                            frames_per_chunk, local_channels=k_loc)
    spec.validate()
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    h_poly = chan.design_pfb(num_channels, taps_per_branch)
    his, los = [], []
    for d in range(n_dev):
        hi, lo = pc.make_packed_matrices(
            h_poly, channel_slice=slice(d * k_loc, (d + 1) * k_loc))
        his.append(hi)
        los.append(lo)
    m2_hi = jnp.stack(his)  # (n_dev, rows*K, 2*k_loc)
    m2_lo = jnp.stack(los)

    def shard_fn(data_loc, m2_hi_loc, m2_lo_loc, state_loc):
        y_re, y_im, new_state = pc.channelize_fused(
            data_loc, state_loc, m2_hi_loc[0], m2_lo_loc[0], spec,
            interpret=interpret)
        # stack as (m, 2, k_loc) so the channel axis concatenates cleanly
        return jnp.stack([y_re, y_im], axis=1), new_state

    sharded = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(None, None, axis), P()),
        check_vma=False,  # pallas interpret machinery trips the checker
    )
    jitted = jax.jit(lambda d, s: sharded(d, m2_hi, m2_lo, s))

    return ShardedPallasPfb(
        mesh=mesh, spec=spec, fn=jitted,
        data_sharding=NamedSharding(mesh, P()),
    )


def sharded_pfb_pallas_apply(bank: ShardedPallasPfb, buf: np.ndarray,
                             state=None):
    """u8 wideband block -> (Y_re (m, K), Y_im (m, K), new state)."""
    spec = bank.spec
    d16 = pc.view_u8_as_i16(np.asarray(buf, np.uint8), spec)
    if state is None:
        H = spec.branch_rows - 1
        state = jnp.zeros((2 * H, spec.num_channels), jnp.float32)
    y, new_state = bank(jax.device_put(d16, bank.data_sharding), state)
    return y[:, 0, :], y[:, 1, :], new_state
