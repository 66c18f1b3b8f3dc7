"""Pallas-front-end sharded WBFM vs the serial fused chain, on the 8-device
virtual CPU mesh.  The sharded output (assembled across time shards) must
match the serial PallasWbfmStreamer bit-for-bit up to f32 association —
boundary errors from bad halo seeding are silent SNR killers (SURVEY.md
'hard parts'), so equality is checked tightly."""

import numpy as np
import pytest

from tpu_sdr.models import wbfm
from tpu_sdr.ops import pallas_fm
from tpu_sdr.parallel import mesh as mesh_mod
from tpu_sdr.parallel.wbfm_sharded_pallas import (
    make_sharded_wbfm_pallas,
    sharded_wbfm_pallas_apply,
)
from tpu_sdr.utils import synth

SPEC = pallas_fm.default_spec()
CHUNK_C = SPEC.chunk_complex  # 65280 complex per kernel chunk


def _serial_reference(blocks):
    out = []
    for b in blocks:
        # the sharded chain rotates in-kernel (broadcast); pin the serial
        # reference to the same placement — the streamer's 'host' default
        # differs at the ~100 dB bf16-addend-order level, beyond these
        # tests' tight allclose
        s = pallas_fm.PallasWbfmStreamer(interpret=True,
                                         rot_impl="broadcast")
        out.append(s.demodulate(b))
    return np.stack(out)


@pytest.mark.parametrize("dp,sp", [(1, 4), (2, 2)])
def test_sharded_pallas_matches_serial(dp, sp):
    stations = 2 * dp
    n_complex = sp * CHUNK_C  # one kernel chunk per time shard
    rng = np.random.default_rng(9)
    base, _ = synth.synth_wbfm_u8(n_complex, capture_rate=1_020_000)
    blocks = np.stack([
        np.asarray(base, np.uint8) if s == 0 else
        rng.integers(0, 256, 2 * n_complex, dtype=np.uint8)
        for s in range(stations)
    ])

    mesh = mesh_mod.make_mesh(dp=dp, sp=sp)
    chain = make_sharded_wbfm_pallas(mesh, wbfm.WbfmConfig(filter_mode="fir"),
                                     interpret=True)
    audio, counts = sharded_wbfm_pallas_apply(chain, blocks)
    got = chain.assemble(audio, counts)

    exp = _serial_reference(blocks)
    assert got.shape == exp.shape
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dp,sp", [(1, 4), (2, 2)])
def test_sharded_pallas_host_rotation_matches_serial(dp, sp):
    """rot_impl='host' sharded chain (pre-rotated input, rotation-free
    bf16 kernel — the round-5 production front) vs the serial host-mode
    streamer on the same raw bytes."""
    stations = 2 * dp
    n_complex = sp * CHUNK_C
    rng = np.random.default_rng(29)
    blocks = rng.integers(0, 256, (stations, 2 * n_complex), dtype=np.uint8)

    mesh = mesh_mod.make_mesh(dp=dp, sp=sp)
    chain = make_sharded_wbfm_pallas(mesh, wbfm.WbfmConfig(filter_mode="fir"),
                                     interpret=True, rot_impl="host")
    audio, counts = sharded_wbfm_pallas_apply(chain, blocks, rotate=True)
    got = chain.assemble(audio, counts)

    exp = np.stack([
        pallas_fm.PallasWbfmStreamer(interpret=True,
                                     rot_impl="host").demodulate(b)
        for b in blocks])
    assert got.shape == exp.shape
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dp,sp", [(1, 4), (2, 2)])
def test_sharded_pallas_carry_io_streams_across_blocks(dp, sp):
    """carry_io=True: successive blocks through the sharded chain, each
    seeded with the previous block's end carries, must match ONE serial
    streamer run over the whole concatenated stream — the sharded chain's
    (carry, block) discipline (round-5 feature; without it every block
    restarted the stream)."""
    from tpu_sdr.parallel.wbfm_sharded_pallas import (
        initial_carry, view_blocks_as_i16)
    import jax

    stations = 2 * dp
    n_complex = sp * CHUNK_C
    rng = np.random.default_rng(17)
    blocks = [rng.integers(0, 256, (stations, 2 * n_complex),
                           dtype=np.uint8) for _ in range(2)]

    mesh = mesh_mod.make_mesh(dp=dp, sp=sp)
    config = wbfm.WbfmConfig(filter_mode="fir")
    chain = make_sharded_wbfm_pallas(mesh, config, interpret=True,
                                     carry_io=True)
    ke, re = initial_carry(stations, config)
    got_parts = []
    for b in blocks:
        x = jax.device_put(view_blocks_as_i16(b), chain.in_sharding)
        audio, counts, ke, re = chain.fn(x, ke, re)
        got_parts.append(chain.assemble(audio, counts))
    got = np.concatenate(got_parts, axis=1)

    # serial streaming reference: one streamer per station over BOTH
    # blocks (broadcast-pinned like _serial_reference)
    exp = []
    for s in range(stations):
        st = pallas_fm.PallasWbfmStreamer(interpret=True,
                                          rot_impl="broadcast")
        exp.append(np.concatenate([st.demodulate(b[s]) for b in blocks]))
    exp = np.stack(exp)
    assert got.shape == exp.shape
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_sharded_pallas_dma_halo_matches_ppermute():
    """The remote-DMA halo (pallas_halo, forced + interpreted here) must
    produce the same assembled audio as the ppermute halo on a 2-D mesh —
    the dict/MESH device_id keeps the exchange within each dp row."""
    dp, sp = 2, 2
    stations = 2 * dp
    n_complex = sp * CHUNK_C
    rng = np.random.default_rng(3)
    blocks = rng.integers(0, 256, (stations, 2 * n_complex), dtype=np.uint8)

    mesh = mesh_mod.make_mesh(dp=dp, sp=sp)
    config = wbfm.WbfmConfig(filter_mode="fir")
    ref_chain = make_sharded_wbfm_pallas(mesh, config, interpret=True,
                                         halo_impl="ppermute")
    ref_audio, ref_counts = sharded_wbfm_pallas_apply(ref_chain, blocks)
    exp = ref_chain.assemble(ref_audio, ref_counts)

    try:
        dma_chain = make_sharded_wbfm_pallas(mesh, config, interpret=True,
                                             halo_impl="dma")
        audio, counts = sharded_wbfm_pallas_apply(dma_chain, blocks)
    except Exception as e:  # interpreter lacks distributed emulation
        pytest.skip(f"pallas distributed interpret unavailable: {e}")
    got = dma_chain.assemble(audio, counts)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)
