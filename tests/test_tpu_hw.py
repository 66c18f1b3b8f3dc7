"""Mosaic (non-interpreted) Pallas kernel tests on a real TPU.

The default CPU tier runs every Pallas kernel under the interpreter; a
Mosaic-vs-interpret divergence (layout, roll semantics, bf16 matmul
behavior) would ship silently.  This module compiles the kernels for the
actual TPU and checks them against the interpreter and the XLA f32 chain.

Run with ``TPU_SDR_TEST_PLATFORM=tpu python -m pytest tests/ -q`` on a
machine with a TPU backend (the driver's verify step does).  First compile
goes through the hardware tunnel and is slow (~20-40 s); everything is
cached after that.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _snr_db(ref, got):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(got, np.float64) - ref
    return 10 * np.log10(np.mean(ref**2) / max(np.mean(err**2), 1e-30))


@pytest.fixture(scope="module")
def capture():
    from tpu_sdr.ops import pallas_fm
    from tpu_sdr.utils import synth

    chunk = pallas_fm.default_spec().chunk_bytes
    u8, _ = synth.synth_wbfm_u8(2 * chunk // 2, capture_rate=1_020_000)
    return np.asarray(u8, dtype=np.uint8)[: 2 * chunk]


def test_mosaic_fused_demod_matches_interpret(capture):
    """Same fused kernel, compiled vs interpreted, on identical input.
    Only f32 association order may differ."""
    from tpu_sdr.ops import pallas_fm

    compiled = pallas_fm.PallasWbfmStreamer(interpret=False)
    interp = pallas_fm.PallasWbfmStreamer(interpret=True)
    got = compiled.demodulate(capture)
    exp = interp.demodulate(capture)
    assert got.shape == exp.shape
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_mosaic_fused_demod_vs_xla_f32(capture):
    from tpu_sdr.models import wbfm
    from tpu_sdr.ops import pallas_fm

    xla = wbfm.WbfmStreamer(wbfm.WbfmConfig(filter_mode="fir",
                                            mxu_precision="f32"))
    ref = xla.demodulate(capture)
    got = pallas_fm.PallasWbfmStreamer(interpret=False).demodulate(capture)
    snr = _snr_db(ref, got)
    assert snr >= 80.0, f"Mosaic fused kernel vs f32 XLA chain: {snr:.1f} dB"


def test_mosaic_fused_streaming_invariance(capture):
    from tpu_sdr.ops import pallas_fm

    chunk = pallas_fm.default_spec().chunk_bytes
    one = pallas_fm.PallasWbfmStreamer(interpret=False)
    full = one.demodulate(capture)
    two = pallas_fm.PallasWbfmStreamer(interpret=False)
    split = np.concatenate(
        [two.demodulate(capture[:chunk]), two.demodulate(capture[chunk:])])
    np.testing.assert_allclose(split, full, rtol=1e-5, atol=1e-6)


def test_mosaic_fused_batch_matches_single(capture):
    from tpu_sdr.ops import pallas_fm

    rng = np.random.default_rng(5)
    other = rng.integers(0, 256, size=len(capture), dtype=np.uint8)
    bufs = np.stack([capture, other])
    batch = pallas_fm.PallasWbfmBatchStreamer(2, interpret=False)
    got = batch.demodulate(bufs)
    for b, buf in enumerate(bufs):
        single = pallas_fm.PallasWbfmStreamer(interpret=False)
        np.testing.assert_allclose(got[b], single.demodulate(buf),
                                   rtol=1e-5, atol=1e-6)


def test_mosaic_chunks_per_step_2(capture):
    """The bench geometry (chunks_per_step=2) must compile and agree."""
    from tpu_sdr.ops import pallas_fm

    one = pallas_fm.PallasWbfmStreamer(interpret=False)
    a = one.demodulate(capture)
    two = pallas_fm.PallasWbfmStreamer(interpret=False)
    two.spec = pallas_fm.default_spec(chunks_per_step=2)
    b = two.demodulate(capture)
    np.testing.assert_allclose(b, a[: len(b)], rtol=1e-5, atol=1e-6)


def test_mosaic_channelizer_matches_interpret():
    from tpu_sdr.ops import pallas_channelizer as pc

    K, T = 64, 8
    spec = pc.default_spec(K, T)
    rng = np.random.default_rng(7)
    buf = rng.integers(0, 256, size=2 * spec.chunk_bytes, dtype=np.uint8)

    compiled = pc.PallasPfbStreamer(K, T, spec.frames_per_chunk,
                                    interpret=False)
    interp = pc.PallasPfbStreamer(K, T, spec.frames_per_chunk,
                                  interpret=True)
    got = compiled.channelize(buf)
    exp = interp.channelize(buf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                               rtol=1e-4, atol=1e-4)


def test_mosaic_remote_dma_halo():
    """Remote-DMA halo on a real TPU mesh (needs >= 2 chips; single-chip
    environments exercise the n_shards==1 short circuit instead)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from tpu_sdr.parallel import halo as ref_halo
    from tpu_sdr.parallel import mesh as mesh_mod
    from tpu_sdr.parallel.pallas_halo import pull_left_halo_pallas

    devs = jax.devices()
    n = len(devs)
    mesh = mesh_mod.make_mesh(dp=1, sp=n, devices=devs)
    x = jnp.arange(n * 256, dtype=jnp.float32)

    def body(xs):
        return pull_left_halo_pallas(xs, 128, "sp", on_tpu=True)

    got = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P("sp"),
                                out_specs=P("sp")))(x)

    def ref_body(xs):
        return ref_halo.pull_left_halo(xs, 128, "sp")

    exp = jax.jit(jax.shard_map(ref_body, mesh=mesh, in_specs=P("sp"),
                                out_specs=P("sp")))(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))


def test_mosaic_remote_dma_self_ring():
    """``make_async_remote_copy`` COMPILED AND EXECUTED on hardware: the
    circular ring shift on a 1-device mesh is a remote copy addressed to
    self, so the DMA engine actually fires (unlike the n==1 halo shortcut,
    which never launches the kernel).  Must equal the ppermute ring."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import PartitionSpec as P

    from tpu_sdr.parallel import mesh as mesh_mod
    from tpu_sdr.parallel.pallas_halo import ring_shift_pallas

    devs = jax.devices()
    n = len(devs)
    mesh = mesh_mod.make_mesh(dp=1, sp=n, devices=devs)
    x = jnp.arange(n * 1024, dtype=jnp.float32)

    got = jax.jit(jax.shard_map(
        lambda xs: ring_shift_pallas(xs, "sp"), mesh=mesh,
        in_specs=P("sp"), out_specs=P("sp")))(x)

    perm = [(i, (i + 1) % n) for i in range(n)]
    exp = jax.jit(jax.shard_map(
        lambda xs: lax.ppermute(xs, "sp", perm), mesh=mesh,
        in_specs=P("sp"), out_specs=P("sp")))(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))


def test_mosaic_sharded_chain_dma_halo_single_chip(capture):
    """The production sharded chain with halo_impl='dma' compiled for the
    real chip: Mosaic compiles the remote-copy halo kernel inside the same
    program as the fused demod kernel (degenerate sp=1 mesh)."""
    import jax

    from tpu_sdr.models import wbfm
    from tpu_sdr.ops import pallas_fm
    from tpu_sdr.parallel import mesh as mesh_mod
    from tpu_sdr.parallel.wbfm_sharded_pallas import (
        make_sharded_wbfm_pallas, sharded_wbfm_pallas_apply)

    mesh = mesh_mod.make_mesh(dp=1, sp=1, devices=jax.devices()[:1])
    chain = make_sharded_wbfm_pallas(mesh, wbfm.WbfmConfig(filter_mode="fir"),
                                     halo_impl="dma")
    blocks = capture[None, :]
    audio, counts = sharded_wbfm_pallas_apply(chain, blocks)
    got = chain.assemble(audio, counts)

    serial = pallas_fm.PallasWbfmStreamer(interpret=False)
    exp = serial.demodulate(capture)[None, :]
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_mosaic_sharded_chain_single_chip(capture):
    """The production sharded Pallas chain compiled for the real chip
    (sp=1 degenerate mesh): Mosaic kernel + edge-carry wiring."""
    import jax

    from tpu_sdr.models import wbfm
    from tpu_sdr.ops import pallas_fm
    from tpu_sdr.parallel import mesh as mesh_mod
    from tpu_sdr.parallel.wbfm_sharded_pallas import (
        make_sharded_wbfm_pallas, sharded_wbfm_pallas_apply)

    mesh = mesh_mod.make_mesh(dp=1, sp=1, devices=jax.devices()[:1])
    chain = make_sharded_wbfm_pallas(mesh, wbfm.WbfmConfig(filter_mode="fir"))
    blocks = capture[None, :]
    audio, counts = sharded_wbfm_pallas_apply(chain, blocks)
    got = chain.assemble(audio, counts)

    serial = pallas_fm.PallasWbfmStreamer(interpret=False)
    exp = serial.demodulate(capture)[None, :]
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_tpu_u8_bitcast_unpack_matches_numpy():
    """The i16-bitcast byte unpack in u8_to_f32 (the fix for the 50x
    stride-2 deinterleave slowdown) must produce byte-exact deinterleaving
    ON HARDWARE — bitcast_convert_type semantics are backend-specific and
    the CPU tier cannot vouch for the TPU lowering."""
    import jax.numpy as jnp

    from tpu_sdr.ops import fm as F

    rng = np.random.default_rng(3)
    buf = rng.integers(0, 256, size=2 * 510 * 64, dtype=np.uint8)
    re, im = F.u8_to_f32(jnp.asarray(buf))
    scale = 1.0 / 127.5
    np.testing.assert_allclose(
        np.asarray(re), buf[0::2].astype(np.float32) * scale - 127.5 * scale,
        rtol=0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(im), buf[1::2].astype(np.float32) * scale - 127.5 * scale,
        rtol=0, atol=1e-6)


def test_tpu_wideband_pallas_front_decodes_station():
    """Fused Pallas channelizer front (Mosaic) through the wideband
    multi-station receiver on hardware: the station tone survives."""
    from tpu_sdr.models import wbfm_wideband as wb
    from tpu_sdr.utils import synth

    K, ch_rate = 16, 170_000
    fs = K * ch_rate
    n = 16 * K * 85 * 24
    u8, _ = synth.synth_multistation_u8(
        n, fs, station_freqs=[3 * ch_rate], audio_freqs=[1000.0],
        deviation=60_000.0)
    config = wb.WidebandConfig(num_channels=K, channels=(3,))
    st = wb.WidebandStreamer(config, use_pallas=True, interpret=False)
    audio = st.demodulate(np.asarray(u8, np.uint8))
    snr = synth.tone_snr(np.asarray(audio[0], np.float64), 1000.0, 32_000,
                         skip=1500)
    assert snr > 25, f"Mosaic PFB front lost the station tone: {snr:.1f} dB"
