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
        # both streamers default to the host rotation placement, so
        # batch and single feed bit-identical frames to the same kernel
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

    # reference pinned to the chain's in-kernel rotation placement
    serial = pallas_fm.PallasWbfmStreamer(interpret=False,
                                          rot_impl="broadcast")
    exp = serial.demodulate(capture)[None, :]
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_mosaic_sharded_chain_host_front_single_chip(capture):
    """The round-5 production sharded front COMPILED on hardware:
    pre-rotated input + rotation-free bf16 kernel + edge-carry wiring
    (rot_impl='host'), vs the serial host-mode streamer."""
    import jax

    from tpu_sdr.models import wbfm
    from tpu_sdr.ops import pallas_fm
    from tpu_sdr.parallel import mesh as mesh_mod
    from tpu_sdr.parallel.wbfm_sharded_pallas import (
        make_sharded_wbfm_pallas, sharded_wbfm_pallas_apply)

    mesh = mesh_mod.make_mesh(dp=1, sp=1, devices=jax.devices()[:1])
    chain = make_sharded_wbfm_pallas(mesh, wbfm.WbfmConfig(filter_mode="fir"),
                                     rot_impl="host")
    audio, counts = sharded_wbfm_pallas_apply(chain, capture[None, :],
                                              rotate=True)
    got = chain.assemble(audio, counts)

    serial = pallas_fm.PallasWbfmStreamer(interpret=False)  # host default
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


def test_mosaic_rot_broadcast_matches_select(capture):
    """The (1, width) broadcast-multiply rotation compiled by Mosaic must
    be bit-identical to the full-size select rotation at every phase
    (multiplies by exact +-1/0 and adds of exact zeros)."""
    import jax.numpy as jnp

    from tpu_sdr.ops import pallas_fm

    spec = pallas_fm.default_spec()
    d16 = jnp.asarray(pallas_fm.view_u8_as_i16(capture, spec))
    w_hi, w_lo, v = pallas_fm.make_kernel_params()
    state = jnp.zeros((pallas_fm.STATE_ROWS, 128), jnp.float32
                      ).at[2, 127].set(1.0)
    rh = jnp.zeros(spec.taps_per_phase - 1, jnp.float32)
    for ph in range(4):
        phase = jnp.asarray([ph], jnp.int32)
        a, _, _ = pallas_fm.demodulate_fused(
            d16, phase, state, rh, w_hi, w_lo, v, spec, rot_impl="select",
            unpack_impl="scale")
        b, _, _ = pallas_fm.demodulate_fused(
            d16, phase, state, rh, w_hi, w_lo, v, spec,
            rot_impl="broadcast", unpack_impl="scale")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mosaic_atan_poly6_quality(capture):
    """6-term atan ladder compiled on hardware: >=100 dB of the 10-term
    exact mode (the floor for swapping it into the bench path)."""
    from tpu_sdr.ops import pallas_fm

    exact = pallas_fm.PallasWbfmStreamer(atan_mode="exact", interpret=False)
    poly6 = pallas_fm.PallasWbfmStreamer(atan_mode="poly6", interpret=False)
    a = exact.demodulate(capture)
    b = poly6.demodulate(capture)
    snr = _snr_db(a, b)
    assert snr >= 100.0, f"poly6 vs exact on hardware: {snr:.1f} dB"


def test_mosaic_atan_fast_close_to_exact(capture):
    """The reference-style fast_atan2 mode compiled on hardware stays
    within its documented ~30 dB envelope of the exact mode."""
    from tpu_sdr.ops import pallas_fm

    exact = pallas_fm.PallasWbfmStreamer(atan_mode="exact", interpret=False)
    fast = pallas_fm.PallasWbfmStreamer(atan_mode="fast", interpret=False)
    assert _snr_db(exact.demodulate(capture), fast.demodulate(capture)) >= 30.0


@pytest.mark.parametrize("g", [4, 8, 16])
def test_mosaic_chunks_per_step_geometry(g):
    """Edge grid geometries (chunks folded per step) compiled by Mosaic
    must agree with the default 1-chunk grid."""
    from tpu_sdr.ops import pallas_fm
    from tpu_sdr.utils import synth

    chunk = pallas_fm.default_spec().chunk_bytes
    u8, _ = synth.synth_wbfm_u8(g * chunk // 2, capture_rate=1_020_000)
    buf = np.asarray(u8, dtype=np.uint8)[: g * chunk]

    one = pallas_fm.PallasWbfmStreamer(interpret=False)
    a = one.demodulate(buf)
    multi = pallas_fm.PallasWbfmStreamer(interpret=False)
    multi.spec = pallas_fm.default_spec(chunks_per_step=g)
    b = multi.demodulate(buf)
    assert len(b) == len(a)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_mosaic_dcfold_matches_scale(capture):
    """DC-fold unpack compiled by Mosaic: agrees with the x255-scale
    unpack (>=100 dB) and holds streaming invariance across the carry
    seam on hardware."""
    from tpu_sdr.ops import pallas_fm

    chunk = pallas_fm.default_spec().chunk_bytes
    base = pallas_fm.PallasWbfmStreamer(interpret=False,
                                        unpack_impl="scale")
    ref = base.demodulate(capture)
    one = pallas_fm.PallasWbfmStreamer(interpret=False,
                                       unpack_impl="dcfold")
    full = one.demodulate(capture)
    snr = _snr_db(ref, full)
    assert snr >= 100.0, f"dcfold vs scale on hardware: {snr:.1f} dB"

    two = pallas_fm.PallasWbfmStreamer(interpret=False,
                                       unpack_impl="dcfold")
    split = np.concatenate(
        [two.demodulate(capture[:chunk]), two.demodulate(capture[chunk:])])
    np.testing.assert_allclose(split, full, rtol=1e-5, atol=1e-6)


def test_mosaic_xla_split_bf16_matches_f32(capture):
    """The split-bf16 banded decimator lowered by XLA-TPU (not Pallas):
    split-precision reconstruction must hold on the real MXU, where bf16
    rounding is hardware behavior rather than emulation."""
    from tpu_sdr.models import wbfm

    f32 = wbfm.WbfmStreamer(wbfm.WbfmConfig(filter_mode="fir",
                                            mxu_precision="f32"))
    bf16 = wbfm.WbfmStreamer(wbfm.WbfmConfig(filter_mode="fir",
                                             mxu_precision="split_bf16"))
    snr = _snr_db(f32.demodulate(capture), bf16.demodulate(capture))
    assert snr >= 80.0, f"split-bf16 vs f32 XLA chain on MXU: {snr:.1f} dB"


def test_mosaic_state_handoff_xla_to_pallas(capture):
    """Mid-stream carry handoff from the XLA chain into the compiled fused
    kernel: no glitch at the seam (pack_state semantics on hardware)."""
    from tpu_sdr.models import wbfm
    from tpu_sdr.ops import pallas_fm

    chunk = pallas_fm.default_spec().chunk_bytes
    config = wbfm.WbfmConfig(filter_mode="fir", mxu_precision="f32")
    xla = wbfm.WbfmStreamer(config)
    first = xla.demodulate(capture[:chunk])

    ps = pallas_fm.PallasWbfmStreamer(interpret=False)
    ps.state = pallas_fm.pack_state(xla.state, ps.spec)
    ps.resamp_hist = xla.state.resamp.hist
    ps.phase = int(xla.state.rot.phase)
    second = ps.demodulate(capture[chunk:])

    ref = wbfm.WbfmStreamer(config)
    expected = np.concatenate(
        [ref.demodulate(capture[:chunk]), ref.demodulate(capture[chunk:])])
    got = np.concatenate([first, second])
    snr = _snr_db(expected, got)
    assert snr >= 80.0, f"handoff continuity on hardware: {snr:.1f} dB"


def test_mosaic_batch_streaming_state(capture):
    """Compiled batch grid: per-station VMEM carries must evolve
    independently across a block split."""
    from tpu_sdr.ops import pallas_fm

    chunk = pallas_fm.default_spec().chunk_bytes
    bufs = np.stack([capture, capture[::-1].copy()])
    one = pallas_fm.PallasWbfmBatchStreamer(2, interpret=False)
    full = one.demodulate(bufs)
    two = pallas_fm.PallasWbfmBatchStreamer(2, interpret=False)
    split = np.concatenate(
        [two.demodulate(bufs[:, :chunk]), two.demodulate(bufs[:, chunk:])],
        axis=1)
    np.testing.assert_allclose(split, full, rtol=1e-5, atol=1e-6)


def test_mosaic_unaligned_split_pending_buffer(capture):
    """Splits that do NOT land on chunk boundaries exercise the host
    pending-buffer + rotator-phase bookkeeping around the compiled kernel."""
    from tpu_sdr.ops import pallas_fm

    one = pallas_fm.PallasWbfmStreamer(interpret=False)
    full = one.demodulate(capture)
    two = pallas_fm.PallasWbfmStreamer(interpret=False)
    cuts = [30_000, len(capture) - 50_000]
    parts = [two.demodulate(capture[:cuts[0]]),
             two.demodulate(capture[cuts[0]:cuts[1]]),
             two.demodulate(capture[cuts[1]:])]
    split = np.concatenate(parts)
    np.testing.assert_allclose(split, full[: len(split)], rtol=1e-5,
                               atol=1e-6)


def test_mosaic_fused_tone_snr(capture):
    """End-to-end receive quality on hardware: the 1 kHz tone in the
    synthesized WBFM capture survives the compiled chain at the same
    >=45 dB bar the CPU tier holds the float chain to."""
    from tpu_sdr.ops import pallas_fm
    from tpu_sdr.utils import synth

    ps = pallas_fm.PallasWbfmStreamer(interpret=False)
    audio = ps.demodulate(capture)
    snr = synth.tone_snr(np.asarray(audio, np.float64), 1000.0, 32_000,
                         skip=1500)
    assert snr >= 45.0, f"hardware chain tone SNR: {snr:.1f} dB"


def test_mosaic_channelizer_streaming_invariance():
    """Compiled PFB kernel: the VMEM frame-history carry must make the
    output invariant to chunk-boundary placement."""
    from tpu_sdr.ops import pallas_channelizer as pc

    K, T = 64, 8
    spec = pc.default_spec(K, T)
    rng = np.random.default_rng(9)
    buf = rng.integers(0, 256, size=2 * spec.chunk_bytes, dtype=np.uint8)

    one = pc.PallasPfbStreamer(K, T, spec.frames_per_chunk, interpret=False)
    full = np.stack(one.channelize(buf))
    two = pc.PallasPfbStreamer(K, T, spec.frames_per_chunk, interpret=False)
    a = np.stack(two.channelize(buf[: spec.chunk_bytes]))
    b = np.stack(two.channelize(buf[spec.chunk_bytes:]))
    np.testing.assert_allclose(np.concatenate([a, b], axis=1), full,
                               rtol=1e-5, atol=1e-5)


def test_mosaic_channelizer_tone_lands_in_channel():
    """Station recovery through the compiled PFB: a complex tone at
    channel 5's center concentrates there."""
    from tpu_sdr.ops import pallas_channelizer as pc

    K, T = 64, 8
    spec = pc.default_spec(K, T)
    n = 2 * spec.chunk_bytes // 2
    t = np.arange(n)
    ph = 2 * np.pi * 5 / K * t
    u8 = np.empty(2 * n, np.uint8)
    u8[0::2] = np.clip(np.round(127.5 + 120 * np.cos(ph)), 0, 255)
    u8[1::2] = np.clip(np.round(127.5 + 120 * np.sin(ph)), 0, 255)

    s = pc.PallasPfbStreamer(K, T, spec.frames_per_chunk, interpret=False)
    y_re, y_im = s.channelize(u8)
    power = np.mean(y_re**2 + y_im**2, axis=0)
    assert int(np.argmax(power)) == 5
    assert power[5] > 20 * np.partition(power, -2)[-2]


@pytest.mark.parametrize("K,T,C", [(16, 8, 64), (128, 8, 64), (64, 16, 256)])
def test_mosaic_channelizer_edge_geometries(K, T, C):
    """Edge channel counts / tap depths / chunk heights compiled by Mosaic
    vs the interpreter — layout bugs are geometry-dependent."""
    from tpu_sdr.ops import pallas_channelizer as pc

    spec = pc.default_spec(K, T, C)
    rng = np.random.default_rng(K + T)
    buf = rng.integers(0, 256, size=2 * spec.chunk_bytes, dtype=np.uint8)
    compiled = pc.PallasPfbStreamer(K, T, C, interpret=False)
    interp = pc.PallasPfbStreamer(K, T, C, interpret=True)
    got = compiled.channelize(buf)
    exp = interp.channelize(buf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                               rtol=1e-4, atol=1e-4)


def test_mosaic_sharded_channelizer_single_chip():
    """The channel-parallel fused channelizer (shard_map around the Mosaic
    kernel) compiled on a 1-device mesh must reproduce the full bank."""
    import jax

    from tpu_sdr.ops import pallas_channelizer as pc
    from tpu_sdr.parallel import mesh as mesh_mod
    from tpu_sdr.parallel.channelizer_sharded_pallas import (
        make_sharded_pfb_pallas, sharded_pfb_pallas_apply)

    K, T = 64, 8
    spec = pc.default_spec(K, T)
    rng = np.random.default_rng(13)
    buf = rng.integers(0, 256, size=2 * spec.chunk_bytes, dtype=np.uint8)

    mesh = mesh_mod.make_mesh(dp=1, sp=1, devices=jax.devices()[:1])
    bank = make_sharded_pfb_pallas(mesh, K, T, spec.frames_per_chunk,
                                   interpret=False)
    got_re, got_im, _ = sharded_pfb_pallas_apply(bank, buf)

    full = pc.PallasPfbStreamer(K, T, spec.frames_per_chunk, interpret=False)
    exp_re, exp_im = full.channelize(buf)
    np.testing.assert_allclose(np.asarray(got_re), exp_re, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_im), exp_im, rtol=1e-5,
                               atol=1e-5)


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


def test_tpu_psd_tone_bin():
    """ops/spectrum.py on hardware: XLA's TPU FFT lowering + the on-device
    power accumulator put a complex tone in the right fftshifted bin."""
    from tpu_sdr.ops import spectrum as S

    n_fft, frac = 1024, 0.125
    rng = np.random.default_rng(2)
    n = 64 * n_fft
    t = np.arange(n)
    ph = 2 * np.pi * frac * t
    u8 = np.empty(2 * n, np.uint8)
    u8[0::2] = np.clip(np.round(127.5 + 100 * np.cos(ph)
                                + rng.normal(0, 1, n)), 0, 255)
    u8[1::2] = np.clip(np.round(127.5 + 100 * np.sin(ph)
                                + rng.normal(0, 1, n)), 0, 255)
    ps = S.PsdStreamer(n_fft)
    ps.accumulate(u8)
    db = ps.finalize_db()
    peak = int(np.argmax(db))
    assert abs(peak - (n_fft // 2 + int(round(frac * n_fft)))) <= 1
    assert db[peak] - np.median(db) > 30


def test_mosaic_host_rotation_variant_matches_default(capture):
    """rot_impl='host' COMPILED on hardware (host byte-map pre-rotation +
    rotation-free kernel with the constant DC correction) vs the default
    broadcast kernel — the round-5 -12% A/B winner must stay >=100 dB
    under real Mosaic layouts, across a split-block carry seam."""
    from tpu_sdr.ops import pallas_fm

    ref = pallas_fm.PallasWbfmStreamer(interpret=False).demodulate(capture)
    s = pallas_fm.PallasWbfmStreamer(interpret=False, rot_impl="host")
    chunk = pallas_fm.default_spec().chunk_bytes
    got = np.concatenate([s.demodulate(capture[:chunk]),
                          s.demodulate(capture[chunk:])])
    assert _snr_db(ref, got) >= 100.0


def test_mosaic_matmul_prev_variant_matches_default(capture):
    """prev_impl='matmul' COMPILED on hardware vs the default kernel —
    the 4-dot stacked-weights variant exercises wider frames (L-1+d
    history columns), the deep-history carry lanes, and the i==0 patch
    under Mosaic layouts the interpreter does not check."""
    from tpu_sdr.ops import pallas_fm

    ref = pallas_fm.PallasWbfmStreamer(interpret=False).demodulate(capture)
    s = pallas_fm.PallasWbfmStreamer(interpret=False, prev_impl="matmul")
    chunk = pallas_fm.default_spec().chunk_bytes
    got = np.concatenate([s.demodulate(capture[:chunk]),
                          s.demodulate(capture[chunk:])])
    assert _snr_db(ref, got) >= 100.0
