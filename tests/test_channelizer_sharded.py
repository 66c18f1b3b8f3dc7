"""Sharded channelizer+demod vs the serial ops on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_sdr.ops import channelizer as CH
from tpu_sdr.ops import fm as F
from tpu_sdr.parallel import mesh as mesh_mod
from tpu_sdr.parallel.channelizer_sharded import make_sharded_channelizer


def _serial(re, im, K, taps_per_branch):
    G = jnp.asarray(CH.design_pfb(K, taps_per_branch))
    yr, yi, _ = CH.pfb_analyze(jnp.asarray(re), jnp.asarray(im), G, CH.pfb_init(G))
    yr, yi = np.asarray(yr), np.asarray(yi)
    out = []
    for k in range(K):
        y, _ = F.quadrature_demod(jnp.asarray(yr[:, k]), jnp.asarray(yi[:, k]),
                                  F.quad_init())
        out.append(np.asarray(y))
    return np.stack(out)  # (K, m)


def test_sharded_channelizer_matches_serial():
    K, T = 32, 6
    m = mesh_mod.make_mesh(dp=1, sp=8)
    chain = make_sharded_channelizer(m, K, taps_per_branch=T)

    rng = np.random.default_rng(0)
    n = K * 64 * 8  # 64 frames per shard
    # multi-tone wideband signal
    t = np.arange(n)
    x = sum(np.exp(2j * np.pi * ((k + 0.05) / K) * t) for k in (2, 9, 20))
    x = x + 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    re = x.real.astype(np.float32)
    im = x.imag.astype(np.float32)

    got = np.asarray(chain(re, im))
    expected = _serial(re, im, K, T)
    assert got.shape == expected.shape == (K, n // K)
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)


def test_sharded_channelizer_recovers_fm_station():
    K, T = 32, 6
    m = mesh_mod.make_mesh(dp=1, sp=8)
    chain = make_sharded_channelizer(m, K, taps_per_branch=T)

    fs = 3_264_000.0
    ch_rate = fs / K
    k = 7
    n = K * 4096
    tt = np.arange(n) / fs
    audio = np.sin(2 * np.pi * 800.0 * tt)
    phase = 2 * np.pi * 30_000.0 * np.cumsum(audio) / fs
    x = np.exp(1j * phase) * np.exp(2j * np.pi * (k / K) * np.arange(n))

    got = np.asarray(chain(x.real.astype(np.float32), x.imag.astype(np.float32)))
    from tpu_sdr.utils import synth

    snr = synth.tone_snr(got[k], 800.0, ch_rate, skip=64)
    assert snr > 30, f"sharded channelized FM tone SNR {snr:.1f} dB"
