"""Channel-parallel fused Pallas channelizer vs the single-device fused
kernel, on the 8-device virtual CPU mesh: the concatenated channel blocks
must reproduce the full analysis exactly (same matmuls, sliced columns)."""

import numpy as np
import pytest

from tpu_sdr.ops import pallas_channelizer as pc
from tpu_sdr.parallel import mesh as mesh_mod
from tpu_sdr.parallel.channelizer_sharded_pallas import (
    make_sharded_pfb_pallas,
    sharded_pfb_pallas_apply,
)

K, T, C = 64, 8, 64


@pytest.fixture(scope="module")
def capture():
    spec = pc.default_spec(K, T, C)
    rng = np.random.default_rng(3)
    return rng.integers(0, 256, size=2 * spec.chunk_bytes, dtype=np.uint8)


@pytest.mark.parametrize("n_dev", [4, 8])
def test_channel_parallel_matches_full(capture, n_dev):
    mesh = mesh_mod.make_mesh(dp=1, sp=n_dev)
    bank = make_sharded_pfb_pallas(mesh, K, T, C, interpret=True)
    got_re, got_im, _ = sharded_pfb_pallas_apply(bank, capture)

    full = pc.PallasPfbStreamer(K, T, C, interpret=True)
    exp_re, exp_im = full.channelize(capture)

    np.testing.assert_allclose(np.asarray(got_re), exp_re, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_im), exp_im, rtol=1e-5, atol=1e-5)


def test_streaming_state_carries(capture):
    mesh = mesh_mod.make_mesh(dp=1, sp=4)
    bank = make_sharded_pfb_pallas(mesh, K, T, C, interpret=True)
    spec = bank.spec

    r1, i1, st = sharded_pfb_pallas_apply(bank, capture[: spec.chunk_bytes])
    r2, i2, _ = sharded_pfb_pallas_apply(bank, capture[spec.chunk_bytes:], st)
    split_re = np.concatenate([np.asarray(r1), np.asarray(r2)])

    full_re, full_im, _ = sharded_pfb_pallas_apply(bank, capture)
    np.testing.assert_allclose(split_re, np.asarray(full_re), rtol=1e-5,
                               atol=1e-5)
