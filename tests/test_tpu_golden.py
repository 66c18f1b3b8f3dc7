"""Golden-vector conformance for the integer-exact chain COMPILED on TPU.

The CPU tier proves the reference-exact path against the embedded rtl_fm
vectors (/root/reference/examples/simple_fm.rs:461-556) under x64 +
XLA:CPU; this module proves the same int32 semantics survive XLA:TPU
lowering — wrap-mul, truncating division, and the i64->i32 wrap inside
``fast_atan2_i32`` (which under x64-off legally becomes an i32 wrap-mul:
both keep the low 32 bits).

Documented tolerance: the once-per-block first demod sample uses the
EXACT atan2, f64 in the reference but f32 on TPU (no f64 hardware,
ops/exact.py:209-219) — that single lane may differ by <=1 LSB of the
pi==2^14 scale, and by <=1 LSB in any audio sample it feeds.  Every other
lane must be bit-exact.
"""

import sys
import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

sys.path.insert(0, os.path.dirname(__file__))
from golden_vectors import BUF_SIGNED, LOWPASS, DEMOD_EXPECTED, RESULT  # noqa: E402

DOWNSAMPLE = 6


def _pairs(v):
    a = np.asarray(v, dtype=np.int32)
    return a[0::2], a[1::2]


def _assert_on_tpu(x):
    dev = next(iter(x.devices())) if hasattr(x, "devices") else None
    assert dev is not None and dev.platform == "tpu", f"ran on {dev}"


def test_lowpass_golden_tpu():
    import jax.numpy as jnp

    from tpu_sdr.ops import exact

    re, im = _pairs(BUF_SIGNED)
    out_re, out_im, count, _ = exact.boxcar_decimate(
        jnp.asarray(re), jnp.asarray(im), exact.boxcar_init(), DOWNSAMPLE)
    _assert_on_tpu(out_re)
    count = int(count)
    exp_re, exp_im = _pairs(LOWPASS)
    assert count == len(exp_re)
    np.testing.assert_array_equal(np.asarray(out_re)[:count], exp_re)
    np.testing.assert_array_equal(np.asarray(out_im)[:count], exp_im)


def test_demod_golden_tpu():
    import jax.numpy as jnp

    from tpu_sdr.ops import exact

    re, im = _pairs(LOWPASS)
    n = len(re)
    out, count, _ = exact.fm_discriminate(
        jnp.asarray(re), jnp.asarray(im), jnp.int32(n),
        exact.discriminator_init())
    _assert_on_tpu(out)
    got = np.asarray(out)[: int(count)].astype(np.int32)
    exp = np.asarray(DEMOD_EXPECTED, np.int32)
    # fast_atan2 lanes (everything but index 0): bit-exact on hardware
    np.testing.assert_array_equal(got[1:], exp[1:])
    # first sample: exact-atan2 lane, f32 on TPU vs the reference's f64
    assert abs(int(got[0]) - int(exp[0])) <= 1, (got[0], exp[0])


def test_resampler_golden_tpu():
    import jax.numpy as jnp

    from tpu_sdr.ops import exact

    x = jnp.asarray(DEMOD_EXPECTED, dtype=jnp.int16)
    out, count, _ = exact.boxcar_resample(
        x, jnp.int32(len(DEMOD_EXPECTED)), exact.resampler_init(),
        rate_out=170_000, rate_resample=32_000)
    _assert_on_tpu(out)
    np.testing.assert_array_equal(np.asarray(out)[: int(count)], RESULT)


def test_fast_atan2_wrap_semantics_tpu():
    """The i64-mul-then-truncate wrap (simple_fm.rs:383-405) at
    adversarial magnitudes: i32 extremes where the pi4* product overflows
    32 bits.  Compares against a host big-int oracle."""
    import jax.numpy as jnp

    from tpu_sdr.ops import exact

    def wrap32(v):
        v &= 0xFFFFFFFF
        return v - (1 << 32) if v >= (1 << 31) else v

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    def oracle(y, x):
        pi4, pi34 = 1 << 12, 3 << 12
        if x == 0 and y == 0:
            return 0
        yabs = abs(y)
        if x >= 0:
            angle = pi4 - tdiv(wrap32(wrap32(pi4 * wrap32(x - yabs))),
                               wrap32(x + yabs) or 1)
        else:
            angle = pi34 - tdiv(wrap32(wrap32(pi4 * wrap32(x + yabs))),
                                wrap32(yabs - x) or 1)
        return -angle if y < 0 else angle

    rng = np.random.default_rng(3)
    small = rng.integers(-(1 << 15), 1 << 15, 256)
    big = rng.integers(-(1 << 30), 1 << 30, 256)
    edge = np.array([0, 1, -1, (1 << 31) - 1, -(1 << 31), 1 << 20,
                     -(1 << 20), 12345, -98765])
    ys = np.concatenate([small, big, edge, edge[::-1]]).astype(np.int32)
    xs = np.concatenate([big, small, edge[::-1], edge]).astype(np.int32)
    got = np.asarray(exact.fast_atan2_i32(jnp.asarray(ys), jnp.asarray(xs)))
    exp = np.array([oracle(int(y), int(x)) for y, x in zip(ys, xs)],
                   np.int64)
    # wrap the oracle result to i32 like the kernel's return dtype
    exp = np.asarray([np.int32(wrap32(int(v))) for v in exp], np.int32)
    np.testing.assert_array_equal(got, exp)


def test_full_chain_oracle_tpu():
    """The composed streamer (rotate -> boxcar -> discriminator ->
    resampler with carries) on-chip vs the plain-python reference-loop
    oracle; audio may differ by <=1 LSB only via each block's first
    exact-atan2 demod sample."""
    from test_golden_exact import _oracle_demodulate

    from tpu_sdr.models import wbfm_exact

    rng = np.random.default_rng(42)
    blocks = [rng.integers(0, 256, size=1024, dtype=np.uint8)
              for _ in range(4)]
    streamer = wbfm_exact.WbfmExactStreamer()
    got = np.concatenate([streamer.demodulate(b) for b in blocks])
    expected = _oracle_demodulate(blocks)
    assert got.shape == expected.shape
    diff = np.abs(got.astype(np.int32) - expected.astype(np.int32))
    assert diff.max() <= 1, f"max audio diff {diff.max()} LSB"
    # the tolerance exists for the exact-atan2 lane only: nearly all
    # samples must still be bit-identical
    assert (diff == 0).mean() >= 0.9, f"only {(diff == 0).mean():.2%} exact"
