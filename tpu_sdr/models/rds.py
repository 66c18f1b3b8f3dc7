"""RDS bit recovery — 57 kHz BPSK subcarrier of the FM multiplex.

Decodes the Radio Data System physical layer from the discriminator output
(the same multiplex signal the stereo decoder consumes): the 57 kHz
suppressed-carrier BPSK subcarrier is coherently detected with a carrier
derived from the 19 kHz pilot (RDS locks its carrier and its 1187.5 bps
clock to the pilot: 57k = 3 x 19k, 1187.5 = 19k/16), matched-filtered
against the biphase pulse pair, and differentially decoded to the bit
stream.  Group/block synchronization (offset words A-D) is left to a host
parser (NEXT.md).

Chain (all tpu_sdr.ops.fm building blocks, banded-MXU filters):

    y ──BPF19k→ p ──/A→ cosθ ──(4c³-3c)→ cos3θ ─┐
    y ──BPF57k (same length; arms stay aligned) ─┴─ × ─LPF2.4k→ b(t)
    b ──resample 170k→152k (64 samples per half-symbol exactly)
      ──half-symbol integrate-and-dump → soft bits → sign → diff decode

Timing is recovered by a one-shot eye-opening search over the 128 sample
phases of a bit (see :func:`best_bit_phase`), which a streaming receiver
runs once at lock.

No reference equivalent (the reference is a mono WBFM port).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_sdr.ops import fm as F
from tpu_sdr.utils import firdes

RDS_RATE = 1187.5
RESAMPLE_FS = 152_000          # 128 samples per data bit, 64 per half-symbol
SAMPLES_PER_BIT = 128


@dataclass(frozen=True)
class RdsConfig:
    mpx_rate: int = 170_000
    pilot_taps: int = 257
    sub_taps: int = 257        # 57 kHz BPF — same length keeps arms aligned
    post_taps: int = 129       # 2.4 kHz LPF after the product
    resample_taps_per_phase: int = 48

    @property
    def resample_up(self) -> int:
        return RESAMPLE_FS // math.gcd(self.mpx_rate, RESAMPLE_FS)  # 76

    @property
    def resample_down(self) -> int:
        return self.mpx_rate // math.gcd(self.mpx_rate, RESAMPLE_FS)  # 85


class RdsState(NamedTuple):
    bpf_p: F.FirState
    bpf_s: F.FirState
    lpf: F.FirState
    resamp: F.AlignedResampleState


@dataclass
class RdsParams:
    W_p: jax.Array
    W_s: jax.Array
    W_lp: jax.Array
    resamp_V: jax.Array
    taps: tuple


def make_params(config: RdsConfig) -> RdsParams:
    fs = config.mpx_rate
    bp_p = firdes.bandpass(config.pilot_taps, 19_000.0, 1_500.0, fs)
    bp_s = firdes.bandpass(config.sub_taps, 57_000.0, 2_400.0, fs)
    lp = firdes.lowpass(config.post_taps, 2_400.0, fs)
    h = firdes.resampler_taps(config.resample_up, config.resample_down,
                              taps_per_phase=config.resample_taps_per_phase)
    hp = F.make_polyphase(h, config.resample_up)
    V = F.make_aligned_poly_matrix(hp, config.resample_up,
                                   config.resample_down)
    mk = lambda t: jnp.asarray(F.make_banded_decim_matrix(t, 1))
    return RdsParams(mk(bp_p), mk(bp_s), mk(lp), jnp.asarray(V),
                     (config.pilot_taps, config.sub_taps, config.post_taps))


def init_state(config: RdsConfig) -> RdsState:
    return RdsState(
        F.fir_init(config.pilot_taps), F.fir_init(config.sub_taps),
        F.fir_init(config.post_taps),
        F.aligned_resample_init(config.resample_taps_per_phase),
    )


def _fir1(x, W, num_taps, state):
    out, _im, new = F.fir_decimate_mxu(x, jnp.zeros_like(x), W, num_taps, 1,
                                       state)
    return out, new


@partial(jax.jit, static_argnames=("config",))
def baseband_block(y: jax.Array, state: RdsState, params: RdsParams,
                   config: RdsConfig):
    """Multiplex block (mpx_rate) -> RDS baseband at 152 kHz + new state.

    Input length must be a multiple of resample_down (85).
    """
    tp, ts, tl = params.taps
    p, bpf_p = _fir1(y, params.W_p, tp, state.bpf_p)
    amp = jnp.sqrt(jnp.maximum(2.0 * jnp.mean(p * p), 1e-12))
    c = p / amp                                 # cos(theta), unit amplitude
    c57 = 4.0 * c * c * c - 3.0 * c             # cos(3*theta)
    x57, bpf_s = _fir1(y, params.W_s, ts, state.bpf_s)
    prod = 2.0 * x57 * c57
    b, lpf = _fir1(prod, params.W_lp, tl, state.lpf)
    b152, rs = F.aligned_resample(b, params.resamp_V, config.resample_up,
                                  config.resample_down, state.resamp)
    return b152, RdsState(bpf_p, bpf_s, lpf, rs)


def soft_bits(b152: np.ndarray, phase: int) -> np.ndarray:
    """Half-symbol integrate-and-dump at ``phase`` (0..127): soft value per
    data bit = first-half sum minus second-half sum (biphase matched
    filter)."""
    b = np.asarray(b152, np.float64)[phase:]
    nbits = len(b) // SAMPLES_PER_BIT
    h = SAMPLES_PER_BIT // 2
    frames = b[: nbits * SAMPLES_PER_BIT].reshape(nbits, SAMPLES_PER_BIT)
    return frames[:, :h].sum(axis=1) - frames[:, h:].sum(axis=1)


def best_bit_phase(b152: np.ndarray) -> int:
    """Eye-opening search: the bit phase maximizing mean |soft| (a
    streaming receiver runs this once at lock, then tracks)."""
    scores = [np.mean(np.abs(soft_bits(b152, ph)))
              for ph in range(SAMPLES_PER_BIT)]
    return int(np.argmax(scores))


def decode_bits(b152: np.ndarray, phase: int | None = None) -> np.ndarray:
    """Baseband -> differentially-decoded RDS bit stream (uint8)."""
    if phase is None:
        phase = best_bit_phase(b152)
    d = (soft_bits(b152, phase) > 0).astype(np.uint8)
    return d[1:] ^ d[:-1]  # differential decode


class RdsReceiver:
    """Host wrapper: feed multiplex blocks (e.g. the WBFM discriminator
    output), collect the recovered bit stream."""

    def __init__(self, config: RdsConfig | None = None):
        self.config = config or RdsConfig()
        self.params = make_params(self.config)
        self.state = init_state(self.config)
        self._pending = np.zeros(0, np.float32)

    def process(self, mpx: np.ndarray) -> np.ndarray:
        """Multiplex samples in -> 152 kHz RDS baseband out (stream-safe)."""
        data = np.concatenate([self._pending, np.asarray(mpx, np.float32)])
        down = self.config.resample_down
        usable = len(data) - (len(data) % down)
        self._pending = data[usable:]
        if usable == 0:
            return np.zeros(0, np.float32)
        b152, self.state = baseband_block(
            jnp.asarray(data[:usable]), self.state, self.params, self.config)
        return np.asarray(b152)


jax.tree_util.register_pytree_node(
    RdsParams,
    lambda p: ((p.W_p, p.W_s, p.W_lp, p.resamp_V), p.taps),
    lambda aux, c: RdsParams(*c, aux),
)


# ---------------------------------------------------------------------------
# Block/group layer (host-side parser over the recovered bit stream)
# ---------------------------------------------------------------------------
#
# RDS blocks are 26 bits: 16 information bits followed by a 10-bit checkword
# = CRC(info) XOR the block's offset word (which identifies the block's
# position in the group).  g(x) = x^10+x^8+x^7+x^5+x^4+x^3+1.

_G_POLY = 0b10110111001  # x^10..x^0 coefficients of g(x)
OFFSET_WORDS = {"A": 0x0FC, "B": 0x198, "C": 0x168, "C'": 0x350, "D": 0x1B4}


def crc10(info: int) -> int:
    """10-bit CRC of a 16-bit information word: info(x)*x^10 mod g(x)."""
    reg = info << 10
    for bit in range(25, 9, -1):
        if reg & (1 << bit):
            reg ^= _G_POLY << (bit - 10)
    return reg & 0x3FF


def make_block(info: int, offset: str) -> np.ndarray:
    """16-bit word + offset name -> 26 transmitted bits (MSB first)."""
    check = crc10(info) ^ OFFSET_WORDS[offset]
    word = (info << 10) | check
    return np.array([(word >> (25 - i)) & 1 for i in range(26)], np.uint8)


def make_group(words: tuple[int, int, int, int],
               version_b: bool = False) -> np.ndarray:
    """Four 16-bit words -> one 104-bit group (offsets A,B,C|C',D)."""
    offs = ("A", "B", "C'" if version_b else "C", "D")
    return np.concatenate([make_block(w, o) for w, o in zip(words, offs)])


def _block_offset(bits26: np.ndarray) -> str | None:
    info = 0
    for b in bits26[:16]:
        info = (info << 1) | int(b)
    check = 0
    for b in bits26[16:]:
        check = (check << 1) | int(b)
    want = check ^ crc10(info)
    for name, off in OFFSET_WORDS.items():
        if want == off:
            return name
    return None


def sync_and_parse(bits: np.ndarray, max_groups: int = 64):
    """Find block sync in a recovered bit stream and parse groups.

    Returns a list of 4-tuples of 16-bit words (one per group with all four
    blocks passing their checkwords).  A real receiver adds error
    correction and flywheel sync; this is the validating parser.
    """
    bits = np.asarray(bits, np.uint8)
    seq = ("A", "B", None, "D")  # None: C or C'
    for start in range(min(len(bits) - 104, 26 * 4)):
        ok = True
        for blk, want in enumerate(seq):
            got = _block_offset(bits[start + 26 * blk: start + 26 * (blk + 1)])
            if want is None:
                ok &= got in ("C", "C'")
            else:
                ok &= got == want
        if not ok:
            continue
        groups = []
        pos = start
        while pos + 104 <= len(bits) and len(groups) < max_groups:
            words = []
            for blk in range(4):
                w26 = bits[pos + 26 * blk: pos + 26 * (blk + 1)]
                if _block_offset(w26) is None:
                    words = None
                    break
                info = 0
                for b in w26[:16]:
                    info = (info << 1) | int(b)
                words.append(info)
            if words is not None:
                groups.append(tuple(words))
            pos += 104
        return groups
    return []
