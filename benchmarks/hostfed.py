"""Host-fed end-to-end WBFM throughput: the SYSTEM number.

``bench.py``'s headline measures the compute chain on an HBM-resident
block; the reference's pipeline is host-fed end to end
(/root/reference/examples/simple_fm.rs:55-132: USB thread -> channel ->
demod loop, throughput accounted at the host).  This harness measures the
full TPU-native equivalent:

    capture file (tmpfs) -> native C++ ring/pump (stream/feeder.py)
    -> zero-copy i16 view -> ``jax.device_put`` (H2D over PCIe/tunnel)
    -> fused Pallas kernel + resampler, carry threaded block to block
    -> audio folded into an on-device accumulator, ONE readback at the end

and, with the same plumbing minus the compute, the pure H2D transport
ceiling — so the result always says how close the pipeline runs to the
wire.  A sliding window of in-flight blocks keeps JAX's async dispatch
overlapping H2D with compute while bounding device-memory growth.

Timing: two run lengths differenced to cancel startup (feeder spin-up,
first-dispatch latency); repeated trials take the best (minimum) pair —
the tunnel's throttled phases only ever ADD time, so the minimum is the
clean-phase number; the per-trial spread is reported as provenance.
"""

from __future__ import annotations

import os
import time

import numpy as np

N_FILE_BLOCKS = 8          # distinct blocks in the looped capture file
TARGET_BLOCK_MB = 20       # ~20 MB blocks: past the H2D bandwidth knee
WINDOW = 6                 # in-flight device blocks (double-buffer depth)


def _capture_path() -> str:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    return os.path.join(base, f"tpusdr_hostfed_{os.getpid()}.bin")


def measure_host_fed(n_short: int = 6, n_long: int = 18, trials: int = 3,
                     compute: bool = True, chunks_per_step: int = 2,
                     time_left=None):
    """Returns a dict or None.

    ``compute=False`` times the identical feeder+device_put pipeline
    without the kernel — the transport ceiling.  Returned keys:

    * ``spb``: best seconds-per-block (the headline), ``block_bytes``,
    * ``flag``: 'differenced' when the long-short delta dominated that
      pair, else 'upper_bound',
    * ``trials_msps``: per-trial complex-Msamples/s — THE SHAPE MATTERS on
      this host: the tunnel serves roughly the first GB per process at
      ~1.5 GB/s and then sustains 30-150 MB/s, so trial 0 is the burst
      capability and later trials the sustained floor; on hardware with
      honest PCIe the trials agree instead.
    """
    import jax
    import jax.numpy as jnp

    from tpu_sdr.ops import pallas_fm
    from tpu_sdr.stream.feeder import BlockFeeder, FileSource

    spec = pallas_fm.default_spec(chunks_per_step=chunks_per_step)
    k = max(1, (TARGET_BLOCK_MB * 1024 * 1024) // spec.chunk_bytes)
    block_bytes = k * spec.chunk_bytes
    rows, width = spec.rows, spec.row_width

    path = _capture_path()
    rng = np.random.default_rng(0)
    with open(path, "wb") as f:
        f.write(rng.integers(0, 256, N_FILE_BLOCKS * block_bytes,
                             dtype=np.uint8).tobytes())

    w_hi, w_lo, v = pallas_fm.make_kernel_params()
    phase = jnp.asarray([0], jnp.int32)
    state0 = jnp.zeros((pallas_fm.STATE_ROWS, 128), jnp.float32
                       ).at[2, 127].set(1.0)
    rh0 = jnp.zeros(spec.taps_per_phase - 1, jnp.float32)

    @jax.jit
    def step(d16, state, rh, acc):
        audio, s2, r2 = pallas_fm.demodulate_fused(
            d16, phase, state, rh, w_hi, w_lo, v, spec)
        return s2, r2, acc + jnp.sum(audio)

    def run(n_blocks: int) -> float:
        feeder = BlockFeeder(FileSource(path, loop=True),
                             block_bytes=block_bytes,
                             queue_blocks=16).start()
        try:
            state, rh, acc = state0, rh0, jnp.float32(0)
            inflight = []
            last = None
            nb = 0
            t0 = time.perf_counter()
            for blk in feeder.blocks():
                d16 = blk.view("<i2").reshape(-1, rows, width)
                dev = jax.device_put(d16)
                if compute:
                    state, rh, acc = step(dev, state, rh, acc)
                    inflight.append(acc)
                else:
                    inflight.append(dev)
                last = inflight[-1]
                if len(inflight) > WINDOW:
                    inflight.pop(0).block_until_ready()
                nb += 1
                if nb >= n_blocks:
                    break
            last.block_until_ready()
            if compute:
                float(acc)
            return time.perf_counter() - t0
        finally:
            feeder.stop()

    try:
        run(2)  # warm: compile + feeder spin-up
        pairs = []
        for _ in range(trials):
            if time_left is not None and time_left() <= 0:
                break
            pairs.append((run(n_short), run(n_long)))
        if not pairs:
            return None
        trials_msps = []
        for t_s, t_l in pairs:
            d = (t_l - t_s) / (n_long - n_short)
            per = d if (d > 0 and (t_l - t_s) >= t_s) else t_l / n_long
            trials_msps.append(round(block_bytes / 2 / per / 1e6, 1))
        best_s = min(p[0] for p in pairs)
        best_l = min(p[1] for p in pairs)
        d = (best_l - best_s) / (n_long - n_short)
        if d > 0 and (best_l - best_s) >= best_s:
            return {"spb": d, "block_bytes": block_bytes,
                    "flag": "differenced", "trials_msps": trials_msps}
        return {"spb": best_l / n_long, "block_bytes": block_bytes,
                "flag": "upper_bound", "trials_msps": trials_msps}
    finally:
        try:
            os.unlink(path)
        except OSError:
            pass
