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
ceiling.  **The headline is the pipeline/ceiling RATIO**, measured from
INTERLEAVED trial pairs in one process: this host's tunnel has
minutes-long throttled phases and a fast-first-GB burst profile, so
absolute Msps from different phases are not comparable — the round-3
artifact's 55% "regression" was exactly that (pipeline trials landed in a
slow phase, ceiling trials in a fast one).  Interleaving puts both legs
in the same phase; the ratio cancels the phase.

Timing per leg: two run lengths differenced to cancel startup (feeder
spin-up, first-dispatch latency); per-trial ratios are reported
individually plus the median, with the per-leg best-of-trials Msps as
secondary absolute numbers.
"""

from __future__ import annotations

import os
import time

import numpy as np

N_FILE_BLOCKS = 8          # distinct blocks in the looped capture file
# ~60 MB blocks: past the H2D bandwidth knee AND big enough to amortize
# the tunnel's per-dispatch round-trip cost.  Measured round 4 (clean
# phase, interleaved): at 20 MB the pipeline ran at only ~0.6-0.85x the
# transport ceiling — all of it per-step dispatch overhead, since the
# kernel itself is ~0.01% of the transfer time — while at 60 MB the
# ratio is ~1.0 (compute fully hidden).  Real-PCIe hosts would amortize
# at far smaller blocks; latency-sensitive deployments should size down.
TARGET_BLOCK_MB = 60
WINDOW = 6                 # in-flight device blocks (double-buffer depth)


def _capture_path() -> str:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    return os.path.join(base, f"tpusdr_hostfed_{os.getpid()}.bin")


def _make_harness(chunks_per_step: int = 2):
    """Shared plumbing for both legs: returns (run, block_bytes, cleanup)
    where ``run(n_blocks, compute)`` executes one feeder-fed pipeline pass
    and returns wall seconds."""
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

    @jax.jit
    def step_ceiling(d16, acc):
        # Touch one element so the block is consumed and freed exactly
        # like the compute leg's (matched in-flight footprint: round 4's
        # ceiling leg kept WINDOW whole 60 MB device blocks alive while
        # the compute leg held scalars, and measured ~40% slop with
        # ratios persistently >1 — the pipeline "beating" its own
        # plumbing-minus-compute ceiling was the ceiling leg's extra
        # memory pressure, not a real compute win).
        return acc + d16[0, 0, 0].astype(jnp.float32)

    def run(n_blocks: int, compute: bool) -> float:
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
                else:
                    acc = step_ceiling(dev, acc)
                inflight.append(acc)
                last = inflight[-1]
                if len(inflight) > WINDOW:
                    inflight.pop(0).block_until_ready()
                nb += 1
                if nb >= n_blocks:
                    break
            last.block_until_ready()
            float(acc)
            return time.perf_counter() - t0
        finally:
            feeder.stop()

    def cleanup():
        try:
            os.unlink(path)
        except OSError:
            pass

    return run, block_bytes, cleanup


def _spb(t_s: float, t_l: float, n_s: int, n_l: int) -> tuple[float, str]:
    """Seconds per block from a (short, long) pair: differenced when the
    delta dominates, else the conservative upper bound."""
    d = (t_l - t_s) / (n_l - n_s)
    if d > 0 and (t_l - t_s) >= t_s:
        return d, "differenced"
    return t_l / n_l, "upper_bound"


def measure_host_fed_ratio(trial_pairs: int = 8, n_long: int = 5,
                           chunks_per_step: int = 2, time_left=None):
    """ADJACENT-pair pipeline-vs-ceiling measurement; returns a dict or
    None.

    Each trial runs one long pipeline pass and one long ceiling pass
    back to back (seconds apart — the only pairing tight enough for this
    host's minutes-long tunnel phases; round 4 showed even short/long
    legs of ONE trial can straddle a phase edge).  The per-trial ratio
    is the raw adjacent quotient: over ~20 s runs the fixed feeder/
    dispatch costs amortize below the phase noise and cancel in the
    quotient anyway (both legs share them).  Keys:

    * ``ratio``: median per-trial pipeline/ceiling throughput ratio (the
      headline — 1.0 means the compute is fully hidden behind the wire),
    * ``ratio_iqr``: [q1, q3] across trials (the defensibility band —
      round-5 ask: IQR within ±25% of the median or the finding that the
      tunnel phase floor prevents it),
    * ``ratio_best``: best-of-trials pairing (each leg's fastest run) —
      the phase-robust summary when trials disagree,
    * ``ratio_trials``: every per-trial ratio (spread = provenance),
    * ``host_fed_msps`` / ``h2d_ceiling_msps``: best-of-trials absolute
      complex Msamples/s per leg (conservative t/n upper bounds; on this
      host they track the tunnel phase, not the pipeline),
    * ``pipe_trials_msps`` / ``ceil_trials_msps``, ``block_bytes``.
    """
    run, block_bytes, cleanup = _make_harness(chunks_per_step)
    try:
        # Warm both legs: compile + feeder spin-up, then a LONG pass of
        # each to burn through the tunnel's fast-first-GB burst so trial
        # 0 sees the same sustained phase the rest do.  In a
        # slow-transfer phase (probe > ~20 s for 2 blocks) shrink the
        # legs and skip the long warm passes — the adjacent-pair ratio
        # still cancels the phase, and a 50 s/leg trial cadence would
        # starve every other metric in the caller's budget.
        t_probe = run(2, False)
        slow_phase = t_probe > 20.0
        if slow_phase:
            n_long = min(n_long, 3)
            run(2, True)  # compile the compute leg only
        else:
            run(n_long, True)
            run(n_long, False)
        ratios, pipe_ts, ceil_ts = [], [], []
        for i in range(trial_pairs):
            if time_left is not None and time_left() <= 0:
                break
            # alternate leg order between trials so any slow drift
            # within a pair biases the ratio both ways and medians out
            if i % 2 == 0:
                tp = run(n_long, True)
                tc = run(n_long, False)
            else:
                tc = run(n_long, False)
                tp = run(n_long, True)
            pipe_ts.append(tp)
            ceil_ts.append(tc)
            ratios.append(tc / tp)
            if ratios and tp + tc > 120.0:
                break  # hard-throttled phase: more pairs won't help
        if not ratios:
            return None
        msps = lambda t: round(  # noqa: E731
            n_long * block_bytes / 2 / t / 1e6, 1)
        q1, q3 = (np.percentile(ratios, (25, 75)) if len(ratios) >= 4
                  else (min(ratios), max(ratios)))
        return {
            "ratio": round(float(np.median(ratios)), 3),
            "ratio_iqr": [round(float(q1), 3), round(float(q3), 3)],
            "ratio_best": round(min(ceil_ts) / min(pipe_ts), 3),
            "ratio_trials": [round(r, 3) for r in ratios],
            "host_fed_msps": msps(min(pipe_ts)),
            "h2d_ceiling_msps": msps(min(ceil_ts)),
            "pipe_trials_msps": [msps(t) for t in pipe_ts],
            "ceil_trials_msps": [msps(t) for t in ceil_ts],
            "block_bytes": block_bytes,
            "flags": {"pipeline": ["adjacent_upper_bound"] * len(pipe_ts),
                      "ceiling": ["adjacent_upper_bound"] * len(ceil_ts)},
        }
    finally:
        cleanup()


def measure_host_fed(n_short: int = 6, n_long: int = 18, trials: int = 3,
                     compute: bool = True, chunks_per_step: int = 2,
                     time_left=None):
    """Single-leg measurement (kept for ad-hoc use; prefer
    :func:`measure_host_fed_ratio` — absolute single-leg Msps on this
    host's tunnel reflect the phase as much as the pipeline)."""
    run, block_bytes, cleanup = _make_harness(chunks_per_step)
    try:
        run(2, compute)  # warm: compile + feeder spin-up
        pairs = []
        for _ in range(trials):
            if time_left is not None and time_left() <= 0:
                break
            pairs.append((run(n_short, compute), run(n_long, compute)))
        if not pairs:
            return None
        trials_msps = [
            round(block_bytes / 2 / _spb(t_s, t_l, n_short, n_long)[0] / 1e6,
                  1)
            for t_s, t_l in pairs]
        best_s = min(p[0] for p in pairs)
        best_l = min(p[1] for p in pairs)
        spb, flag = _spb(best_s, best_l, n_short, n_long)
        return {"spb": spb, "block_bytes": block_bytes, "flag": flag,
                "trials_msps": trials_msps}
    finally:
        cleanup()
