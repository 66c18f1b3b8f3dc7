"""Halo-exchange overhead + sharded-vs-unsharded step cost on ONE chip.

Real N>=2 ICI scaling is environment-blocked (one chip behind a tunnel);
the CPU virtual mesh proves exactness but its timing is meaningless (8
devices share 2 host cores — SCALING_r03's 0.11 "efficiency").  What IS
measurable on one chip:

1. the cost of the halo exchange itself, via the degenerate self-ring —
   ``make_async_remote_copy`` addressed to self compiles and EXECUTES the
   same Mosaic remote-DMA program a real ring runs, minus the ICI wire
   time (~1 us/hop on v5e, noted in provenance);
2. the cost of the sharded FORM itself: the same production geometry
   through the unsharded fused chain, interleaved in the same process —
   ``sharded_overhead_ratio = step(none) / step(unsharded)`` is the
   factor an N-chip projection must apply to the single-chip headline
   (round-4 VERDICT: the old harness hid a 3x gap here because its
   anti-LICM input perturbation copied the whole 25 MB block every scan
   step).

Method: three chains at the production per-chip geometry (12.5M complex
per step, the bench.py block) on a (dp=1, sp=1) mesh:

* ``halo_impl='dma'``  — remote-DMA halo kernel forced (self-ring),
* ``halo_impl='none'`` — exchange skipped (valid on sp=1; same output),
* ``unsharded``        — ``pallas_fm.demodulate_fused`` (the bench.py
                         headline path) at the identical kernel geometry.

All three thread their natural streaming carry through the scan (the
sharded chains via ``carry_io=True`` block-to-block carries, the serial
chain via its kernel state) — a real loop dependency, so nothing is
LICM-hoisted and no artificial input copy is timed.  Each leg is timed
with bench.py's scan-differenced discipline; legs are INTERLEAVED per
rep so tunnel phases hit all three equally.

``halo_us = step(dma) - step(none)`` isolates the exchange.

Projection (weak scaling, one station row per chip, ring halos):
per-chip step time at N>=2 is ``C + 2*halo_us`` — the carry DMA plus the
resampler's (smaller) demod-halo exchange, both N-independent neighbor
permutes — so efficiency is flat in N.  C is the SHARDED per-chip step
(step_none), not the unsharded headline; the ratio between the two is
reported explicitly instead of being assumed 1.

Emits SCALING_r{N}.json-style provenance with --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGET_COMPLEX = 12_533_760   # per-chip shard (the bench.py block size)
CHUNKS_PER_STEP = 16          # bench.py's winning host+bf16 geometry (r5)


def measure(n_short: int = 128, n_long: int = 512, reps: int = 4):
    # ab_kernel's discipline: scan lengths where device work (~0.25-0.5 s
    # per long run) dominates the tunnel's ±20-100 ms dispatch jitter —
    # at short lengths the per-rep deltas are pure noise (measured).
    import time as _t

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpu_sdr.models import wbfm
    from tpu_sdr.ops import pallas_fm
    from tpu_sdr.parallel import mesh as mesh_mod
    from tpu_sdr.parallel.wbfm_sharded_pallas import (
        initial_carry, make_sharded_wbfm_pallas)

    assert jax.default_backend() == "tpu", "halo overhead needs the real chip"
    spec = pallas_fm.default_spec(chunks_per_step=CHUNKS_PER_STEP)
    n_loc = max(1, TARGET_COMPLEX // spec.chunk_complex) * spec.chunk_complex
    mesh = mesh_mod.make_mesh(dp=1, sp=1, devices=jax.devices()[:1])
    config = wbfm.WbfmConfig(filter_mode="fir")

    rng = np.random.default_rng(0)
    host = rng.integers(0, 256, 2 * n_loc, dtype=np.uint8)
    # production front (round 5): host byte-map rotation applied once
    # here, off the timed path (in deployment it rides the C++ feeder's
    # conversion pass) + rotation-free bf16 kernel
    from tpu_sdr.native import rotate_fs4_u8

    host = rotate_fs4_u8(host)
    x = jax.device_put(host.view("<i2").reshape(1, n_loc))

    def make_run_sharded(halo_impl: str):
        chain = make_sharded_wbfm_pallas(mesh, config, halo_impl=halo_impl,
                                         chunks_per_step=CHUNKS_PER_STEP,
                                         carry_io=True, rot_impl="host")
        ke0, re0 = initial_carry(1, config)

        @partial(jax.jit, static_argnames=("n",))
        def run_n(ke, re, n):
            def body(carry, _):
                k, r, acc = carry
                audio, _counts, k2, r2 = chain.fn(x, k, r)
                return (k2, r2, acc + jnp.sum(audio)), ()

            (_, _, acc), _ = lax.scan(
                body, (ke, re, jnp.float32(0)), None, length=n)
            return acc

        def run(n: int) -> float:
            t0 = _t.perf_counter()
            float(run_n(ke0, re0, n))
            return _t.perf_counter() - t0

        return run

    def make_run_unsharded():
        d16 = jax.device_put(pallas_fm.view_u8_as_i16(host, spec))
        w_hi, w_lo, v = pallas_fm.make_kernel_params(config)
        phase = jnp.asarray([0], jnp.int32)
        state0 = jnp.zeros((pallas_fm.STATE_ROWS, 128),
                           jnp.float32).at[2, 127].set(1.0)
        rh0 = jnp.zeros(spec.taps_per_phase - 1, jnp.float32)

        @partial(jax.jit, static_argnames=("n",))
        def run_n(state, rh, n):
            def body(carry, _):
                s, r, acc = carry
                audio, s2, r2 = pallas_fm.demodulate_fused(
                    d16, phase, s, r, w_hi, w_lo, v, spec,
                    rot_impl="host", unpack_impl="dcfold_bf16")
                return (s2, r2, acc + jnp.sum(audio)), ()

            (_, _, acc), _ = lax.scan(
                body, (state0, rh0, jnp.float32(0)), None, length=n)
            return acc

        def run(n: int) -> float:
            t0 = _t.perf_counter()
            float(run_n(state0, rh0, n))
            return _t.perf_counter() - t0

        return run

    runs = {
        "dma": make_run_sharded("dma"),
        "none": make_run_sharded("none"),
        "unsharded": make_run_unsharded(),
    }
    for r in runs.values():  # compile every leg before any timing
        r(2)
    # one discarded warmup rep at full scan lengths: the first timed rep
    # of a fresh process consistently lands in a throttled/cold phase
    # (round-4/5 runs: its halo estimate was a 1000x outlier every time)
    for r in runs.values():
        r(n_short), r(n_long)

    # INTERLEAVED reps: tunnel phase throttling hits all legs equally, so
    # leg DIFFERENCES and RATIOS stay clean even in a dirty phase.
    ts = {k: [] for k in runs}
    tl = {k: [] for k in runs}
    halo_ests, ratio_ests = [], []
    for _ in range(reps):
        step = {}
        for k, r in runs.items():
            ts[k].append(r(n_short))
            tl[k].append(r(n_long))
            step[k] = (tl[k][-1] - ts[k][-1]) / (n_long - n_short)
        # doubly-differenced per-rep estimator: the long-run leg delta
        # minus the short-run leg delta isolates the PER-STEP halo cost,
        # cancelling both fixed dispatch costs and the rep's phase (all
        # runs of a rep sit seconds apart)
        halo_ests.append(((tl["dma"][-1] - tl["none"][-1])
                          - (ts["dma"][-1] - ts["none"][-1]))
                         / (n_long - n_short))
        if step["unsharded"] > 0:
            ratio_ests.append(step["none"] / step["unsharded"])

    def leg(k):
        d = (min(tl[k]) - min(ts[k])) / (n_long - n_short)
        if d > 0 and (min(tl[k]) - min(ts[k])) >= min(ts[k]):
            return d, "differenced"
        return min(tl[k]) / n_long, "upper_bound"

    t_dma, flag_dma = leg("dma")
    t_none, flag_none = leg("none")
    t_uns, flag_uns = leg("unsharded")
    halo_s = max(0.0, float(np.median(halo_ests)))
    # conservative bound: when the halo cost is below measurement noise
    # (median ~0), project efficiency from the noise floor itself —
    # median |delta| is robust to single throttle-spike outliers
    halo_bound_s = max(halo_s, float(np.median(np.abs(halo_ests))))
    ratio = float(np.median(ratio_ests)) if ratio_ests else None

    # conservative compute time: the per-chip SHARDED step at the bench
    # headline's samples/s (fast compute makes fixed overhead loom larger)
    # fastest observed headline (round-5 builder run, pallas_host
    # differenced): using the highest rate makes the fixed overhead loom
    # largest, i.e. the most conservative efficiency projection
    msps_bench = 91_523.0
    c_bench = n_loc / (msps_bench * 1e6)
    overhead = 2.0 * halo_bound_s  # carry DMA + resampler halo permute

    def eff(c):
        return round(c / (c + overhead), 4) if c > 0 else 0.0

    return {
        "metric": "sp_halo_overhead_projection",
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "geometry": {"complex_per_shard": n_loc, "stations": 1,
                     "mesh": "dp=1,sp=1 self-ring"},
        "step_none_us": round(t_none * 1e6, 1),
        "step_dma_us": round(t_dma * 1e6, 1),
        "step_unsharded_us": round(t_uns * 1e6, 1),
        "sharded_overhead_ratio": (round(ratio, 3)
                                   if ratio is not None else None),
        "sharded_overhead_ratio_reps": [round(r, 3) for r in ratio_ests],
        "halo_us": round(halo_s * 1e6, 1),
        "halo_us_bound": round(halo_bound_s * 1e6, 1),
        "halo_us_reps": [round(h * 1e6, 1) for h in halo_ests],
        "timing": {"dma": flag_dma, "none": flag_none,
                   "unsharded": flag_uns,
                   "loop_dependency": "streaming carry (carry_io), "
                                      "no input perturbation",
                   "halo": "median of per-rep doubly-differenced deltas",
                   "ratio": "median of per-rep interleaved step ratios"},
        "projected_efficiency": {
            "at_measured_step": {str(n): eff(t_none) for n in (2, 4, 8)},
            "at_bench_headline_rate": {str(n): eff(c_bench)
                                       for n in (2, 4, 8)},
        },
        "note": ("halo_us from the degenerate self-ring remote DMA on one "
                 "chip: same Mosaic program a real ring executes, minus "
                 "ICI wire latency (~1 us/hop on v5e).  Efficiency is "
                 "N-independent for neighbor-ring halos; x2 counts the "
                 "carry DMA plus the (smaller) resampler halo permute.  "
                 "sharded_overhead_ratio is the per-chip step cost of the "
                 "sharded form vs the unsharded headline path at the SAME "
                 "geometry — multiply the headline by its inverse before "
                 "projecting N-chip throughput.  CPU virtual-mesh "
                 "exactness lives in tests/; its timing harness "
                 "(bench_scaling.py) is a plumbing check only."),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--reps", type=int, default=4)
    args = p.parse_args(argv)
    r = measure(reps=args.reps)
    line = json.dumps(r)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
