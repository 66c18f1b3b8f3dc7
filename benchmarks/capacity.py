"""Station-capacity (DP) benchmark: how many 1.02 Msps WBFM stations can
ONE chip demodulate in real time?

The reference's implicit bound is ONE station per host CPU thread
(/root/reference/examples/simple_fm.rs:143-168: the demod loop must keep
up with the dongle's 1.02 Msps).  This framework's DP showcase is the
batched fused kernel (``pallas_fm.demodulate_fused_batch``, grid =
stations x chunks, one launch demodulates every station); this harness
sweeps the station count and reports the real-time knee.

Method: per station and launch, one kernel chunk (65,280 complex = 64 ms
of air time at 1.02 Msps).  A launch is real-time when its step time is
<= the air time.  Timing is bench.py's scan-differenced discipline (the
loop inside one jitted ``lax.scan``, streaming carries threaded, audio
checksummed into the carry; two lengths differenced), per station count.
The sweep stops at the first non-real-time or out-of-memory count; the
knee is also projected from measured aggregate throughput as
``aggregate_msps / 1.02``.

Honesty note: this is DEVICE-COMPUTE capacity (the wideband use case
channelizes one wide capture on-chip — multi_fm; independent per-station
captures would be host-ingest-bound far earlier: see the host-fed ratio
metric in benchmarks/hostfed.py for that bound).

Emits CAPACITY_r{N}.json with --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STATION_MSPS = 1.02          # the dongle rate every station must sustain
# Scan-differenced measurement sweep.  2048 is the practical ceiling for
# the gold-standard timing method on this environment: XLA's compile of
# scan-over-the-batched-kernel scales superlinearly with the per-step
# station count (measured round 5: S=2048 compiles in ~1-2 min/length,
# S=8192 exceeds 9 min even for a 2-iteration scan or a 4x2048
# sub-batched body; the bare kernel compiles in ~2 s at every count).
# Larger counts get memory-fit probes (single launch, OOM check) plus
# the throughput projection.
SWEEP = (64, 512, 2048)
MEMFIT = (8192, 32768)


def _make_runner(stations: int):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpu_sdr.ops import pallas_fm

    spec = pallas_fm.default_spec()  # chunks_per_step=1: one chunk/station
    rng = np.random.default_rng(0)
    blocks = rng.integers(0, 256, (stations, spec.chunk_bytes),
                          dtype=np.uint8)
    # production kernel config (round 5): host byte-map rotation (done
    # once here, off the timed path — in deployment it rides the C++
    # feeder) + bf16 pre-matmul pipeline
    from tpu_sdr.native import rotate_fs4_u8

    blocks = rotate_fs4_u8(blocks.reshape(-1)).reshape(blocks.shape)
    d16 = jax.device_put(pallas_fm.view_u8_as_i16_batch(blocks, spec))
    w_hi, w_lo, v = pallas_fm.make_kernel_params()
    phases = jnp.zeros(stations, jnp.int32)
    states0 = jnp.zeros((stations, pallas_fm.STATE_ROWS, 128), jnp.float32
                        ).at[:, 2, 127].set(1.0)
    rh0 = jnp.zeros((stations, spec.taps_per_phase - 1), jnp.float32)

    # Gold-standard timing: the whole loop inside ONE jitted scan (a
    # single dispatch, immune to the tunnel's large per-dispatch cost —
    # a host loop of async dispatches measured dispatch-bound here).
    # XLA's compile of scan-over-the-batched-kernel blows up past a
    # ~2048-station grid (observed round 5: the S=8192 scan compile ran
    # >9 min while the bare kernel compiled in ~2 s), so larger counts
    # run as K sequential 2048-station sub-batch calls inside the same
    # scan body — identical device work, compile cost K x the proven
    # 2048 case.
    SUB = min(stations, 2048)
    K = stations // SUB
    d16k = d16.reshape(K, SUB, 1, spec.rows, spec.row_width)
    phases_k = phases.reshape(K, SUB)

    @partial(jax.jit, static_argnames=("n",))
    def run_n(states, rhs, n):
        def step(carry, _):
            s, r, acc = carry
            outs_s, outs_r = [], []
            for k in range(K):
                audio, s2, r2 = pallas_fm.demodulate_fused_batch(
                    d16k[k], phases_k[k], s[k], r[k], w_hi, w_lo, v, spec,
                    rot_impl="host", unpack_impl="dcfold_bf16")
                outs_s.append(s2)
                outs_r.append(r2)
                acc = acc + jnp.sum(audio)
            return (jnp.stack(outs_s), jnp.stack(outs_r), acc), ()

        (_, _, acc), _ = lax.scan(
            step,
            (states.reshape(K, SUB, pallas_fm.STATE_ROWS, 128),
             rh0.reshape(K, SUB, -1), jnp.float32(0)),
            None, length=n)
        return acc

    def run(n: int) -> float:
        t0 = time.perf_counter()
        float(run_n(states0, rh0, n))
        return time.perf_counter() - t0

    method = ("scan_differenced" if K == 1
              else f"scan_differenced ({K}x{SUB} sub-batches per step)")
    return run, spec, method


def measure(reps: int = 3, out_path: str | None = None,
            budget_s: float = 480.0):
    import pathlib

    import jax

    # persistent compile cache (same dir bench.py/tests use): the sweep
    # compiles 3 scan lengths per station count, ~30-60 s each through
    # the tunnel's remote compile helper on a cold cache
    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).resolve().parents[1]
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    assert jax.default_backend() == "tpu", "capacity needs the real chip"
    t_start = time.time()
    results = []
    knee = None
    air_s = None
    done = {}
    if out_path and os.path.exists(out_path):
        # resume: carry forward measured counts from a previous pass (the
        # tunnel's throttled phases regularly outlast one process budget)
        try:
            with open(out_path) as f:
                prior = json.loads(f.read())
            done = {r["stations"]: r for r in prior.get("sweep", [])
                    if r.get("step_ms") is not None
                    or r.get("fits_memory") is not None}
        except Exception:
            done = {}

    def flush(summary):
        if out_path:
            with open(out_path, "w") as f:
                f.write(json.dumps(summary) + "\n")

    for stations in SWEEP:
        if stations in done:
            results.append(done[stations])
            if done[stations].get("real_time"):
                knee = stations
            continue
        if time.time() - t_start > budget_s:
            results.append({"stations": stations,
                            "skipped": "budget exhausted (tunnel phase?)"})
            break
        try:
            run, spec, method = _make_runner(stations)
            air_s = spec.chunk_complex / (STATION_MSPS * 1e6)
            # scale scan lengths so the long run stays ~0.3-3 s of work;
            # quantized to powers of 4 so the persistent compile cache
            # hits across counts and rounds
            per_launch_est = stations * spec.chunk_complex / 70e9
            n_long = 8
            while n_long < 512 and n_long * per_launch_est < 1.0:
                n_long *= 4
            n_short = max(2, n_long // 4)
            run(2)  # compile
            ds = []
            for _ in range(reps):
                t_s = run(n_short)
                t_l = run(n_long)
                ds.append((t_l - t_s) / (n_long - n_short))
            step_s = float(np.median(ds))
            agg_msps = stations * spec.chunk_complex / step_s / 1e6
            rt = step_s <= air_s
            results.append({
                "stations": stations,
                "step_ms": round(step_s * 1e3, 3),
                "air_ms": round(air_s * 1e3, 1),
                "aggregate_gsps": round(agg_msps / 1e3, 2),
                "real_time": bool(rt),
                "timing": "%s (median of %d interleaved reps)"
                          % (method, reps),
            })
            print(json.dumps(results[-1]), flush=True)
            flush(_summary(jax, results, knee if not rt else stations))
            if rt:
                knee = stations
            else:
                break
        except Exception as e:  # OOM or compile failure ends the sweep
            results.append({"stations": stations,
                            "error": str(e).splitlines()[0][:200]})
            print(json.dumps(results[-1]), flush=True)
            break

    # Memory-fit probes: can the batch FIT and execute at counts beyond
    # the scan-compile limit?  (Per-launch wall time through this tunnel
    # is dominated by the ±20-100 ms dispatch cost at these ~10-60 ms
    # work sizes, so no timing claim is made — the real-time status of
    # these counts rests on the measured-throughput projection.)
    for stations in MEMFIT:
        if stations in done:
            results.append(done[stations])
            continue
        if time.time() - t_start > budget_s:
            break
        try:
            import jax.numpy as jnp

            from tpu_sdr.ops import pallas_fm

            spec = pallas_fm.default_spec()
            rng = np.random.default_rng(1)
            blocks = rng.integers(0, 256, (stations, spec.chunk_bytes),
                                  dtype=np.uint8)
            d16 = jax.device_put(
                pallas_fm.view_u8_as_i16_batch(blocks, spec))
            w_hi, w_lo, v = pallas_fm.make_kernel_params()
            audio, s2, r2 = pallas_fm.demodulate_fused_batch(
                d16,
                jnp.zeros(stations, jnp.int32),
                jnp.zeros((stations, pallas_fm.STATE_ROWS, 128),
                          jnp.float32).at[:, 2, 127].set(1.0),
                jnp.zeros((stations, spec.taps_per_phase - 1), jnp.float32),
                w_hi, w_lo, v, spec)
            audio.block_until_ready()
            results.append({"stations": stations, "fits_memory": True,
                            "timing": "memory-fit probe only (single "
                                      "launch; tunnel dispatch cost "
                                      "dwarfs the ~10-60 ms work)"})
            del audio, s2, r2, d16
        except Exception as e:
            results.append({"stations": stations, "fits_memory": False,
                            "error": str(e).splitlines()[0][:200]})
            break
        print(json.dumps(results[-1]), flush=True)
        flush(_summary(jax, results, knee))

    summary = _summary(jax, results, knee)
    flush(summary)
    return summary


def _summary(jax, results, knee):
    best = max((r for r in results if r.get("real_time")),
               key=lambda r: r["stations"], default=None)
    projected = (round(best["aggregate_gsps"] * 1e3 / STATION_MSPS)
                 if best else None)
    return {
        "metric": "dp_station_capacity",
        "device": str(jax.devices()[0]),
        "station_rate_msps": STATION_MSPS,
        "kernel_config": "rot_impl=host, unpack=dcfold_bf16 "
                         "(production default, round 5)",
        "chunk_complex_per_station": 65280,
        "sweep": results,
        "real_time_stations_measured": knee,
        "real_time_stations_projected_from_throughput": projected,
        "note": ("Device-compute capacity of the batched fused kernel "
                 "(grid = stations x chunks): every count up to the knee "
                 "demodulates one 64 ms chunk per station faster than its "
                 "air time.  The projected knee divides measured aggregate "
                 "throughput by the 1.02 Msps station rate; the sweep is "
                 "memory-bound before compute at large counts (per-station "
                 "input chunk + carries + z + audio live in HBM "
                 "simultaneously).  Host ingest of independent captures "
                 "binds far earlier — see the host-fed ratio metric."),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--budget", type=float, default=480.0)
    args = p.parse_args(argv)
    r = measure(reps=args.reps, out_path=args.out, budget_s=args.budget)
    print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
