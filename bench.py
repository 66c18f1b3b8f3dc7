"""Benchmark: WBFM chain throughput in complex Msamples/s on one chip.

Measures the full streaming receive chain (u8 I/Q block -> audio) in its
candidate implementations and reports the fastest:

* ``pallas``     — fused Pallas kernel front-end (VMEM-resident chain,
                   split-bf16 MXU decimator) + XLA resampler,
* ``xla_bf16``   — XLA chain with the split-precision bf16 decimator,
* ``xla_f32``    — XLA chain, true-f32 (Precision.HIGHEST) matmuls.

Timing methodology: the n-iteration loop runs INSIDE one jitted
``lax.scan`` — one dispatch, one host readback, no per-iteration Python or
tunnel round-trips.  The carry state threads through every iteration (a
real data dependency, exactly like production streaming) and the audio is
folded into the carry as a checksum so no stage can be dead-code
eliminated.  Two run lengths are differenced to cancel the remaining fixed
dispatch+readback latency; lengths escalate (x4) until the long run is
dominated by iteration work, and each path reports whether its number is a
clean differenced measurement or a conservative ``t/n`` upper bound
(``timing`` field; an upper bound still CONTAINS the fixed latency and can
only understate the true throughput).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} against
the 500 Msamples/s/chip target (BASELINE.md — the reference publishes no
numbers; its implicit bound is 1.02 Msps real-time on a CPU thread).
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

TARGET_MSPS = 500.0
N_COMPLEX = 6 * 85 * 24576  # ~12.5M complex samples (~25 MB u8) per block
N_SHORT, N_LONG = 4, 16
MAX_ESCALATIONS = 4


def _diff_time(run) -> tuple[float, str]:
    """(seconds per iteration, 'differenced'|'upper_bound').

    ``run(n)`` must execute one n-iteration scan dispatch and return wall
    seconds including a host readback of the final carry.
    """
    n_s, n_l = N_SHORT, N_LONG
    run(n_s)  # compile
    t_l = run(n_l)  # compile + first timing signal
    for _ in range(MAX_ESCALATIONS):
        t_s = min(run(n_s) for _ in range(3))
        t_l = min(run(n_l) for _ in range(3))
        d = (t_l - t_s) / (n_l - n_s)
        if d > 0 and (t_l - t_s) >= t_s:
            # iteration work dominates the fixed latency: clean measurement
            return d, "differenced"
        # fixed dispatch+readback latency still swamps the delta: escalate
        n_s, n_l = n_l, n_l * 4
    return t_l / n_l, "upper_bound"


def bench_xla(host_block, precision: str):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpu_sdr.models import wbfm

    config = wbfm.WbfmConfig(filter_mode="fir", mxu_precision=precision)
    params = wbfm.make_params(config)
    state0 = wbfm.init_state(config)
    buf = jax.device_put(host_block)

    @partial(jax.jit, static_argnames=("n",))
    def run_n(state, n):
        def step(carry, _):
            s, acc = carry
            audio, _count, s2 = wbfm.demodulate_block(buf, s, params, config)
            return (s2, acc + jnp.sum(audio)), ()

        (s, acc), _ = lax.scan(step, (state, jnp.float32(0)), None, length=n)
        return s, acc

    def run(n: int) -> float:
        t0 = time.perf_counter()
        _s, acc = run_n(state0, n)
        float(acc)  # host readback = true sync
        return time.perf_counter() - t0

    return _diff_time(run)


def bench_pallas(host_block):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpu_sdr.ops import pallas_fm

    # chunks_per_step=2 sweeps fastest on hardware: M=340 matmul rows and
    # half the grid steps vs the default geometry
    spec = pallas_fm.default_spec(chunks_per_step=2)
    if host_block.size % spec.chunk_bytes:
        return None
    d16 = jax.device_put(pallas_fm.view_u8_as_i16(host_block, spec))
    w_hi, w_lo, v = pallas_fm.make_kernel_params()
    phase = jnp.asarray([0], jnp.int32)
    state0 = jnp.zeros((pallas_fm.STATE_ROWS, 128), jnp.float32
                       ).at[2, 127].set(1.0)
    rh0 = jnp.zeros(spec.taps_per_phase - 1, jnp.float32)

    @partial(jax.jit, static_argnames=("n",))
    def run_n(state, rh, n):
        def step(carry, _):
            s, r, acc = carry
            audio, s2, r2 = pallas_fm.demodulate_fused(
                d16, phase, s, r, w_hi, w_lo, v, spec)
            return (s2, r2, acc + jnp.sum(audio)), ()

        (s, r, acc), _ = lax.scan(
            step, (state, rh, jnp.float32(0)), None, length=n)
        return s, acc

    def run(n: int) -> float:
        t0 = time.perf_counter()
        _s, acc = run_n(state0, rh0, n)
        float(acc)
        return time.perf_counter() - t0

    return _diff_time(run)


def main() -> None:
    import jax

    rng = np.random.default_rng(0)
    host_block = rng.integers(0, 256, size=2 * N_COMPLEX, dtype=np.uint8)

    results = {}
    timing = {}
    if jax.default_backend() == "tpu":
        try:
            r = bench_pallas(host_block)
            if r:
                results["pallas"], timing["pallas"] = r
        except Exception:
            pass
    try:
        results["xla_bf16"], timing["xla_bf16"] = bench_xla(
            host_block, "split_bf16")
    except Exception:
        pass
    results["xla_f32"], timing["xla_f32"] = bench_xla(host_block, "f32")

    path, dt = min(results.items(), key=lambda kv: kv[1])
    msps = N_COMPLEX / dt / 1e6
    print(json.dumps({
        "metric": "wbfm_chain_throughput",
        "value": round(msps, 2),
        "unit": "complex Msamples/s/chip",
        "vs_baseline": round(msps / TARGET_MSPS, 4),
        "path": path,
        "all_paths_msps": {k: round(N_COMPLEX / v / 1e6, 1)
                           for k, v in results.items()},
        "timing": timing,
    }))


if __name__ == "__main__":
    main()
