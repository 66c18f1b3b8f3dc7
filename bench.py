"""Benchmark: WBFM chain throughput in complex Msamples/s on one chip.

Measures the full streaming receive chain (u8 I/Q block -> audio) in its
candidate implementations and reports the fastest:

* ``pallas``     — fused Pallas kernel front-end (VMEM-resident chain,
                   split-bf16 MXU decimator) + XLA resampler,
* ``xla_bf16``   — XLA chain with the split-precision bf16 decimator,
* ``xla_f32``    — XLA chain, true-f32 (Precision.HIGHEST) matmuls.

Timing methodology: the carry state threads through every iteration (a
real data dependency, exactly like production streaming), the final state
is read back to the host (forcing the whole dependent chain — on tunneled
TPU backends ``block_until_ready`` can return before execution finishes),
and two run lengths are differenced to cancel the fixed dispatch+readback
latency.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} against
the 500 Msamples/s/chip target (BASELINE.md — the reference publishes no
numbers; its implicit bound is 1.02 Msps real-time on a CPU thread).
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET_MSPS = 500.0
N_COMPLEX = 6 * 85 * 24576  # ~12.5M complex samples (~25 MB u8) per block
N_SHORT, N_LONG = 5, 25


def _diff_time(run) -> float:
    """Seconds per iteration, fixed latency cancelled.

    The tunnel's async pipelining occasionally makes the short/long delta
    non-positive (both runs hide behind the same fixed latency); such
    degenerate rounds are rejected and the conservative upper bound
    ``t_long / N_LONG`` (which still CONTAINS the fixed latency) is used
    instead — the reported number can only understate the true throughput.
    """
    run(2)  # warm (compile already done by caller)
    deltas = []
    upper = float("inf")
    for _ in range(3):
        t_short = run(N_SHORT)
        t_long = run(N_LONG)
        upper = min(upper, t_long / N_LONG)
        d = (t_long - t_short) / (N_LONG - N_SHORT)
        if d > 0:
            deltas.append(d)
    deltas = [d for d in deltas if d >= 0.2 * upper]  # reject noise-floor hits
    if deltas:
        return sorted(deltas)[len(deltas) // 2]
    return upper


def bench_xla(buf, precision: str):
    from tpu_sdr.models import wbfm

    config = wbfm.WbfmConfig(filter_mode="fir", mxu_precision=precision)
    params = wbfm.make_params(config)
    state0 = wbfm.init_state(config)

    def run(n: int) -> float:
        s = state0
        t0 = time.perf_counter()
        for _ in range(n):
            _a, _c, s = wbfm.demodulate_block(buf, s, params, config)
        np.asarray(s.quad.pre_re)  # host readback = true sync
        return time.perf_counter() - t0

    return _diff_time(run)


def bench_pallas(host_block):
    import jax
    import jax.numpy as jnp

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

    def run(n: int) -> float:
        s, r = state0, rh0
        t0 = time.perf_counter()
        for _ in range(n):
            _a, s, r = pallas_fm.demodulate_fused(
                d16, phase, s, r, w_hi, w_lo, v, spec)
        np.asarray(s[0, 0])
        return time.perf_counter() - t0

    return _diff_time(run)


def main() -> None:
    import jax

    rng = np.random.default_rng(0)
    host_block = rng.integers(0, 256, size=2 * N_COMPLEX, dtype=np.uint8)
    buf = jax.device_put(host_block)

    results = {}
    if jax.default_backend() == "tpu":
        try:
            dt = bench_pallas(host_block)
            if dt:
                results["pallas"] = dt
        except Exception:
            pass
    try:
        results["xla_bf16"] = bench_xla(buf, "split_bf16")
    except Exception:
        pass
    results["xla_f32"] = bench_xla(buf, "f32")

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
    }))


if __name__ == "__main__":
    main()
