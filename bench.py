"""Benchmark: WBFM chain throughput in complex Msamples/s on one chip.

Runs the FIR-mode fast chain (the BASELINE.json north-star configuration:
real anti-alias FIR decimation + quadrature discriminator + polyphase audio
resampler) over large streaming blocks on the default JAX platform (TPU
under the driver), steady-state, with the carry state threaded between
blocks exactly as production streaming does.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the 500 Msamples/s/chip target (BASELINE.md — the reference
publishes no numbers; its implicit bound is 1.02 Msps real-time on a CPU
thread).
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET_MSPS = 500.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpu_sdr.models import wbfm

    config = wbfm.WbfmConfig(filter_mode="fir")
    params = wbfm.make_params(config)

    # ~12.5M complex samples / block (~25 MB u8), aligned so the whole chain
    # takes the MXU frame-matmul paths (multiple of decim * resample_down).
    n_complex = 6 * 85 * 24576
    n_bytes = 2 * n_complex
    rng = np.random.default_rng(0)
    host_block = rng.integers(0, 256, size=n_bytes, dtype=np.uint8)

    state = wbfm.init_state(config)
    buf = jax.device_put(host_block)

    # Warmup / compile
    audio, count, state = wbfm.demodulate_block(buf, state, params, config)
    jax.block_until_ready(audio)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        audio, count, state = wbfm.demodulate_block(buf, state, params, config)
        jax.block_until_ready(audio)  # sync per block: honest steady-state
    dt = time.perf_counter() - t0

    msps = n_complex * iters / dt / 1e6
    print(json.dumps({
        "metric": "wbfm_fir_chain_throughput",
        "value": round(msps, 2),
        "unit": "complex Msamples/s/chip",
        "vs_baseline": round(msps / TARGET_MSPS, 4),
    }))


if __name__ == "__main__":
    main()
