"""Interleaved A/B timing of fused-kernel variants on the real chip.

NEXT.md's headroom analysis says the fused kernel is VPU/overhead-bound;
the candidate levers are the rotation implementation (full-size select vs
(1, width) broadcast multiply), the atan ladder length (10-term f32-exact
vs 6-term ~107 dB), and the grid geometry (chunks_per_step).  This harness
times each variant with the same scan-differenced methodology as bench.py,
*interleaved* (every variant measured in every repetition round) so a
tunnel-phase drift cannot masquerade as a variant effect — the same
protocol that produced the rotation-folding negative result (NEXT.md).

Usage:  python -m benchmarks.ab_kernel [reps]
Prints one JSON line per variant with per-rep ms/block and the median.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

import os

# Long enough that scan work (~0.26 ms/block clean phase) dominates the
# ~20 ms dispatch+readback and its drift; differencing removes the rest.
N_SHORT = int(os.environ.get("AB_N_SHORT", "256"))
N_LONG = int(os.environ.get("AB_N_LONG", "1024"))


def make_runner(host_block, chunks_per_step, atan_mode, rot_impl,
                unpack_impl="scale", prev_impl="shift"):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpu_sdr.ops import pallas_fm

    spec = pallas_fm.default_spec(chunks_per_step=chunks_per_step)
    if host_block.size % spec.chunk_bytes:
        return None
    d16 = jax.device_put(pallas_fm.view_u8_as_i16(host_block, spec))
    w_hi, w_lo, v = pallas_fm.make_kernel_params(prev_impl=prev_impl)
    phase = jnp.asarray([0], jnp.int32)
    state0 = jnp.zeros((pallas_fm.STATE_ROWS, 128), jnp.float32
                       ).at[2, 127].set(1.0)
    rh0 = jnp.zeros(spec.taps_per_phase - 1, jnp.float32)

    @partial(jax.jit, static_argnames=("n",))
    def run_n(state, rh, n):
        def step(carry, _):
            s, r, acc = carry
            audio, s2, r2 = pallas_fm.demodulate_fused(
                d16, phase, s, r, w_hi, w_lo, v, spec,
                atan_mode=atan_mode, rot_impl=rot_impl,
                unpack_impl=unpack_impl, prev_impl=prev_impl)
            return (s2, r2, acc + jnp.sum(audio)), ()

        (s, r, acc), _ = lax.scan(
            step, (state, rh, jnp.float32(0)), None, length=n)
        return s, acc

    def run(n: int) -> float:
        t0 = time.perf_counter()
        _s, acc = run_n(state0, rh0, n)
        float(acc)
        return time.perf_counter() - t0

    return run


def main() -> None:
    import pathlib

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).resolve().parents[1]
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    gs = ([int(g) for g in sys.argv[2].split(",")] if len(sys.argv) > 2
          else [8])
    n_complex = 6 * 85 * 24576  # same block as bench.py (~12.5M complex)
    rng = np.random.default_rng(0)
    host_block = rng.integers(0, 256, size=2 * n_complex, dtype=np.uint8)

    mode = sys.argv[3] if len(sys.argv) > 3 else "rot_atan"
    variants = []
    if mode == "host":
        # device-side saving of host pre-rotation (rot_impl='host'):
        # the host leg consumes a PRE-ROTATED HBM block (rotation done
        # once outside the timed region — in production it rides the C++
        # feeder's conversion pass, see csrc/tpusdr_io.cpp), the baseline
        # leg the raw block with the in-kernel broadcast rotation.
        from tpu_sdr.ops import pallas_fm as _pf

        rotated = _pf.host_rotate_fs4_u8(host_block)
        for g in gs:
            variants.append((f"g{g}_rot_broadcast", g, "poly6", "broadcast",
                             "dcfold", "shift", host_block))
            variants.append((f"g{g}_rot_host", g, "poly6", "host",
                             "dcfold", "shift", rotated))
            # bf16 pre-matmul pipeline retry: its round-4 7% loss was
            # measured WITH the in-kernel rotation; host mode removes
            # most of the 16-bit layout work that cost
            variants.append((f"g{g}_rot_host_bf16", g, "poly6", "host",
                             "dcfold_bf16", "shift", rotated))
    elif mode == "rcp":
        # atan range-reduction: exact divide vs approx-reciprocal+Newton,
        # at the production defaults (broadcast + dcfold)
        for g in gs:
            variants.append((f"g{g}_poly6_div", g, "poly6", "broadcast",
                             "dcfold"))
            variants.append((f"g{g}_poly6_rcp", g, "poly6_rcp", "broadcast",
                             "dcfold"))
    elif mode == "prev":
        # discriminator-prev: VPU shuffle vs stacked-weights matmul, at
        # the production defaults (poly6 + broadcast + dcfold)
        for g in gs:
            variants.append((f"g{g}_prev_shift", g, "poly6", "broadcast",
                             "dcfold", "shift"))
            variants.append((f"g{g}_prev_matmul", g, "poly6", "broadcast",
                             "dcfold", "matmul"))
    elif mode == "dcfold":
        # defaults (poly6+broadcast) across the unpack impls
        for g in gs:
            variants.append((f"g{g}_scale", g, "poly6", "broadcast",
                             "scale"))
            variants.append((f"g{g}_dcfold", g, "poly6", "broadcast",
                             "dcfold"))
            variants.append((f"g{g}_dcfold_bf16", g, "poly6", "broadcast",
                             "dcfold_bf16"))
    else:
        for g in gs:
            for atan in ("exact", "poly6"):
                for rot in ("select", "broadcast"):
                    variants.append((f"g{g}_{atan}_{rot}", g, atan, rot,
                                     "scale"))

    runners = {}
    for name, g, atan, rot, unpack, *rest in variants:
        prev = rest[0] if rest else "shift"
        block = rest[1] if len(rest) > 1 else host_block
        r = make_runner(block, g, atan, rot, unpack, prev)
        if r is None:
            continue
        t0 = time.perf_counter()
        r(N_SHORT)  # compile
        r(N_LONG)
        print(json.dumps({"compiled": name,
                          "warm_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
        runners[name] = r

    per_block = {name: [] for name in runners}
    for rep in range(reps):
        for name, run in runners.items():
            t_s = run(N_SHORT)
            t_l = run(N_LONG)
            per_block[name].append((t_l - t_s) / (N_LONG - N_SHORT))
        # incremental dump: a timeout kill still leaves usable rounds
        print(json.dumps({"rep": rep, "ms_per_block": {
            k: round(v[-1] * 1e3, 3) for k, v in per_block.items()}}),
            flush=True)

    for name, ds in per_block.items():
        med = float(np.median(ds))
        print(json.dumps({
            "variant": name,
            "ms_per_block": [round(d * 1e3, 3) for d in ds],
            "median_ms": round(med * 1e3, 3),
            "msps": round(n_complex / med / 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
