"""Standalone worker for the 2-process multi-host integration test.

Run as ``python tests/multihost_worker.py <process_id> <num_processes>
<coordinator> <out_dir>`` (tests/test_multihost.py spawns two of these).
Each process owns 4 virtual CPU devices; together they form a
(hosts=2, chips=4) mesh.  Each process feeds ONLY its own station's bytes
(the feeder fan-out), the sharded WBFM chain runs with time halos on the
intra-host axis, and process 0 gathers the audio and checks it against the
serial single-process chain bit-for-float.
"""

import os
import sys


def main() -> int:
    pid = int(sys.argv[1])
    n_proc = int(sys.argv[2])
    coordinator = sys.argv[3]
    out_dir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tpu_sdr.parallel import distributed as dist

    dist.init_distributed(coordinator_address=coordinator,
                          num_processes=n_proc, process_id=pid)
    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    import numpy as np

    from tpu_sdr.models import wbfm
    from tpu_sdr.parallel.wbfm_sharded import make_sharded_wbfm

    mesh = dist.make_host_mesh()
    assert mesh.shape == {"dp": n_proc, "sp": 4}
    # Every host must see the identical mesh (global device order).
    ids = [[d.id for d in row] for row in mesh.devices]
    assert ids == sorted(ids), ids

    config = wbfm.WbfmConfig(filter_mode="fir")
    chain = make_sharded_wbfm(mesh, config)

    # One station per host; each host generates only its own bytes.
    n_loc = 4 * config.decim * 1024  # per-chip complex samples
    n_complex = n_loc * 4            # per-station (time axis spans 4 chips)
    rng = np.random.default_rng(100 + pid)
    local_blocks = rng.integers(0, 256, size=(1, 2 * n_complex),
                                dtype=np.uint8)

    audio, counts = dist.multihost_wbfm_apply(chain, local_blocks)
    jax.block_until_ready((audio, counts))

    audio_np = dist.fetch_global(audio)
    counts_np = dist.fetch_global(counts)
    got = chain.assemble(audio_np, counts_np)

    if pid == 0:
        # Serial reference: one direct demodulate_block call per station
        # (full consumption — the streamer trims to its 2*decim*down
        # quantum and would emit fewer samples for this length).
        # Recreate each host's bytes from its seed.
        import jax.numpy as jnp

        params = wbfm.make_params(config)
        exp_rows = []
        for p in range(n_proc):
            r = np.random.default_rng(100 + p)
            buf = r.integers(0, 256, size=2 * n_complex, dtype=np.uint8)
            out = wbfm.demodulate_block(
                jnp.asarray(buf), wbfm.init_state(config), params, config)
            exp_rows.append(np.asarray(out[0])[: int(out[1])])
        exp = np.stack(exp_rows)
        assert got.shape == exp.shape, (got.shape, exp.shape)
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)
        with open(os.path.join(out_dir, "ok"), "w") as f:
            f.write(f"shape={got.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
