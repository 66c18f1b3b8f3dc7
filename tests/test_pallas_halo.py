"""Pallas remote-DMA halo exchange vs the ppermute reference, on the 8-way
virtual CPU mesh (conftest forces CPU + 8 host devices).  The Pallas path
runs under the TPU interpreter's distributed emulation; semantics must
match tpu_sdr.parallel.halo.pull_left_halo exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from tpu_sdr.parallel import halo as ref_halo
from tpu_sdr.parallel import mesh as mesh_mod


def _run(fn, n_dev, halo, left_edge=None):
    mesh = mesh_mod.make_mesh(dp=1, sp=n_dev)
    x = jnp.arange(n_dev * 32, dtype=jnp.float32)

    def body(xs):
        edge = None if left_edge is None else jnp.asarray(left_edge, jnp.float32)
        return fn(xs, halo, "sp", edge)

    # check_vma=False: the pallas interpret machinery mixes varying and
    # unvarying values internally, which the vma checker rejects
    out = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P("sp"), out_specs=P("sp"),
        check_vma=False))(x)
    return np.asarray(out).reshape(n_dev, halo)


@pytest.mark.parametrize("halo", [4, 8])
def test_pallas_halo_matches_ppermute(halo):
    try:
        from tpu_sdr.parallel.pallas_halo import pull_left_halo_pallas
        got = _run(lambda x, h, a, e: pull_left_halo_pallas(x, h, a, e, force=True),
                   8, halo)
    except Exception as e:  # interpreter lacks distributed emulation
        pytest.skip(f"pallas distributed interpret unavailable: {e}")
    exp = _run(ref_halo.pull_left_halo, 8, halo)
    np.testing.assert_allclose(got, exp)


def test_pallas_halo_left_edge_carry():
    edge = np.full(4, 7.5, np.float32)
    try:
        from tpu_sdr.parallel.pallas_halo import pull_left_halo_pallas
        got = _run(lambda x, h, a, e: pull_left_halo_pallas(x, h, a, e, force=True),
                   8, 4, left_edge=edge)
    except Exception as e:
        pytest.skip(f"pallas distributed interpret unavailable: {e}")
    np.testing.assert_allclose(got[0], edge)
    # shard i>0 sees the tail of shard i-1 (each shard holds 32 samples)
    np.testing.assert_allclose(got[1], np.arange(28, 32, dtype=np.float32))


@pytest.mark.parametrize("n_dev", [1, 4])
def test_ring_shift_matches_ppermute(n_dev):
    """Circular ring shift (the single-chip DMA smoke) vs the ppermute
    permutation, interpreted on the virtual mesh; n_dev=1 is the self-copy
    degenerate ring the TPU tier executes compiled."""
    from jax import lax
    from jax.experimental.pallas import tpu as pltpu

    try:
        from tpu_sdr.parallel.pallas_halo import ring_shift_pallas
        mesh = mesh_mod.make_mesh(dp=1, sp=n_dev)
        x = jnp.arange(n_dev * 32, dtype=jnp.float32)
        got = jax.jit(jax.shard_map(
            lambda xs: ring_shift_pallas(xs, "sp",
                                         interpret=pltpu.InterpretParams()),
            mesh=mesh, in_specs=P("sp"), out_specs=P("sp"),
            check_vma=False))(x)
    except Exception as e:  # interpreter lacks distributed emulation
        pytest.skip(f"pallas distributed interpret unavailable: {e}")
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    exp = jax.jit(jax.shard_map(
        lambda xs: lax.ppermute(xs, "sp", perm), mesh=mesh,
        in_specs=P("sp"), out_specs=P("sp"), check_vma=False))(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))


def test_fallback_path_matches_reference():
    from tpu_sdr.parallel.pallas_halo import pull_left_halo_pallas

    got = _run(pull_left_halo_pallas, 8, 4)  # CPU backend -> ppermute path
    exp = _run(ref_halo.pull_left_halo, 8, 4)
    np.testing.assert_allclose(got, exp)
