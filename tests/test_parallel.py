"""Sharded pipeline correctness: 8-device mesh result == single-device."""

import numpy as np
import pytest

from heracles_tpu.ops import sht

NSIDE, LMAX = 16, 24


@pytest.fixture(scope="module")
def mesh():
    from heracles_tpu import parallel

    m = parallel.make_mesh(8)
    assert m.devices.size == 8 and m.shape["m"] == 2
    return m


def _plane_grid(planes):
    """Host oracle for the all-pairs grid from rectangular alms."""
    nm = planes.shape[-1]
    eps = np.where(np.arange(nm) == 0, 1.0, 2.0)
    grid = np.einsum("alm,blm->abl", planes.real * eps, planes.real)
    grid += np.einsum("alm,blm->abl", planes.imag * eps, planes.imag)
    ells = np.arange(planes.shape[-2])
    return grid / (2 * ells + 1)


def test_map2alm_sharded_matches_unsharded(mesh):
    from heracles_tpu import parallel

    (maps,) = parallel.example_batch(mesh, nside=NSIDE, lmax=LMAX, seed=2)
    alm = np.asarray(parallel.map2alm_sharded(mesh, maps, LMAX))
    host = np.asarray(maps).astype(np.float64)
    want = np.asarray(sht.map2alm(host, lmax=LMAX, packed=False))
    np.testing.assert_allclose(alm[..., : LMAX + 1], want, rtol=2e-4, atol=5e-7)


def test_map2alm_sharded_spin2_matches_unsharded(mesh):
    from heracles_tpu import parallel

    _, qu = parallel.example_batch(mesh, nside=NSIDE, lmax=LMAX, seed=3,
                                   spin2=True)
    alm = np.asarray(parallel.map2alm_sharded(mesh, qu, LMAX, spin=2))
    assert alm.shape[:2] == (qu.shape[0], 2)
    host = np.asarray(qu).astype(np.float64)
    want = np.asarray(sht.map2alm(host, lmax=LMAX, spin=2, packed=False))
    np.testing.assert_allclose(alm[..., : LMAX + 1], want, rtol=2e-4, atol=1e-7)


def test_pipeline_step_matches_unsharded(mesh):
    from heracles_tpu import parallel

    (maps,) = parallel.example_batch(mesh, nside=NSIDE, lmax=LMAX, seed=1)
    out = np.asarray(parallel.pipeline_step(mesh, maps, LMAX))

    host = np.asarray(maps).astype(np.float64)
    planes = np.asarray(sht.map2alm(host, lmax=LMAX, packed=False))
    np.testing.assert_allclose(out, _plane_grid(planes), rtol=2e-4, atol=1e-7)


def test_pipeline_step_mixed_spins_matches_unsharded(mesh):
    """spin-0 + spin-2 batches in one sharded all-pairs grid."""
    from heracles_tpu import parallel

    maps, qu = parallel.example_batch(mesh, nside=NSIDE, lmax=LMAX, seed=4,
                                      spin2=True)
    out = np.asarray(parallel.pipeline_step(mesh, maps, LMAX, qu))

    host0 = np.asarray(maps).astype(np.float64)
    host2 = np.asarray(qu).astype(np.float64)
    p0 = np.asarray(sht.map2alm(host0, lmax=LMAX, packed=False))
    eb = np.asarray(sht.map2alm(host2, lmax=LMAX, spin=2, packed=False))
    planes = np.concatenate([p0, eb.reshape((-1,) + eb.shape[-2:])], axis=0)
    want = _plane_grid(planes)
    assert out.shape == want.shape
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=1e-7)


def test_graft_entry_forward():
    from __graft_entry__ import entry

    fn, args = entry()
    import jax

    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("spin", [0, 2])
def test_sharded_pallas_engine_matches_jnp(mesh, spin):
    """The Pallas (interpret) sharded engine == the jnp scan engine."""
    from heracles_tpu.parallel import example_batch, map2alm_sharded

    nside, lmax = 16, 24
    if spin == 0:
        (maps,) = example_batch(mesh, nside=nside, lmax=lmax, seed=7)
    else:
        _, maps = example_batch(mesh, nside=nside, lmax=lmax, seed=7,
                                spin2=True)
    a_jnp = np.asarray(
        map2alm_sharded(mesh, maps, lmax, spin=spin, engine="jnp")
    )
    a_pl = np.asarray(
        map2alm_sharded(mesh, maps, lmax, spin=spin,
                        engine="pallas-interpret")
    )
    scale = np.abs(a_jnp).max()
    np.testing.assert_allclose(a_pl, a_jnp, atol=5e-6 * scale, rtol=1e-4)
