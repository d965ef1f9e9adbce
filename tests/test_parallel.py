"""Sharded pipeline correctness: 8-device mesh result == single-device."""

import numpy as np
import pytest

from heracles_tpu.ops import sht

NSIDE, LMAX = 8, 12


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


def test_public_transform_with_mesh_matches_single_device():
    """transform(fields, data, mesh=...) == transform(fields, data)."""
    import numpy as np

    from heracles_tpu import HealpixMapper, transform
    from heracles_tpu.core import update_metadata
    from heracles_tpu.fields import Positions, Shears
    from heracles_tpu.parallel import make_mesh

    nside, lmax = NSIDE, LMAX
    rng = np.random.default_rng(33)
    mapper = HealpixMapper(nside, lmax=lmax, deconvolve=False)
    fields = {
        "POS": Positions(mapper, "RA", "DEC", overdensity=False),
        "SHE": Shears(mapper, "RA", "DEC", "G1", "G2", "W"),
    }
    npix = 12 * nside * nside
    data = {}
    for b in range(3):
        m = rng.normal(size=npix)
        update_metadata(m, spin=0)
        data["POS", b] = m
        qu = rng.normal(size=(2, npix))
        update_metadata(qu, spin=2)
        data["SHE", b] = qu

    want = transform(fields, dict(data))
    mesh = make_mesh()
    got = transform(fields, dict(data), mesh=mesh)
    assert set(got.keys()) == set(want.keys())
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=5e-11, atol=5e-11
        )
        assert (got[k].dtype.metadata or {}).get("spin") == (
            want[k].dtype.metadata or {}
        ).get("spin")


def test_angular_power_spectra_with_mesh_matches_single_device():
    import numpy as np

    from heracles_tpu import angular_power_spectra
    from heracles_tpu.core import update_metadata
    from heracles_tpu.ops import sht
    from heracles_tpu.parallel import make_mesh

    lmax = 12
    nlm = sht.alm_size(lmax)
    rng = np.random.default_rng(44)
    alms = {}
    for b in range(3):
        a = rng.normal(size=nlm) + 1j * rng.normal(size=nlm)
        update_metadata(a, spin=0)
        alms["POS", b] = a
        e = rng.normal(size=(2, nlm)) + 1j * rng.normal(size=(2, nlm))
        update_metadata(e, spin=2)
        alms["SHE", b] = e

    want = angular_power_spectra(alms)
    got = angular_power_spectra(alms, mesh=make_mesh())
    assert set(got.keys()) == set(want.keys())
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k].array), np.asarray(want[k].array),
            rtol=1e-12, atol=1e-12,
        )


def test_angular_power_spectra_samples_matches_per_sample():
    import numpy as np

    from heracles_tpu import angular_power_spectra
    from heracles_tpu.core import update_metadata
    from heracles_tpu.ops import sht
    from heracles_tpu.twopoint import angular_power_spectra_samples
    from heracles_tpu.parallel import make_mesh

    lmax = 12
    nlm = sht.alm_size(lmax)
    rng = np.random.default_rng(55)
    samples = []
    for s in range(5):
        alms = {}
        for b in range(2):
            a = rng.normal(size=nlm) + 1j * rng.normal(size=nlm)
            update_metadata(a, spin=0, fsky=0.5, musq=1.0, dens=100.0)
            alms["POS", b] = a
        samples.append(alms)

    want = [angular_power_spectra(al) for al in samples]
    for mesh in (None, make_mesh()):
        got = angular_power_spectra_samples(samples, mesh=mesh)
        assert len(got) == len(want)
        for w, g in zip(want, got):
            assert set(g.keys()) == set(w.keys())
            for k in w:
                np.testing.assert_allclose(
                    np.asarray(g[k].array), np.asarray(w[k].array),
                    rtol=1e-12, atol=1e-12,
                )




@pytest.mark.parametrize("spin", [0, 2])
def test_mapper_synthesize_sharded_matches_unsharded(mesh, spin):
    """HealpixMapper.synthesize_sharded == synthesize on a stacked batch."""
    import heracles_tpu as h
    from heracles_tpu.ops import sht as sht_mod

    nside, lmax = NSIDE, LMAX
    mapper = h.HealpixMapper(nside, lmax=lmax, deconvolve=False)
    rng = np.random.default_rng(61)
    nlm = sht_mod.alm_size(lmax)
    shape = (3, nlm) if spin == 0 else (3, 2, nlm)
    alm = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    got = mapper.synthesize_sharded(mesh, alm, spin=spin)
    want = np.stack([
        np.asarray(mapper.synthesize(alm[b], spin=spin)) for b in range(3)
    ])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-11)
    assert (got.dtype.metadata or {}).get("spin") == spin
