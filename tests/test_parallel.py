"""Sharded pipeline correctness: 8-device mesh result == single-device."""

import numpy as np

from heracles_tpu.ops import sht


def test_pipeline_step_matches_unsharded():
    import jax

    from heracles_tpu import parallel

    nside, lmax = 16, 24
    mesh = parallel.make_mesh(8)
    assert mesh.devices.size == 8 and mesh.shape["m"] == 2
    (maps,) = parallel.example_batch(mesh, nside=nside, lmax=lmax, seed=1)
    out = np.asarray(parallel.pipeline_step(mesh, maps, lmax))

    host = np.asarray(maps).astype(np.float64)
    alms = np.asarray(sht.map2alm(host, lmax=lmax, weights=None))
    nbins = host.shape[0]
    want = np.empty((nbins, nbins, lmax + 1))
    from heracles_tpu.twopoint import alm2cl

    for a in range(nbins):
        for b in range(nbins):
            want[a, b] = alm2cl(alms[a], alms[b])
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=1e-7)


def test_map2alm_sharded_matches_unsharded():
    from heracles_tpu import parallel

    nside, lmax = 16, 24
    mesh = parallel.make_mesh(8)
    (maps,) = parallel.example_batch(mesh, nside=nside, lmax=lmax, seed=2)
    alm = np.asarray(parallel.map2alm_sharded(mesh, maps, lmax))
    host = np.asarray(maps).astype(np.float64)
    want = np.asarray(sht.map2alm(host, lmax=lmax, weights=None, packed=False))
    np.testing.assert_allclose(
        alm[..., : lmax + 1], want, rtol=2e-4, atol=1e-7
    )


def test_graft_entry_forward():
    from __graft_entry__ import entry

    fn, args = entry()
    import jax

    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))
