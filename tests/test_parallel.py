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


@pytest.mark.parametrize("spin", [0, 2])
def test_sharded_pallas_engine_matches_jnp(mesh, spin):
    """The Pallas (interpret) sharded engine == the jnp scan engine."""
    from heracles_tpu.parallel import example_batch, map2alm_sharded

    nside, lmax = NSIDE, LMAX
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


def test_jackknife_cls_with_mesh_matches_single_device(tmp_path):
    import numpy as np

    from heracles_tpu import HealpixMapper
    from heracles_tpu.core import update_metadata
    from heracles_tpu.dices import jackknife_cls
    from heracles_tpu.fields import Positions
    from heracles_tpu.parallel import make_mesh

    nside, lmax, njk = 8, 12, 4
    npix = 12 * nside * nside
    rng = np.random.default_rng(66)
    mapper = HealpixMapper(nside, lmax=lmax, deconvolve=False)
    fields = {"POS": Positions(mapper, "RA", "DEC", overdensity=False)}

    m = rng.normal(size=npix) + 1.0
    update_metadata(m, spin=0, fsky=1.0)
    v = np.ones(npix)
    update_metadata(v, spin=0, fsky=1.0)
    data_maps = {("POS", 0): m}
    vis_maps = {("POS", 0): v}
    jk_map = (np.arange(npix) * njk // npix + 1).astype(float)

    want = jackknife_cls(
        data_maps, vis_maps, jk_map, fields, dir=str(tmp_path / "a")
    )
    got = jackknife_cls(
        data_maps, vis_maps, jk_map, fields, dir=str(tmp_path / "b"),
        mesh=make_mesh(),
    )
    assert set(got.keys()) == set(want.keys())
    for k in want:
        for key in want[k]:
            np.testing.assert_allclose(
                np.asarray(got[k][key].array), np.asarray(want[k][key].array),
                rtol=1e-9, atol=1e-11,
            )


@pytest.mark.parametrize("spin", [0, 2])
@pytest.mark.parametrize("engine", ["jnp", "pallas-interpret"])
def test_map2alm_sharded_dd_matches_f64(mesh, spin, engine):
    """Sharded dd analysis on f32 maps reaches ~f64 accuracy, beats plain."""
    from heracles_tpu import parallel

    nside, lmax = NSIDE, LMAX
    if spin == 0:
        (maps,) = parallel.example_batch(mesh, nside=nside, lmax=lmax, seed=11)
    else:
        _, maps = parallel.example_batch(mesh, nside=nside, lmax=lmax,
                                         seed=11, spin2=True)
    want = np.asarray(
        sht.map2alm(np.asarray(maps).astype(np.float64), lmax=lmax,
                    spin=spin, packed=False)
    )
    a_dd = np.asarray(
        parallel.map2alm_sharded(mesh, maps, lmax, spin=spin, engine=engine,
                                 dd=True)
    )[..., : lmax + 1]
    a_pl = np.asarray(
        parallel.map2alm_sharded(mesh, maps, lmax, spin=spin, engine=engine,
                                 dd=False)
    )[..., : lmax + 1]
    scale = np.abs(want).max()
    err_dd = np.abs(a_dd - want).max() / scale
    err_pl = np.abs(a_pl - want).max() / scale
    # the dd recurrence removes the f32 recurrence error; what remains is
    # the f32 input/FFT quantisation (~1e-7 at this toy scale)
    assert err_dd < 5e-7, (err_dd, err_pl)
    assert err_dd <= err_pl, (err_dd, err_pl)


@pytest.mark.parametrize("spin", [0, 2])
@pytest.mark.parametrize("engine", ["jnp", "pallas-interpret"])
def test_alm2map_sharded_matches_unsharded(mesh, spin, engine):
    from heracles_tpu import parallel

    nside, lmax = NSIDE, LMAX
    rng = np.random.default_rng(21)
    n_m = mesh.shape["m"]
    per = parallel._m_block(lmax, n_m)
    nbins = 2 * mesh.shape["batch"]
    shape = (nbins, lmax + 1, lmax + 1) if spin == 0 else (
        nbins, 2, lmax + 1, lmax + 1)
    alm = (rng.normal(size=shape) + 1j * rng.normal(size=shape))
    # zero the l < m triangle (as unpack_alm would)
    ls = np.arange(lmax + 1)[:, None]
    msk = ls >= np.arange(lmax + 1)[None, :]
    alm *= msk
    dt = np.complex128 if engine == "jnp" else np.complex64
    alm = alm.astype(dt)
    pad = per * n_m - (lmax + 1)
    alm_pad = np.pad(alm, [(0, 0)] * (alm.ndim - 1) + [(0, pad)])
    got = np.asarray(parallel.alm2map_sharded(
        mesh, alm_pad, nside, lmax=lmax, spin=spin, engine=engine))
    want = np.asarray(sht.alm2map(
        alm.astype(np.complex128), nside, lmax=lmax, spin=spin,
        packed=False))
    scale = np.abs(want).max()
    tol = 1e-10 if engine == "jnp" else 5e-6
    np.testing.assert_allclose(got, want, atol=tol * scale, rtol=1e-4)


def test_sharded_m_offset_real_orders(mesh):
    """Orders beyond the first 128-lane block land on the right device.

    At toy lmax the second m block is all padding, so this is the only
    test where a non-zero m0 offset carries *real* orders through the
    sharded analysis + synthesis (jnp engine; nside 128 keeps it fast).
    """
    from heracles_tpu import parallel

    nside, lmax = 128, 192
    rng = np.random.default_rng(23)
    nbins = mesh.shape["batch"]
    maps = rng.normal(size=(nbins, 12 * nside * nside))
    alm = np.asarray(parallel.map2alm_sharded(mesh, maps, lmax))
    want = np.asarray(sht.map2alm(maps, lmax=lmax, packed=False))
    np.testing.assert_allclose(
        alm[..., : lmax + 1], want, rtol=1e-9, atol=1e-12
    )
    # synthesis back through the mesh == unsharded synthesis
    m_back = np.asarray(parallel.alm2map_sharded(mesh, alm, nside, lmax=lmax))
    want_m = np.asarray(sht.alm2map(want, nside, lmax=lmax, packed=False))
    scale = np.abs(want_m).max()
    np.testing.assert_allclose(m_back, want_m, atol=1e-10 * scale, rtol=1e-6)


def test_mixmat_mesh_matches_unsharded(mesh):
    """f64 GL node sharding: mixmat/mixmat_eb(mesh=) == single device."""
    from heracles_tpu.twopoint import mixmat, mixmat_eb

    lmax = 16
    rng = np.random.default_rng(31)
    cl = (rng.uniform(size=lmax + 1) / (1 + np.arange(lmax + 1)))
    want = mixmat(cl, l1max=lmax, l2max=lmax)
    got = mixmat(cl, l1max=lmax, l2max=lmax, mesh=mesh)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)
    want_eb = mixmat_eb(cl, l1max=lmax, l2max=lmax)
    got_eb = mixmat_eb(cl, l1max=lmax, l2max=lmax, mesh=mesh)
    np.testing.assert_allclose(got_eb, want_eb, rtol=1e-11, atol=1e-14)


def test_gram_df32_sharded_matches_truth(mesh):
    """Sharded compensated Gram (interpret kernel) == the f64 truth."""
    from heracles_tpu.ops import df32

    rng = np.random.default_rng(41)
    K, L1, L2 = 700, 24, 40
    A = df32.split_f64(rng.normal(size=(K, L1)))
    B = df32.split_f64(rng.normal(size=(K, L2)))
    u = df32.split_f64(rng.normal(size=K))

    def f64(p):
        return np.asarray(p[0], np.float64) + np.asarray(p[1], np.float64)

    want = (f64(A) * f64(u)[:, None]).T @ f64(B)
    got = df32.gram_df32_sharded(mesh, A, B, u, interpret=True)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-13 * scale)


def test_mixmat_eb_df32_mesh_kernel(mesh, monkeypatch):
    """df32 kernel branch (interpret) across the mesh == f64 oracle."""
    from heracles_tpu.twopoint import mixmat_eb

    monkeypatch.setenv("HERACLES_TPU_MIXMAT_KERNEL", "interpret")
    lmax = 12
    rng = np.random.default_rng(51)
    cl = (rng.uniform(size=lmax + 1) / (1 + np.arange(lmax + 1)))
    got = mixmat_eb(cl.astype(np.float32), l1max=lmax, l2max=lmax,
                    mesh=mesh)
    want = mixmat_eb(cl.astype(np.float64), l1max=lmax, l2max=lmax)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-7 * scale, rtol=2e-5)
