"""Sharded-path extras: engines, dd, synthesis, mixmat, m offsets.

Split from test_parallel.py so each file fits a ~10-minute CI chunk —
the cost is 8-virtual-device shard_map COMPILES (not execution), so
shrinking sizes further does not help.
"""

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


@pytest.mark.parametrize("spin", [0, 2])
def test_discrete_adjoint_sharded_matches_blocked(mesh, spin):
    """Point-sharded exact adjoint == the host block loop."""
    from heracles_tpu.mappers import DiscreteMapper

    rng = np.random.default_rng(71)
    lmax, npts = 16, 301  # odd size exercises the padding path
    mapper = DiscreteMapper(lmax)
    theta = np.arccos(rng.uniform(-1, 1, size=npts))
    phi = rng.uniform(0, 2 * np.pi, size=npts)
    if spin == 0:
        values = rng.normal(size=(1, npts))
    else:
        values = rng.normal(size=(2, npts))
    want = mapper._adjoint_synthesis(theta, phi, values, spin)
    got = mapper.adjoint_synthesis_sharded(mesh, theta, phi, values,
                                           spin=spin)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-12 * scale, rtol=1e-10)
