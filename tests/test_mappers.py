"""Mapper backends: protocol conformance, scatter, transform, discrete."""

import numpy as np
import pytest

from heracles_tpu import healpix as hpx
from heracles_tpu.mapper import Mapper
from heracles_tpu.mappers import DiscreteMapper, HealpixMapper


def test_protocol_conformance():
    assert isinstance(HealpixMapper(8), Mapper)
    assert isinstance(DiscreteMapper(10), Mapper)


def test_healpix_mapper_properties():
    m = HealpixMapper(16)
    assert m.nside == 16
    assert m.lmax == 24  # 3*nside//2 default
    assert m.deconvolve is True
    assert m.area == pytest.approx(4 * np.pi / hpx.nside2npix(16))
    m2 = HealpixMapper(16, 30, deconvolve=False)
    assert m2.lmax == 30 and m2.deconvolve is False


def test_healpix_create_metadata():
    m = HealpixMapper(8, 12)
    out = m.create(2, spin=2)
    assert out.shape == (2, hpx.nside2npix(8))
    md = out.dtype.metadata
    assert md["geometry"] == "healpix"
    assert md["kernel"] == "healpix"
    assert md["nside"] == 8 and md["lmax"] == 12
    assert md["spin"] == 2 and md["deconv"] is True


def test_map_values_matches_add_at():
    rng = np.random.default_rng(0)
    nside = 8
    m = HealpixMapper(nside)
    n = 1000
    lon = rng.uniform(0, 360, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    w = rng.uniform(0, 1, n)
    data = m.create()
    m.map_values(lon, lat, data, w)
    ipix = np.asarray(hpx.ang2pix_ring(nside, lon, lat, lonlat=True))
    want = np.zeros(hpx.nside2npix(nside))
    np.add.at(want, ipix, w)
    np.testing.assert_allclose(data, want)
    # device accumulation path gives the same map
    state = m.begin()
    state = m.add(state, lon, lat, w)
    np.testing.assert_allclose(m.finish(state), want, atol=1e-12)


def test_transform_deconvolve_metadata():
    nside, lmax = 8, 8
    m = HealpixMapper(nside, lmax, deconvolve=True)
    data = m.create()
    data[:] = 1.0
    alm = m.transform(data)
    assert alm.dtype.metadata["deconv"] is True
    m2 = HealpixMapper(nside, lmax, deconvolve=False)
    data2 = m2.create()
    data2[:] = 1.0
    alm2 = m2.transform(data2)
    # monopole unaffected by deconvolution (pixwin[0] == 1)
    assert alm[0] == pytest.approx(alm2[0])
    assert alm[0].real == pytest.approx(np.sqrt(4 * np.pi), rel=1e-6)


def test_transform_spin2_shape():
    nside, lmax = 8, 8
    m = HealpixMapper(nside, lmax)
    qu = m.create(2, spin=2)
    rng = np.random.default_rng(1)
    qu[:] = rng.normal(size=qu.shape)
    alm = m.transform(qu, spin=2)
    assert alm.shape == (2, (lmax + 1) * (lmax + 2) // 2)


def test_resample():
    m = HealpixMapper(4)
    big = np.ones(hpx.nside2npix(8))
    from heracles_tpu.core import update_metadata

    update_metadata(big, nside=8)
    out = m.resample(big)
    assert out.size == hpx.nside2npix(4)
    assert out.dtype.metadata["nside"] == 4
    np.testing.assert_allclose(out, 1.0)


def test_discrete_mapper_create_and_resample():
    lmax = 6
    m = DiscreteMapper(lmax)
    alm = m.create(spin=0)
    assert alm.shape == ((lmax + 1) * (lmax + 2) // 2,)
    md = alm.dtype.metadata
    assert md["geometry"] == "discrete" and md["kernel"] == "none"
    assert m.transform(alm) is alm  # identity
    # resample re-truncates the triangle
    rng = np.random.default_rng(2)
    big = rng.normal(size=36) + 1j * rng.normal(size=36)  # lmax=7
    small = DiscreteMapper(3).resample(big)
    assert small.shape == (10,)
    # (l, m) = (3, 2) entry: packed idx at lmax 7: 2*(2*7+1-2)//2+3 = 16
    # at lmax 3: 2*(2*3+1-2)//2+3 = 8
    assert small[8] == big[16]


def test_discrete_mapper_adjoint_oracle():
    """map_values == sum_p v_p conj(Ylm(p)) via scipy (spin 0)."""
    from scipy.special import sph_harm_y

    lmax = 5
    m = DiscreteMapper(lmax)
    rng = np.random.default_rng(3)
    n = 50
    lon = rng.uniform(0, 360, n)
    lat = rng.uniform(-89, 89, n)
    v = rng.normal(size=n)
    data = m.create(spin=0)
    m.map_values(lon, lat, data, v, spin=0)
    theta = np.radians(90 - lat)
    phi = np.radians(lon)
    k = 0
    for mm in range(lmax + 1):
        for ell in range(mm, lmax + 1):
            want = np.sum(v * np.conj(sph_harm_y(ell, mm, theta, phi)))
            assert data[k] == pytest.approx(want, abs=1e-10), (ell, mm)
            k += 1


def test_discrete_mapper_spin2_adjoint_selfconsistent():
    """Spin-2 adjoint at points == quadrature-weighted gridded analysis.

    Place "points" at all pixel centres with values w_p * f_p: the
    discrete adjoint must then equal the gridded map2alm with those
    weights.
    """
    from heracles_tpu.ops import sht

    nside, lmax = 8, 8
    rng = np.random.default_rng(4)
    npix = hpx.nside2npix(nside)
    qu = rng.normal(size=(2, npix))
    lon, lat = hpx.pix2ang_ring(nside, np.arange(npix), lonlat=True)
    w = np.repeat(sht.ring_weights(nside), hpx.ring_geometry(nside)["npix"])
    m = DiscreteMapper(lmax)
    data = m.create(2, spin=2)
    m.map_values(lon, lat, data, qu * w, spin=2)
    want = np.asarray(sht.map2alm(qu, lmax=lmax, spin=2, weights="ring"))
    np.testing.assert_allclose(data, want, atol=1e-10)
