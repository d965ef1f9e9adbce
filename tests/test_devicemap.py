"""Device-resident maps: identical pipeline results, no host round trip.

``HealpixMapper(device_maps=True)`` keeps the accumulated maps on the
device between map_catalogs and transform; these tests pin that path to
the default host-map path bit-for-bit (CPU x64) and check the DeviceMap
wrapper's numpy-protocol surface (metadata dtype, update_metadata,
materialisation).
"""

import numpy as np
import pytest

import heracles_tpu as h
from heracles_tpu.core import update_metadata
from heracles_tpu.devicemap import DeviceMap
from heracles_tpu.mapping import map_catalogs, transform


def _catalog(n=5000, seed=11):
    rng = np.random.default_rng(seed)
    arr = np.rec.fromarrays(
        [
            rng.uniform(0, 360, n),
            np.degrees(np.arcsin(rng.uniform(-1, 1, n))),
            rng.normal(0, 0.1, n),
            rng.normal(0, 0.1, n),
            rng.uniform(0.5, 1.5, n),
        ],
        names="RA,DEC,G1,G2,W",
    )
    return h.ArrayCatalog(arr)


def _fields(mapper):
    return {
        "POS": h.Positions(mapper, "RA", "DEC", overdensity=False),
        "SHE": h.Shears(mapper, "RA", "DEC", "G1", "G2", "W"),
    }


def test_device_maps_pipeline_matches_host():
    nside, lmax = 16, 24
    cat = {0: _catalog()}
    host_mapper = h.HealpixMapper(nside, lmax)
    dev_mapper = h.HealpixMapper(nside, lmax, device_maps=True)

    maps_host = map_catalogs(_fields(host_mapper), cat)
    maps_dev = map_catalogs(_fields(dev_mapper), cat)

    for key in maps_host:
        m_dev = maps_dev[key]
        assert isinstance(m_dev, DeviceMap)
        np.testing.assert_array_equal(np.asarray(m_dev), maps_host[key])
        # metadata rides the wrapper dtype exactly like the host dtype
        md_h = dict(maps_host[key].dtype.metadata)
        md_d = dict(m_dev.dtype.metadata)
        assert md_h == md_d

    alms_host = transform(_fields(host_mapper), maps_host)
    alms_dev = transform(_fields(dev_mapper), maps_dev)
    for key in alms_host:
        np.testing.assert_allclose(
            alms_dev[key], alms_host[key], rtol=0, atol=1e-13
        )
        md_h = dict(alms_host[key].dtype.metadata or {})
        md_d = dict(alms_dev[key].dtype.metadata or {})
        assert md_h == md_d


def test_device_alms_spectra_match_host():
    """Device-resident alms flow through angular_power_spectra unchanged."""
    from heracles_tpu.twopoint import angular_power_spectra

    nside, lmax = 16, 24
    cat = {0: _catalog(), 1: _catalog(seed=12)}
    host_mapper = h.HealpixMapper(nside, lmax)
    dev_mapper = h.HealpixMapper(nside, lmax, device_maps=True)

    alms_host = transform(
        _fields(host_mapper), map_catalogs(_fields(host_mapper), cat)
    )
    alms_dev = transform(
        _fields(dev_mapper), map_catalogs(_fields(dev_mapper), cat)
    )
    for key in alms_host:
        assert isinstance(alms_dev[key], DeviceMap)
        np.testing.assert_allclose(
            np.asarray(alms_dev[key]), alms_host[key], rtol=0, atol=1e-12
        )

    cls_host = angular_power_spectra(alms_host)
    cls_dev = angular_power_spectra(alms_dev)
    assert set(cls_host) == set(cls_dev)
    for key in cls_host:
        np.testing.assert_allclose(
            np.asarray(cls_dev[key]), np.asarray(cls_host[key]),
            rtol=0, atol=1e-12,
        )
        md_h = dict(cls_host[key].array.dtype.metadata or {})
        md_d = dict(cls_dev[key].array.dtype.metadata or {})
        assert md_h == md_d


def test_device_alms_io_roundtrip(tmp_path):
    """write_alms/read_alms handle DeviceMap alms (planes transfer)."""
    from heracles_tpu.io import read_alms, write_alms

    nside, lmax = 16, 24
    cat = {0: _catalog()}
    mapper = h.HealpixMapper(nside, lmax, device_maps=True)
    fields = _fields(mapper)
    alms = transform(fields, map_catalogs(fields, cat))
    path = str(tmp_path / "alms.fits")
    write_alms(path, alms, clobber=True)
    back = read_alms(path)
    for key in alms:
        np.testing.assert_allclose(
            back[key], np.asarray(alms[key]), rtol=0, atol=0
        )


def test_device_maps_solo_transform():
    """batch=1 (solo per-map) transform accepts DeviceMap input."""
    nside, lmax = 16, 24
    cat = {0: _catalog()}
    mapper = h.HealpixMapper(nside, lmax, device_maps=True)
    fields = _fields(mapper)
    maps = map_catalogs(fields, cat)
    alms_solo = transform(fields, maps, batch=1)
    alms_batched = transform(fields, maps)
    for key in alms_solo:
        np.testing.assert_allclose(
            alms_solo[key], alms_batched[key], rtol=0, atol=1e-13
        )


def test_devicemap_wrapper_surface():
    import jax.numpy as jnp

    arr = jnp.asarray(np.arange(12.0))
    m = DeviceMap(arr, metadata={"spin": 0})
    assert m.shape == (12,) and m.size == 12 and m.ndim == 1
    assert m.dtype.metadata["spin"] == 0

    update_metadata(m, nside=4, extra="x")
    assert m.dtype.metadata["nside"] == 4
    assert m.dtype.metadata["spin"] == 0

    # in-place device arithmetic rebinds, host materialisation keeps
    # the tagged dtype
    m /= 2.0
    m -= np.ones(12)
    host = np.asarray(m)
    np.testing.assert_array_equal(host, np.arange(12.0) / 2.0 - 1.0)
    assert host.dtype.metadata["nside"] == 4

    from copy import deepcopy

    m2 = deepcopy(m)
    m2 *= 0.0
    np.testing.assert_array_equal(np.asarray(m), host)  # m unchanged

    with pytest.raises(ValueError):
        m.dtype = np.dtype("int8")
