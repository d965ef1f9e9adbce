"""FITS I/O: round trips, metadata, key escaping, lazy mappings."""

import numpy as np
import pytest

from heracles_tpu.core import update_metadata
from heracles_tpu.io import (
    AlmFits,
    ClsFits,
    MapFits,
    _key_from_string,
    _string_from_key,
    read,
    read_alms,
    read_maps,
    read_vmap,
    write,
    write_alms,
    write_maps,
)
from heracles_tpu.result import Result


def test_key_string_roundtrip():
    keys = [
        ("POS", 0),
        ("POS", "SHE", 1, 2),
        ("A-B", 3),  # literal dash must be escaped
        ("x\\y", 1),
        "plain",
        42,
    ]
    for key in keys:
        assert _key_from_string(_string_from_key(key)) == key


def test_write_read_maps(tmp_path):
    path = str(tmp_path / "maps.fits")
    nside = 4
    m1 = np.arange(12 * nside * nside, dtype=float)
    update_metadata(m1, nside=nside, spin=0, catalog="cat")
    m2 = np.stack([m1, 2 * m1])
    update_metadata(m2, nside=nside, spin=2)
    write_maps(path, {("POS", 0): m1, ("SHE", 1): m2})
    out = read_maps(path)
    np.testing.assert_array_equal(out["POS", 0], m1)
    np.testing.assert_array_equal(out["SHE", 1], m2)
    assert out["POS", 0].dtype.metadata["catalog"] == "cat"
    assert out["SHE", 1].dtype.metadata["spin"] == 2
    # include/exclude
    only = read_maps(path, include=[("POS", ...)])
    assert list(only) == [("POS", 0)]


def test_write_read_alms(tmp_path):
    path = str(tmp_path / "alms.fits")
    rng = np.random.default_rng(0)
    alm = rng.normal(size=21) + 1j * rng.normal(size=21)
    update_metadata(alm, spin=0, lmax=5)
    alm2 = rng.normal(size=(2, 21)) + 1j * rng.normal(size=(2, 21))
    update_metadata(alm2, spin=2)
    write_alms(path, {("POS", 0): alm, ("SHE", 0): alm2})
    out = read_alms(path)
    np.testing.assert_allclose(out["POS", 0], alm)
    np.testing.assert_allclose(out["SHE", 0], alm2)
    assert out["POS", 0].dtype.metadata["lmax"] == 5
    assert out["SHE", 0].shape == (2, 21)


def test_write_read_results(tmp_path):
    path = str(tmp_path / "cls.fits")
    lmax = 7
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(2, 2, lmax + 1))
    update_metadata(arr, bias=0.25)
    r = Result(arr, spin=(2, 2), axis=-1)
    write(path, {("SHE", "SHE", 0, 0): r})
    out = read(path)["SHE", "SHE", 0, 0]
    np.testing.assert_allclose(np.asarray(out), arr)
    assert out.spin == (2, 2)
    assert out.axis == (2,)
    assert out.dtype.metadata["bias"] == 0.25
    np.testing.assert_array_equal(out.ell, np.arange(lmax + 1))


def test_write_read_result_two_axes_nonsquare(tmp_path):
    # mixing-matrix-like result with two different-length ell axes
    path = str(tmp_path / "mms.fits")
    n1, n2 = 5, 9
    rng = np.random.default_rng(2)
    r = Result(
        rng.normal(size=(n1, n2)),
        spin=(0, 0),
        ell=(np.arange(n1) * 2.0, np.arange(n2) * 1.0),
        axis=(0, 1),
    )
    write(path, {("A", "B", 0, 0): r})
    out = read(path)["A", "B", 0, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(r))
    assert out.axis == (0, 1)
    np.testing.assert_array_equal(out.ell[0], r.ell[0])
    np.testing.assert_array_equal(out.ell[1], r.ell[1])


def test_append_vs_clobber(tmp_path):
    path = str(tmp_path / "maps.fits")
    m = np.ones(48)
    write_maps(path, {("A", 0): m})
    write_maps(path, {("B", 0): m})  # append
    assert set(read_maps(path)) == {("A", 0), ("B", 0)}
    write_maps(path, {("C", 0): m}, clobber=True)
    assert set(read_maps(path)) == {("C", 0)}


def test_fits_dicts(tmp_path):
    path = str(tmp_path / "d.fits")
    m = np.arange(48.0)
    update_metadata(m, nside=2)
    d = MapFits(path, clobber=True)
    d["POS", 0] = m
    assert ("POS", 0) in d
    assert len(d) == 1
    np.testing.assert_array_equal(d["POS", 0], m)
    with pytest.raises(KeyError):
        d["missing"]
    with pytest.raises(NotImplementedError):
        del d["POS", 0]
    # alm dict
    alm = np.ones(10, dtype=complex)
    update_metadata(alm, spin=0)
    a = AlmFits(str(tmp_path / "a.fits"), clobber=True)
    a["X", 1] = alm
    np.testing.assert_allclose(a["X", 1], alm)
    # result dict (the reference's missing ClsFits, fixed here)
    c = ClsFits(str(tmp_path / "c.fits"), clobber=True)
    c["A", "B", 0, 1] = Result(np.ones(8), spin=(0, 0))
    assert c["A", "B", 0, 1].spin == (0, 0)


def test_read_vmap(tmp_path):
    from heracles_tpu import healpix as hpx
    from heracles_tpu.fits import FitsFile
    from heracles_tpu.io import UNSEEN, _write_map

    nside = 4
    m = np.ones(hpx.nside2npix(nside))
    m[:5] = UNSEEN
    path = str(tmp_path / "vmap.fits")
    f = FitsFile(path, mode="rw", clobber=True)
    _write_map(f, "VMAP", m)
    v = read_vmap(path)
    assert v[0] == 0.0 and v[10] == 1.0
    # regrade
    v2 = read_vmap(path, nside=2)
    assert v2.size == hpx.nside2npix(2)
    # transform to alms
    va = read_vmap(path, transform=True, lmax=4)
    assert np.iscomplexobj(va)
    assert va.size == 15


def test_key_codec_run_folding_does_not_merge_literal_tilde():
    """A non-printable run folds to one '~' even after a literal '~'."""
    from heracles_tpu.io import _string_from_key

    assert _string_from_key("a~\x00\x01b") == "a~~b"
    assert _string_from_key("x\x00\x01y") == "x~y"


def test_fitsdict_sees_appends_from_other_handles(tmp_path):
    """A FitsDict must pick up extensions appended through another handle."""
    from heracles_tpu.io import AlmFits

    path = tmp_path / "alms.fits"
    d = AlmFits(path, clobber=True)
    alm = np.arange(6, dtype=complex)
    d["POS", 0] = alm
    assert ("POS", 0) in d

    other = AlmFits(path)
    other["POS", 1] = 2 * alm

    # the first handle's index is stale on disk size change -> rescan
    assert ("POS", 1) in d
    assert set(d) == {("POS", 0), ("POS", 1)}
    np.testing.assert_allclose(np.asarray(d["POS", 1]), 2 * alm)
