"""Pure-Python FITS layer: round trips, headers, paging."""

import numpy as np
import pytest

from heracles_tpu.fits import FitsFile, Header


def test_table_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    path = str(tmp_path / "t.fits")
    f = FitsFile(path, mode="rw", clobber=True)
    hdr = Header()
    hdr.set("META NSIDE", 32, "resolution")
    hdr.set("LONGKEYNAME FOO", "hello 'quoted'")
    hdr.set("FVAL", 1.5e-7)
    hdr.set("BVAL", True)
    data = {
        "X": rng.normal(size=10),
        "I": np.arange(10, dtype=np.int32),
        "V": rng.normal(size=(10, 3)),
        "M": rng.normal(size=(10, 2, 4)),
        "C": rng.normal(size=10) + 1j * rng.normal(size=10),
        "S": np.array([f"name{i}" for i in range(10)], dtype="S8"),
    }
    f.write_table(data, extname="TEST1", header=hdr)
    f.write_table({"Y": np.arange(5.0)}, extname="TEST2")

    g = FitsFile(path)
    assert len(g) == 3  # primary + 2 tables
    h = g["TEST1"]
    assert h.get_extname() == "TEST1"
    assert h.get_nrows() == 10
    rh = h.read_header()
    assert rh["META NSIDE"] == 32
    assert rh["LONGKEYNAME FOO"] == "hello 'quoted'"
    assert rh["FVAL"] == pytest.approx(1.5e-7)
    assert rh["BVAL"] is True
    assert rh.get_comment("META NSIDE") == "resolution"
    t = h.read()
    np.testing.assert_allclose(t["X"], data["X"])
    np.testing.assert_array_equal(t["I"], data["I"])
    np.testing.assert_allclose(t["V"], data["V"])
    np.testing.assert_allclose(t["M"], data["M"])
    np.testing.assert_allclose(t["C"], data["C"])
    assert t["S"][3] == b"name3"


def test_row_range_and_column_reads(tmp_path):
    rng = np.random.default_rng(1)
    path = str(tmp_path / "p.fits")
    f = FitsFile(path, mode="rw", clobber=True)
    x = rng.normal(size=100)
    v = rng.normal(size=(100, 3))
    f.write_table({"X": x, "V": v}, extname="T")
    h = FitsFile(path)["T"]
    part = h[["X", "V"]][20:50]
    np.testing.assert_allclose(part["X"], x[20:50])
    np.testing.assert_allclose(part["V"], v[20:50])
    col = h.read(rows=(0, 10), columns="X")
    np.testing.assert_allclose(col, x[:10])


def test_missing_extension(tmp_path):
    path = str(tmp_path / "e.fits")
    f = FitsFile(path, mode="rw", clobber=True)
    f.write_table({"A": np.arange(3.0)}, extname="ONE")
    g = FitsFile(path)
    assert "ONE" in g and "TWO" not in g
    with pytest.raises(OSError):
        g["TWO"]


def test_read_vmap_nested_ordering(tmp_path):
    """NESTED-stored visibility maps are reordered to RING."""
    from heracles_tpu import healpix as hpx
    from heracles_tpu.fits import FitsFile
    from heracles_tpu.io import _write_map, read_vmap

    nside = 4
    npix = hpx.nside2npix(nside)
    ring_values = np.arange(npix, dtype=float)
    # store in NESTED order with a NESTED header
    nest_values = ring_values[np.asarray(hpx.nest2ring(nside, np.arange(npix)))]
    path = str(tmp_path / "v.fits")
    f = FitsFile(path, mode="rw", clobber=True)
    from heracles_tpu.io import _healpix_header, _metadata_header

    hdr = _metadata_header({}, extra=_healpix_header(npix))
    hdr["ORDERING"] = "NESTED"
    f.write_table([nest_values], names=["VMAP"], extname="V", header=hdr)
    out = read_vmap(path)
    np.testing.assert_array_equal(out, ring_values)
