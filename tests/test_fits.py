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


def test_concurrent_row_reads_are_isolated(tmp_path):
    """Overlapping reads from two threads must not share a row buffer."""
    from concurrent.futures import ThreadPoolExecutor

    from heracles_tpu.fits import FitsFile

    n = 50_000
    data = np.zeros(n, dtype=[("A", ">f8"), ("B", ">f8")])
    data["A"] = np.arange(n, dtype=np.float64)
    data["B"] = 2.0 * np.arange(n, dtype=np.float64)
    path = tmp_path / "cat.fits"
    with FitsFile(path, mode="rw", clobber=True) as f:
        f.write_table(data, extname="CAT")

    hdu = FitsFile(path)[1]
    spans = [(i * 5000, (i + 1) * 5000) for i in range(10)] * 4

    def read(span):
        cols = hdu.read_columns(["A", "B"], rows=span)
        lo = np.arange(span[0], span[1], dtype=np.float64)
        assert np.array_equal(cols["A"], lo)
        assert np.array_equal(cols["B"], 2.0 * lo)

    with ThreadPoolExecutor(4) as pool:
        list(pool.map(read, spans))


def test_short_read_raises(tmp_path):
    """Truncated data segments raise instead of returning stale bytes."""
    import pytest

    from heracles_tpu.fits import FitsFile

    n = 1000
    data = np.zeros(n, dtype=[("A", ">f8")])
    path = tmp_path / "trunc.fits"
    with FitsFile(path, mode="rw", clobber=True) as f:
        f.write_table(data, extname="CAT")
    size = path.stat().st_size
    with open(path, "r+b") as f:
        f.truncate(size - 4000)
    hdu = FitsFile(path)[1]
    with pytest.raises(OSError, match="short read"):
        hdu.read_columns(["A"], rows=(0, n))
