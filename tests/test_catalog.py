"""Catalogue layer: pages, views, selections, filters, FITS paging."""

import numpy as np
import pytest

from heracles_tpu.catalog import (
    ArrayCatalog,
    Catalog,
    CatalogPage,
    CatalogView,
    FitsCatalog,
    FootprintFilter,
    InvalidValueFilter,
    fsky_from_visibility,
)


def _array(n=100, seed=0):
    rng = np.random.default_rng(seed)
    return np.rec.fromarrays(
        [rng.uniform(0, 360, n), rng.uniform(-90, 90, n), rng.uniform(0, 1, n)],
        names=["RA", "DEC", "W"],
    )


def test_page_basics():
    page = CatalogPage({"A": [1.0, 2.0], "B": [3.0, 4.0]})
    assert page.size == 2
    assert page.names == ["A", "B"]
    np.testing.assert_array_equal(page["A"], [1, 2])
    np.testing.assert_array_equal(page["-A"], [-1, -2])  # column negation
    a, b = page.get("A", "B")
    np.testing.assert_array_equal(b, [3, 4])
    with pytest.raises(ValueError):
        CatalogPage({"A": [1], "B": [1, 2]})


def test_page_nan_check_and_delete():
    page = CatalogPage({"A": [1.0, np.nan, 3.0]})
    with pytest.raises(ValueError):
        page.get("A")
    page.delete([1])
    assert page.size == 2
    np.testing.assert_array_equal(page.get("A"), [1, 3])


def test_fsky_from_visibility():
    assert fsky_from_visibility(np.full(10, 0.5)) == 0.5
    # harmonic visibility: monopole/sqrt(4pi)
    alm = np.zeros(5, complex)
    alm[0] = 0.25 * np.sqrt(4 * np.pi)
    assert fsky_from_visibility(alm) == pytest.approx(0.25)


def test_array_catalog_protocol_and_views():
    cat = ArrayCatalog(_array())
    assert isinstance(cat, Catalog)
    assert cat.size == 100
    assert set(cat.names) == {"RA", "DEC", "W"}
    sel = cat.where(cat._arr["W"] > 0.5)
    assert isinstance(sel, CatalogView)
    assert sel.base is cat
    rows = sum(p.size for p in sel)
    assert rows == int((cat._arr["W"] > 0.5).sum())
    # nested selections AND together
    sub = sel.where(cat._arr["RA"] < 180)
    want = int(((cat._arr["W"] > 0.5) & (cat._arr["RA"] < 180)).sum())
    assert sum(p.size for p in sub) == want


def test_view_visibility_and_fsky():
    cat = ArrayCatalog(_array())
    vis = np.full(12 * 4, 0.75)
    view = cat.where(cat._arr["W"] > 0, visibility=vis)
    assert view.fsky == pytest.approx(0.75)
    assert cat.fsky is None
    cat.visibility = np.full(12 * 4, 0.5)
    assert cat.fsky == pytest.approx(0.5)
    # view's own visibility takes precedence
    assert view.fsky == pytest.approx(0.75)


def test_array_catalog_paging():
    cat = ArrayCatalog(_array(100))
    cat.page_size = 30
    sizes = [p.size for p in cat]
    assert sizes == [30, 30, 30, 10]


def test_invalid_value_filter():
    cat = ArrayCatalog(
        np.rec.fromarrays([[1.0, np.nan, 3.0], [1.0, 1.0, 1.0]], names=["X", "W"])
    )
    cat.add_filter(InvalidValueFilter("X", warn=False))
    (page,) = list(cat)
    assert page.size == 2


def test_footprint_filter():
    from heracles_tpu import healpix as hpx

    nside = 4
    fp = np.zeros(hpx.nside2npix(nside))
    fp[: hpx.nside2npix(nside) // 2] = 1  # northern half
    arr = _array(200, seed=1)
    cat = ArrayCatalog(arr)
    cat.add_filter(FootprintFilter(fp, "RA", "DEC"))
    total = sum(p.size for p in cat)
    ipix = np.asarray(
        hpx.ang2pix_ring(nside, arr["RA"], arr["DEC"], lonlat=True)
    )
    assert total == int((fp[ipix] != 0).sum())


def test_fits_catalog(tmp_path):
    from heracles_tpu.fits import FitsFile

    arr = _array(120, seed=2)
    path = str(tmp_path / "cat.fits")
    f = FitsFile(path, mode="rw", clobber=True)
    f.write_table(
        {"RA": arr["RA"], "DEC": arr["DEC"], "W": arr["W"]}, extname="CAT"
    )
    cat = FitsCatalog(path)
    assert cat.size == 120
    assert set(cat.names) == {"RA", "DEC", "W"}
    cat.page_size = 50
    pages = list(cat)
    assert [p.size for p in pages] == [50, 50, 20]
    np.testing.assert_allclose(
        np.concatenate([p["RA"] for p in pages]), arr["RA"]
    )
    # string-expression selection
    view = cat.where("W > 0.5")
    got = np.concatenate([p["W"] for p in view])
    np.testing.assert_allclose(got, arr["W"][arr["W"] > 0.5])
    # joined selections
    view2 = view.where("RA < 180")
    got2 = sum(p.size for p in view2)
    assert got2 == int(((arr["W"] > 0.5) & (arr["RA"] < 180)).sum())
