"""Fields: normalisation, bias ingredients, masks, column specs."""

import numpy as np
import pytest

import heracles_tpu as h
from heracles_tpu import healpix as hpx
from heracles_tpu.fields import get_masks
from heracles_tpu.mapping import map_catalogs


NSIDE = 8
LMAX = 12


def uniform_catalog(n=8000, seed=0, nbins=1):
    rng = np.random.default_rng(seed)
    arr = np.rec.fromarrays(
        [
            rng.uniform(0, 360, n),
            np.degrees(np.arcsin(rng.uniform(-1, 1, n))),
            rng.uniform(0.5, 1.5, n),
            rng.normal(0, 0.1, n),
            rng.normal(0, 0.1, n),
            rng.normal(1.0, 0.1, n),
        ],
        names=["RA", "DEC", "W", "G1", "G2", "V"],
    )
    cat = h.ArrayCatalog(arr)
    cat.visibility = np.ones(hpx.nside2npix(NSIDE))
    return cat, arr


def test_field_column_spec():
    mapper = h.HealpixMapper(NSIDE, LMAX)
    # positions: 2 required + 1 optional
    h.Positions(mapper, "RA", "DEC")
    h.Positions(mapper, "RA", "DEC", "W")
    with pytest.raises(ValueError):
        h.Positions(mapper, "RA")
    with pytest.raises(ValueError):
        h.Positions(mapper, "RA", "DEC", "W", "X")
    # spin weights
    assert h.Positions(mapper, "RA", "DEC").spin == 0
    assert h.Shears(mapper, "RA", "DEC", "G1", "G2").spin == 2


def test_positions_overdensity_zero_mean():
    cat, arr = uniform_catalog()
    mapper = h.HealpixMapper(NSIDE, LMAX)
    field = h.Positions(mapper, "RA", "DEC", mask="VIS")
    maps = map_catalogs({"POS": field}, {0: cat})
    pos = maps["POS", 0]
    md = pos.dtype.metadata
    # overdensity: zero mean by construction
    assert abs(pos.mean()) < 1e-12
    # nbar: mean count per pixel
    assert md["nbar"] == pytest.approx(len(arr) / hpx.nside2npix(NSIDE))
    assert md["musq"] == 1.0
    assert md["fsky"] == 1.0
    # dens ingredient: (nbar/area)^2 / (ngal / 4pi fsky) / <w^2>, w == 1
    area = mapper.area
    want = (md["nbar"] / area) ** 2 / (len(arr) / (4 * np.pi))
    assert md["dens"] == pytest.approx(want)


def test_positions_without_visibility_raises():
    cat, _ = uniform_catalog()
    cat.visibility = None
    mapper = h.HealpixMapper(NSIDE, LMAX)
    field = h.Positions(mapper, "RA", "DEC")
    with pytest.raises(ValueError, match="visibility"):
        map_catalogs({"POS": field}, {0: cat})


def test_positions_counts_mode():
    cat, arr = uniform_catalog()
    mapper = h.HealpixMapper(NSIDE, LMAX)
    field = h.Positions(mapper, "RA", "DEC", overdensity=False)
    maps = map_catalogs({"POS": field}, {0: cat})
    pos = maps["POS", 0]
    nbar = pos.dtype.metadata["nbar"]
    # counts normalised by nbar: total = npix
    assert pos.sum() * nbar == pytest.approx(len(arr))


def test_positions_nbar_sanity_warning():
    cat, _ = uniform_catalog()
    mapper = h.HealpixMapper(NSIDE, LMAX)
    field = h.Positions(mapper, "RA", "DEC", overdensity=False, nbar=1e6)
    with pytest.warns(UserWarning, match="more than 3 sigma"):
        maps = map_catalogs({"POS": field}, {0: cat})
    assert maps["POS", 0].dtype.metadata["nbar"] == 1e6


def test_scalar_field_normalisation():
    cat, arr = uniform_catalog()
    mapper = h.HealpixMapper(NSIDE, LMAX)
    field = h.ScalarField(mapper, "RA", "DEC", "V", "W")
    maps = map_catalogs({"SCL": field}, {0: cat})
    val = maps["SCL", 0]
    md = val.dtype.metadata
    n = len(arr)
    wbar_want = n / (4 * np.pi) * arr["W"].mean() * mapper.area
    assert md["wbar"] == pytest.approx(wbar_want)
    wv = arr["W"] * arr["V"]
    assert md["musq"] == pytest.approx((wv**2).mean() / (arr["W"] ** 2).mean())
    # map total: sum w*v / wbar
    assert val.sum() == pytest.approx(wv.sum() / wbar_want)


def test_scalar_field_drops_zero_weights():
    rng = np.random.default_rng(3)
    n = 1000
    arr = np.rec.fromarrays(
        [rng.uniform(0, 360, n), rng.uniform(-60, 60, n),
         np.ones(n), np.r_[np.zeros(100), np.ones(n - 100)]],
        names=["RA", "DEC", "V", "W"],
    )
    cat = h.ArrayCatalog(arr)
    mapper = h.HealpixMapper(NSIDE, LMAX)
    field = h.ScalarField(mapper, "RA", "DEC", "V", "W")
    maps = map_catalogs({"S": field}, {0: cat})
    md = maps["S", 0].dtype.metadata
    # ngal counts only non-zero weights: wbar = (n-100)/(4pi)*1*area
    assert md["wbar"] == pytest.approx((n - 100) / (4 * np.pi) * mapper.area)


def test_spin2_field_two_components():
    cat, arr = uniform_catalog()
    mapper = h.HealpixMapper(NSIDE, LMAX)
    field = h.Shears(mapper, "RA", "DEC", "G1", "-G2", "W")
    maps = map_catalogs({"SHE": field}, {0: cat})
    she = maps["SHE", 0]
    assert she.shape == (2, hpx.nside2npix(NSIDE))
    md = she.dtype.metadata
    assert md["spin"] == 2
    # column negation: the G2 row has flipped sign
    wbar = md["wbar"]
    np.testing.assert_allclose(
        she[1].sum(), -(arr["W"] * arr["G2"]).sum() / wbar
    )


def test_visibility_and_weights_fields():
    cat, arr = uniform_catalog()
    mapper = h.HealpixMapper(NSIDE, LMAX)
    maps = map_catalogs(
        {"VIS": h.Visibility(mapper), "WHT": h.Weights(mapper, "RA", "DEC", "W")},
        {0: cat},
    )
    np.testing.assert_array_equal(maps["VIS", 0], 1.0)
    wht = maps["WHT", 0]
    md = wht.dtype.metadata
    assert md["musq"] == 1.0
    assert wht.sum() == pytest.approx(arr["W"].sum() / md["wbar"])


def test_visibility_resample(recwarn):
    cat, _ = uniform_catalog()
    cat.visibility = np.ones(hpx.nside2npix(16))  # higher res than mapper
    mapper = h.HealpixMapper(NSIDE, LMAX)
    maps = map_catalogs({"VIS": h.Visibility(mapper)}, {0: cat})
    assert maps["VIS", 0].size == hpx.nside2npix(NSIDE)
    np.testing.assert_allclose(maps["VIS", 0], 1.0)


def test_map_catalogs_include_exclude():
    cat, _ = uniform_catalog()
    mapper = h.HealpixMapper(NSIDE, LMAX)
    fields = {
        "POS": h.Positions(mapper, "RA", "DEC", mask="VIS"),
        "VIS": h.Visibility(mapper),
    }
    out = map_catalogs(fields, {0: cat}, include=[("VIS", 0)])
    assert list(out.keys()) == [("VIS", 0)]
    out = map_catalogs(fields, {0: cat}, exclude=[("POS", ...)])
    assert list(out.keys()) == [("VIS", 0)]


def test_get_masks():
    mapper = h.HealpixMapper(NSIDE, LMAX)
    fields = {
        "POS": h.Positions(mapper, "RA", "DEC", mask="VIS"),
        "SHE": h.Shears(mapper, "RA", "DEC", "G1", "G2", mask="WHT"),
        "VIS": h.Visibility(mapper),
    }
    assert get_masks(fields) == ["VIS", "WHT"]
    combs = get_masks(fields, comb=2)
    assert ("VIS", "VIS") in combs and ("VIS", "WHT") in combs
    # E/B suffix filtering
    eb = get_masks(fields, comb=2, include=[("SHE_E", "SHE_E")], append_eb=True)
    assert eb == [("WHT", "WHT")]


def test_transform_batched_matches_sequential():
    """Grouped (stacked) transforms == the per-map loop, incl. metadata."""
    from heracles_tpu.core import update_metadata
    from heracles_tpu.mapping import transform

    rng = np.random.default_rng(3)
    npix = hpx.nside2npix(NSIDE)
    mapper = h.HealpixMapper(NSIDE, LMAX, deconvolve=False)
    fields = {
        "POS": h.Positions(mapper, "RA", "DEC"),
        "SHE": h.Shears(mapper, "RA", "DEC", "G1", "G2"),
    }
    data = {}
    for i in range(3):
        m = mapper.create(spin=0)
        m[:] = rng.normal(size=npix)
        update_metadata(m, nbar=float(10 + i), fsky=0.5 + 0.1 * i)
        data["POS", i] = m
    for i in range(2):
        m = mapper.create(2, spin=2)
        m[:] = rng.normal(size=(2, npix))
        update_metadata(m, wbar=float(i + 1))
        data["SHE", i] = m

    seq = transform(fields, data, batch=1)
    bat = transform(fields, data, batch=8)
    assert list(seq.keys()) == list(bat.keys()) == list(data.keys())
    for key in data:
        np.testing.assert_allclose(
            np.asarray(bat[key]), np.asarray(seq[key]), rtol=5e-7, atol=1e-9
        )
        md_s = dict(seq[key].dtype.metadata or {})
        md_b = dict(bat[key].dtype.metadata or {})
        assert md_b == md_s
        # per-map science metadata must survive the batched path
        if key[0] == "POS":
            assert md_b["nbar"] == 10 + key[1]
        else:
            assert md_b["wbar"] == key[1] + 1
