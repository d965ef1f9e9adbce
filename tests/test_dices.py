"""DICES: jackknife identities, covariance oracles, shrinkage."""

import numpy as np
import pytest

import heracles_tpu as h
import heracles_tpu.dices as dices
from heracles_tpu import healpix as hpx
from heracles_tpu.core import update_metadata
from heracles_tpu.result import Result
from heracles_tpu.utils import flatten, get_cl

NSIDE = 8
LMAX = 8
NJK = 3


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    npix = hpx.nside2npix(NSIDE)
    mapper = h.HealpixMapper(NSIDE, LMAX, deconvolve=False)
    fields = {
        "POS": h.Positions(mapper, "RA", "DEC", mask="VIS"),
        "VIS": h.Visibility(mapper),
    }
    data = mapper.create(spin=0)
    data[:] = rng.normal(size=npix)
    update_metadata(data, fsky=1.0, musq=1.0, dens=100.0)
    vis = mapper.create(spin=0)
    vis[:] = 1.0
    update_metadata(vis, fsky=1.0)
    jk = np.zeros(npix)
    edges = np.linspace(0, npix, NJK + 1).astype(int)
    for k in range(NJK):
        jk[edges[k] : edges[k + 1]] = k + 1
    return fields, {("POS", 0): data}, {("VIS", 0): vis}, jk


def test_alm_subtraction_equals_map_masking(setup, tmp_path):
    """full alms - region alms == alms of the masked map (SHT linearity)."""
    from heracles_tpu.dices.jackknife import _get_region_maps
    from heracles_tpu.mapping import transform

    fields, data_maps, vis_maps, jk = setup
    full = transform(fields, data_maps)
    region1 = transform(fields, _get_region_maps(data_maps, jk, 1))
    rest = {k: jk_masked for k, jk_masked in data_maps.items()}
    masked = {
        key: m * (jk != 1).astype(int) * (jk > 0).astype(int)
        for key, m in data_maps.items()
    }
    # re-attach metadata lost by arithmetic
    for key, m in masked.items():
        update_metadata(m, **(data_maps[key].dtype.metadata or {}))
    direct = transform(fields, masked)
    np.testing.assert_allclose(
        full["POS", 0] - region1["POS", 0], direct["POS", 0], atol=1e-12
    )


def test_jackknife_cls_and_covariance(setup, tmp_path):
    fields, data_maps, vis_maps, jk = setup
    d = str(tmp_path / "dices")
    cls0 = dices.jackknife_cls(data_maps, vis_maps, jk, fields, nd=0, dir=d)[()]
    cls1 = dices.jackknife_cls(data_maps, vis_maps, jk, fields, nd=1, dir=d)
    assert set(cls1.keys()) == {(1,), (2,), (3,)}
    cov = dices.jackknife_covariance(cls1, nd=1)
    key = ("POS", "POS", "POS", "POS", 0, 0, 0, 0)
    assert key in cov
    r = cov[key]
    assert r.shape == (LMAX + 1, LMAX + 1)
    assert r.spin == (0, 0, 0, 0)
    # oracle: prefactored np.cov of the sample matrix
    samples = np.stack([np.asarray(c["POS", "POS", 0, 0]) for c in cls1.values()])
    want = np.cov(samples.T, bias=False) * (NJK - 1) ** 2 / NJK
    np.testing.assert_allclose(np.asarray(r), want, rtol=1e-10)


def test_delete2_correction_is_diagonal(setup, tmp_path):
    fields, data_maps, vis_maps, jk = setup
    d = str(tmp_path / "dices2")
    cls0 = dices.jackknife_cls(data_maps, vis_maps, jk, fields, nd=0, dir=d)[()]
    cls1 = dices.jackknife_cls(data_maps, vis_maps, jk, fields, nd=1, dir=d)
    cls2 = dices.jackknife_cls(data_maps, vis_maps, jk, fields, nd=2, dir=d)
    assert set(cls2.keys()) == {(1, 2), (1, 3), (2, 3)}
    Q = dices.delete2_correction(cls0, cls1, cls2)
    key = ("POS", "POS", "POS", "POS", 0, 0, 0, 0)
    q = np.asarray(Q[key])
    off = q - np.diag(np.diag(q))
    np.testing.assert_allclose(off, 0.0)
    cov = dices.jackknife_covariance(cls1, nd=1)
    deb = dices.debias_covariance(cov, cls0, cls1, cls2)
    np.testing.assert_allclose(
        np.asarray(deb[key]), np.asarray(cov[key]) - q, atol=1e-14
    )


def test_full_mask_correction_matches_fast(setup, tmp_path):
    """With a uniform footprint, Fast and Full corrections must agree."""
    fields, data_maps, vis_maps, jk = setup
    d1 = str(tmp_path / "fast")
    d2 = str(tmp_path / "full")
    fast = dices.jackknife_cls(
        data_maps, vis_maps, jk, fields, mask_correction="Fast", nd=1, dir=d1
    )
    full = dices.jackknife_cls(
        data_maps, vis_maps, jk, fields, mask_correction="Full", nd=1, dir=d2
    )
    a = np.asarray(fast[(1,)]["POS", "POS", 0, 0])
    b = np.asarray(full[(1,)]["POS", "POS", 0, 0])
    # the two corrections agree on the broad amplitude (they differ in
    # the ell-dependence of the mask deconvolution)
    assert np.mean(b[2:]) == pytest.approx(np.mean(a[2:]), rel=0.5)


def test_gaussian_covariance_unit_cls():
    # Knox formula: diag == 2 for unit cls of a single spin-0 auto
    lmax = 6
    cl = Result(np.ones(lmax + 1), spin=(0, 0))
    cov = dices.gaussian_covariance({("A", "A", 0, 0): cl})
    g = np.asarray(cov["A", "A", "A", "A", 0, 0, 0, 0])
    np.testing.assert_allclose(np.diag(g), 2.0)
    np.testing.assert_allclose(g - np.diag(np.diag(g)), 0.0)


def test_flatten_roundtrip_structure():
    lmax = 4
    rng = np.random.default_rng(0)
    cls = {
        ("A", "A", 0, 0): Result(rng.normal(size=lmax + 1), spin=(0, 0)),
        ("A", "B", 0, 0): Result(rng.normal(size=(2, lmax + 1)), spin=(0, 2)),
    }
    v = flatten(cls)
    assert v.shape == ((lmax + 1) + 2 * (lmax + 1),)
    np.testing.assert_array_equal(v[: lmax + 1], np.asarray(cls["A", "A", 0, 0]))


def test_flatten_covariance_with_transpose_blocks():
    n = 3
    rng = np.random.default_rng(1)
    a = rng.normal(size=(n, n))
    b = rng.normal(size=(n, n))
    c = rng.normal(size=(n, n))
    cov = {
        ("A", "A", "A", "A", 0, 0, 0, 0): Result(
            a, spin=(0, 0, 0, 0), axis=(-2, -1)
        ),
        ("A", "A", "B", "B", 0, 0, 0, 0): Result(
            b, spin=(0, 0, 0, 0), axis=(-2, -1)
        ),
        ("B", "B", "B", "B", 0, 0, 0, 0): Result(
            c, spin=(0, 0, 0, 0), axis=(-2, -1)
        ),
    }
    m = flatten(cov, order=[("A", "A", 0, 0), ("B", "B", 0, 0)])
    assert m.shape == (2 * n, 2 * n)
    np.testing.assert_array_equal(m[:n, :n], a)
    np.testing.assert_array_equal(m[:n, n:], b)
    np.testing.assert_array_equal(m[n:, :n], b.T)  # transpose-filled
    np.testing.assert_array_equal(m[n:, n:], c)


def test_get_cl_symmetric_lookup():
    lmax = 4
    arr = np.arange((lmax + 1) * 4.0).reshape(2, 2, lmax + 1)
    cls = {("S", "P", 0, 1): Result(arr, spin=(2, 2))}
    sym = get_cl(("P", "S", 1, 0), cls)
    np.testing.assert_array_equal(np.asarray(sym), arr.transpose(1, 0, 2))
    assert sym.spin == (2, 2)


def test_shrinkage(setup, tmp_path):
    fields, data_maps, vis_maps, jk = setup
    d = str(tmp_path / "shr")
    cls0 = dices.jackknife_cls(data_maps, vis_maps, jk, fields, nd=0, dir=d)[()]
    cls1 = dices.jackknife_cls(data_maps, vis_maps, jk, fields, nd=1, dir=d)
    cov = dices.jackknife_covariance(cls1, nd=1)
    target = dices.gaussian_covariance(cls0)
    lam = dices.shrinkage_factor(cls1, target)
    assert np.isfinite(lam)
    shrunk = dices.shrink(cov, target, 1.0)
    key = next(iter(cov))
    # full shrinkage imposes the target correlation: diagonal equals cov's
    np.testing.assert_allclose(
        np.diag(np.asarray(shrunk[key])), np.diag(np.asarray(cov[key])),
        rtol=1e-10,
    )


def test_batched_region_alms_match_sequential(setup, tmp_path):
    """region_batch > 1 (one batched SHT) must equal the per-region loop."""
    from heracles_tpu.io import read_alms

    fields, data_maps, vis_maps, jk = setup
    d1 = str(tmp_path / "seq")
    d2 = str(tmp_path / "bat")
    dices.compute_jk_alms(data_maps, vis_maps, jk, fields, dir=d1,
                          region_batch=1)
    dices.compute_jk_alms(data_maps, vis_maps, jk, fields, dir=d2,
                          region_batch=2)
    import os

    for k in range(NJK + 1):
        a = read_alms(os.path.join(d1, f"data_alms_{k}.fits"))
        b = read_alms(os.path.join(d2, f"data_alms_{k}.fits"))
        for key in a:
            np.testing.assert_allclose(b[key], a[key], atol=1e-12)


def test_sample_covariance_matches_npcov():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(9, 4))
    y = rng.normal(size=(9, 5))
    np.testing.assert_allclose(
        dices.sample_covariance(x), np.cov(x.T), rtol=1e-12
    )
    # cross-covariance block of np.cov of the stacked variables
    joint = np.cov(np.concatenate([x, y], axis=1).T)
    np.testing.assert_allclose(
        dices.sample_covariance(x, y), joint[:4, 4:], rtol=1e-12
    )


def test_shrinkage_factor_matches_bruteforce():
    """Closed-form lambda* equals the scalar Schafer-Strimmer definition."""
    rng = np.random.default_rng(7)
    n, p = 8, 5
    x = rng.normal(size=(n, p))
    cls1 = {
        (k,): {("A", "A", 0, 0): Result(row.copy(), spin=(0, 0))}
        for k, row in enumerate(x)
    }
    t = np.cov(x.T) + np.eye(p)
    target = {
        ("A", "A", "A", "A", 0, 0, 0, 0): Result(
            t, spin=(0, 0, 0, 0), axis=(-2, -1)
        )
    }
    lam = dices.shrinkage_factor(cls1, target)

    # brute force straight from the jackknife shrinkage definition
    xbar = x.mean(axis=0)
    s = (n - 1) ** 2 / n
    W = s * np.einsum("ki,kj->kij", x - xbar, x - xbar)
    Wbar = W.mean(axis=0)
    S = n / (n - 1) * Wbar

    def covW(i1, j1, i2, j2):
        return (
            n
            / (n - 1) ** 3
            * np.sum(
                (W[:, i1, j1] - Wbar[i1, j1]) * (W[:, i2, j2] - Wbar[i2, j2])
            )
        )

    tc = t / np.outer(np.sqrt(np.diag(t)), np.sqrt(np.diag(t)))
    num = den = 0.0
    for i in range(p):
        for j in range(p):
            if i == j:
                continue
            f = 0.5 * (
                np.sqrt(Wbar[j, j] / Wbar[i, i]) * covW(i, i, i, j)
                + np.sqrt(Wbar[i, i] / Wbar[j, j]) * covW(j, j, i, j)
            )
            num += covW(i, j, i, j) - tc[i, j] * f
            den += (S[i, j] - tc[i, j] * np.sqrt(S[i, i] * S[j, j])) ** 2
    np.testing.assert_allclose(lam, num / den, rtol=1e-10)


def test_in_memory_mode_matches_file_mode(setup, tmp_path):
    """dir=None (no FITS caches) must reproduce the file-cached spectra."""
    import os

    fields, data_maps, vis_maps, jk = setup
    d = str(tmp_path / "files")
    with_files = dices.jackknife_cls(data_maps, vis_maps, jk, fields,
                                     nd=1, dir=d)
    in_memory = dices.jackknife_cls(data_maps, vis_maps, jk, fields,
                                    nd=1, dir=None)
    assert set(in_memory) == set(with_files)
    for regions in with_files:
        for key in with_files[regions]:
            np.testing.assert_allclose(
                np.asarray(in_memory[regions][key]),
                np.asarray(with_files[regions][key]),
                atol=1e-12,
            )
    # and truly nothing was written anywhere for the in-memory run
    assert sorted(os.listdir(tmp_path)) == ["files"]


def test_in_memory_mode_requires_cache_for_cls():
    """Without FITS fallback, missing alms must raise, not crash."""
    import pytest as _pytest

    jk = np.zeros(12 * 4 * 4)
    jk[:100] = 1
    jk[100:200] = 2
    with _pytest.raises(KeyError):
        dices.jackknife.compute_jk_cls_from_alms(
            jk, {}, nd=1, dir=None, alms_cache={}
        )


def test_device_cache_mode_matches_file_mode(setup, tmp_path):
    """device_cache=True (alms resident, device delete-k assembly) must
    reproduce the file-cached spectra — incl. a spin-2 field (the
    (B, 2, nlm) stack shape)."""
    rng = np.random.default_rng(5)
    fields, data_maps, vis_maps, jk = setup
    mapper = fields["POS"].mapper_or_error
    fields = dict(fields)
    fields["SHE"] = h.Spin2Field(mapper, "RA", "DEC", "G1", "G2",
                                 mask="VIS")
    she = mapper.create(2, spin=2)
    she[:] = rng.normal(size=she.shape)
    update_metadata(she, fsky=1.0, musq=1.0, dens=50.0)
    data_maps = {**data_maps, ("SHE", 0): she}
    d = str(tmp_path / "files")
    with_files = dices.jackknife_cls(data_maps, vis_maps, jk, fields,
                                     nd=1, dir=d)
    cache = dices.jackknife.compute_jk_alms(
        data_maps, vis_maps, jk, fields, dir=None, device_cache=True,
        region_batch=2,
    )
    from heracles_tpu.devicemap import DeviceMap

    assert all(
        isinstance(v, DeviceMap)
        for alms in cache.values() for v in alms.values()
    )
    resident = dices.jackknife.compute_jk_cls_from_alms(
        jk, fields, nd=1, dir=None, alms_cache=cache
    )
    assert set(resident) == set(with_files)
    for regions in with_files:
        for key in with_files[regions]:
            np.testing.assert_allclose(
                np.asarray(resident[regions][key]),
                np.asarray(with_files[regions][key]),
                rtol=1e-10, atol=1e-12,
            )


def test_device_cache_validation():
    """device_cache=True with a cache dir must raise (no FITS in the
    device mode), and auto mode must respect the HBM budget."""
    import pytest as _pytest

    import heracles_tpu as h
    from heracles_tpu.core import update_metadata
    from heracles_tpu import healpix as hpx

    npix = hpx.nside2npix(4)
    mapper = h.HealpixMapper(4, 4, deconvolve=False)
    fields = {"POS": h.Positions(mapper, "RA", "DEC", mask="VIS"),
              "VIS": h.Visibility(mapper)}
    m = mapper.create(spin=0)
    m[:] = 1.0
    update_metadata(m, fsky=1.0, musq=1.0, dens=1.0)
    v = mapper.create(spin=0)
    v[:] = 1.0
    update_metadata(v, fsky=1.0)
    jk = np.zeros(npix)
    jk[: npix // 2] = 1
    jk[npix // 2 :] = 2
    with _pytest.raises(ValueError):
        dices.jackknife.compute_jk_alms(
            {("POS", 0): m}, {("VIS", 0): v}, jk, fields,
            dir="/tmp/x", device_cache=True,
        )
    # zero budget forces the host cache even with dir=None
    import os as _os

    _os.environ["HERACLES_TPU_DICES_DEVICE_BYTES"] = "0"
    try:
        cache = dices.jackknife.compute_jk_alms(
            {("POS", 0): m}, {("VIS", 0): v}, jk, fields, dir=None,
        )
    finally:
        del _os.environ["HERACLES_TPU_DICES_DEVICE_BYTES"]
    from heracles_tpu.devicemap import DeviceMap

    assert not any(
        isinstance(a, DeviceMap)
        for alms in cache.values() for a in alms.values()
    )


def test_device_cache_full_correction_matches_file_mode(setup, tmp_path):
    """mask_correction="Full" through the device-resident path."""
    fields, data_maps, vis_maps, jk = setup
    d = str(tmp_path / "files_full")
    with_files = dices.jackknife_cls(
        data_maps, vis_maps, jk, fields, nd=1, dir=d,
        mask_correction="Full",
    )
    in_mem = dices.jackknife_cls(
        data_maps, vis_maps, jk, fields, nd=1, dir=None,
        mask_correction="Full",
    )
    for regions in with_files:
        for key in with_files[regions]:
            np.testing.assert_allclose(
                np.asarray(in_mem[regions][key]),
                np.asarray(with_files[regions][key]),
                rtol=1e-10, atol=1e-12,
            )
