"""Two-point layer: alm2cl, pair logic, debias, mixing matrices."""

import numpy as np
import pytest

from heracles_tpu.core import TocDict, update_metadata
from heracles_tpu.result import Result
from heracles_tpu.twopoint import (
    alm2cl,
    alm2lmax,
    angular_power_spectra,
    apply_mixing_matrix,
    debias_cls,
    invert_mixing_matrix,
    mixing_matrices,
    mixmat,
    mixmat_eb,
)


def random_alm(lmax, shape=(), seed=0):
    rng = np.random.default_rng(seed)
    nlm = (lmax + 1) * (lmax + 2) // 2
    alm = rng.normal(size=(*shape, nlm)) + 1j * rng.normal(size=(*shape, nlm))
    alm[..., : lmax + 1] = alm[..., : lmax + 1].real
    return alm


def alm2cl_manual(alm1, alm2, lmax):
    """Oracle: direct sum over the packed triangular layout."""
    cl = np.zeros(lmax + 1)
    for ell in range(lmax + 1):
        total = 0.0
        for m in range(ell + 1):
            idx = m * (2 * lmax + 1 - m) // 2 + ell
            w = 1.0 if m == 0 else 2.0
            total += w * np.real(alm1[idx] * np.conj(alm2[idx]))
        cl[ell] = total / (2 * ell + 1)
    return cl


def test_alm2lmax():
    for lmax in (1, 5, 12):
        assert alm2lmax(np.zeros((lmax + 1) * (lmax + 2) // 2)) == lmax


def test_alm2cl_matches_manual():
    lmax = 8
    a = random_alm(lmax, seed=1)
    b = random_alm(lmax, seed=2)
    np.testing.assert_allclose(alm2cl(a, b), alm2cl_manual(a, b, lmax))
    np.testing.assert_allclose(alm2cl(a), alm2cl_manual(a, a, lmax))


def test_alm2cl_lmax_truncation():
    a = random_alm(10, seed=3)
    b = random_alm(6, seed=4)
    cl = alm2cl(a, b)
    assert cl.shape == (7,)
    cl5 = alm2cl(a, b, lmax=5)
    assert cl5.shape == (6,)


def test_alm2cl_broadcasting():
    lmax = 6
    a = random_alm(lmax, shape=(2,), seed=5)
    b = random_alm(lmax, shape=(3,), seed=6)
    cl = alm2cl(a, b)
    assert cl.shape == (2, 3, lmax + 1)
    np.testing.assert_allclose(cl[1, 2], alm2cl_manual(a[1], b[2], lmax))


def _alm_with_md(lmax, spin, seed, **extra):
    shape = (2,) if spin else ()
    alm = random_alm(lmax, shape=shape, seed=seed)
    update_metadata(alm, spin=spin, **extra)
    return alm


def test_angular_power_spectra_pairs():
    lmax = 6
    alms = TocDict(
        {
            ("POS", 0): _alm_with_md(lmax, 0, 1),
            ("POS", 1): _alm_with_md(lmax, 0, 2),
            ("SHE", 0): _alm_with_md(lmax, 2, 3),
        }
    )
    cls = angular_power_spectra(alms)
    # 3 keys -> 6 unique pairs
    assert len(cls) == 6
    assert ("POS", "POS", 0, 1) in cls
    assert ("POS", "SHE", 0, 0) in cls
    # canonical ordering: no (SHE, POS) keys
    assert all(k[:2] != ("SHE", "POS") for k in cls)
    r = cls["SHE", "SHE", 0, 0]
    assert r.shape == (2, 2, lmax + 1)
    assert r.spin == (2, 2)
    md = r.dtype.metadata
    assert md["spin_1"] == 2 and md["spin_2"] == 2


def test_angular_power_spectra_bias_and_debias():
    lmax = 6
    alms = TocDict(
        {("POS", 0): _alm_with_md(lmax, 0, 7, fsky=0.5, musq=1.0, dens=10.0)}
    )
    raw = angular_power_spectra(alms, debias=False)
    deb = angular_power_spectra(alms, debias=True)
    bias = 0.5 * 1.0 / 10.0
    assert raw["POS", "POS", 0, 0].dtype.metadata["bias"] == pytest.approx(bias)
    # debias subtracts a flat bias for l >= 0 (no pixwin metadata here)
    np.testing.assert_allclose(
        np.asarray(raw["POS", "POS", 0, 0]) - np.asarray(deb["POS", "POS", 0, 0]),
        bias,
    )


def test_debias_spin2_only_eb_blocks():
    lmax = 4
    cl = np.ones((2, 2, lmax + 1))
    update_metadata(cl, spin_1=2, spin_2=2, bias=1.0)
    out = debias_cls(TocDict({("SHE", "SHE", 0, 0): cl}))
    arr = np.asarray(out["SHE", "SHE", 0, 0])
    # EE and BB lose the bias for l >= 2; EB untouched
    np.testing.assert_allclose(arr[0, 0, 2:], 0.0)
    np.testing.assert_allclose(arr[1, 1, 2:], 0.0)
    np.testing.assert_allclose(arr[0, 0, :2], 1.0)
    np.testing.assert_allclose(arr[0, 1], 1.0)


def wigner3j_brute(l1, l2, l3, m1, m2, m3):
    """Exact 3j symbol via the Racah sum formula (fractions-free floats)."""
    import math

    if m1 + m2 + m3 != 0:
        return 0.0
    if l3 < abs(l1 - l2) or l3 > l1 + l2:
        return 0.0
    if abs(m1) > l1 or abs(m2) > l2 or abs(m3) > l3:
        return 0.0
    f = math.factorial
    pref = math.sqrt(
        f(l1 + l2 - l3) * f(l1 - l2 + l3) * f(-l1 + l2 + l3) / f(l1 + l2 + l3 + 1)
        * f(l1 + m1) * f(l1 - m1) * f(l2 + m2) * f(l2 - m2) * f(l3 + m3) * f(l3 - m3)
    )
    total = 0.0
    for t in range(0, l1 + l2 + l3 + 1):
        denoms = [
            t,
            l3 - l2 + t + m1,
            l3 - l1 + t - m2,
            l1 + l2 - l3 - t,
            l1 - t - m1,
            l2 - t + m2,
        ]
        if any(d < 0 for d in denoms):
            continue
        term = 1.0
        for d in denoms:
            term *= f(d)
        total += (-1.0) ** t / term
    return (-1.0) ** (l1 - l2 - m3) * pref * total


def mixmat_brute(cl, l1max, l2max, s1, s2):
    """Oracle: direct Wigner-3j sums for the mixing matrix."""
    l3max = len(cl) - 1
    M = np.zeros((l1max + 1, l2max + 1))
    for l1 in range(l1max + 1):
        for l2 in range(l2max + 1):
            total = 0.0
            for l3 in range(abs(l1 - l2), min(l1 + l2, l3max) + 1):
                total += (
                    (2 * l3 + 1)
                    * cl[l3]
                    * wigner3j_brute(l1, l2, l3, -s1, s1, 0)
                    * wigner3j_brute(l1, l2, l3, -s2, s2, 0)
                )
            M[l1, l2] = (2 * l2 + 1) / (4 * np.pi) * total
    return M


@pytest.mark.parametrize("spin", [(0, 0), (0, 2)])
def test_mixmat_vs_brute_force(spin):
    lmax = 8
    rng = np.random.default_rng(11)
    cl = rng.uniform(0.1, 1.0, lmax + 1)
    got = mixmat(cl, spin=spin)
    want = mixmat_brute(cl, lmax, lmax, *spin)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_mixmat_eb_vs_brute_force():
    lmax = 6
    rng = np.random.default_rng(12)
    cl = rng.uniform(0.1, 1.0, lmax + 1)
    got = mixmat_eb(cl, spin=(2, 2))
    # brute-force parity-filtered sums
    Mp = np.zeros((lmax + 1, lmax + 1))
    Mm = np.zeros((lmax + 1, lmax + 1))
    for l1 in range(lmax + 1):
        for l2 in range(lmax + 1):
            for l3 in range(abs(l1 - l2), min(l1 + l2, lmax) + 1):
                j = wigner3j_brute(l1, l2, l3, -2, 2, 0)
                term = (2 * l3 + 1) * cl[l3] * j * j * (2 * l2 + 1) / (8 * np.pi)
                if (l1 + l2 + l3) % 2 == 0:
                    Mp[l1, l2] += 2 * term
                else:
                    Mm[l1, l2] += 2 * term
    np.testing.assert_allclose(got[0], Mp, atol=1e-12)
    np.testing.assert_allclose(got[1], Mm, atol=1e-12)
    np.testing.assert_allclose(got[2], Mp - Mm, atol=1e-12)


def test_mixmat_full_sky_mask_is_identity():
    # mask cl of the unit full-sky mask: cl = 4pi delta_l0
    lmax = 10
    cl = np.zeros(lmax + 1)
    cl[0] = 4 * np.pi
    M = mixmat(cl)
    np.testing.assert_allclose(M, np.eye(lmax + 1), atol=1e-10)


def test_mixmat_l123max():
    cl = np.ones(13)
    M = mixmat(cl, l1max=5, l2max=8, l3max=10)
    assert M.shape == (6, 9)


class _FakeField:
    def __init__(self, mask, spin):
        self.mask = mask
        self.spin = spin


def test_mixing_matrices_dispatch():
    lmax = 6
    fields = {
        "POS": _FakeField("VIS", 0),
        "SHE": _FakeField("WHT", 2),
    }
    cl = np.zeros(lmax + 1)
    cl[0] = 4 * np.pi
    cls = TocDict(
        {
            ("VIS", "VIS", 0, 0): cl,
            ("VIS", "WHT", 0, 0): cl.copy(),
            ("WHT", "WHT", 0, 0): cl.copy(),
        }
    )
    mms = mixing_matrices(fields, cls)
    assert set(mms.keys()) == {
        ("POS", "POS", 0, 0),
        ("POS", "SHE", 0, 0),
        ("SHE", "SHE", 0, 0),
    }
    assert mms["POS", "POS", 0, 0].shape == (lmax + 1, lmax + 1)
    assert mms["SHE", "SHE", 0, 0].shape == (3, lmax + 1, lmax + 1)
    assert mms["SHE", "SHE", 0, 0].axis == (1,)


def test_invert_and_apply_mixing_matrix_roundtrip():
    lmax = 8
    rng = np.random.default_rng(13)
    # well-conditioned mask spectrum
    cl3 = np.zeros(lmax + 1)
    cl3[0] = 4 * np.pi
    cl3[1:] = rng.uniform(0, 0.1, lmax)
    M = Result(mixmat(cl3), spin=(0, 0), ell=np.arange(lmax + 1), axis=-2)
    d = Result(rng.normal(size=lmax + 1), spin=(0, 0))
    key = ("A", "A", 0, 0)
    mixed = apply_mixing_matrix({key: d}, {key: M})
    inv = invert_mixing_matrix({key: M}, rcond=1e-10)
    back = apply_mixing_matrix(mixed, inv)
    np.testing.assert_allclose(np.asarray(back[key]), np.asarray(d), rtol=1e-8)


def test_invert_apply_spin2_eb_blocks():
    lmax = 6
    rng = np.random.default_rng(14)
    cl3 = np.zeros(lmax + 1)
    cl3[0] = 4 * np.pi
    cl3[1:] = rng.uniform(0, 0.05, lmax)
    M = Result(
        mixmat_eb(cl3), spin=(2, 2), ell=np.arange(lmax + 1), axis=-2
    )
    arr = rng.normal(size=(2, 2, lmax + 1))
    arr[..., :2] = 0  # spin-2 fields have no l < 2 modes
    d = Result(arr, spin=(2, 2))
    key = ("S", "S", 0, 0)
    mixed = apply_mixing_matrix({key: d}, {key: M})
    inv = invert_mixing_matrix({key: M}, rcond=1e-10)
    back = apply_mixing_matrix(mixed, inv)
    np.testing.assert_allclose(
        np.asarray(back[key])[..., 2:], arr[..., 2:], rtol=1e-6, atol=1e-10
    )
