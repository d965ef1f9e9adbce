"""cl2corr/corr2cl round trips and Wigner-d table oracle."""

import math

import numpy as np
import pytest

from heracles_tpu.result import Result
from heracles_tpu.transforms import cl2corr, corr2cl, wigner_d_table
from heracles_tpu.unmixing import naturalspice


def wigner_d_brute(j, m, n, beta):
    total = 0.0
    for k in range(max(0, m - n), min(j + m, j - n) + 1):
        num = math.sqrt(
            math.factorial(j + m) * math.factorial(j - m)
            * math.factorial(j + n) * math.factorial(j - n)
        )
        den = (
            math.factorial(k) * math.factorial(j + m - k)
            * math.factorial(j - n - k) * math.factorial(n - m + k)
        )
        total += (
            (-1.0) ** k * num / den
            * math.cos(beta / 2) ** (2 * j + m - n - 2 * k)
            * math.sin(beta / 2) ** (n - m + 2 * k)
        )
    return total


@pytest.mark.parametrize("ab", [(0, 0), (2, 0), (2, 2), (2, -2)])
def test_wigner_d_table_oracle(ab):
    a, b = ab
    lmax = 8
    x = np.array([-0.9, -0.3, 0.1, 0.7, 0.99])
    tab = wigner_d_table(a, b, x, lmax)
    for ell in range(lmax + 1):
        for i, xi in enumerate(x):
            want = (
                wigner_d_brute(ell, a, b, math.acos(xi))
                if ell >= max(abs(a), abs(b))
                else 0.0
            )
            assert tab[ell, i] == pytest.approx(want, abs=1e-13)


def test_roundtrip_spin00():
    lmax = 16
    rng = np.random.default_rng(0)
    cl = Result(rng.uniform(0.5, 1.5, lmax + 1), spin=(0, 0))
    key = ("A", "A", 0, 0)
    back = corr2cl(cl2corr({key: cl}))[key]
    np.testing.assert_allclose(np.asarray(back), np.asarray(cl), rtol=1e-10)
    np.testing.assert_array_equal(back.ell, np.arange(lmax + 1))


def test_roundtrip_spin02():
    lmax = 16
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(2, lmax + 1))
    arr[:, :2] = 0
    cl = Result(arr, spin=(0, 2))
    key = ("P", "S", 0, 0)
    back = corr2cl(cl2corr({key: cl}))[key]
    np.testing.assert_allclose(np.asarray(back), arr, atol=1e-10)


def test_roundtrip_spin22_with_eb():
    lmax = 16
    rng = np.random.default_rng(2)
    arr = rng.normal(size=(2, 2, lmax + 1))
    arr[..., :2] = 0
    cl = Result(arr, spin=(2, 2))
    key = ("S", "S", 0, 0)
    corr = cl2corr({key: cl})
    back = corr2cl(corr)[key]
    np.testing.assert_allclose(np.asarray(back), arr, atol=1e-10)


class _FakeField:
    def __init__(self, mask, spin):
        self.mask = mask
        self.spin = spin


def test_naturalspice_full_sky_recovers_cls():
    # with the full-sky mask, xi_mask = 1 and unmixing is the identity
    lmax = 12
    lmax_mask = 24
    rng = np.random.default_rng(3)
    cl = Result(rng.uniform(0.5, 1.0, lmax + 1), spin=(0, 0))
    mask_cl = np.zeros(lmax_mask + 1)
    mask_cl[0] = 4 * np.pi
    m = {("VIS", "VIS", 0, 0): Result(mask_cl, spin=(0, 0))}
    fields = {"POS": _FakeField("VIS", 0)}
    d = {("POS", "POS", 0, 0): cl}
    out = naturalspice(d, m, fields)
    np.testing.assert_allclose(
        np.asarray(out["POS", "POS", 0, 0]), np.asarray(cl), rtol=1e-6, atol=1e-8
    )
