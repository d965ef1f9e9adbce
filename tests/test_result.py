"""Result container and weighted binning."""

import numpy as np
import pytest

from heracles_tpu.result import Result, binned, get_result_array


def test_result_axis_normalisation():
    r = Result(np.zeros((3, 10)))
    assert r.axis == (1,)
    r = Result(np.zeros((4, 5)), ell=(np.arange(4), np.arange(5)))
    assert r.axis == (0, 1)
    r = Result(np.zeros((2, 8)), axis=-1)
    assert r.axis == (1,)


def test_get_result_array_defaults():
    r = Result(np.zeros(6))
    (ell,) = get_result_array(r, "ell")
    np.testing.assert_array_equal(ell, np.arange(6))
    (low,) = get_result_array(r, "lower")
    (up,) = get_result_array(r, "upper")
    np.testing.assert_array_equal(up[:-1], low[1:])
    (w,) = get_result_array(r, "weight")
    np.testing.assert_array_equal(w, 1.0)


def test_binned_flat_weights():
    lmax = 9
    cl = np.arange(lmax + 1, dtype=float)
    edges = np.array([0, 5, 10])
    b = binned(Result(cl), edges)
    # first bin: ells 1..4 (digitize: 0 falls below first edge? 0 is >= 0
    # -> bin 1); weighted mean of ell values
    assert b.shape == (2,)
    np.testing.assert_allclose(np.asarray(b), [2.0, 7.0])
    np.testing.assert_allclose(b.ell, [2.0, 7.0])
    np.testing.assert_array_equal(b.lower, [0, 5])
    np.testing.assert_array_equal(b.upper, [5, 10])


def test_binned_weight_strings():
    lmax = 9
    cl = np.ones(lmax + 1)
    edges = np.array([2, 6, 10])
    for w in ("2l+1", "l(l+1)"):
        b = binned(Result(cl), edges, w)
        np.testing.assert_allclose(np.asarray(b), 1.0)


def test_binned_two_axes():
    arr = np.ones((8, 8))
    r = Result(arr, ell=(np.arange(8), np.arange(8)), axis=(0, 1))
    b = binned(r, np.array([0, 4, 8]))
    assert b.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(b), 1.0)
    assert isinstance(b.ell, tuple) and len(b.ell) == 2


def test_binned_mapping():
    d = {("a",): Result(np.ones(8))}
    out = binned(d, np.array([0, 8]))
    assert out[("a",)].shape == (1,)


def test_binned_preserves_metadata():
    from heracles_tpu.core import update_metadata

    cl = np.ones(8)
    update_metadata(cl, bias=0.5)
    b = binned(Result(cl), np.array([0, 8]))
    assert b.dtype.metadata["bias"] == 0.5
