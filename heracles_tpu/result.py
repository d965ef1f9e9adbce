"""Result container and weighted ell-binning.

Behavioural contract: reference ``/root/reference/heracles/result.py``:

* ``Result`` is a frozen dataclass carrying ``array, ell, spin, axis,
  lower, upper, weight`` (result.py:75-121); ``axis`` is normalised to a
  tuple of positive axes at construction,
* ``get_result_array`` synthesises defaults (ell = arange, lower = ell,
  upper = next lower, weight = ones) per ell axis (result.py:53-72),
* ``binned`` applies weighted binning over every ell axis with weight
  strings ``"2l+1"`` / ``"l(l+1)"`` or arrays (result.py:124-248).

The binning here is vectorised with a one-hot bin matrix contraction
rather than the reference's per-index python loops, which keeps it usable
inside jitted host callbacks and on large grids.
"""

from __future__ import annotations

from collections.abc import Mapping
from dataclasses import dataclass
from typing import Any

import numpy as np

__all__ = ["Result", "binned", "get_result_array", "normalize_result_axis"]


def _normalize_axis_tuple(axis, ndim):
    if not isinstance(axis, tuple):
        axis = (int(axis),)
    out = []
    for ax in axis:
        ax = int(ax)
        if ax < 0:
            ax += ndim
        if not 0 <= ax < ndim:
            raise ValueError(f"axis {ax} out of bounds for array of dimension {ndim}")
        out.append(ax)
    if len(set(out)) != len(out):
        raise ValueError("repeated axis")
    return tuple(out)


def normalize_result_axis(axis, result, ell):
    """Return the normalised tuple of ell axes for a result array.

    ``axis=None`` defaults to the trailing axes: one per entry of ``ell``
    when that is a tuple, the last axis otherwise (none for 0-d arrays).
    """
    ndim = np.ndim(result)
    if axis is None:
        n_ell = len(ell) if isinstance(ell, tuple) else min(ndim, 1)
        axis = tuple(range(ndim - n_ell, ndim))
    return _normalize_axis_tuple(axis, ndim) if axis != () else ()


# default factories for per-ell-axis companion arrays of a Result
_DEFAULT_ARRAYS = {
    "ell": lambda r, axis: tuple(np.arange(r.shape[a]) for a in axis),
    "lower": lambda r, axis: get_result_array(r, "ell"),
    "upper": lambda r, axis: tuple(
        np.concatenate([lo[1:], lo[-1:] + 1])
        for lo in get_result_array(r, "lower")
    ),
    "weight": lambda r, axis: tuple(np.ones(r.shape[a]) for a in axis),
}


def get_result_array(result, name):
    """Return array *name* of *result* as a tuple, one entry per ell axis.

    Absent arrays are synthesised from the defaults table above (``ell``
    counts from 0, bin edges degenerate to single multipoles, weights
    are uniform).
    """
    value = getattr(result, name, None)
    axis = normalize_result_axis(getattr(result, "axis", None), result, value)
    if value is None:
        try:
            make = _DEFAULT_ARRAYS[name]
        except KeyError:
            raise ValueError(f"no default rule for array {name!r}") from None
        return make(result, axis)
    return value if isinstance(value, tuple) else (value,) * len(axis)


@dataclass(frozen=True, repr=False)
class Result:
    """Frozen container for a result array with angular metadata."""

    array: Any
    ell: Any = None
    spin: Any = None
    axis: Any = None
    lower: Any = None
    upper: Any = None
    weight: Any = None

    def __post_init__(self):
        axis = normalize_result_axis(self.axis, self.array, self.ell)
        object.__setattr__(self, "axis", axis)

    def __repr__(self):
        return f"{self.__class__.__name__}(axis={self.axis!r})"

    def __array__(self, dtype=None, *, copy=None):
        if copy is not None:
            return self.array.__array__(dtype, copy=copy)
        return self.array.__array__(dtype)

    def __getitem__(self, key):
        return self.array[key]

    @property
    def ndim(self):
        return self.array.ndim

    @property
    def shape(self):
        return self.array.shape

    @property
    def dtype(self):
        return self.array.dtype


def _safe_ratio(num, den):
    """num/den where num is nonzero, else 0 (reference result.py:133-135)."""
    out = np.zeros(np.broadcast(num, den).shape)
    return np.divide(num, den, where=(np.asarray(num) != 0), out=out)


def _combine_weight(ell, user_w, result_w):
    if user_w is None:
        return result_w
    if isinstance(user_w, str):
        if user_w == "l(l+1)":
            return ell * (ell + 1) * result_w
        if user_w == "2l+1":
            return (2 * ell + 1) * result_w
        raise ValueError(f"unknown weights string: {user_w}")
    return np.asarray(user_w)[: result_w.size] * result_w


def binned(result, bins, weight=None):
    """Bin a Result (or mapping of Results) over all of its ell axes."""
    if isinstance(result, Mapping):
        return {key: binned(value, bins, weight) for key, value in result.items()}

    spin = getattr(result, "spin", None)
    ells = get_result_array(result, "ell")
    axes = normalize_result_axis(getattr(result, "axis", None), result, ells)

    if not isinstance(bins, tuple):
        bins = (bins,) * len(axes)
    if len(bins) != len(axes):
        raise ValueError("result and bins have different number of ell axes")
    if not isinstance(weight, tuple):
        weight = (weight,) * len(axes)
    if len(weight) != len(axes):
        raise ValueError("result and weight have different number of ell axes")

    result_weight = get_result_array(result, "weight")
    combined = [
        _combine_weight(ell, w1, w2)
        for ell, w1, w2 in zip(ells, weight, result_weight)
    ]

    md = {}
    if result.dtype.metadata:
        md.update(result.dtype.metadata)
    dt = np.dtype(float, metadata=md)

    out = np.asarray(np.copy(result), dtype=float)

    binned_ell, binned_weight = (), ()
    for axis, ell, w, b in zip(axes, ells, combined, bins):
        b = np.asarray(b)
        m = b.size
        # bin index per ell (0 = below first edge, m = above last edge)
        index = np.digitize(ell, b)
        wb = np.bincount(index, weights=w, minlength=m + 1)[1:m]
        ellb = _safe_ratio(np.bincount(index, w * ell, m + 1)[1:m], wb)
        # one-hot (nell, nbins) contraction: sums w*x into bins along `axis`
        onehot = (index[:, None] == np.arange(1, m)) * w[:, None]
        num = np.moveaxis(
            np.tensordot(np.moveaxis(out, axis, -1), onehot, axes=([-1], [0])),
            -1,
            axis,
        )
        shape = [1] * num.ndim
        shape[axis] = m - 1
        den = wb.reshape(shape)
        out = _safe_ratio(num, den)
        binned_ell += (ellb,)
        binned_weight += (wb,)

    out = out.view(dt)

    binned_lower = tuple(np.asarray(b)[:-1] for b in bins)
    binned_upper = tuple(np.asarray(b)[1:] for b in bins)

    if len(axes) == 1:
        binned_ell = binned_ell[0]
        binned_lower = binned_lower[0]
        binned_upper = binned_upper[0]
        binned_weight = binned_weight[0]

    return Result(
        out,
        spin=spin,
        ell=binned_ell,
        axis=axes,
        lower=binned_lower,
        upper=binned_upper,
        weight=binned_weight,
    )
