"""Cl-dictionary algebra helpers.

Parity with ``/root/reference/heracles/utils.py``: symmetric-key lookup
with spin transpose, elementwise add/sub over cl dicts, spin-0 axis
expansion/squeezing to uniform (2, 2, ell)-like shapes, correlation
imposition between covariance dicts, and the block flattening of
cl-dicts to vectors / covariance-dicts to matrices.
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np

__all__ = [
    "get_cl",
    "add_to_Cls",
    "sub_to_Cls",
    "expand_spin0_dims",
    "squeeze_spin0_dims",
    "impose_correlation",
    "flatten",
]


def get_cl(key, cls):
    """Look up a cl by key, falling back to the symmetric (swapped) key.

    The symmetric lookup transposes the E/B block axes when both spins
    are non-zero, and always swaps the spin pair (reference utils.py:28-52).
    """
    if key in cls:
        return cls[key]
    a, b, i, j = key
    sym = (b, a, j, i)
    if sym not in cls:
        raise KeyError(f"Key {key} not found in Cls.")
    result = cls[sym]
    arr = result.array
    s1, s2 = result.spin
    if s1 != 0 and s2 != 0:
        arr = np.transpose(arr, axes=(1, 0, 2))
    return replace(result, array=arr, spin=(s2, s1))


def add_to_Cls(cls, x):
    """Elementwise ``cls[key].array + x[key]`` over a cl dict."""
    return {
        key: replace(value, array=value.array + x[key]) for key, value in cls.items()
    }


def sub_to_Cls(cls, x):
    """Elementwise ``cls[key].array - x[key]`` over a cl dict."""
    return {
        key: replace(value, array=value.array - x[key]) for key, value in cls.items()
    }


def expand_spin0_dims(result):
    """Insert length-1 axes where the spin is zero (uniform block shape)."""
    offset = 0
    shape = list(result.shape)
    for i, s in enumerate(result.spin):
        if s == 0:
            shape.insert(i, 1)
            offset += 1
    arr = result.array.reshape(*shape)
    return replace(result, array=arr, axis=tuple(a + offset for a in result.axis))


def squeeze_spin0_dims(result):
    """Inverse of :func:`expand_spin0_dims`."""
    offset = 0
    shape = list(result.shape)
    for i, s in enumerate(result.spin):
        if s == 0:
            dim = shape.pop(i - offset)
            assert dim == 1, "found spin-0 axis of size != 1"
            offset += 1
    arr = result.array.reshape(*shape)
    return replace(result, array=arr, axis=tuple(a - offset for a in result.axis))


def impose_correlation(cov_a, cov_b):
    """Rescale each covariance in ``cov_a`` to the variances of ``cov_b``.

    The output has the correlation structure of ``cov_a`` and the
    diagonal of ``cov_b`` (reference utils.py:118-138).
    """
    out = {}
    for key in cov_a:
        a = cov_a[key]
        b = cov_b[key]
        a_std = np.sqrt(np.diagonal(a, axis1=-2, axis2=-1))[..., None, :]
        b_std = np.sqrt(np.diagonal(b, axis1=-2, axis2=-1))[..., None, :]
        c = a * (b_std * np.swapaxes(b_std, -1, -2))
        c = c / (a_std * np.swapaxes(a_std, -1, -2))
        out[key] = replace(a, array=c)
    return out


def _dof(spin):
    return 1 if spin == 0 else 2


def _flatten(result):
    """Flatten one block: cl -> vector, covariance -> matrix."""
    a = result.array
    naxes = len(result.axis)
    if naxes == 1:
        s1, s2 = result.spin
        ell = a.shape[-1]
        return a.reshape(_dof(s1) * _dof(s2), ell).reshape(-1)
    if naxes == 2:
        s1, s2, s3, s4 = result.spin
        d12 = _dof(s1) * _dof(s2)
        d34 = _dof(s3) * _dof(s4)
        ell = a.shape[-1]
        return (
            a.reshape(d12, d34, ell, ell)
            .transpose(0, 2, 1, 3)
            .reshape(d12 * ell, d34 * ell)
        )
    raise NotImplementedError("Flattening for >2 axes not implemented yet.")


def flatten(results, order=None):
    """Flatten a cl dict to one vector, or a covariance dict to one matrix.

    For covariances, missing off-diagonal blocks are filled from their
    transposes (reference utils.py:141-215).
    """
    blocks = {key: _flatten(result) for key, result in results.items()}
    naxes = {len(result.axis) for result in results.values()}
    if len(naxes) != 1:
        raise ValueError("All results must have the same length axis to flatten.")
    (naxes,) = naxes

    if naxes == 1:
        return np.concatenate(list(blocks.values()))
    if naxes == 2:
        if order is None:
            order = list({(k[0], k[1], k[4], k[5]) for k in blocks})
        rows = []
        for key_i in order:
            row = []
            for key_j in order:
                a1, b1, i1, j1 = key_i
                a2, b2, i2, j2 = key_j
                cov_key = (a1, b1, a2, b2, i1, j1, i2, j2)
                block = blocks.get(cov_key)
                if block is None:
                    sym = (a2, b2, a1, b1, i2, j2, i1, j1)
                    if sym in blocks:
                        block = blocks[sym].T
                    else:
                        raise KeyError(f"Missing block for {cov_key}")
                row.append(block)
            rows.append(row)
        return np.block(rows)
    raise NotImplementedError("Flattening for axis != 2 not implemented yet.")
