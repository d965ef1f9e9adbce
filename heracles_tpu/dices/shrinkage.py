"""Linear shrinkage of jackknife covariances (Schafer-Strimmer style).

Parity with ``/root/reference/heracles/dices/shrinkage.py``: the shrunk
covariance is lambda * (correlation-imposed target) + (1-lambda) * cov,
with the optimal lambda* estimated from the jackknife W-matrices; the
Gaussian target is the Knox formula cov[l,l] = C13*C24 + C14*C23 per
spin-component with spin-0 dimension expansion.
"""

from __future__ import annotations

import itertools
from dataclasses import replace

import numpy as np

from ..result import Result, get_result_array
from ..utils import (
    add_to_Cls,
    expand_spin0_dims,
    flatten,
    get_cl,
    impose_correlation,
    squeeze_spin0_dims,
)
from .jackknife import bias

__all__ = ["shrink", "shrinkage_factor", "gaussian_covariance"]


def shrink(cov, target, shrinkage_factor):
    """lambda * correlated-target + (1 - lambda) * cov, per key."""
    out = {}
    correlated_target = impose_correlation(target, cov)
    for key in cov:
        c = cov[key].array
        tc = correlated_target[key].array
        out[key] = replace(
            cov[key], array=shrinkage_factor * tc + (1 - shrinkage_factor) * c
        )
    return out


def shrinkage_factor(cls1, target):
    """Optimal linear shrinkage factor lambda* from delete-1 samples."""
    samples = [flatten(cls1[key]) for key in cls1.keys()]
    mean = np.mean(np.array(samples), axis=0)
    target = flatten(target)
    njk = len(samples)
    W = _get_W(samples, mean)
    W *= (njk - 1) ** 2 / njk
    Wbar = np.mean(W, axis=0)
    S = (njk / (njk - 1)) * Wbar
    target_corr = target / np.outer(
        np.sqrt(np.diag(target)), np.sqrt(np.diag(target))
    )
    numerator = 0.0
    denominator = 0.0
    for i in range(len(S)):
        for j in range(len(S)):
            if i == j:
                continue
            f = 0.5 * np.sqrt(Wbar[j, j] / Wbar[i, i]) * _covW(i, i, i, j, W, Wbar)
            f += 0.5 * np.sqrt(Wbar[i, i] / Wbar[j, j]) * _covW(j, j, i, j, W, Wbar)
            t = target_corr[i, j]
            numerator += _covW(i, j, i, j, W, Wbar) - t * f
            denominator += (S[i, j] - t * np.sqrt(S[i, i] * S[j, j])) ** 2
    return numerator / denominator


def gaussian_covariance(cls):
    """Diagonal Gaussian (Knox) covariance target from measured cls."""
    b = bias(cls)
    cls = add_to_Cls(cls, b)
    cov = {}
    for key1, key2 in itertools.combinations_with_replacement(cls.keys(), 2):
        a1, b1, i1, j1 = key1
        a2, b2, i2, j2 = key2
        (ell1,) = get_result_array(cls[key1], "ell")
        (ell2,) = get_result_array(cls[key2], "ell")
        cl1 = expand_spin0_dims(cls[key1])
        cl2 = expand_spin0_dims(cls[key2])
        c13 = expand_spin0_dims(get_cl((a1, a2, i1, i2), cls))
        c24 = expand_spin0_dims(get_cl((b1, b2, j1, j2), cls))
        c14 = expand_spin0_dims(get_cl((a1, b2, i1, j2), cls))
        c23 = expand_spin0_dims(get_cl((b1, a2, j1, i2), cls))
        dof_a1, dof_b1, _ = cl1.shape
        dof_a2, dof_b2, _ = cl2.shape
        nell = min(len(ell1), len(ell2))
        r = np.zeros((dof_a1, dof_b1, dof_a2, dof_b2, nell))
        for p, q, s, t in np.ndindex(r.shape[:-1]):
            r[p, q, s, t, :] = (
                np.asarray(c13[p, s])[:nell] * np.asarray(c24[q, t])[:nell]
                + np.asarray(c14[p, t])[:nell] * np.asarray(c23[q, s])[:nell]
            )
        r = r[..., :, None] * np.eye(nell)
        result = Result(
            r, spin=(*cl1.spin, *cl2.spin), ell=(ell1, ell2), axis=(-2, -1)
        )
        cov[a1, b1, a2, b2, i1, j1, i2, j2] = squeeze_spin0_dims(result)
    return cov


def _get_W(x, xbar):
    """Per-sample outer-product deviation matrices."""
    xbi, xbj = np.meshgrid(xbar, xbar, indexing="ij")
    W = []
    for xi in x:
        a, bmat = np.meshgrid(xi, xi, indexing="ij")
        W.append((a - xbi) * (bmat - xbj))
    return np.array(W)


def _covW(i1, j1, i2, j2, W, Wbar):
    """Covariance of W-matrix entries (for the lambda* estimate)."""
    n = len(W)
    total = np.sum((W[:, i1, j1] - Wbar[i1, j1]) * (W[:, i2, j2] - Wbar[i2, j2]))
    return total * n / ((n - 1) ** 3)
