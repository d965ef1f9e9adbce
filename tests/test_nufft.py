"""Gridded (NUFFT) adjoint synthesis vs the exact per-point adjoint.

The reference's large-N pixel-free path is ducc's
``adjoint_synthesis_general(..., epsilon=...)``
(/root/reference/heracles/ducc.py:108-128); these tests pin the
TPU-native gridded equivalent to the same epsilon semantics against
the repo's exact O(N * lmax^2) adjoint.
"""

import numpy as np
import pytest

from heracles_tpu.mappers import DiscreteMapper
from heracles_tpu.ops import nufft


@pytest.fixture(scope="module")
def points():
    rng = np.random.default_rng(11)
    n = 3000
    theta = np.arccos(rng.uniform(-1, 1, n))
    phi = rng.uniform(0, 2 * np.pi, n)
    return theta, phi, rng


def test_adjoint_gridded_spin0_epsilon(points):
    theta, phi, rng = points
    lmax = 32
    v = rng.normal(size=(2, theta.size))
    exact = np.asarray(
        DiscreteMapper(lmax)._adjoint_synthesis(theta, phi, v, spin=0)
    )
    scale = np.max(np.abs(exact))
    for eps, bound in [(1e-5, 3e-5), (1e-9, 3e-9), (1e-12, 1e-11)]:
        alm = nufft.adjoint_gridded(theta, phi, v, lmax, spin=0, epsilon=eps)
        assert np.max(np.abs(alm - exact)) / scale < bound


def test_adjoint_gridded_spin2(points):
    theta, phi, rng = points
    lmax = 32
    v = rng.normal(size=(2, theta.size))
    exact = np.asarray(
        DiscreteMapper(lmax)._adjoint_synthesis(theta, phi, v, spin=2)
    )
    alm = nufft.adjoint_gridded(theta, phi, v, lmax, spin=2, epsilon=1e-12)
    err = np.max(np.abs(alm.reshape(exact.shape) - exact))
    assert err / np.max(np.abs(exact)) < 1e-11


def test_incremental_spread_matches_single_pass(points):
    theta, phi, rng = points
    lmax = 16
    v = rng.normal(size=(1, theta.size))
    w = nufft.kernel_width(1e-9)
    full = nufft.spread_torus(theta, phi, v, lmax, w)
    half = theta.size // 2
    acc = nufft.spread_torus(theta[:half], phi[:half], v[:, :half], lmax, w)
    acc = nufft.spread_torus(
        theta[half:], phi[half:], v[:, half:], lmax, w, grid=acc
    )
    np.testing.assert_allclose(acc, full, rtol=0, atol=1e-12)
