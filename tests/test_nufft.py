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


def test_paged_gridded_mapping_matches_exact():
    """map_catalogs with the gridded DiscreteMapper == exact, incl. spin-2.

    Drives the accumulation interface (begin/add/finish): the torus grid
    accumulates across catalogue pages and reduces once.
    """
    import heracles_tpu as h
    from heracles_tpu.catalog import ArrayCatalog
    from heracles_tpu.mapping import map_catalogs

    rng = np.random.default_rng(7)
    n, lmax = 3000, 32
    cat = ArrayCatalog(
        np.rec.fromarrays(
            [rng.uniform(0, 360, n),
             np.degrees(np.arcsin(rng.uniform(-1, 1, n))),
             rng.normal(0, 0.1, n), rng.normal(0, 0.1, n), np.ones(n)],
            names=["RA", "DEC", "G1", "G2", "W"],
        ),
    )
    cat.page_size = 1000  # several pages -> exercises grid accumulation
    out = {}
    for tag, mapper in [
        ("gridded", DiscreteMapper(lmax, method="gridded")),
        ("exact", DiscreteMapper(lmax, method="exact", point_block=1024)),
    ]:
        fields = {
            "POS": h.Positions(mapper, "RA", "DEC", overdensity=False),
            "SHE": h.Spin2Field(mapper, "RA", "DEC", "G1", "G2", "W"),
        }
        out[tag] = map_catalogs(fields, {0: cat})
    for k in out["gridded"]:
        a = np.asarray(out["gridded"][k])
        b = np.asarray(out["exact"][k])
        assert np.max(np.abs(a - b)) / np.max(np.abs(b)) < 1e-10
        assert set(dict(out["gridded"][k].dtype.metadata or {})) == set(
            dict(out["exact"][k].dtype.metadata or {})
        )


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
