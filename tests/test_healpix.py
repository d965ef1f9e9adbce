"""Geometry self-consistency tests (no healpy oracle available in-image).

Checks: ring tables tile the sphere, pixel centres round-trip through
ang2pix/pix2ang, NEST<->RING is a bijection consistent with the hierarchy,
and ud_grade partitions/averages correctly.
"""

import numpy as np
import pytest

from heracles_tpu import healpix as hpx


@pytest.mark.parametrize("nside", [1, 2, 4, 8, 32, 64])
def test_ring_geometry_tiles_sphere(nside):
    g = hpx.ring_geometry(nside)
    assert g["npix"].sum() == hpx.nside2npix(nside)
    assert g["start"][0] == 0
    # rings are north->south with mirror symmetry
    assert np.allclose(g["z"], -g["z"][::-1])
    assert np.allclose(g["npix"], g["npix"][::-1])
    # z strictly decreasing
    assert np.all(np.diff(g["z"]) < 0)


@pytest.mark.parametrize("nside", [1, 2, 4, 16, 64])
def test_pix2ang_ang2pix_roundtrip(nside):
    pix = np.arange(hpx.nside2npix(nside))
    theta, phi = hpx.pix2ang_ring(nside, pix)
    assert np.all((theta >= 0) & (theta <= np.pi))
    back = hpx.ang2pix_ring(nside, theta, phi)
    np.testing.assert_array_equal(back, pix)


def test_pix2ang_base_pixels():
    # documented base-resolution geometry: nside=1 has 4 polar pixels at
    # phi = pi/4, 3pi/4, ... and 4 equatorial pixels at phi = 0, pi/2, ...
    theta, phi = hpx.pix2ang_ring(1, np.arange(12))
    np.testing.assert_allclose(phi[:4], np.pi / 4 * np.array([1, 3, 5, 7]))
    np.testing.assert_allclose(phi[4:8], np.pi / 2 * np.array([0, 1, 2, 3]))
    np.testing.assert_allclose(theta[4:8], np.pi / 2)
    np.testing.assert_allclose(np.cos(theta[:4]), 2.0 / 3.0)


def test_pix2ang_matches_ring_tables():
    nside = 8
    g = hpx.ring_geometry(nside)
    pix = np.arange(hpx.nside2npix(nside))
    theta, phi = hpx.pix2ang_ring(nside, pix)
    for r in range(hpx.nside2nrings(nside)):
        s, n = g["start"][r], g["npix"][r]
        np.testing.assert_allclose(theta[s : s + n], g["theta"][r], atol=1e-12)
        np.testing.assert_allclose(phi[s], g["phi0"][r], atol=1e-12)
        np.testing.assert_allclose(
            np.diff(phi[s : s + n]), 2 * np.pi / n, atol=1e-12
        )


@pytest.mark.parametrize("nside", [1, 2, 4, 16])
def test_nest_ring_bijection(nside):
    pix = np.arange(hpx.nside2npix(nside))
    nest = hpx.ring2nest(nside, pix)
    assert np.array_equal(np.sort(nest), pix)
    np.testing.assert_array_equal(hpx.nest2ring(nside, nest), pix)


def test_nest_hierarchy_children_within_parent():
    # the 4 children (nest) of a pixel must lie geometrically inside it:
    # their centres must map back to the parent through ang2pix
    nside = 8
    parents_nest = np.arange(hpx.nside2npix(nside))
    children_nest = parents_nest[:, None] * 4 + np.arange(4)
    children_ring = hpx.nest2ring(2 * nside, children_nest)
    theta, phi = hpx.pix2ang_ring(2 * nside, children_ring)
    got_parent_ring = hpx.ang2pix_ring(nside, theta, phi)
    got_parent_nest = hpx.ring2nest(nside, got_parent_ring)
    np.testing.assert_array_equal(
        got_parent_nest, np.repeat(parents_nest, 4).reshape(-1, 4)
    )


def test_ud_grade_roundtrip_and_mean():
    nside = 16
    rng = np.random.default_rng(0)
    m = rng.normal(size=hpx.nside2npix(nside))
    up = hpx.ud_grade(m, 2 * nside)
    assert up.shape[-1] == hpx.nside2npix(2 * nside)
    # upgrade conserves the mean, degrade inverts upgrade
    np.testing.assert_allclose(up.mean(), m.mean())
    np.testing.assert_allclose(hpx.ud_grade(up, nside), m)
    # degrading a constant map stays constant
    const = np.ones(hpx.nside2npix(nside))
    np.testing.assert_allclose(hpx.ud_grade(const, nside // 2), 1.0)


def test_ang2pix_jax_matches_numpy():
    import jax.numpy as jnp

    nside = 32
    rng = np.random.default_rng(1)
    theta = np.arccos(rng.uniform(-1, 1, 1000))
    phi = rng.uniform(0, 2 * np.pi, 1000)
    a = hpx.ang2pix_ring(nside, theta, phi)
    b = np.asarray(hpx.ang2pix_ring(nside, jnp.asarray(theta), jnp.asarray(phi), xp=jnp))
    np.testing.assert_array_equal(a, b)


def test_ang2pix_lonlat():
    nside = 16
    pix = np.arange(hpx.nside2npix(nside))
    lon, lat = hpx.pix2ang_ring(nside, pix, lonlat=True)
    assert np.all((lat >= -90) & (lat <= 90))
    back = hpx.ang2pix_ring(nside, lon, lat, lonlat=True)
    np.testing.assert_array_equal(back, pix)
