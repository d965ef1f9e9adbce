"""Ring-FFT phase of the SHT, validated against a brute-force NUDFT."""

import numpy as np
import pytest

from heracles_tpu import healpix as hpx
from heracles_tpu.ops import ringfft


def brute_force_F(maps, nside, nm):
    """F_m(r) = sum_p v_p e^{-i m phi_p} by direct summation (oracle)."""
    g = hpx.ring_geometry(nside)
    nr = hpx.nside2nrings(nside)
    F = np.zeros(maps.shape[:-1] + (nr, nm), dtype=complex)
    pix = np.arange(hpx.nside2npix(nside))
    _, phi = hpx.pix2ang_ring(nside, pix)
    for r in range(nr):
        s, n = int(g["start"][r]), int(g["npix"][r])
        ph = phi[s : s + n]
        for m in range(nm):
            F[..., r, m] = (maps[..., s : s + n] * np.exp(-1j * m * ph)).sum(-1)
    return F


@pytest.mark.parametrize("nside", [1, 2, 4, 8])
def test_ring_analysis_real(nside):
    rng = np.random.default_rng(nside)
    maps = rng.normal(size=hpx.nside2npix(nside))
    nm = 3 * nside  # exercise m >= nph aliasing on cap rings
    F, Fneg = ringfft.ring_analysis(maps, nside, nm)
    assert Fneg is None
    ref = brute_force_F(maps, nside, nm)
    np.testing.assert_allclose(np.asarray(F), ref, atol=1e-10 * nside)


def test_ring_analysis_complex():
    nside = 4
    rng = np.random.default_rng(0)
    maps = rng.normal(size=(2, hpx.nside2npix(nside))) + 1j * rng.normal(
        size=(2, hpx.nside2npix(nside))
    )
    nm = 8
    F, Fneg = ringfft.ring_analysis(maps, nside, nm)
    ref = brute_force_F(maps, nside, nm)
    np.testing.assert_allclose(np.asarray(F), ref, atol=1e-10)
    # negative orders: F_{-m} via conjugated brute force
    g = hpx.ring_geometry(nside)
    pix = np.arange(hpx.nside2npix(nside))
    _, phi = hpx.pix2ang_ring(nside, pix)
    nr = hpx.nside2nrings(nside)
    refneg = np.zeros((2, nr, nm), dtype=complex)
    for r in range(nr):
        s, n = int(g["start"][r]), int(g["npix"][r])
        ph = phi[s : s + n]
        for m in range(nm):
            refneg[:, r, m] = (maps[:, s : s + n] * np.exp(1j * m * ph)).sum(-1)
    np.testing.assert_allclose(np.asarray(Fneg), refneg, atol=1e-10)


@pytest.mark.parametrize("nside", [2, 8])
def test_ring_synthesis_real_roundtrip(nside):
    # synthesis of h then brute-force evaluation must agree
    rng = np.random.default_rng(7)
    nr = hpx.nside2nrings(nside)
    nm = 2 * nside
    h = rng.normal(size=(nr, nm)) + 1j * rng.normal(size=(nr, nm))
    maps = np.asarray(ringfft.ring_synthesis(h, None, nside))
    # oracle: v_p = Re[h_0] ... sum over +-m
    g = hpx.ring_geometry(nside)
    pix = np.arange(hpx.nside2npix(nside))
    _, phi = hpx.pix2ang_ring(nside, pix)
    expect = np.zeros(hpx.nside2npix(nside))
    for r in range(nr):
        s, n = int(g["start"][r]), int(g["npix"][r])
        ph = phi[s : s + n]
        v = h[r, 0] * np.ones(n, dtype=complex)
        for m in range(1, nm):
            v += h[r, m] * np.exp(1j * m * ph)
            v += np.conj(h[r, m]) * np.exp(-1j * m * ph)
        expect[s : s + n] = v.real
    np.testing.assert_allclose(maps, expect, atol=1e-10)


def test_ring_synthesis_complex():
    nside = 4
    rng = np.random.default_rng(3)
    nr = hpx.nside2nrings(nside)
    nm = 10  # > nph of small rings: exercises alias fold collisions
    hp = rng.normal(size=(nr, nm)) + 1j * rng.normal(size=(nr, nm))
    hn = rng.normal(size=(nr, nm)) + 1j * rng.normal(size=(nr, nm))
    maps = np.asarray(
        ringfft.ring_synthesis(hp, hn, nside, real_output=False)
    )
    g = hpx.ring_geometry(nside)
    pix = np.arange(hpx.nside2npix(nside))
    _, phi = hpx.pix2ang_ring(nside, pix)
    expect = np.zeros(hpx.nside2npix(nside), dtype=complex)
    for r in range(nr):
        s, n = int(g["start"][r]), int(g["npix"][r])
        ph = phi[s : s + n]
        v = hp[r, 0] * np.ones(n, dtype=complex)
        for m in range(1, nm):
            v += hp[r, m] * np.exp(1j * m * ph)
            v += hn[r, m] * np.exp(-1j * m * ph)
        expect[s : s + n] = v
    np.testing.assert_allclose(maps, expect, atol=1e-10)


def test_analysis_synthesis_adjointness():
    # <F(v), h> = <v, S(h)> for real maps: analysis and synthesis are
    # adjoint up to the conjugate-fold convention
    nside = 4
    rng = np.random.default_rng(11)
    npix = hpx.nside2npix(nside)
    nm = 6
    nr = hpx.nside2nrings(nside)
    v = rng.normal(size=npix)
    h = rng.normal(size=(nr, nm)) + 1j * rng.normal(size=(nr, nm))
    F, _ = ringfft.ring_analysis(v, nside, nm)
    lhs = np.real(np.sum(np.asarray(F) * np.conj(np.asarray(h)) * [1] ))
    # build the real-part pairing weight: m=0 once, m>0 twice
    w = np.ones(nm)
    w[1:] = 1.0
    Fh = np.asarray(F)
    lhs = np.real(np.vdot(h[:, 0], Fh[:, 0]) + 2 * np.real(np.vdot(h[:, 1:], Fh[:, 1:])))
    s = np.asarray(ringfft.ring_synthesis(h, None, nside))
    rhs_full = float(np.dot(v, s))
    # conjugate pairing: <v, S(h)> = sum_p v_p (h_0 + 2Re sum h_m e^{im phi})
    # equals Re[vdot(h_0, F_0)] + 2 Re[vdot(h_m, F_m)]
    np.testing.assert_allclose(lhs, rhs_full, rtol=1e-10)


def test_ring_analysis_weight_fusion_matches_post_multiply():
    """weight= folded into the phase planes == separate F * w pass."""
    import numpy as np

    from heracles_tpu.ops import ringfft

    nside, nm = 16, 25
    rng = np.random.default_rng(8)
    npix = 12 * nside * nside
    w = rng.uniform(0.5, 1.5, size=4 * nside - 1)

    maps = rng.normal(size=npix)
    F0, _ = ringfft.ring_analysis(maps, nside, nm)
    Fw, _ = ringfft.ring_analysis(maps, nside, nm, weight=w)
    np.testing.assert_allclose(
        np.asarray(Fw), np.asarray(F0) * w[:, None], rtol=1e-12, atol=1e-12
    )

    u = maps + 1j * rng.normal(size=npix)
    F0, N0 = ringfft.ring_analysis(u, nside, nm)
    Fw, Nw = ringfft.ring_analysis(u, nside, nm, weight=w)
    np.testing.assert_allclose(
        np.asarray(Fw), np.asarray(F0) * w[:, None], rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(Nw), np.asarray(N0) * w[:, None], rtol=1e-12, atol=1e-12
    )
