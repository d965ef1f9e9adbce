"""SHT validation: Wigner-d oracle, scipy Ylm oracle, round trips, spin-2."""

import os
import math

import numpy as np
import pytest

from heracles_tpu import healpix as hpx
from heracles_tpu.ops import sht, wigner


def wigner_d_brute(j, m, n, beta):
    """Wigner (small) d-matrix element by the exact sum formula (oracle)."""
    total = 0.0
    for k in range(max(0, m - n), min(j + m, j - n) + 1):
        num = math.sqrt(
            math.factorial(j + m)
            * math.factorial(j - m)
            * math.factorial(j + n)
            * math.factorial(j - n)
        )
        den = (
            math.factorial(k)
            * math.factorial(j + m - k)
            * math.factorial(j - n - k)
            * math.factorial(n - m + k)
        )
        total += (
            (-1.0) ** k
            * num
            / den
            * math.cos(beta / 2) ** (2 * j + m - n - 2 * k)
            * math.sin(beta / 2) ** (n - m + 2 * k)
        )
    return total


def slm_brute(ell, m, s, theta):
    """(-1)^m sqrt((2l+1)/4pi) d^l_{-m,-s}(theta) — the engine's target."""
    return (
        (-1.0) ** m
        * math.sqrt((2 * ell + 1) / (4 * np.pi))
        * wigner_d_brute(ell, -m, -s, theta)
    )


def lambda_table(ms, ns, thetas, lmax):
    """Extract slm(l, m; theta) from the scan engine via one-hot synthesis."""
    import jax.numpy as jnp

    x = jnp.asarray(np.cos(thetas))
    logch = jnp.asarray(np.log(np.cos(thetas / 2)))
    logsh = jnp.asarray(np.log(np.sin(thetas / 2)))
    nlanes = len(ms)
    out = np.empty((lmax + 1, len(thetas), nlanes))
    for ell in range(lmax + 1):
        alm = jnp.zeros((lmax + 1, nlanes), dtype=jnp.complex128)
        alm = alm.at[ell, :].set(1.0)
        G = wigner.lambda_synthesis_scan(
            jnp.asarray(ms), jnp.asarray(ns), x, logch, logsh, lmax, alm
        )
        out[ell] = np.asarray(G.real)
    return out


@pytest.mark.parametrize("spin", [0, 2])
def test_lambda_vs_brute_force(spin):
    lmax = 10
    thetas = np.array([0.3, 1.1, np.pi / 2, 2.4, np.pi - 0.2])
    ms = list(range(lmax + 1))
    tab = lambda_table(ms, [spin] * len(ms), thetas, lmax)
    for ell in range(lmax + 1):
        for im, m in enumerate(ms):
            for it, th in enumerate(thetas):
                want = slm_brute(ell, m, spin, th) if ell >= max(m, spin) else 0.0
                got = tab[ell, it, im]
                assert got == pytest.approx(want, abs=1e-12), (ell, m, th)


def test_lambda_negative_spin_column():
    # n = -2 lanes (used for a_{+2} analysis)
    lmax = 8
    thetas = np.array([0.7, 2.0])
    ms = [0, 1, 2, 5]
    tab = lambda_table(ms, [-2] * len(ms), thetas, lmax)
    for ell in range(lmax + 1):
        for im, m in enumerate(ms):
            for it, th in enumerate(thetas):
                want = slm_brute(ell, m, -2, th) if ell >= max(m, 2) else 0.0
                assert tab[ell, it, im] == pytest.approx(want, abs=1e-12)


def test_lambda_scaled_seed_high_m():
    # high m at small theta: seed underflows any unscaled float; the scaled
    # recurrence must still produce the right O(1) values at high ell
    lmax = 400
    m = 380
    theta = 0.15  # sin^380(0.075) ~ 1e-400: underflows even float64
    import jax.numpy as jnp

    x = jnp.asarray(np.array([np.cos(theta)]))
    logch = jnp.asarray(np.array([np.log(np.cos(theta / 2))]))
    logsh = jnp.asarray(np.array([np.log(np.sin(theta / 2))]))
    alm = jnp.zeros((lmax + 1, 1), dtype=jnp.complex128).at[lmax, 0].set(1.0)
    G = wigner.lambda_synthesis_scan(
        jnp.asarray([m]), jnp.asarray([0]), x, logch, logsh, lmax, alm
    )
    got = float(np.asarray(G.real)[0, 0])
    # oracle via scipy's fully normalized spherical harmonic at phi=0
    from scipy.special import sph_harm_y

    want = float(sph_harm_y(lmax, m, theta, 0.0).real)
    assert got == pytest.approx(want, rel=1e-10)


def test_wigner_seed_host_matches_device_seed():
    # host-f64 seed planes (the TPU accuracy path: device f32 log/lgamma
    # carry absolute-error floors) must agree with the f64 device seeds
    # to f32 mantissa accuracy, including pole handling and signs
    import jax.numpy as jnp

    lmax = 50
    theta = np.array([0.0, 0.01, 0.8, np.pi / 2, 2.7, np.pi])
    ms = np.array([0, 1, 5, 30, 50, -3, 7])
    ns = np.array([0, 2, -2, 0, 2, 2, -2])
    mant, k = wigner.wigner_seed_host(ms, ns, theta)
    assert mant.dtype == np.float32 and k.dtype == np.int32
    assert np.all(np.isfinite(mant))  # incl. the exact poles

    # exact poles excluded: the device seed path nans there (0 * log 0),
    # latent only because ring centres never sit exactly on a pole
    inner = slice(1, -1)
    x = jnp.asarray(np.cos(theta[inner]))
    logch = jnp.asarray(np.log(np.cos(theta[inner] / 2)))
    logsh = jnp.asarray(np.log(np.sin(theta[inner] / 2)))
    alm = jnp.zeros((lmax + 1, ms.size), dtype=jnp.complex128)
    alm = alm.at[lmax].set(1.0)
    ref = np.asarray(wigner.lambda_synthesis_scan(
        jnp.asarray(ms), jnp.asarray(ns), x, logch, logsh, lmax, alm
    ).real)
    got = np.asarray(wigner.lambda_synthesis_scan(
        jnp.asarray(ms), jnp.asarray(ns), x, logch, logsh, lmax, alm,
        seed=(jnp.asarray(mant[:, inner]), jnp.asarray(k[:, inner])),
    ).real)
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=2e-7 * scale)


def test_map2alm_matches_dense_adjoint():
    """The fast path must equal the dense a_lm = sum_p w_p f_p Ylm*(p).

    This validates the full engine (ring FFT + Wigner scan + weights)
    against scipy spherical harmonics, including the HEALPix m-aliasing
    that is a property of the grid itself.
    """
    from scipy.special import sph_harm_y

    nside, lmax = 8, 10
    rng = np.random.default_rng(5)
    maps = rng.normal(size=hpx.nside2npix(nside))
    alm = np.asarray(sht.map2alm(maps, lmax=lmax))
    pix = np.arange(hpx.nside2npix(nside))
    theta, phi = hpx.pix2ang_ring(nside, pix)
    g = hpx.ring_geometry(nside)
    w = np.repeat(sht.ring_weights(nside), g["npix"])
    k = 0
    for m in range(lmax + 1):
        for ell in range(m, lmax + 1):
            dense = np.sum(w * maps * np.conj(sph_harm_y(ell, m, theta, phi)))
            assert alm[k] == pytest.approx(dense, abs=1e-12), (ell, m)
            k += 1


def test_map2alm_constant_map():
    nside = 8
    maps = np.full(hpx.nside2npix(nside), 2.5)
    alm = np.asarray(sht.map2alm(maps, lmax=8, iterations=3))
    want = np.zeros(sht.alm_size(8), dtype=complex)
    want[0] = 2.5 * np.sqrt(4 * np.pi)
    np.testing.assert_allclose(alm, want, atol=1e-7)


def test_map2alm_y10():
    nside = 16
    pix = np.arange(hpx.nside2npix(nside))
    theta, _ = hpx.pix2ang_ring(nside, pix)
    maps = np.sqrt(3 / (4 * np.pi)) * np.cos(theta)
    alm = np.asarray(sht.map2alm(maps, lmax=4))
    want = np.zeros(sht.alm_size(4), dtype=complex)
    want[1] = 1.0  # (l=1, m=0)
    np.testing.assert_allclose(alm, want, atol=1e-7)


@pytest.mark.parametrize("nside,lmax", [(8, 8), (16, 20)])
def test_spin0_roundtrip(nside, lmax):
    rng = np.random.default_rng(42)
    nlm = sht.alm_size(lmax)
    alm = rng.normal(size=nlm) + 1j * rng.normal(size=nlm)
    alm[: lmax + 1] = alm[: lmax + 1].real  # m=0 must be real
    maps = np.asarray(sht.alm2map(alm, nside, lmax=lmax))
    back = np.asarray(sht.map2alm(maps, lmax=lmax, iterations=3))
    np.testing.assert_allclose(back, alm, atol=1e-6)


def test_spin0_batched():
    nside, lmax = 8, 8
    rng = np.random.default_rng(0)
    nlm = sht.alm_size(lmax)
    alm = rng.normal(size=(3, nlm)) + 1j * rng.normal(size=(3, nlm))
    alm[:, : lmax + 1] = alm[:, : lmax + 1].real
    maps = np.asarray(sht.alm2map(alm, nside, lmax=lmax))
    assert maps.shape == (3, hpx.nside2npix(nside))
    back = np.asarray(sht.map2alm(maps, lmax=lmax))
    # each batch row independently equals the unbatched transform
    one = np.asarray(sht.map2alm(maps[1], lmax=lmax))
    np.testing.assert_allclose(back[1], one, atol=1e-12)


@pytest.mark.parametrize("nside,lmax", [(8, 8), (16, 20)])
def test_spin2_roundtrip(nside, lmax):
    rng = np.random.default_rng(7)
    nlm = sht.alm_size(lmax)
    alm = rng.normal(size=(2, nlm)) + 1j * rng.normal(size=(2, nlm))
    alm[:, : lmax + 1] = alm[:, : lmax + 1].real
    # l < 2 modes of spin-2 fields do not exist
    # (packed index = m*(2*lmax+1-m)//2 + l)
    for m in range(2):
        start = m * (2 * lmax + 1 - m) // 2
        for ell in range(m, min(2, lmax + 1)):
            alm[:, start + ell] = 0
    maps = np.asarray(sht.alm2map(alm, nside, lmax=lmax, spin=2))
    assert maps.shape == (2, hpx.nside2npix(nside))
    back = np.asarray(sht.map2alm(maps, lmax=lmax, spin=2, iterations=3))
    np.testing.assert_allclose(back, alm, atol=2e-6)


def test_spin2_pure_e_produces_real_symmetric_qu():
    # a pure-E, m=0 mode gives U = 0 everywhere (standard convention check)
    nside, lmax = 8, 8
    alm = np.zeros((2, sht.alm_size(lmax)), dtype=complex)
    alm[0, 4] = 1.0  # E mode, (l=4, m=0)
    qu = np.asarray(sht.alm2map(alm, nside, lmax=lmax, spin=2))
    np.testing.assert_allclose(qu[1], 0.0, atol=1e-10)
    assert np.max(np.abs(qu[0])) > 1e-3


def test_ring_weights_integrate_legendre():
    nside = 8
    w = sht.ring_weights(nside)
    g = hpx.ring_geometry(nside)
    for ell in range(0, 3 * nside + 1):
        P = np.polynomial.legendre.Legendre.basis(ell)(g["z"])
        total = np.sum(w * g["npix"] * P)
        want = 4 * np.pi if ell == 0 else 0.0
        assert total == pytest.approx(want, abs=1e-10)


def test_pixel_window_monotone():
    pw = sht.pixel_window(16, 32)
    assert pw[0] == pytest.approx(1.0, abs=1e-12)
    assert np.all(np.diff(pw) < 0)
    assert pw[-1] > 0.5


@pytest.mark.parametrize("lmax,mmax", [(12, 12), (12, 7)])
def test_pack_unpack_jax_matches_numpy(lmax, mmax):
    """The scatter/gather-free device layout transforms == the host path."""
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    nlm = sht.alm_size(lmax, mmax)
    packed = rng.normal(size=(3, nlm)) + 1j * rng.normal(size=(3, nlm))

    rect_np = sht.unpack_alm(packed, lmax, mmax)
    rect_jx = np.asarray(sht.unpack_alm(jnp.asarray(packed), lmax, mmax))
    np.testing.assert_allclose(rect_jx, rect_np, rtol=0, atol=0)

    back_np = sht.pack_alm(rect_np, lmax, mmax)
    back_jx = np.asarray(sht.pack_alm(jnp.asarray(rect_np), lmax, mmax))
    np.testing.assert_allclose(back_jx, back_np, rtol=0, atol=0)
    np.testing.assert_allclose(back_np, packed, rtol=0, atol=0)


def test_dd_high_accuracy_mode():
    """Double-single (dd) f32 recurrence: ~100x below plain-f32 error.

    The dd mode (map2alm/alm2map ``dd=True``; HERACLES_TPU_SHT_DD env)
    carries the Wigner recurrence in renormalised (hi, lo) f32 pairs,
    removing the top-band recurrence rounding that dominates the plain
    f32 error budget.  Truth is the engine's own f64 path.
    """
    import jax.numpy as jnp

    nside, lmax = 64, 128
    rng = np.random.default_rng(7)
    nlm = sht.alm_size(lmax)
    alm_t = rng.normal(size=nlm) + 1j * rng.normal(size=nlm)
    alm_t[: lmax + 1] = alm_t[: lmax + 1].real
    alm_t = alm_t.astype(np.complex128)

    m64 = np.asarray(sht.alm2map(jnp.asarray(alm_t), nside, lmax=lmax))
    a64 = np.asarray(sht.map2alm(jnp.asarray(m64), lmax=lmax))
    scale = np.abs(a64).max()

    m32 = jnp.asarray(m64.astype(np.float32))
    err = {
        flag: np.abs(
            np.asarray(sht.map2alm(m32, lmax=lmax, dd=flag)) - a64
        ).max()
        / scale
        for flag in (False, True)
    }
    assert err[True] < 2e-6
    assert err[True] < err[False] / 5

    # synthesis branch
    s64 = m64
    sdd = np.asarray(
        sht.alm2map(jnp.asarray(alm_t.astype(np.complex64)), nside,
                    lmax=lmax, dd=True)
    )
    assert np.abs(sdd - s64).max() / np.abs(s64).max() < 2e-6

    # spin-2 analysis branch
    alm2 = np.stack([alm_t, 0.5 * alm_t[::-1]])
    for m in range(2):
        start = m * (2 * lmax + 1 - m) // 2
        alm2[:, start + m : start + max(m, 2)] = 0
    p64 = np.asarray(sht.alm2map(jnp.asarray(alm2), nside, lmax=lmax, spin=2))
    qa64 = np.asarray(sht.map2alm(jnp.asarray(p64), lmax=lmax, spin=2))
    qadd = np.asarray(
        sht.map2alm(jnp.asarray(p64.astype(np.float32)), lmax=lmax, spin=2,
                    dd=True)
    )
    assert np.abs(qadd - qa64).max() / np.abs(qa64).max() < 2e-6


def test_comp_mode_plumbing():
    """dd="comp" flows through map2alm/alm2map and _use_dd.

    On the CPU jnp-scan fallback comp maps to full dd, so the result
    must match dd=True and beat plain f32 against the f64 truth.
    """
    import jax.numpy as jnp

    nside, lmax = 32, 48
    rng = np.random.default_rng(9)
    nlm = sht.alm_size(lmax)
    alm_t = rng.normal(size=nlm) + 1j * rng.normal(size=nlm)
    alm_t[: lmax + 1] = alm_t[: lmax + 1].real
    m64 = np.asarray(sht.alm2map(jnp.asarray(alm_t), nside, lmax=lmax))
    a64 = np.asarray(sht.map2alm(jnp.asarray(m64), lmax=lmax))
    scale = np.abs(a64).max()

    m32 = jnp.asarray(m64.astype(np.float32))
    a_comp = np.asarray(sht.map2alm(m32, lmax=lmax, dd="comp"))
    a_dd = np.asarray(sht.map2alm(m32, lmax=lmax, dd=True))
    np.testing.assert_allclose(a_comp, a_dd, rtol=0, atol=0)
    assert np.abs(a_comp - a64).max() / scale < 1e-5

    os.environ["HERACLES_TPU_SHT_DD"] = "comp"
    try:
        assert sht._use_dd() == "comp"
    finally:
        del os.environ["HERACLES_TPU_SHT_DD"]
    os.environ["HERACLES_TPU_SHT_DD"] = "accum"
    try:
        assert sht._use_dd() == "comp"
    finally:
        del os.environ["HERACLES_TPU_SHT_DD"]
