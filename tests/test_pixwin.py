"""Exact pixel window: scipy oracle, congruence classes, convergence."""

import numpy as np
import pytest
from scipy.special import sph_harm_y

from heracles_tpu import healpix as hpx
from heracles_tpu.ops import pixwin, sht, wigner


def test_rep_powers_match_scipy_definition():
    """Scalar power sums equal the brute-force |int_p Y*_lm|^2 sums."""
    nside, f, lmax = 8, 4, 8
    pix = np.array([0, 7, 100, 400])  # cap, cap, shoulder-ish, belt
    th, ph = pixwin._children_angles(nside, pix, f)
    powers = pixwin._rep_powers(th, ph, lmax, pol=False)

    v = 1.0 / (f * f)
    for r in range(len(pix)):
        for l in (0, 1, 4, 8):
            tot = 0.0
            for m in range(-l, l + 1):
                w = np.sum(v * np.conj(sph_harm_y(l, m, th[r], ph[r])))
                tot += abs(w) ** 2
            np.testing.assert_allclose(powers[r, 0, l], tot, rtol=1e-10)


def test_power_scan_matches_analysis_scan():
    """The fused power reduction equals |alm|^2 of the plain scan."""
    nside, f, lmax = 8, 4, 8
    pix = np.array([3, 300])
    th, ph = pixwin._children_angles(nside, pix, f)
    powers = pixwin._rep_powers(th, ph, lmax, pol=True)

    import jax.numpy as jnp

    ms, ns, weights = pixwin._lane_setup(lmax, True)
    for r in range(len(pix)):
        x = np.cos(th[r])
        logch = np.log(np.cos(th[r] / 2))
        logsh = np.log(np.sin(th[r] / 2))
        Fw = (1.0 / th.shape[-1]) * np.exp(-1j * ms[None, :] * ph[r][:, None])
        alm = np.asarray(
            wigner.lambda_analysis_scan(
                jnp.asarray(ms), jnp.asarray(ns), jnp.asarray(x),
                jnp.asarray(logch), jnp.asarray(logsh), lmax, jnp.asarray(Fw),
            )
        )
        # alm: (lmax+1, lanes); want: (K, lmax+1)
        want = np.einsum("kn,ln->kl", weights, np.abs(alm) ** 2)
        np.testing.assert_allclose(powers[r], want, rtol=1e-10, atol=1e-14)


def test_congruence_classes_equal_all_pixel_average():
    nside, f, lmax = 8, 4, 8
    pix, wts = pixwin._pixel_classes(nside, cap_samples=64)
    th, ph = pixwin._children_angles(nside, pix, f)
    powers = pixwin._rep_powers(th, ph, lmax, False)
    avg = np.einsum("r,rkl->kl", wts / (12 * nside**2), powers)

    pall = np.arange(12 * nside * nside)
    tha, pha = pixwin._children_angles(nside, pall, f)
    pa = pixwin._rep_powers(tha, pha, lmax, False)
    np.testing.assert_allclose(avg, pa.mean(axis=0), rtol=1e-12, atol=1e-15)


def test_window_factor_convergence(tmp_path, monkeypatch):
    monkeypatch.setenv("HERACLES_TPU_CACHE", str(tmp_path))
    nside, lmax = 8, 16
    w8 = pixwin.pixel_window_exact(nside, lmax, factor=8)
    w16 = pixwin.pixel_window_exact(nside, lmax, factor=16)
    assert w8[0] == pytest.approx(1.0, abs=1e-12)
    assert np.all(np.diff(w8) < 0)
    assert np.max(np.abs(w8 - w16)) < 2e-4


def test_polarization_window(tmp_path, monkeypatch):
    monkeypatch.setenv("HERACLES_TPU_CACHE", str(tmp_path))
    nside, lmax = 8, 16
    tp = pixwin.pixel_window_exact(nside, lmax, pol=True, factor=8)
    assert tp.shape == (2, lmax + 1)
    assert np.all(tp[1, :2] == 0)
    # P and T windows are close but not equal; P slightly lower
    ratio = tp[1, 2:] / tp[0, 2:]
    assert np.all(ratio < 1.0) and np.all(ratio > 0.99)


def test_packaged_production_windows(tmp_path, monkeypatch):
    """Exact polarized windows ship for nside 512..4096 (north star incl.).

    The reference deconvolves with healpy's exact tables at every nside
    (healpy.py:170-196); these packaged tables make method="auto" exact
    with no cap fallback at production resolutions.
    """
    monkeypatch.setenv("HERACLES_TPU_CACHE", str(tmp_path))  # no user cache
    sht._pixel_window_cached.cache_clear()
    sht._pixwin_resolved_exact.clear()
    for nside in (512, 1024, 2048, 4096):
        lmax = min(3 * nside // 2, 3000)
        if nside >= 2048 and pixwin.find_cached(nside, lmax, True) is None:
            # the >=2048 tables build on the TPU (chunk-checkpointed
            # queue); enforce them as soon as they are packaged
            pytest.skip(f"exact pixel window table for nside={nside} "
                        "not packaged yet (TPU build queued)")
        assert pixwin.find_cached(nside, lmax, True) is not None, nside
        tp = sht.pixel_window(nside, lmax, pol=True)
        assert tp.shape == (2, lmax + 1)
        assert tp[0, 0] == pytest.approx(1.0, abs=1e-9)
        # non-increasing (flat runs where the true decrement is below
        # the ~1e-7 build noise are monotone-projected at build time)
        assert np.all(np.diff(tp[0]) <= 0) and np.all(tp[0] <= 1.0)
        assert tp[0, -1] < 0.999  # and it really decreases overall
        # exact windows differ measurably from the cap approximation
        cap = sht.pixel_window(nside, lmax, method="cap")
        assert np.max(np.abs(tp[0] - cap)) > 1e-4
    sht._pixel_window_cached.cache_clear()
    sht._pixwin_resolved_exact.clear()


def test_sht_pixel_window_dispatch(tmp_path, monkeypatch):
    monkeypatch.setenv("HERACLES_TPU_CACHE", str(tmp_path))
    sht._pixel_window_cached.cache_clear()
    # small nside -> auto=exact, pol cache reused for scalar lookups
    w = sht.pixel_window(16, 24)
    tp = sht.pixel_window(16, 24, pol=True)
    assert w.shape == (25,) and tp.shape == (2, 25)
    np.testing.assert_allclose(tp[0], w, rtol=1e-8)
    cap = sht.pixel_window(16, 24, method="cap")
    assert np.max(np.abs(cap - w)) < 2e-2  # cap approx is percent-level
    sht._pixel_window_cached.cache_clear()
