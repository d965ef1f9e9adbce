"""Pallas analysis kernel vs the jnp folded scan (interpret mode on CPU)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from heracles_tpu.ops import sht, wigner
from heracles_tpu.ops.pallas_sht import analysis_spin0_folded


def test_pallas_matches_jnp_folded():
    nside, lmax = 16, 24
    rng = np.random.default_rng(0)
    nhalf = 2 * nside
    nm_pad = 128
    Fe = (rng.normal(size=(nhalf, nm_pad))
          + 1j * rng.normal(size=(nhalf, nm_pad))).astype(np.complex64)
    Fo = (rng.normal(size=(nhalf, nm_pad))
          + 1j * rng.normal(size=(nhalf, nm_pad))).astype(np.complex64)
    x, logch, logsh = sht._geom_arrays(nside, "float32")
    x, logch, logsh = x[:nhalf], logch[:nhalf], logsh[:nhalf]

    got = np.asarray(
        analysis_spin0_folded(
            jnp.asarray(Fe), jnp.asarray(Fo), jnp.asarray(x),
            jnp.asarray(logch), jnp.asarray(logsh), lmax,
            ring_block=16, interpret=True,
        )
    )

    ms = jnp.arange(nm_pad, dtype=jnp.int32)
    ns = jnp.zeros(nm_pad, jnp.int32)
    # the jnp scan takes (FN, FS) and forms Fe/Fo = FN +- FS internally;
    # the kernel takes Fe/Fo directly
    FN = (Fe + Fo) / 2
    FS = (Fe - Fo) / 2
    want = np.asarray(
        wigner.lambda_analysis_scan_folded(
            ms, ns, jnp.asarray(x), jnp.asarray(logch), jnp.asarray(logsh),
            lmax, jnp.asarray(FN), jnp.asarray(FS), cross=False,
        )
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=2e-4)


def test_pallas_high_m_scaling():
    """Scaled seeds: high m at small theta must not underflow."""
    nside, lmax = 32, 48
    rng = np.random.default_rng(1)
    nhalf = 2 * nside
    nm_pad = 128
    Fe = (rng.normal(size=(nhalf, nm_pad))).astype(np.complex64)
    Fo = np.zeros_like(Fe)
    x, logch, logsh = sht._geom_arrays(nside, "float32")
    x, logch, logsh = x[:nhalf], logch[:nhalf], logsh[:nhalf]
    got = np.asarray(
        analysis_spin0_folded(
            jnp.asarray(Fe), jnp.asarray(Fo), jnp.asarray(x),
            jnp.asarray(logch), jnp.asarray(logsh), lmax,
            ring_block=32, interpret=True,
        )
    )
    assert np.all(np.isfinite(got))
    # orders beyond lmax contribute nothing (lam = 0 for l < m)
    np.testing.assert_allclose(got[:, lmax + 1 :], 0.0, atol=1e-6)


def test_pallas_pair_matches_jnp_cross():
    """The cross-mode (spin-pair) kernel vs the jnp cross scan."""
    from heracles_tpu.ops.pallas_sht import analysis_pair_folded

    nside, lmax, spin = 16, 24, 2
    rng = np.random.default_rng(3)
    nhalf = 2 * nside
    nm_pad = 128

    def rand():
        return (rng.normal(size=(nhalf, nm_pad))
                + 1j * rng.normal(size=(nhalf, nm_pad))).astype(np.complex64)

    FNp, Sp, FNm, Sm = rand(), rand(), rand(), rand()
    x, logch, logsh = sht._geom_arrays(nside, "float32")
    x, logch, logsh = x[:nhalf], logch[:nhalf], logsh[:nhalf]

    ap, am = analysis_pair_folded(
        jnp.asarray(FNp), jnp.asarray(Sp), jnp.asarray(FNm), jnp.asarray(Sm),
        jnp.asarray(x), jnp.asarray(logch), jnp.asarray(logsh), lmax, spin,
        ring_block=16, interpret=True,
    )

    # jnp reference: cross scan with lanes [ns=+s block | ns=-s block],
    # FN = [FNp, FNm], FS such that FS[1] = Sp, FS[0] = Sm
    ms = jnp.tile(jnp.arange(nm_pad, dtype=jnp.int32), 2)
    nsv = jnp.repeat(jnp.asarray([spin, -spin], jnp.int32), nm_pad)
    FN_l = jnp.concatenate([jnp.asarray(FNp), jnp.asarray(FNm)], axis=-1)
    FS_l = jnp.concatenate([jnp.asarray(Sm), jnp.asarray(Sp)], axis=-1)
    want = np.asarray(
        wigner.lambda_analysis_scan_folded(
            ms, nsv, jnp.asarray(x), jnp.asarray(logch), jnp.asarray(logsh),
            lmax, FN_l, FS_l, cross=True,
        )
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(
        np.asarray(ap), want[:, :nm_pad], atol=3e-5 * scale, rtol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(am), want[:, nm_pad:], atol=3e-5 * scale, rtol=3e-4
    )


def test_pallas_batched_analysis_matches_unbatched():
    """Leading batch dims run the same program per element."""
    nside, lmax = 16, 24
    rng = np.random.default_rng(5)
    nhalf = 2 * nside
    nm_pad = 128
    Fe = (rng.normal(size=(3, nhalf, nm_pad))
          + 1j * rng.normal(size=(3, nhalf, nm_pad))).astype(np.complex64)
    Fo = (rng.normal(size=(3, nhalf, nm_pad))
          + 1j * rng.normal(size=(3, nhalf, nm_pad))).astype(np.complex64)
    x, logch, logsh = sht._geom_arrays(nside, "float32")
    x, logch, logsh = x[:nhalf], logch[:nhalf], logsh[:nhalf]

    got = np.asarray(
        analysis_spin0_folded(
            jnp.asarray(Fe), jnp.asarray(Fo), jnp.asarray(x),
            jnp.asarray(logch), jnp.asarray(logsh), lmax,
            ring_block=16, interpret=True,
        )
    )
    assert got.shape == (3, lmax + 1, nm_pad)
    for b in range(3):
        want = np.asarray(
            analysis_spin0_folded(
                jnp.asarray(Fe[b]), jnp.asarray(Fo[b]), jnp.asarray(x),
                jnp.asarray(logch), jnp.asarray(logsh), lmax,
                ring_block=16, interpret=True,
            )
        )
        np.testing.assert_allclose(got[b], want, rtol=1e-6, atol=1e-6)


def test_pallas_nb_grouped_maps_match_nb1():
    """nb maps per program (shared recurrence) == one map per program."""
    from heracles_tpu.ops.pallas_sht import (
        analysis_pair_folded,
        synthesis_pair_folded,
        synthesis_spin0_folded,
    )

    nside, lmax, spin = 16, 24, 2
    rng = np.random.default_rng(11)
    nhalf, nm_pad, B = 2 * nside, 128, 2
    x, logch, logsh = sht._geom_arrays(nside, "float32")
    x, logch, logsh = x[:nhalf], logch[:nhalf], logsh[:nhalf]

    def crand(shape):
        return (rng.normal(size=shape)
                + 1j * rng.normal(size=shape)).astype(np.complex64)

    Fs = [jnp.asarray(crand((B, nhalf, nm_pad))) for _ in range(4)]
    alms = [jnp.asarray(crand((B, lmax + 1, nm_pad))) for _ in range(2)]

    a1 = analysis_spin0_folded(Fs[0], Fs[1], x, logch, logsh, lmax,
                               ring_block=16, nb=1, interpret=True)
    a2 = analysis_spin0_folded(Fs[0], Fs[1], x, logch, logsh, lmax,
                               ring_block=16, nb=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

    p1 = analysis_pair_folded(*Fs, x, logch, logsh, lmax, spin,
                              ring_block=16, nb=1, interpret=True)
    p2 = analysis_pair_folded(*Fs, x, logch, logsh, lmax, spin,
                              ring_block=16, nb=2, interpret=True)
    for u, v in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))

    s1 = synthesis_spin0_folded(alms[0], x, logch, logsh, lmax,
                                ring_block=16, nb=1, interpret=True)
    s2 = synthesis_spin0_folded(alms[0], x, logch, logsh, lmax,
                                ring_block=16, nb=2, interpret=True)
    for u, v in zip(s1, s2):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))

    q1 = synthesis_pair_folded(alms[0], alms[1], x, logch, logsh, lmax,
                               spin, ring_block=16, nb=1, interpret=True)
    q2 = synthesis_pair_folded(alms[0], alms[1], x, logch, logsh, lmax,
                               spin, ring_block=16, nb=2, interpret=True)
    for u, v in zip(q1, q2):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_comp_seed_frac_high_m():
    """Compensated seed exponents keep f32 precision at m ~ 3000.

    The seed log-magnitude is a near-cancelling sum of O(m*ln4) ~ 4000
    terms; plain f32 evaluation loses ~ulp(4000) ~ 5e-4 of it, the
    hi/lo path keeps the *result* accurate to f32 eps.
    """
    from scipy.special import gammaln

    from heracles_tpu.ops.pallas_sht import _comp_seed_frac

    m = 3000
    logc64 = 0.5 * (gammaln(2 * m + 1) - 2 * gammaln(m + 1))
    # logsum values in the region where the seed actually contributes
    logsum64 = np.linspace(-1.5, -1.3, 64) - logc64 / m + (-1.386 + logc64 / m)
    logsum64 = np.linspace(-logc64 / m - 0.02, -logc64 / m + 0.02, 64)

    def split(a):
        hi = np.float32(a)
        return hi, np.float32(np.float64(a) - np.float64(hi))

    lc_hi, lc_lo = split(logc64)
    ls_hi = logsum64.astype(np.float32)
    ls_lo = (logsum64 - ls_hi.astype(np.float64)).astype(np.float32)

    frac, k0 = _comp_seed_frac(
        jnp.asarray([lc_hi]), jnp.asarray([lc_lo]),
        [(jnp.float32(m), jnp.asarray(ls_hi), jnp.asarray(ls_lo))],
    )
    got = np.asarray(frac, dtype=np.float64) + np.asarray(k0, np.float64)
    C = np.log(2.0) * 60.0
    want = (logc64 + m * logsum64) / C
    # seed-relative error = C * (exponent error)
    assert np.abs(got - want).max() * C < 1e-5  # ~f32 eps floor
    # hi-only evaluation loses ~ulp(m*ln4) ~ 2e-4 through cancellation
    naive = ((np.float32(lc_hi) + np.float32(m) * ls_hi)
             / np.float32(C)).astype(np.float64)
    assert np.abs(naive - want).max() * C > 5e-5


def test_pallas_points_degenerate_inputs():
    """Fe = Fo = F (and zero southern rows) = the unfolded point scan."""
    from heracles_tpu.ops.pallas_sht import analysis_pair_folded

    lmax, spin, npts = 24, 2, 48
    rng = np.random.default_rng(21)
    nm_pad = 128
    theta = np.arccos(rng.uniform(-1, 1, size=npts)).astype(np.float32)
    x = jnp.asarray(np.cos(theta))
    logch = jnp.asarray(np.log(np.cos(theta / 2)).astype(np.float32))
    logsh = jnp.asarray(np.log(np.sin(theta / 2)).astype(np.float32))

    def rand():
        return (rng.normal(size=(npts, nm_pad))
                + 1j * rng.normal(size=(npts, nm_pad))).astype(np.complex64)

    ms = jnp.arange(nm_pad, dtype=jnp.int32)

    # spin 0: Fe = Fo = F
    F = rand()
    got = np.asarray(analysis_spin0_folded(
        jnp.asarray(F), jnp.asarray(F), x, logch, logsh, lmax,
        ring_block=16, interpret=True,
    ))
    want = np.asarray(wigner.lambda_analysis_scan(
        ms, jnp.zeros(nm_pad, jnp.int32), x, logch, logsh, lmax,
        jnp.asarray(F),
    ))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=2e-4)

    # spin pair: zero southern rows decouple the +-s columns
    Fp, Fm = rand(), rand()
    zero = jnp.zeros_like(jnp.asarray(Fp))
    ap, am = analysis_pair_folded(
        jnp.asarray(Fp), zero, jnp.asarray(Fm), zero, x, logch, logsh,
        lmax, spin, ring_block=16, interpret=True,
    )
    ms2 = jnp.tile(ms, 2)
    ns2 = jnp.repeat(jnp.asarray([spin, -spin], jnp.int32), nm_pad)
    want2 = np.asarray(wigner.lambda_analysis_scan(
        ms2, ns2, x, logch, logsh, lmax,
        jnp.concatenate([jnp.asarray(Fp), jnp.asarray(Fm)], axis=-1),
    ))
    scale2 = np.abs(want2).max()
    np.testing.assert_allclose(
        np.asarray(ap), want2[:, :nm_pad], atol=3e-5 * scale2, rtol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(am), want2[:, nm_pad:], atol=3e-5 * scale2, rtol=3e-4
    )


def test_pallas_pair_synthesis_matches_jnp_cross():
    """The spin-pair synthesis kernel vs the jnp cross scan (batched)."""
    from heracles_tpu.ops.pallas_sht import synthesis_pair_folded

    nside, lmax, spin = 16, 24, 2
    rng = np.random.default_rng(11)
    nhalf = 2 * nside
    nm_pad = 128

    def rand():
        return (rng.normal(size=(2, lmax + 1, nm_pad))
                + 1j * rng.normal(size=(2, lmax + 1, nm_pad))
                ).astype(np.complex64)

    ap, am = rand(), rand()
    x, logch, logsh = sht._geom_arrays(nside, "float32")
    x, logch, logsh = x[:nhalf], logch[:nhalf], logsh[:nhalf]

    GNp, GSp, GNm, GSm = synthesis_pair_folded(
        jnp.asarray(ap), jnp.asarray(am), jnp.asarray(x),
        jnp.asarray(logch), jnp.asarray(logsh), lmax, spin,
        ring_block=16, interpret=True,
    )

    # jnp reference: cross scan with lanes [ns=+s block | ns=-s block]
    ms = jnp.tile(jnp.arange(nm_pad, dtype=jnp.int32), 2)
    nsv = jnp.repeat(jnp.asarray([spin, -spin], jnp.int32), nm_pad)
    alm_l = jnp.concatenate([jnp.asarray(ap), jnp.asarray(am)], axis=-1)
    wantN, wantS = wigner.lambda_synthesis_scan_folded(
        ms, nsv, jnp.asarray(x), jnp.asarray(logch), jnp.asarray(logsh),
        lmax, alm_l, cross=True,
    )
    wantN = np.asarray(wantN)
    wantS = np.asarray(wantS)
    scale = np.abs(wantN).max()
    kw = dict(atol=3e-5 * scale, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(GNp), wantN[..., :nm_pad], **kw)
    np.testing.assert_allclose(np.asarray(GNm), wantN[..., nm_pad:], **kw)
    np.testing.assert_allclose(np.asarray(GSp), wantS[..., :nm_pad], **kw)
    np.testing.assert_allclose(np.asarray(GSm), wantS[..., nm_pad:], **kw)


def test_pallas_synthesis_matches_jnp():
    from heracles_tpu.ops.pallas_sht import synthesis_spin0_folded

    nside, lmax = 16, 24
    rng = np.random.default_rng(9)
    nm_pad = 128
    alm = (rng.normal(size=(lmax + 1, nm_pad))
           + 1j * rng.normal(size=(lmax + 1, nm_pad))).astype(np.complex64)
    x, logch, logsh = sht._geom_arrays(nside, "float32")
    nhalf = 2 * nside
    x, logch, logsh = x[:nhalf], logch[:nhalf], logsh[:nhalf]
    GN, GS = synthesis_spin0_folded(
        jnp.asarray(alm), jnp.asarray(x), jnp.asarray(logch),
        jnp.asarray(logsh), lmax, ring_block=16, interpret=True,
    )
    ms = jnp.arange(nm_pad, dtype=jnp.int32)
    nsv = jnp.zeros(nm_pad, jnp.int32)
    wantN, wantS = wigner.lambda_synthesis_scan_folded(
        ms, nsv, jnp.asarray(x), jnp.asarray(logch), jnp.asarray(logsh),
        lmax, jnp.asarray(alm), cross=False,
    )
    scale = float(np.abs(np.asarray(wantN)).max())
    np.testing.assert_allclose(
        np.asarray(GN), np.asarray(wantN), atol=2e-5 * scale, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(GS), np.asarray(wantS), atol=2e-5 * scale, rtol=2e-4
    )


def test_pallas_bulk_and_triangle_regions():
    """Large lmax exercises the triangle skip + deferred-rescale bulk loop.

    With m_chunk=128 and nm_pad=256 the second chunk starts its l-loop at
    blk m0//8 = 16 (triangle skip), and blocks beyond the diagonal margin
    run the stripped bulk step in all four kernels.
    """
    from heracles_tpu.ops.pallas_sht import (
        analysis_pair_folded,
        synthesis_pair_folded,
        synthesis_spin0_folded,
    )

    nside, lmax, spin = 16, 420, 2
    rng = np.random.default_rng(17)
    nhalf = 2 * nside
    nm_pad = 256
    x, logch, logsh = sht._geom_arrays(nside, "float32")
    x, logch, logsh = x[:nhalf], logch[:nhalf], logsh[:nhalf]
    ms = jnp.arange(nm_pad, dtype=jnp.int32)

    def rand(*shape):
        return (rng.normal(size=shape)
                + 1j * rng.normal(size=shape)).astype(np.complex64)

    # spin-0 analysis
    Fe, Fo = rand(nhalf, nm_pad), rand(nhalf, nm_pad)
    got = np.asarray(analysis_spin0_folded(
        jnp.asarray(Fe), jnp.asarray(Fo), jnp.asarray(x),
        jnp.asarray(logch), jnp.asarray(logsh), lmax,
        ring_block=32, interpret=True,
    ))
    want = np.asarray(wigner.lambda_analysis_scan_folded(
        ms, jnp.zeros(nm_pad, jnp.int32), jnp.asarray(x), jnp.asarray(logch),
        jnp.asarray(logsh), lmax, jnp.asarray((Fe + Fo) / 2),
        jnp.asarray((Fe - Fo) / 2), cross=False,
    ))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=4e-5 * scale, rtol=4e-4)

    # spin-0 synthesis
    alm = rand(lmax + 1, nm_pad)
    GN, GS = synthesis_spin0_folded(
        jnp.asarray(alm), jnp.asarray(x), jnp.asarray(logch),
        jnp.asarray(logsh), lmax, ring_block=32, interpret=True,
    )
    wantN, wantS = wigner.lambda_synthesis_scan_folded(
        ms, jnp.zeros(nm_pad, jnp.int32), jnp.asarray(x), jnp.asarray(logch),
        jnp.asarray(logsh), lmax, jnp.asarray(alm), cross=False,
    )
    scale = float(np.abs(np.asarray(wantN)).max())
    np.testing.assert_allclose(
        np.asarray(GN), np.asarray(wantN), atol=4e-5 * scale, rtol=4e-4
    )
    np.testing.assert_allclose(
        np.asarray(GS), np.asarray(wantS), atol=4e-5 * scale, rtol=4e-4
    )

    # pair analysis
    FNp, Sp, FNm, Sm = (rand(nhalf, nm_pad) for _ in range(4))
    ap, am = analysis_pair_folded(
        jnp.asarray(FNp), jnp.asarray(Sp), jnp.asarray(FNm), jnp.asarray(Sm),
        jnp.asarray(x), jnp.asarray(logch), jnp.asarray(logsh), lmax, spin,
        ring_block=32, interpret=True,
    )
    ms2 = jnp.tile(ms, 2)
    ns2 = jnp.repeat(jnp.asarray([spin, -spin], jnp.int32), nm_pad)
    want2 = np.asarray(wigner.lambda_analysis_scan_folded(
        ms2, ns2, jnp.asarray(x), jnp.asarray(logch), jnp.asarray(logsh),
        lmax, jnp.concatenate([jnp.asarray(FNp), jnp.asarray(FNm)], axis=-1),
        jnp.concatenate([jnp.asarray(Sm), jnp.asarray(Sp)], axis=-1),
        cross=True,
    ))
    scale2 = np.abs(want2).max()
    np.testing.assert_allclose(
        np.asarray(ap), want2[:, :nm_pad], atol=5e-5 * scale2, rtol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(am), want2[:, nm_pad:], atol=5e-5 * scale2, rtol=5e-4
    )

    # pair synthesis
    a_p, a_m = rand(lmax + 1, nm_pad), rand(lmax + 1, nm_pad)
    GNp, GSp, GNm, GSm = synthesis_pair_folded(
        jnp.asarray(a_p), jnp.asarray(a_m), jnp.asarray(x),
        jnp.asarray(logch), jnp.asarray(logsh), lmax, spin,
        ring_block=32, interpret=True,
    )
    wantN2, wantS2 = wigner.lambda_synthesis_scan_folded(
        ms2, ns2, jnp.asarray(x), jnp.asarray(logch), jnp.asarray(logsh),
        lmax, jnp.concatenate([jnp.asarray(a_p), jnp.asarray(a_m)], axis=-1),
        cross=True,
    )
    wantN2 = np.asarray(wantN2)
    wantS2 = np.asarray(wantS2)
    scale3 = np.abs(wantN2).max()
    kw = dict(atol=5e-5 * scale3, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(GNp), wantN2[..., :nm_pad], **kw)
    np.testing.assert_allclose(np.asarray(GNm), wantN2[..., nm_pad:], **kw)
    np.testing.assert_allclose(np.asarray(GSp), wantS2[..., :nm_pad], **kw)
    np.testing.assert_allclose(np.asarray(GSm), wantS2[..., nm_pad:], **kw)


def test_pallas_offset_seed_planes_match_full():
    """m-sharded blocks (globally-offset lane orders) == full-run slice.

    The m-sharded multi-chip path feeds each device seed planes whose
    lane orders start at the shard offset; the kernels' triangle-skip /
    bulk boundaries must derive from those orders, not from the local
    program id (which made every shard > 0 run the bulk recurrence at
    l < m -> NaN).  lmax is chosen so the offset chunk has a genuine
    bulk region.
    """
    from heracles_tpu.ops.pallas_sht import (
        analysis_pair_folded,
        pair_seed_planes,
        synthesis_spin0_folded,
        synthesis_pair_folded,
        spin0_seed_planes,
    )

    nside, lmax, spin = 16, 768, 2
    nhalf, nm_full, m0s = 2 * nside, 1024, 256
    blk = slice(m0s, m0s + 128)
    x, logch, logsh = sht._geom_arrays(nside, "float32")
    x, logch, logsh = x[:nhalf], logch[:nhalf], logsh[:nhalf]
    rng = np.random.default_rng(5)

    def crand(shape):
        return (rng.normal(size=shape)
                + 1j * rng.normal(size=shape)).astype(np.complex64)

    Fs = [jnp.asarray(crand((nhalf, nm_full))) for _ in range(4)]
    alms = [jnp.asarray(crand((lmax + 1, nm_full))) for _ in range(2)]
    ms_blk = np.arange(m0s, m0s + 128)

    full = analysis_spin0_folded(Fs[0], Fs[1], x, logch, logsh, lmax,
                                 ring_block=16, interpret=True)
    part = analysis_spin0_folded(
        Fs[0][:, blk], Fs[1][:, blk], x, logch, logsh, lmax,
        seed_planes=spin0_seed_planes(ms_blk), ring_block=16,
        interpret=True,
    )
    assert np.all(np.isfinite(np.asarray(part)))
    np.testing.assert_array_equal(np.asarray(full)[:, blk], np.asarray(part))

    fullp = analysis_pair_folded(*Fs, x, logch, logsh, lmax, spin,
                                 ring_block=16, interpret=True)
    partp = analysis_pair_folded(
        *(F[:, blk] for F in Fs), x, logch, logsh, lmax, spin,
        seed_planes=pair_seed_planes(ms_blk, spin), ring_block=16,
        interpret=True,
    )
    for u, v in zip(fullp, partp):
        assert np.all(np.isfinite(np.asarray(v)))
        np.testing.assert_array_equal(np.asarray(u)[:, blk], np.asarray(v))

    fulls = synthesis_spin0_folded(alms[0], x, logch, logsh, lmax,
                                   ring_block=16, interpret=True)
    parts = synthesis_spin0_folded(
        alms[0][:, blk], x, logch, logsh, lmax,
        seed_planes=spin0_seed_planes(ms_blk), ring_block=16,
        interpret=True,
    )
    for u, v in zip(fulls, parts):
        assert np.all(np.isfinite(np.asarray(v)))
        np.testing.assert_array_equal(np.asarray(u)[:, blk], np.asarray(v))

    fullq = synthesis_pair_folded(alms[0], alms[1], x, logch, logsh,
                                  lmax, spin, ring_block=16, interpret=True)
    partq = synthesis_pair_folded(
        alms[0][:, blk], alms[1][:, blk], x, logch, logsh, lmax, spin,
        seed_planes=pair_seed_planes(ms_blk, spin), ring_block=16,
        interpret=True,
    )
    for u, v in zip(fullq, partq):
        assert np.all(np.isfinite(np.asarray(v)))
        np.testing.assert_array_equal(np.asarray(u)[:, blk], np.asarray(v))


def test_pallas_dd_analysis_beats_plain():
    """dd (double-single) spin-0 analysis kernel: ~f64 accuracy on f32.

    The dd kernel carries the recurrence and seeds as (hi, lo) f32 pairs
    (pallas_sht._kernel_dd); against an f64 jnp-scan truth it must land
    ~100x below the plain kernel's f32 recurrence error.
    """
    nside, lmax = 32, 48
    rng = np.random.default_rng(3)
    nhalf = 2 * nside
    nm_pad = 128
    Fe = (rng.normal(size=(nhalf, nm_pad))
          + 1j * rng.normal(size=(nhalf, nm_pad))).astype(np.complex64)
    Fo = (rng.normal(size=(nhalf, nm_pad))
          + 1j * rng.normal(size=(nhalf, nm_pad))).astype(np.complex64)
    x64, logch64, logsh64 = sht._geom_arrays(nside, "float64")
    x64, logch64, logsh64 = x64[:nhalf], logch64[:nhalf], logsh64[:nhalf]
    x = x64.astype(np.float32)
    x_lo = (x64 - x.astype(np.float64)).astype(np.float32)
    logch = logch64.astype(np.float32)
    logch_lo = (logch64 - logch.astype(np.float64)).astype(np.float32)
    logsh = logsh64.astype(np.float32)
    logsh_lo = (logsh64 - logsh.astype(np.float64)).astype(np.float32)

    ms = jnp.arange(nm_pad, dtype=jnp.int32)
    ns = jnp.zeros(nm_pad, jnp.int32)
    FN = ((Fe + Fo) / 2).astype(np.complex128)
    FS = ((Fe - Fo) / 2).astype(np.complex128)
    want = np.asarray(
        wigner.lambda_analysis_scan_folded(
            ms, ns, jnp.asarray(x64), jnp.asarray(logch64),
            jnp.asarray(logsh64), lmax, jnp.asarray(FN), jnp.asarray(FS),
            cross=False,
        )
    )
    kw = dict(logch_lo=jnp.asarray(logch_lo), logsh_lo=jnp.asarray(logsh_lo),
              ring_block=32, interpret=True)
    got_dd = np.asarray(
        analysis_spin0_folded(
            jnp.asarray(Fe), jnp.asarray(Fo), jnp.asarray(x),
            jnp.asarray(logch), jnp.asarray(logsh), lmax,
            dd=True, x_lo=jnp.asarray(x_lo), **kw,
        )
    )
    got_plain = np.asarray(
        analysis_spin0_folded(
            jnp.asarray(Fe), jnp.asarray(Fo), jnp.asarray(x),
            jnp.asarray(logch), jnp.asarray(logsh), lmax, **kw,
        )
    )
    scale = np.abs(want).max()
    err_dd = np.abs(got_dd - want).max() / scale
    err_plain = np.abs(got_plain - want).max() / scale
    assert err_dd < 5e-7, err_dd
    assert err_dd < err_plain / 10


def test_pallas_dd_pair_beats_plain():
    """dd spin-pair analysis kernel: ~f64 accuracy on f32 inputs.

    Both branch recurrences carry (hi, lo) pairs (_pair_kernel_dd);
    against an f64 jnp cross-scan truth the dd kernel must land well
    below the plain pair kernel's f32 recurrence error.
    """
    from heracles_tpu.ops.pallas_sht import analysis_pair_folded

    nside, lmax, spin = 32, 48, 2
    rng = np.random.default_rng(5)
    nhalf = 2 * nside
    nm_pad = 128

    def rand():
        return (rng.normal(size=(nhalf, nm_pad))
                + 1j * rng.normal(size=(nhalf, nm_pad))).astype(np.complex64)

    FNp, Sp, FNm, Sm = rand(), rand(), rand(), rand()
    x64, logch64, logsh64 = sht._geom_arrays(nside, "float64")
    x64, logch64, logsh64 = x64[:nhalf], logch64[:nhalf], logsh64[:nhalf]
    x = x64.astype(np.float32)
    x_lo = (x64 - x.astype(np.float64)).astype(np.float32)
    logch = logch64.astype(np.float32)
    logch_lo = (logch64 - logch.astype(np.float64)).astype(np.float32)
    logsh = logsh64.astype(np.float32)
    logsh_lo = (logsh64 - logsh.astype(np.float64)).astype(np.float32)

    ms = jnp.tile(jnp.arange(nm_pad, dtype=jnp.int32), 2)
    nsv = jnp.repeat(jnp.asarray([spin, -spin], jnp.int32), nm_pad)
    FN_l = jnp.concatenate(
        [jnp.asarray(FNp), jnp.asarray(FNm)], axis=-1
    ).astype(jnp.complex128)
    FS_l = jnp.concatenate(
        [jnp.asarray(Sm), jnp.asarray(Sp)], axis=-1
    ).astype(jnp.complex128)
    want = np.asarray(
        wigner.lambda_analysis_scan_folded(
            ms, nsv, jnp.asarray(x64), jnp.asarray(logch64),
            jnp.asarray(logsh64), lmax, FN_l, FS_l, cross=True,
        )
    )

    args = (jnp.asarray(FNp), jnp.asarray(Sp), jnp.asarray(FNm),
            jnp.asarray(Sm), jnp.asarray(x), jnp.asarray(logch),
            jnp.asarray(logsh), lmax, spin)
    kw = dict(logch_lo=jnp.asarray(logch_lo), logsh_lo=jnp.asarray(logsh_lo),
              ring_block=32, interpret=True)
    ap_dd, am_dd = analysis_pair_folded(
        *args, dd=True, x_lo=jnp.asarray(x_lo), **kw
    )
    ap_pl, am_pl = analysis_pair_folded(*args, **kw)

    scale = np.abs(want).max()
    got_dd = np.concatenate([np.asarray(ap_dd), np.asarray(am_dd)], axis=-1)
    got_pl = np.concatenate([np.asarray(ap_pl), np.asarray(am_pl)], axis=-1)
    err_dd = np.abs(got_dd - want).max() / scale
    err_plain = np.abs(got_pl - want).max() / scale
    assert err_dd < 5e-7, err_dd
    assert err_dd < err_plain / 10, (err_dd, err_plain)


def test_pallas_dd_synthesis_beats_plain():
    """dd synthesis kernels (spin 0 + pair): ~f64 accuracy on f32 inputs."""
    from heracles_tpu.ops.pallas_sht import (
        synthesis_pair_folded,
        synthesis_spin0_folded,
    )

    nside, lmax, spin = 32, 48, 2
    rng = np.random.default_rng(7)
    nhalf = 2 * nside
    nm_pad = 128
    x64, logch64, logsh64 = sht._geom_arrays(nside, "float64")
    x64, logch64, logsh64 = x64[:nhalf], logch64[:nhalf], logsh64[:nhalf]
    x = x64.astype(np.float32)
    x_lo = (x64 - x.astype(np.float64)).astype(np.float32)
    logch = logch64.astype(np.float32)
    logch_lo = (logch64 - logch.astype(np.float64)).astype(np.float32)
    logsh = logsh64.astype(np.float32)
    logsh_lo = (logsh64 - logsh.astype(np.float64)).astype(np.float32)
    kw = dict(logch_lo=jnp.asarray(logch_lo), logsh_lo=jnp.asarray(logsh_lo),
              ring_block=32, interpret=True)
    ms = jnp.arange(nm_pad, dtype=jnp.int32)

    def rand(*shape):
        return (rng.normal(size=shape)
                + 1j * rng.normal(size=shape)).astype(np.complex64)

    def err(got, want, scale):
        return max(
            np.abs(np.asarray(g) - np.asarray(w)).max() / scale
            for g, w in zip(got, want)
        )

    # spin 0
    alm = rand(lmax + 1, nm_pad)
    wantN, wantS = wigner.lambda_synthesis_scan_folded(
        ms, jnp.zeros(nm_pad, jnp.int32), jnp.asarray(x64),
        jnp.asarray(logch64), jnp.asarray(logsh64), lmax,
        jnp.asarray(alm).astype(jnp.complex128), cross=False,
    )
    scale = float(np.abs(np.asarray(wantN)).max())
    args = (jnp.asarray(alm), jnp.asarray(x), jnp.asarray(logch),
            jnp.asarray(logsh), lmax)
    e_dd = err(synthesis_spin0_folded(*args, dd=True,
                                      x_lo=jnp.asarray(x_lo), **kw),
               (wantN, wantS), scale)
    e_pl = err(synthesis_spin0_folded(*args, **kw), (wantN, wantS), scale)
    assert e_dd < 5e-7, e_dd
    assert e_dd < e_pl / 10, (e_dd, e_pl)

    # spin pair
    ap, am = rand(lmax + 1, nm_pad), rand(lmax + 1, nm_pad)
    ms2 = jnp.tile(ms, 2)
    nsv = jnp.repeat(jnp.asarray([spin, -spin], jnp.int32), nm_pad)
    alm_l = jnp.concatenate(
        [jnp.asarray(ap), jnp.asarray(am)], axis=-1
    ).astype(jnp.complex128)
    wantN, wantS = wigner.lambda_synthesis_scan_folded(
        ms2, nsv, jnp.asarray(x64), jnp.asarray(logch64),
        jnp.asarray(logsh64), lmax, alm_l, cross=True,
    )
    wantN, wantS = np.asarray(wantN), np.asarray(wantS)
    want4 = (wantN[..., :nm_pad], wantS[..., :nm_pad],
             wantN[..., nm_pad:], wantS[..., nm_pad:])
    scale = float(np.abs(wantN).max())
    args = (jnp.asarray(ap), jnp.asarray(am), jnp.asarray(x),
            jnp.asarray(logch), jnp.asarray(logsh), lmax, spin)
    e_dd = err(synthesis_pair_folded(*args, dd=True,
                                     x_lo=jnp.asarray(x_lo), **kw),
               want4, scale)
    e_pl = err(synthesis_pair_folded(*args, **kw), want4, scale)
    assert e_dd < 5e-7, e_dd
    assert e_dd < e_pl / 10, (e_dd, e_pl)


@pytest.mark.parametrize("dd", [False, True])
def test_pallas_fma_contract_matches_tree(dd):
    """contract="fma" (fused multiply-add chains) == "tree" at roundoff.

    The fma contraction reassociates the ring sum (serial per-tile FMA
    chains instead of the halving tree), so agreement is at f32 ring-
    accumulation roundoff, not bit-exact.
    """
    from heracles_tpu.ops.pallas_sht import (
        analysis_pair_folded,
        analysis_spin0_folded,
        synthesis_pair_folded,
        synthesis_spin0_folded,
    )

    nside, lmax, spin = 16, 24, 2
    rng = np.random.default_rng(7)
    nhalf, nm_pad = 2 * nside, 128
    x, logch, logsh = sht._geom_arrays(nside, "float32")
    x, logch, logsh = x[:nhalf], logch[:nhalf], logsh[:nhalf]

    def crand(shape):
        return (rng.normal(size=shape)
                + 1j * rng.normal(size=shape)).astype(np.complex64)

    Fs = [jnp.asarray(crand((nhalf, nm_pad))) for _ in range(4)]
    alms = [jnp.asarray(crand((lmax + 1, nm_pad))) for _ in range(2)]
    kw = dict(ring_block=32, interpret=True, dd=dd)

    def close(u, v):
        u, v = np.asarray(u), np.asarray(v)
        scale = max(np.abs(u).max(), 1e-30)
        np.testing.assert_allclose(v, u, atol=1e-5 * scale, rtol=1e-4)

    a_t = analysis_spin0_folded(Fs[0], Fs[1], x, logch, logsh, lmax,
                                contract="tree", **kw)
    a_f = analysis_spin0_folded(Fs[0], Fs[1], x, logch, logsh, lmax,
                                contract="fma", **kw)
    close(a_t, a_f)

    p_t = analysis_pair_folded(*Fs, x, logch, logsh, lmax, spin,
                               contract="tree", **kw)
    p_f = analysis_pair_folded(*Fs, x, logch, logsh, lmax, spin,
                               contract="fma", **kw)
    for u, v in zip(p_t, p_f):
        close(u, v)

    s_t = synthesis_spin0_folded(alms[0], x, logch, logsh, lmax,
                                 contract="tree", **kw)
    s_f = synthesis_spin0_folded(alms[0], x, logch, logsh, lmax,
                                 contract="fma", **kw)
    for u, v in zip(s_t, s_f):
        close(u, v)

    q_t = synthesis_pair_folded(alms[0], alms[1], x, logch, logsh, lmax,
                                spin, contract="tree", **kw)
    q_f = synthesis_pair_folded(alms[0], alms[1], x, logch, logsh, lmax,
                                spin, contract="fma", **kw)
    for u, v in zip(q_t, q_f):
        close(u, v)


def test_synthesis_skip_default_is_none():
    """The bulk-block skip conds measure 1.7-1.8x slower on Mosaic
    (STATUS.md round 4); the default must stay "none" unless re-measured
    on hardware."""
    from heracles_tpu.ops.pallas_sht import _env_skip

    assert _env_skip() == "none"
