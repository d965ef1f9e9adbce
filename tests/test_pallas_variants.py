"""Pallas variant kernels: l-chunked pair synthesis, env validation,
and the comp (x-truncation-corrected) kernels — split from
test_pallas.py to keep each suite chunk under the 10-minute cap."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from heracles_tpu.ops import sht, wigner
from heracles_tpu.ops.pallas_sht import analysis_spin0_folded


def test_pallas_pair_synthesis_l_chunked_matches_plain():
    """The opt-in l-chunked pair synthesis vs the plain kernel.

    Covers l_chunk=8 and a chunk-straddling l_chunk=24 at a size where
    lpad is not a multiple of the chunk.
    """
    from heracles_tpu.ops.pallas_sht import synthesis_pair_folded

    nside, lmax, spin = 8, 12, 2
    rng = np.random.default_rng(17)
    nhalf = 2 * nside
    nm_pad = 128

    def rand():
        return (rng.normal(size=(2, lmax + 1, nm_pad))
                + 1j * rng.normal(size=(2, lmax + 1, nm_pad))
                ).astype(np.complex64)

    ap, am = rand(), rand()
    x, logch, logsh = sht._geom_arrays(nside, "float32")
    args = (jnp.asarray(ap), jnp.asarray(am), jnp.asarray(x[:nhalf]),
            jnp.asarray(logch[:nhalf]), jnp.asarray(logsh[:nhalf]),
            lmax, spin)
    kw = dict(ring_block=8, interpret=True)
    plain = synthesis_pair_folded(*args, **kw)
    for lc in (8, 24):
        lchunked = synthesis_pair_folded(*args, l_chunk=lc, **kw)
        for got, want in zip(lchunked, plain):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-4
            )


def test_pallas_pair_synthesis_l_chunk_validation():
    """Non-multiple-of-8 l_chunk silently corrupts the block indexing;
    the wrapper and the env hook must reject it."""
    import pytest

    from heracles_tpu.ops import pallas_sht

    for bad in (4, 12, -8):
        with pytest.raises(ValueError):
            pallas_sht._check_l_chunk(bad)
    os.environ["HERACLES_TPU_SHT_LCHUNK"] = "12"
    try:
        with pytest.raises(ValueError):
            pallas_sht._env_lc()
    finally:
        del os.environ["HERACLES_TPU_SHT_LCHUNK"]


def test_env_skip_rejects_typos():
    import pytest

    from heracles_tpu.ops.pallas_sht import _env_skip

    os.environ["HERACLES_TPU_SHT_SKIP"] = "fulll"
    try:
        with pytest.raises(ValueError):
            _env_skip()
    finally:
        del os.environ["HERACLES_TPU_SHT_SKIP"]


def test_pallas_comp_analysis_beats_plain():
    """comp (x-truncation-corrected) spin-0 analysis vs f64 truth.

    The plain kernel's dominant systematic error is the f32 truncation
    of cos(theta), a coherent per-step dephasing (~(l-m)*eps*x/sin t;
    tools/recurrence_error_model.py).  The comp kernel's single lo
    stream removes it at ~1.5x plain cost; against the f64 scan it must
    land well below plain (the residual is the hi-product random walk).
    """
    nside, lmax = 8, 420
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
    logsh = logsh64.astype(np.float32)
    lo_ch = (logch64 - logch.astype(np.float64)).astype(np.float32)
    lo_sh = (logsh64 - logsh.astype(np.float64)).astype(np.float32)

    args = (jnp.asarray(Fe), jnp.asarray(Fo), jnp.asarray(x),
            jnp.asarray(logch), jnp.asarray(logsh), lmax)
    kw = dict(ring_block=16, interpret=True, logch_lo=jnp.asarray(lo_ch),
              logsh_lo=jnp.asarray(lo_sh))
    a_plain = np.asarray(analysis_spin0_folded(*args, **kw))
    a_comp = np.asarray(analysis_spin0_folded(
        *args, **kw, dd="comp", x_lo=jnp.asarray(x_lo)))

    ms = jnp.arange(nm_pad, dtype=jnp.int32)
    ns = jnp.zeros(nm_pad, jnp.int32)
    FN = ((Fe + Fo) / 2).astype(np.complex128)
    FS = ((Fe - Fo) / 2).astype(np.complex128)
    want = np.asarray(wigner.lambda_analysis_scan_folded(
        ms, ns, jnp.asarray(x64), jnp.asarray(logch64),
        jnp.asarray(logsh64), lmax, jnp.asarray(FN), jnp.asarray(FS),
        cross=False,
    ))
    sc = np.abs(want).max()
    err_plain = np.abs(a_plain - want).max() / sc
    err_comp = np.abs(a_comp - want).max() / sc
    # measured: plain 4.7e-5, comp 1.26e-5 (ratio 3.7)
    assert err_comp < 2e-5, err_comp
    assert err_comp < err_plain / 2.5, (err_comp, err_plain)


def test_pallas_comp_kernels_match_plain_small():
    """comp plumbing smoke: all four comp kernels vs plain at a size
    where the correction stream is negligible (short chains)."""
    from heracles_tpu.ops.pallas_sht import (
        analysis_pair_folded,
        synthesis_pair_folded,
        synthesis_spin0_folded,
    )

    nside, lmax, spin = 16, 24, 2
    rng = np.random.default_rng(11)
    nhalf = 2 * nside
    nm_pad = 128
    x64 = sht._geom_arrays(nside, "float64")[0][:nhalf]
    x = x64.astype(np.float32)
    x_lo = jnp.asarray((x64 - x.astype(np.float64)).astype(np.float32))
    _, logch, logsh = sht._geom_arrays(nside, "float32")
    logch, logsh = logch[:nhalf], logsh[:nhalf]

    def rnd(*shape):
        return (rng.normal(size=shape)
                + 1j * rng.normal(size=shape)).astype(np.complex64)

    geom = (jnp.asarray(x), jnp.asarray(logch), jnp.asarray(logsh))
    kw = dict(ring_block=16, interpret=True)
    ckw = dict(dd="comp", x_lo=x_lo, **kw)

    F = [jnp.asarray(rnd(nhalf, nm_pad)) for _ in range(4)]
    for out_p, out_c in zip(
        analysis_pair_folded(*F, *geom, lmax, spin, **kw),
        analysis_pair_folded(*F, *geom, lmax, spin, **ckw),
    ):
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_p),
                                   atol=2e-5, rtol=1e-3)

    alm = jnp.asarray(rnd(lmax + 1, nm_pad))
    for out_p, out_c in zip(
        synthesis_spin0_folded(alm, *geom, lmax, **kw),
        synthesis_spin0_folded(alm, *geom, lmax, **ckw),
    ):
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_p),
                                   atol=2e-5, rtol=1e-3)

    ap, am = jnp.asarray(rnd(lmax + 1, nm_pad)), jnp.asarray(
        rnd(lmax + 1, nm_pad))
    for out_p, out_c in zip(
        synthesis_pair_folded(ap, am, *geom, lmax, spin, **kw),
        synthesis_pair_folded(ap, am, *geom, lmax, spin, **ckw),
    ):
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_p),
                                   atol=2e-5, rtol=1e-3)
