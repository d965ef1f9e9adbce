"""Spherical harmonic transforms on HEALPix maps, TPU-native.

Replaces the reference's use of ``healpy.map2alm`` / ``hp.alm2map`` /
``hp.pixwin`` (``/root/reference/heracles/healpy.py:162-209``,
``twopoint.py:154-165``) with a pure JAX implementation:

* phase 1 (azimuth): batched ring FFTs (:mod:`.ringfft`);
* phase 2 (colatitude): fused scaled Wigner-d scans (:mod:`.wigner`);
* quadrature: ring weights solved once per (nside, lmax) on the host so
  that the analysis of band-limited maps is exact, playing the role of
  healpy's iterative pixel weights (reference healpy.py:183-189).

Conventions (matching HEALPix/healpy):

* alms are stored healpy-packed at the API boundary
  (index = m*(2*lmax+1-m)//2 + l) and rectangular (lmax+1, mmax+1) complex
  internally;
* spin-2: a_{E} = -(a_{+2}+a_{-2})/2, a_B = i(a_{+2}-a_{-2})/2 with
  (Q+iU) = sum a_{+2,lm} {}_2Y_{lm}.
"""

from __future__ import annotations

import functools
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..healpix import npix2nside, nside2pixarea, ring_geometry
from . import ringfft, wigner

logger = logging.getLogger(__name__)


def _use_pallas():
    """Pallas kernels are auto-selected on TPU; HERACLES_TPU_NO_PALLAS=1
    forces the jnp scan fallbacks (debugging / numerics comparison)."""
    flag = os.environ.get("HERACLES_TPU_NO_PALLAS", "").strip().lower()
    return (
        jax.default_backend() == "tpu"
        and flag in ("", "0", "false", "no")
    )

__all__ = [
    "alm_size",
    "pack_alm",
    "unpack_alm",
    "map2alm",
    "alm2map",
    "ring_weights",
    "pixel_window",
    "resolve_lmax",
]

DEFAULT_M_CHUNK = 128


def resolve_lmax(nside, lmax=None):
    """Default band limit, matching the reference mapper (healpy.py:87)."""
    return 3 * nside // 2 if lmax is None else int(lmax)


def alm_size(lmax, mmax=None):
    """Packed alm length: sum over m = 0..mmax of (lmax - m + 1)."""
    mmax = lmax if mmax is None else mmax
    return (mmax + 1) * (lmax + 1) - mmax * (mmax + 1) // 2


@functools.lru_cache(maxsize=64)
def _pack_index(lmax, mmax):
    """(l_idx, m_idx) arrays giving rect coords of each packed entry."""
    ls = np.concatenate([np.arange(m, lmax + 1) for m in range(mmax + 1)])
    ms = np.concatenate([np.full(lmax + 1 - m, m) for m in range(mmax + 1)])
    return ls, ms


@functools.lru_cache(maxsize=64)
def _run_positions(lmax, mmax):
    """Slice positions of each order's run for the layout transforms.

    The packed array is a concatenation of per-order runs (order m holds
    l = m..lmax).  Reading a full (lmax+1)-slice of the packed array at
    position m*(2*lmax - m + 1)/2 puts a_{lm} at column l (columns
    l < m hold the previous run's tail, masked/overwritten) — so the
    packed<->rectangular conversions are scans of contiguous dynamic
    slices instead of elementwise gathers/scatters, which run at
    ~0.3 GB/s on TPU and would otherwise dominate alm2map.
    """
    m = np.arange(mmax + 1, dtype=np.int64)
    return (m * (2 * lmax - m + 1) // 2).astype(np.int32)


def pack_alm(alm_rect, lmax=None, mmax=None):
    """Rectangular (..., lmax+1, mmax+1) -> healpy-packed (..., nlm)."""
    if lmax is None:
        lmax = alm_rect.shape[-2] - 1
    if mmax is None:
        mmax = alm_rect.shape[-1] - 1
    if not isinstance(alm_rect, jax.Array):
        ls, ms = _pack_index(lmax, mmax)
        return alm_rect[..., ls, ms]
    # gather-free: write each order's (lmax+1)-row at its run position in
    # descending m, so later (lower-m) rows overwrite the l < m prefix
    # garbage of earlier ones
    L = lmax + 1
    nlm = alm_size(lmax, mmax)
    starts = _run_positions(lmax, mmax)
    rows = jnp.moveaxis(jnp.swapaxes(alm_rect, -1, -2), -2, 0)  # (M, ..., L)
    buf = jnp.zeros(alm_rect.shape[:-2] + (nlm + L,), alm_rect.dtype)

    def write(buf, xs):
        row, s = xs
        return jax.lax.dynamic_update_slice_in_dim(buf, row, s, axis=-1), None

    buf, _ = jax.lax.scan(
        write, buf,
        (jnp.flip(rows, axis=0), jnp.asarray(starts[::-1].copy())),
    )
    return buf[..., :nlm]


def unpack_alm(alm_packed, lmax, mmax=None):
    """healpy-packed (..., nlm) -> rectangular (..., lmax+1, mmax+1)."""
    mmax = lmax if mmax is None else mmax
    if not isinstance(alm_packed, jax.Array):
        ls, ms = _pack_index(lmax, mmax)
        out = np.zeros(
            alm_packed.shape[:-1] + (lmax + 1, mmax + 1), alm_packed.dtype
        )
        out[..., ls, ms] = alm_packed
        return out
    # scatter-free: each order's run is a contiguous (lmax+1)-slice of
    # the packed array (columns l < m masked to zero), then one transpose
    L = lmax + 1
    starts = _run_positions(lmax, mmax)
    padded = jnp.pad(alm_packed, [(0, 0)] * (alm_packed.ndim - 1) + [(0, L)])

    def row(_, s):
        return None, jax.lax.dynamic_slice_in_dim(padded, s, L, axis=-1)

    _, rows = jax.lax.scan(row, None, jnp.asarray(starts))
    rows = jnp.moveaxis(rows, 0, -2)  # (..., mmax+1, L)
    mask = jnp.arange(L)[None, :] >= jnp.arange(mmax + 1)[:, None]
    return jnp.swapaxes(jnp.where(mask, rows, 0), -1, -2)


@functools.lru_cache(maxsize=32)
def _geom_arrays(nside, dtype_str):
    """Per-ring cos(theta), log cos/sin(theta/2) (host constants, f64 math).

    Returned as numpy so the cache never holds traced/device values; jit
    embeds them as constants at the use site.
    """
    g = ring_geometry(nside)
    z = g["z"]
    logch = 0.5 * np.log((1.0 + z) / 2.0)
    logsh = 0.5 * np.log((1.0 - z) / 2.0)
    dt = np.dtype(dtype_str)
    return z.astype(dt), logch.astype(dt), logsh.astype(dt)


@functools.lru_cache(maxsize=32)
def _geom_lo_arrays(nside):
    """f32 residuals of the f64 ring half-angle logs (northern half).

    Feed the Pallas kernels' compensated seed evaluation: the seed
    exponents multiply these logs by the harmonic order m, so plain f32
    geometry would cost ~ulp * m ~ 4e-4 relative seed error at m ~ 3000.
    """
    _, lch64, lsh64 = _geom_arrays(nside, "float64")
    _, lch32, lsh32 = _geom_arrays(nside, "float32")
    nhalf = 2 * nside
    lo_ch = (lch64 - lch32.astype(np.float64)).astype(np.float32)
    lo_sh = (lsh64 - lsh32.astype(np.float64)).astype(np.float32)
    return lo_ch[:nhalf], lo_sh[:nhalf]


@functools.lru_cache(maxsize=32)
def _x_lo_array(nside):
    """f32 residual of the f64 ring cos(theta) (northern half).

    Feeds the double-single (dd) recurrence: the three-term recurrence is
    evaluated in x = cos(theta), and the dd carries only pay off when x
    itself enters at (hi, lo) precision.
    """
    x64 = _geom_arrays(nside, "float64")[0][: 2 * nside]
    x32 = x64.astype(np.float32)
    return (x64 - x32.astype(np.float64)).astype(np.float32)


def _use_dd():
    """Accuracy mode of the Wigner recurrence: False, True or "comp".

    ``dd=True`` (HERACLES_TPU_SHT_DD=1): the three-term recurrence
    carries (hi, lo) f32 pairs (double-single), removing the f32
    recurrence error entirely at ~2-5x the scan cost.

    ``dd="comp"`` (HERACLES_TPU_SHT_DD=comp, or the legacy alias
    "accum"): the plain recurrence plus a single correction stream for
    the f32 truncation of cos(theta) — the *dominant* systematic error
    of the plain kernel (tools/recurrence_error_model.py).  Measured on
    TPU at n4096/l3000: 1.26x the plain end-to-end cost; top-band Cl
    error 1.4e-5 at n2048 (plain 3.3e-5; at n512 comp sits at the f64
    one-pass aliasing floor).  The residual is the hi-product rounding
    random walk, which only the full-Dekker dd kernel removes.

    0/"plain": the plain f32 recurrence (~2-3e-5 band-max Cl at
    l >~ 0.9*lmax, measured on TPU at nside 512/2048/4096).  Unset:
    ``_DD_DEFAULT`` — plain; comp missed the <= 1e-5-every-band bar at
    n2048 that the round-4 verdict set for flipping the default
    (STATUS.md "float32 error budget").
    """
    flag = os.environ.get("HERACLES_TPU_SHT_DD", "").strip().lower()
    if flag in ("comp", "accum"):
        return "comp"
    if flag in ("1", "true", "yes", "on"):
        return True
    if flag in ("0", "false", "no", "off", "none", "plain"):
        return False
    if flag:
        raise ValueError(
            f"HERACLES_TPU_SHT_DD={flag!r}: expected 0/1/plain/comp"
        )
    return _DD_DEFAULT


# measured (tools/accuracy_sweep.json n2048 rows): comp one-pass lands
# at 1.4e-5 top band — short of the <= 1e-5-every-band bar for a
# default flip — so the default stays the plain recurrence
_DD_DEFAULT = False


@functools.lru_cache(maxsize=32)
def ring_weights(nside, lmax_w=None):
    """Quadrature weights per pixel of each ring (numpy, float64).

    Solved on the host as the minimum-norm correction to the uniform
    pixel-area weights such that sum_p w_p P_l(z_p) = 4*pi*delta_{l0} for
    all even l <= lmax_w (odd l vanish by N/S symmetry).  This plays the
    role of healpy's ring/pixel weight files (reference healpy.py:183-189
    uses use_pixel_weights=True): analysis of band-limited maps becomes
    (near-)exact instead of O(pixel area) accurate.
    """
    nside = int(nside)
    if lmax_w is None:
        lmax_w = 3 * nside
    # disk cache: the host lstsq takes minutes at nside >= 4096.  Two
    # locations are tried: the user cache dir (written here) and the
    # tables packaged with the library (heracles_tpu/data/, read-only).
    cache_dir = os.environ.get("HERACLES_TPU_CACHE", "/tmp/heracles_tpu_cache")
    name = f"ringweights_{nside}_{lmax_w}.npy"
    packaged = os.path.join(os.path.dirname(__file__), "..", "data", name)
    if os.path.exists(packaged):
        return np.load(packaged)
    cache = None
    if nside >= 256:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            cache = os.path.join(cache_dir, name)
            if os.path.exists(cache):
                return np.load(cache)
        except OSError:
            cache = None
    if nside >= 1024:
        logger.info(
            "solving ring quadrature weights for nside=%d (one-time, "
            "several minutes at nside>=4096; cached to %s)",
            nside, cache or "<memory>",
        )
    g = ring_geometry(nside)
    z = g["z"]
    nph = g["npix"].astype(np.float64)
    nr = z.size
    nhalf = 2 * nside  # rings 0..2*nside-1 cover z > 0 plus the equator
    zs = z[:nhalf]
    fold = np.where(np.arange(nhalf) == nhalf - 1, 1.0, 2.0)  # equator unpaired
    # even-l Legendre values by recurrence, accumulate design matrix rows
    nev = lmax_w // 2 + 1
    A = np.empty((nev, nhalf))
    pm1 = np.ones_like(zs)
    p = zs.copy()
    A[0] = nph[:nhalf] * fold
    for ell in range(2, lmax_w + 1):
        pnext = ((2 * ell - 1) * zs * p - (ell - 1) * pm1) / ell
        pm1, p = p, pnext
        if ell % 2 == 0:
            A[ell // 2] = nph[:nhalf] * fold * p
    b = np.zeros(nev)
    b[0] = 4.0 * np.pi
    w0 = np.full(nhalf, nside2pixarea(nside))
    delta, *_ = np.linalg.lstsq(A, b - A @ w0, rcond=None)
    w_half = w0 + delta
    w = np.concatenate([w_half, w_half[:-1][::-1]])
    assert w.size == nr
    if cache:
        try:
            np.save(cache, w)
        except OSError:
            pass
    return w


def _mmax_pad(mmax, m_chunk):
    return ((mmax + 1 + m_chunk - 1) // m_chunk) * m_chunk


def _run_chunks(nm_pad, m_chunk, fn):
    """lax.map over m-chunks; fn(ms) -> per-chunk output stacked on axis 0."""
    nchunks = nm_pad // m_chunk
    starts = jnp.arange(nchunks, dtype=jnp.int32) * m_chunk
    return jax.lax.map(fn, starts)


@functools.lru_cache(maxsize=4)
def _host_seed_planes(nside, nm_pad, ns, dd=False):
    """Host-f64 Wigner seed planes for the folded jnp f32 scans.

    The device-evaluated seed logs (:func:`wigner.wigner_seed_log`) ride
    on XLA's f32 ``log``/``lgamma``, whose absolute-error floors grow
    with the harmonic order — measured ~1% alm error at nside=128 when
    the jnp fallback ran with device seeds on TPU, against ~2e-5 with
    these host planes.  The Pallas production path already computes
    compensated host-grade seeds in-kernel (pallas_sht._comp_seed_frac);
    this is the jnp-fallback analog (HERACLES_TPU_NO_PALLAS oracle runs
    and the CPU-f32 diagnostics path).

    Returns (mant, k) planes of shape (nspin * nm_pad, nhalf): rows for
    spin column i at [i * nm_pad + m], sliced per m-chunk inside the
    lax.map (the chunk starts are traced).
    """
    z = _geom_arrays(nside, "float64")[0][: 2 * nside]
    theta = np.arccos(z)
    ms = np.tile(np.arange(nm_pad), len(ns))
    nsl = np.repeat(np.asarray(ns, np.int64), nm_pad)
    return wigner.wigner_seed_host(ms, nsl, theta, dd=dd)


def _seed_slicer(seed_planes, nspin, nm_pad, m_chunk):
    """Chunk slicer over the stacked host seed planes (traced start)."""
    if seed_planes is None:
        return lambda start: None
    planes = tuple(jnp.asarray(p) for p in seed_planes)

    def sl(start):
        def rows(p):
            return jnp.concatenate(
                [
                    jax.lax.dynamic_slice_in_dim(
                        p, i * nm_pad + start, m_chunk, axis=0
                    )
                    for i in range(nspin)
                ],
                axis=0,
            )

        return tuple(rows(p) for p in planes)

    return sl


def _fold_rings(F, nside):
    """Split full-ring arrays (..., nr, nm) into (north, south-mirrored).

    North covers rings 0..2*nside-1 (incl. the equator); the south part
    is mirrored onto the same rows with a zero equator row (the equator
    is its own mirror and must enter once).
    """
    nhalf = 2 * nside
    FN = F[..., :nhalf, :]
    FS = jnp.flip(F[..., nhalf:, :], axis=-2)
    FS = jnp.pad(FS, [(0, 0)] * (F.ndim - 2) + [(0, 1), (0, 0)])
    return FN, FS


def _analysis_rect(Fw, x, logch, logsh, lmax, mmax, ns, m_chunk,
                   geom_lo=None, dd=False):
    """Run the ring-pair-folded Wigner analysis scan over m-chunks.

    ``Fw``: tuple of (..., nr, nm_pad) complex arrays over *full* rings,
    one per spin column n in ``ns``; ``x``/``logch``/``logsh`` cover the
    northern half (incl. equator).  N/S mirror symmetry pairs column +n
    with column -n, so each branch's even/odd inputs combine its own
    northern rows with its partner branch's southern rows.
    Returns tuple of (..., lmax+1, nm_pad) rectangular alms.
    """
    nm_pad = Fw[0].shape[-1]
    nspin = len(ns)
    nside = (Fw[0].shape[-2] + 1) // 4
    cross = nspin == 2

    # mirror symmetry: lam^{(n)}(pi-t) = (-1)^{l+m} lam^{(-n)}(t), so the
    # southern rows pair with the partner (-n) branch and carry a (-1)^m
    # per-order sign; the l-parity is handled inside the folded scan
    msign = jnp.where(jnp.arange(nm_pad) % 2 == 0, 1.0, -1.0)
    folded = [_fold_rings(f, nside) for f in Fw]

    # note: not `dd and <check>` — that collapses "comp" to True
    dd = dd if Fw[0].dtype == jnp.complex64 else False

    # TPU fast path: the fused Pallas kernel (spin 0, f32, any batch);
    # dd=True routes to the double-single high-accuracy kernel variant
    if (
        not cross
        and abs(int(ns[0])) == 0
        and Fw[0].dtype == jnp.complex64
        and _use_pallas()
    ):
        from . import pallas_sht

        FN0, FS0raw = folded[0]
        FS0 = FS0raw * msign
        lo_ch, lo_sh = geom_lo if geom_lo is not None else (None, None)
        alm = pallas_sht.analysis_spin0_folded(
            FN0 + FS0, FN0 - FS0, x, logch, logsh, lmax,
            logch_lo=lo_ch, logsh_lo=lo_sh, m_chunk=m_chunk,
            dd=dd,
            x_lo=jnp.asarray(_x_lo_array(nside)) if dd else None,
        )
        return (alm,)

    FN = [fn for fn, _ in folded]
    FS = []
    for b in range(nspin):
        partner = folded[nspin - 1 - b] if cross else folded[b]
        FS.append(partner[1] * msign)

    # TPU fast path for spin pairs: the fused cross-mode Pallas kernel;
    # dd=True routes to the double-single high-accuracy kernel variant
    if (
        cross
        and Fw[0].dtype == jnp.complex64
        and _use_pallas()
    ):
        from . import pallas_sht

        lo_ch, lo_sh = geom_lo if geom_lo is not None else (None, None)
        alm_p, alm_m = pallas_sht.analysis_pair_folded(
            FN[0], FS[1], FN[1], FS[0], x, logch, logsh, lmax,
            abs(int(ns[0])), logch_lo=lo_ch, logsh_lo=lo_sh,
            m_chunk=m_chunk,
            dd=dd,
            x_lo=jnp.asarray(_x_lo_array(nside)) if dd else None,
        )
        return (alm_p, alm_m)

    # f32 fallback: host-f64 seeds (the device f32 log/lgamma seed path
    # costs ~1% alm error at production orders — see _host_seed_planes).
    # The jnp scans have no "comp" mode; it maps to full dd (the jnp
    # fallback is not the perf-critical path).
    dd = True if dd == "comp" else dd
    seed_sl = _seed_slicer(
        _host_seed_planes(nside, nm_pad, tuple(int(n) for n in ns), dd=dd)
        if Fw[0].dtype == jnp.complex64
        else None,
        nspin, nm_pad, m_chunk,
    )
    x_lo = jnp.asarray(_x_lo_array(nside)) if dd else None

    def chunk(start):
        ms = start + jnp.arange(m_chunk, dtype=jnp.int32)
        ms_l = jnp.tile(ms, nspin)
        ns_l = jnp.repeat(jnp.asarray(ns, jnp.int32), m_chunk)

        def slice_cat(fs):
            return jnp.concatenate(
                [jax.lax.dynamic_slice_in_dim(f, start, m_chunk, axis=-1)
                 for f in fs],
                axis=-1,
            )

        return wigner.lambda_analysis_scan_folded(
            ms_l, ns_l, x, logch, logsh, lmax,
            slice_cat(FN), slice_cat(FS), cross=cross,
            seed=seed_sl(start), dd=dd, x_lo=x_lo,
        )

    ys = _run_chunks(nm_pad, m_chunk, chunk)
    # ys: (nchunks, ..., lmax+1, nspin*m_chunk) -> per-spin (..., lmax+1, nm_pad)
    outs = []
    for i in range(nspin):
        part = ys[..., i * m_chunk : (i + 1) * m_chunk]
        part = jnp.moveaxis(part, 0, -2)  # (..., lmax+1, nchunks, m_chunk)
        outs.append(part.reshape(part.shape[:-2] + (nm_pad,)))
    return tuple(outs)


def _analysis_rect_points(Fw, x, logch, logsh, lmax, ns, m_chunk,
                          geom_lo=None):
    """Unfolded analysis over arbitrary points (no ring-pair symmetry).

    Used by the discrete (pixel-free) mapper, where the "rings" are
    individual catalogue points at arbitrary colatitudes.

    TPU fast paths: the folded Pallas kernels compute the unfolded
    contraction when fed degenerate inputs — the spin-0 kernel contracts
    Fe on even l and Fo on odd l, so Fe = Fo = F yields the plain
    sum over points; the pair kernel with zero southern rows reduces to
    the two independent +-s columns.
    """
    nm_pad = Fw[0].shape[-1]
    nspin = len(ns)

    if (
        Fw[0].dtype == jnp.complex64
        and _use_pallas()
    ):
        from . import pallas_sht

        lo_ch, lo_sh = geom_lo if geom_lo is not None else (None, None)
        if nspin == 1 and abs(int(ns[0])) == 0:
            alm = pallas_sht.analysis_spin0_folded(
                Fw[0], Fw[0], x, logch, logsh, lmax,
                logch_lo=lo_ch, logsh_lo=lo_sh, m_chunk=m_chunk,
            )
            return (alm,)
        if nspin == 2:
            zero = jnp.zeros_like(Fw[0])
            return pallas_sht.analysis_pair_folded(
                Fw[0], zero, Fw[1], zero, x, logch, logsh, lmax,
                abs(int(ns[0])), logch_lo=lo_ch, logsh_lo=lo_sh,
                m_chunk=m_chunk,
            )

    def chunk(start):
        ms = start + jnp.arange(m_chunk, dtype=jnp.int32)
        ms_l = jnp.tile(ms, nspin)
        ns_l = jnp.repeat(jnp.asarray(ns, jnp.int32), m_chunk)
        Fw_l = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(f, start, m_chunk, axis=-1) for f in Fw],
            axis=-1,
        )
        return wigner.lambda_analysis_scan(ms_l, ns_l, x, logch, logsh, lmax, Fw_l)

    ys = _run_chunks(nm_pad, m_chunk, chunk)
    outs = []
    for i in range(nspin):
        part = ys[..., i * m_chunk : (i + 1) * m_chunk]
        part = jnp.moveaxis(part, 0, -2)
        outs.append(part.reshape(part.shape[:-2] + (nm_pad,)))
    return tuple(outs)


def _synthesis_rect(alms, x, logch, logsh, lmax, ns, m_chunk, nside,
                    geom_lo=None, dd=False):
    """Inverse: tuple of rectangular alms (..., lmax+1, nm_pad) -> ring G.

    Ring-pair folded: each branch's full-ring G is reassembled from the
    even/odd partial sums, with the southern rows coming from the partner
    (-n) branch.  Returns tuple of (..., nr, nm_pad) complex per column.
    """
    nm_pad = alms[0].shape[-1]
    nspin = len(ns)
    cross = nspin == 2

    # note: not `dd and <check>` — that collapses "comp" to True
    dd = dd if alms[0].dtype == jnp.complex64 else False

    # TPU fast path: fused Pallas synthesis (spin 0, f32, any batch);
    # dd=True routes to the double-single high-accuracy kernel variant
    if (
        not cross
        and abs(int(ns[0])) == 0
        and alms[0].dtype == jnp.complex64
        and _use_pallas()
    ):
        from . import pallas_sht

        lo_ch, lo_sh = geom_lo if geom_lo is not None else (None, None)
        GN, GS = pallas_sht.synthesis_spin0_folded(
            alms[0], x, logch, logsh, lmax,
            logch_lo=lo_ch, logsh_lo=lo_sh, m_chunk=m_chunk,
            dd=dd,
            x_lo=jnp.asarray(_x_lo_array(nside)) if dd else None,
        )
        south = jnp.flip(GS[..., :-1, :], axis=-2)
        return (jnp.concatenate([GN, south], axis=-2),)

    # TPU fast path for spin pairs: the fused pair synthesis kernel
    if (
        cross
        and alms[0].dtype == jnp.complex64
        and _use_pallas()
    ):
        from . import pallas_sht

        lo_ch, lo_sh = geom_lo if geom_lo is not None else (None, None)
        GNp, GSp, GNm, GSm = pallas_sht.synthesis_pair_folded(
            alms[0], alms[1], x, logch, logsh, lmax, abs(int(ns[0])),
            logch_lo=lo_ch, logsh_lo=lo_sh, m_chunk=m_chunk,
            dd=dd,
            x_lo=jnp.asarray(_x_lo_array(nside)) if dd else None,
        )
        outs = []
        for GN, GS in ((GNp, GSp), (GNm, GSm)):
            south = jnp.flip(GS[..., :-1, :], axis=-2)
            outs.append(jnp.concatenate([GN, south], axis=-2))
        return tuple(outs)

    # f32 fallback: host-f64 seeds (see _host_seed_planes); "comp" maps
    # to full dd here (the jnp scans have no comp mode)
    dd = True if dd == "comp" else dd
    seed_sl = _seed_slicer(
        _host_seed_planes(nside, nm_pad, tuple(int(n) for n in ns), dd=dd)
        if alms[0].dtype == jnp.complex64
        else None,
        nspin, nm_pad, m_chunk,
    )
    x_lo = jnp.asarray(_x_lo_array(nside)) if dd else None

    def chunk(start):
        ms = start + jnp.arange(m_chunk, dtype=jnp.int32)
        ms_l = jnp.tile(ms, nspin)
        ns_l = jnp.repeat(jnp.asarray(ns, jnp.int32), m_chunk)
        alm_l = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(a, start, m_chunk, axis=-1) for a in alms],
            axis=-1,
        )
        return wigner.lambda_synthesis_scan_folded(
            ms_l, ns_l, x, logch, logsh, lmax, alm_l, cross=cross,
            seed=seed_sl(start), dd=dd, x_lo=x_lo,
        )

    GN, GS = _run_chunks(nm_pad, m_chunk, chunk)

    def unchunk(part):
        part = jnp.moveaxis(part, 0, -2)  # (..., nhalf, nchunks, m_chunk)
        return part.reshape(part.shape[:-2] + (nm_pad,))

    outs = []
    for i in range(nspin):
        sl = slice(i * m_chunk, (i + 1) * m_chunk)
        north = unchunk(GN[..., sl])
        # full rings: north rows as-is; south rows are the mirrored GS
        # without its equator row (the equator is its own mirror)
        south = jnp.flip(unchunk(GS[..., sl])[..., :-1, :], axis=-2)
        outs.append(jnp.concatenate([north, south], axis=-2))
    return tuple(outs)


def _weights_arr(nside, weights, dtype):
    if weights is None:
        w = np.full(4 * nside - 1, nside2pixarea(nside))
    elif isinstance(weights, str) and weights == "ring":
        w = ring_weights(nside)
    else:
        return jnp.asarray(weights).astype(dtype)
    return w.astype(np.dtype(dtype))


def map2alm(maps, lmax=None, mmax=None, *, spin=0, weights="ring",
            iterations=0, m_chunk=DEFAULT_M_CHUNK, packed=True,
            fft_chirps=None, fft_chirps_synth=None, dd=None):
    """Spin-0/2 spherical harmonic analysis of HEALPix RING maps.

    ``maps``: (..., npix) real for spin 0; (..., 2, npix) [Q, U] for spin 2.
    ``weights``: "ring" (quadrature weights, default — the analog of
    healpy's use_pixel_weights=True), None (pixel area), or an array of
    per-ring weights.
    ``iterations``: Jacobi refinement steps alm += A(w*(f - S(alm))),
    healpy's ``iter=`` analog; suppresses the HEALPix m-aliasing coupling
    (m >= nph of polar rings), which is exponentially small for
    lmax <= ~2*nside but visible at toy resolutions.
    ``dd``: accuracy mode — True (double-single recurrence), "comp"
    (compensated x-truncation stream, ~1.5x), or False (default: the
    HERACLES_TPU_SHT_DD env flag; see :func:`_use_dd`).
    Returns packed alms (..., nlm) for spin 0, or (..., 2, nlm) (E, B) for
    spin 2 (packed=False returns rectangular (..., lmax+1, mmax+1)).
    """
    dd = _use_dd() if dd is None else (dd if dd == "comp" else bool(dd))
    out = _map2alm_once(maps, lmax, mmax, spin=spin, weights=weights,
                        m_chunk=m_chunk, packed=False,
                        fft_chirps=fft_chirps, dd=dd)
    if iterations:
        nside = npix2nside(jnp.shape(maps)[-1])
        lmax_r = resolve_lmax(nside, lmax)
        for _ in range(int(iterations)):
            resid = jnp.asarray(maps) - alm2map(
                out, nside, lmax=lmax_r, mmax=mmax, spin=spin,
                m_chunk=m_chunk, packed=False, fft_chirps=fft_chirps_synth,
                dd=dd,
            )
            out = out + _map2alm_once(
                resid, lmax, mmax, spin=spin, weights=weights,
                m_chunk=m_chunk, packed=False, fft_chirps=fft_chirps,
                dd=dd,
            )
    if packed:
        lmax_r = resolve_lmax(npix2nside(jnp.shape(maps)[-1]), lmax)
        mmax_r = lmax_r if mmax is None else int(mmax)
        return pack_alm(out, lmax_r, mmax_r)
    return out


def _map2alm_once(maps, lmax=None, mmax=None, *, spin=0, weights="ring",
                  m_chunk=DEFAULT_M_CHUNK, packed=True, fft_chirps=None,
                  dd=False):
    """Single-pass analysis (no refinement)."""
    maps = jnp.asarray(maps)
    spin = abs(int(spin))
    npix = maps.shape[-1]
    nside = npix2nside(npix)
    lmax = resolve_lmax(nside, lmax)
    mmax = lmax if mmax is None else int(mmax)
    fdt = "float64" if maps.dtype in (jnp.float64, jnp.complex128) else "float32"
    x, logch, logsh = _geom_arrays(nside, fdt)
    nhalf = 2 * nside
    x, logch, logsh = x[:nhalf], logch[:nhalf], logsh[:nhalf]
    geom_lo = _geom_lo_arrays(nside) if fdt == "float32" else None
    w = _weights_arr(nside, weights, fdt)[:, None]
    nm_pad = _mmax_pad(mmax, m_chunk)

    def pad_m(F):
        return jnp.pad(F, [(0, 0)] * (F.ndim - 1) + [(0, nm_pad - (mmax + 1))])

    # the FFT produces a 128-lane-padded m width directly (chirp planes
    # are built at the same rounding) and the quadrature weight rides
    # inside its phase planes — no F * w pass, and no pad pass unless
    # m_chunk > 128 demands extra columns
    nm_fft = -(-(mmax + 1) // 128) * 128

    def pad_fft(F):
        if nm_fft == nm_pad:
            return F
        return jnp.pad(F, [(0, 0)] * (F.ndim - 1) + [(0, nm_pad - nm_fft)])

    if spin == 0:
        F, _ = ringfft.ring_analysis(maps, nside, nm_fft,
                                     chirps=fft_chirps, weight=w[:, 0])
        (alm,) = _analysis_rect(
            (pad_fft(F),), x, logch, logsh, lmax, mmax, (0,), m_chunk,
            geom_lo=geom_lo, dd=dd,
        )
        alm = alm[..., : mmax + 1]
        out = alm
    else:
        u = maps[..., 0, :] + 1j * maps[..., 1, :]
        F, Fneg = ringfft.ring_analysis(u, nside, nm_fft,
                                        chirps=fft_chirps, weight=w[:, 0])
        # a_{+s,lm} = sum_r w slm(l,m,+s) F_m(r): engine column ns=+s
        # a_{-s,lm} = sum_r w slm(l,m,-s) conj(F_{-m}(r)): column ns=-s
        # (w real: conj(Fneg * w) == conj(Fneg) * w)
        a_p, a_m = _analysis_rect(
            (pad_fft(F), pad_fft(jnp.conj(Fneg))),
            x, logch, logsh, lmax, mmax, (spin, -spin), m_chunk,
            geom_lo=geom_lo, dd=dd,
        )
        a_p = a_p[..., : mmax + 1]
        a_m = a_m[..., : mmax + 1]
        alm_e = -(a_p + a_m) / 2
        alm_b = 1j * (a_p - a_m) / 2
        out = jnp.stack([alm_e, alm_b], axis=-3)
    if packed:
        return pack_alm(out, lmax, mmax)
    return out


def alm2map(alm, nside, lmax=None, mmax=None, *, spin=0,
            m_chunk=DEFAULT_M_CHUNK, packed=True, fft_chirps=None,
            dd=None):
    """Spin-0/2 spherical harmonic synthesis onto a HEALPix RING map.

    ``alm``: packed (..., nlm) (spin 0) or (..., 2, nlm) (E, B) (spin 2);
    rectangular when packed=False.  Returns (..., npix) or (..., 2, npix).
    ``dd``: high-accuracy double-single f32 recurrence (see map2alm).
    """
    dd = _use_dd() if dd is None else (dd if dd == "comp" else bool(dd))
    alm = jnp.asarray(alm)
    spin = abs(int(spin))
    if lmax is None:
        if not packed:
            lmax = alm.shape[-2] - 1
        else:
            # invert nlm = (mmax+1)(lmax+1) - mmax(mmax+1)/2 with mmax = lmax
            nlm = alm.shape[-1]
            lmax = int((np.sqrt(8 * nlm + 1) - 3) / 2 + 0.5)
    mmax = lmax if mmax is None else int(mmax)
    if packed:
        alm = unpack_alm(alm, lmax, mmax)
    fdt = "float64" if alm.dtype == jnp.complex128 else "float32"
    x, logch, logsh = _geom_arrays(nside, fdt)
    nhalf = 2 * nside
    x, logch, logsh = x[:nhalf], logch[:nhalf], logsh[:nhalf]
    geom_lo = _geom_lo_arrays(nside) if fdt == "float32" else None
    nm_pad = _mmax_pad(mmax, m_chunk)

    def pad_m(a):
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, nm_pad - (mmax + 1))])

    if spin == 0:
        (G,) = _synthesis_rect(
            (pad_m(alm),), x, logch, logsh, lmax, (0,), m_chunk, nside,
            geom_lo=geom_lo, dd=dd,
        )
        G = G[..., : mmax + 1]
        return ringfft.ring_synthesis(G, None, nside, chirps=fft_chirps)
    alm_e = alm[..., 0, :, :]
    alm_b = alm[..., 1, :, :]
    a_p = -(alm_e + 1j * alm_b)  # a_{+spin}
    a_m = -(alm_e - 1j * alm_b)  # a_{-spin}
    # u = sum_{m>=0} G+_m e^{im phi} + sum_{m>0} G-_m e^{-im phi} with
    # G+_m = sum_l a_{+s,lm} slm(l,m,+s) and
    # G-_m = sum_l conj(a_{-s,lm}) slm-column(ns=-s) (reality relations)
    Gp, Gm = _synthesis_rect(
        (pad_m(a_p), pad_m(jnp.conj(a_m))),
        x, logch, logsh, lmax, (spin, -spin), m_chunk, nside,
        geom_lo=geom_lo, dd=dd,
    )
    Gp = Gp[..., : mmax + 1]
    Gm = Gm[..., : mmax + 1]
    u = ringfft.ring_synthesis(Gp, Gm, nside, real_output=False,
                               chirps=fft_chirps)
    return jnp.stack([u.real, u.imag], axis=-2)


map2alm_jit = jax.jit(
    map2alm,
    static_argnames=(
        "lmax", "mmax", "spin", "weights", "iterations", "m_chunk",
        "packed", "dd",
    ),
)
alm2map_jit = jax.jit(
    alm2map,
    static_argnames=(
        "nside", "lmax", "mmax", "spin", "m_chunk", "packed", "dd"
    ),
)


# -- host-boundary wrappers ---------------------------------------------------
#
# Complex arrays cannot cross jit/transfer boundaries on some TPU
# transports (observed on this build machine's tunnel), so the host-facing
# wrappers split alms into real/imag planes *inside* the jit.

_map2alm_planes = jax.jit(
    lambda maps, **kw: (lambda a: jnp.stack([a.real, a.imag]))(
        map2alm(maps, **kw)
    ),
    static_argnames=(
        "lmax", "mmax", "spin", "weights", "iterations", "m_chunk",
        "packed", "dd",
    ),
)  # fft_chirps rides through **kw as a traced pytree argument

_alm2map_planes = jax.jit(
    lambda re, im, nside, **kw: alm2map(re + 1j * im, nside, **kw),
    static_argnames=(
        "nside", "lmax", "mmax", "spin", "m_chunk", "packed", "dd"
    ),
)


def _host_chirps(npix_or_nside, lmax, mmax, dtype, *, from_npix,
                 kind="analysis"):
    """Cached device fft(chirp) planes for the host wrappers."""
    nside = npix2nside(npix_or_nside) if from_npix else npix_or_nside
    lmax_r = resolve_lmax(nside, lmax)
    mext = (lmax_r if mmax is None else int(mmax)) + 1
    fdt = (
        "float64"
        if np.dtype(dtype) in (np.float64, np.complex128)
        else "float32"
    )
    return ringfft.chirp_fft_planes(nside, mext, fdt, kind)


def map2alm_async(maps, lmax=None, **kw):
    """Dispatch map2alm and start the device->host plane readback.

    Returns a zero-argument callable that completes the transfer and
    returns the numpy complex alms (the same result as
    :func:`map2alm_host`).  Callers that process many transforms can
    dispatch transform k+1 while transform k's readback is still in
    flight — at production sizes the ~GB-scale alm readbacks otherwise
    serialize behind the device compute (the DICES jackknife profile:
    ~90% of the stage was the host boundary).
    """
    if not isinstance(maps, jax.Array):
        maps = np.asarray(maps)
    if "fft_chirps" not in kw:
        kw["fft_chirps"] = _host_chirps(
            maps.shape[-1], lmax, kw.get("mmax"), maps.dtype, from_npix=True
        )
        if kw.get("iterations"):
            kw["fft_chirps_synth"] = _host_chirps(
                maps.shape[-1], lmax, kw.get("mmax"), maps.dtype,
                from_npix=True, kind="synthesis",
            )
    planes = _map2alm_planes(maps, lmax=lmax, **kw)
    try:
        planes.copy_to_host_async()
    except AttributeError:
        pass  # non-jax (already-host) result

    def result():
        p = np.asarray(planes)
        return np.ascontiguousarray(p[0] + 1j * p[1])

    return result


def map2alm_host(maps, lmax=None, **kw):
    """map2alm for host (numpy) callers; returns numpy complex alms.

    Device-resident ``jax.Array`` input is passed straight to the jitted
    transform (no host round-trip) — the DICES region-masked stacks are
    built on the device and come through here.
    """
    return map2alm_async(maps, lmax=lmax, **kw)()


def alm2map_host(alm, nside, lmax=None, **kw):
    """alm2map for host (numpy) callers; input numpy complex alms."""
    alm = np.asarray(alm)
    if "fft_chirps" not in kw:
        lmax_r = lmax
        if lmax_r is None and kw.get("packed", True):
            nlm = alm.shape[-1]
            lmax_r = int((np.sqrt(8 * nlm + 1) - 3) / 2 + 0.5)
        elif lmax_r is None:
            lmax_r = alm.shape[-2] - 1
        kw["fft_chirps"] = _host_chirps(
            int(nside), lmax_r, kw.get("mmax"), alm.real.dtype,
            from_npix=False, kind="synthesis",
        )
    re = np.ascontiguousarray(alm.real)
    im = np.ascontiguousarray(alm.imag)
    return np.asarray(_alm2map_planes(re, im, nside, lmax=lmax, **kw))


def pixel_window(nside, lmax, *, pol=False, method="auto"):
    """HEALPix pixel window w(l), l = 0..lmax (numpy, float64).

    The analog of healpy's tabulated ``pixwin`` (consumed by the
    reference at healpy.py:170-196 and twopoint.py:148-168).  With
    ``pol=True`` returns (2, lmax+1) [temperature, polarization]
    windows (the spin-2 window, used to deconvolve shear maps).

    ``method``:

    * ``"exact"`` — integrate the (spin-weighted) harmonics over the true
      pixel shapes (:func:`heracles_tpu.ops.pixwin.pixel_window_exact`);
      matches healpy's tables; cached on disk per nside.
    * ``"cap"`` — equal-area spherical-cap closed form; sub-percent low,
      but internally consistent (round trips stay exact).
    * ``"auto"`` (default) — exact when a disk cache exists or nside is
      small enough to compute on the fly (<= 32); cap otherwise, with a
      log hint to precompute.  Override with HERACLES_TPU_PIXWIN.
    """
    from . import pixwin as _pixwin

    # resolve the env override and the auto choice OUTSIDE the lru cache,
    # so a window table appearing later (precomputed in-session or by
    # another process) is picked up instead of freezing the first choice;
    # once "exact" resolves, pin it (tables don't vanish mid-run) so a
    # deconvolution-heavy pipeline doesn't re-glob the data dir per call
    method = os.environ.get("HERACLES_TPU_PIXWIN", method)
    if method == "auto":
        rkey = (int(nside), int(lmax), bool(pol))
        if rkey in _pixwin_resolved_exact:
            method = "exact"
        elif nside <= 32 or _pixwin.find_cached(nside, lmax, pol) is not None:
            method = "exact"
            _pixwin_resolved_exact.add(rkey)
        else:
            method = "cap"
            if nside not in _pixwin_warned_nsides:
                _pixwin_warned_nsides.add(nside)
                logger.info(
                    "pixel_window(nside=%d): no exact window cached; using "
                    "the cap approximation (precompute with "
                    "heracles_tpu.ops.pixwin.pixel_window_exact)", nside,
                )
    return _pixel_window_cached(int(nside), int(lmax), bool(pol), method)


_pixwin_resolved_exact = set()
_pixwin_warned_nsides = set()


@functools.lru_cache(maxsize=32)
def _pixel_window_cached(nside, lmax, pol, method):
    from . import pixwin as _pixwin

    if method == "exact":
        return _pixwin.pixel_window_exact(nside, lmax, pol=pol)
    if method != "cap":
        raise ValueError(f"unknown pixel window method: {method!r}")
    w = _pixwin.cap_window(nside, lmax)
    if pol:
        w = np.stack([w, w])
        w[1, : min(2, lmax + 1)] = 0.0
    return w
