"""Exact HEALPix pixel window functions (scalar and polarization).

The pixel window of an azimuthally-averaged HEALPix pixelisation is

    w_l^2 = < 4 pi / ((2l+1) Omega_p^2) * sum_m |int_p  sY*_lm dOmega|^2 >_p

averaged over all pixels p (s = 0 for the scalar window, s = 2 for the
polarization window).  The reference consumes healpy's tabulated values
(/root/reference/heracles/healpy.py:170-196, twopoint.py:148-168); this
module computes the same quantity from scratch, TPU-first:

* each representative pixel is covered by its ``factor``^2 NESTED
  children at nside_hi = nside * factor, so the integral over the true
  pixel shape becomes an equal-area point sum;
* the per-pixel harmonic sums are reduced on device by the fused
  :func:`heracles_tpu.ops.wigner.lambda_power_scan` — the (l, m) alm
  table of every pixel is consumed per l-step and never materialised;
* the residual smoothing of the point sum (itself the fine grid's pixel
  window) is divided out with the cap-approximation window at nside_hi,
  where the cap model's error is second order;
* pixel congruence classes keep the work at O(nside) transforms: every
  ring's pixels are congruent up to an azimuthal rotation (belt rings by
  phi translation, cap rings by the 2pi/(4i) boundary-curve shift), and
  the azimuthal power average is rotation-invariant — one representative
  per ring; N/S mirror symmetry halves everything.

Windows cache to $HERACLES_TPU_CACHE like the quadrature ring weights.
"""

from __future__ import annotations

import functools
import logging
import os

import numpy as np

from ..healpix import nest2ring, pix2ang_ring, ring2nest
from . import wigner

logger = logging.getLogger(__name__)

__all__ = ["pixel_window_exact", "cap_window", "find_cached"]


def _cache_dir():
    return os.environ.get("HERACLES_TPU_CACHE", "/tmp/heracles_tpu_cache")


def find_cached(nside, lmax, pol):
    """Load a cached exact window covering (nside, lmax, pol), else None.

    Any cached file for the same nside with lmax' >= lmax serves (sliced);
    a pol=True cache also serves pol=False requests (its first row).
    """
    import glob

    packaged = os.path.join(os.path.dirname(__file__), "..", "data")
    try:
        paths = glob.glob(
            os.path.join(packaged, f"pixwin_{int(nside)}_*.npy")
        ) + glob.glob(
            os.path.join(_cache_dir(), f"pixwin_{int(nside)}_*.npy")
        )
    except OSError:
        return None
    for path in sorted(paths):
        try:
            _, _, lm, pl, _, _ = os.path.basename(path)[:-4].split("_")
            lm, pl = int(lm), int(pl)
        except ValueError:
            continue
        if lm < lmax or (pol and not pl):
            continue
        try:
            arr = np.load(path)
        except (OSError, ValueError):
            continue
        arr = arr[..., : lmax + 1]
        return arr if pol or arr.ndim == 1 else arr[0]
    return None


def cap_window(nside, lmax):
    """Equal-area spherical-cap approximation of the scalar window.

    w_l = [P_{l-1}(c) - P_{l+1}(c)] / ((2l+1)(1-c)), c = 1 - Omega/2pi.
    Used standalone as a fallback and to remove the sub-grid smoothing of
    the exact computation.
    """
    c = 1.0 - np.pi / (3.0 * nside * nside) / (2.0 * np.pi)
    P = np.empty(lmax + 2)
    P[0] = 1.0
    if lmax + 1 >= 1:
        P[1] = c
    for ell in range(2, lmax + 2):
        P[ell] = ((2 * ell - 1) * c * P[ell - 1] - (ell - 1) * P[ell - 2]) / ell
    w = np.empty(lmax + 1)
    w[0] = 1.0
    ell = np.arange(1, lmax + 1)
    w[1:] = (P[ell - 1] - P[ell + 1]) / ((2 * ell + 1) * (1.0 - c))
    return w


def _pixel_classes(nside, cap_samples):
    """Representative pixels (RING indices) and their multiplicities.

    Total multiplicity equals 12 nside^2.  Every ring's pixels are
    congruent up to an azimuthal rotation (belt rings by phi
    translation; cap rings repeat the same boundary curves shifted by
    2pi/(4i)), and the azimuthally-averaged power |a_lm|^2 is invariant
    under that rotation — so ONE representative per ring is exact.
    ``cap_samples > 1`` samples extra quadrant positions per cap ring
    (verified redundant: results are bit-identical for cap_samples
    1..32 at nside 64/128).
    """
    pix, wts = [], []
    # rings with position-dependent pixel shapes: the polar cap rings
    # (1 <= i < nside) *and* the cap/belt shoulder ring i = nside; shapes
    # repeat per quadrant, so sample quadrant positions j
    for i in range(1, nside + 1):
        if i < nside:
            start, quad = 2 * i * (i - 1), i
        else:
            start, quad = 2 * nside * (nside - 1), nside
        js = np.unique(
            np.round(np.linspace(0, quad - 1, min(quad, cap_samples))).astype(int)
        )
        alloc = np.zeros(js.size)
        near = np.abs(np.arange(quad)[:, None] - js[None, :]).argmin(axis=1)
        np.add.at(alloc, near, 1.0)
        pix.extend(start + js)
        wts.extend(8.0 * alloc)  # 4 quadrants x N/S mirror
    # interior belt rings: all 4*nside pixels congruent (phi translations)
    for i in range(nside + 1, 2 * nside + 1):
        start = 2 * nside * (nside - 1) + (i - nside) * 4 * nside
        pix.append(start)
        wts.append(4.0 * nside * (1.0 if i == 2 * nside else 2.0))
    pix = np.asarray(pix, dtype=np.int64)
    wts = np.asarray(wts)
    assert wts.sum() == 12.0 * nside * nside
    return pix, wts


@functools.lru_cache(maxsize=16)
def _subcell_moment(nside, factor=8, cap_samples=1):
    """Mean squared angular distance of pixel mass from the pixel centre.

    The midpoint point-sum over a fine grid *divides* the true integral
    by the fine pixels' own window (1-D analogy: midpoint of e^{ikx} =
    integral / sinc(kh/2)); to leading order that window is isotropic
    after the azimuthal/m average and depends only on this second
    moment: w_sub(l) = 1 - l(l+1) s2 / 4 + O((l theta_pix)^4).
    """
    pix, wts = _pixel_classes(nside, cap_samples)
    th0, ph0 = pix2ang_ring(nside, pix)
    th, ph = _children_angles(nside, pix, factor)
    cosd = (
        np.sin(th0)[:, None] * np.sin(th) * np.cos(ph - ph0[:, None])
        + np.cos(th0)[:, None] * np.cos(th)
    )
    d2 = np.arccos(np.clip(cosd, -1.0, 1.0)) ** 2
    return float(np.einsum("r,r->", wts / (12.0 * nside * nside),
                           d2.mean(axis=1)))


def _subcell_window(nside, lmax):
    """Small-l window of the midpoint sub-sampling at ``nside``."""
    ells = np.arange(lmax + 1)
    return 1.0 - ells * (ells + 1) * _subcell_moment(int(nside)) / 4.0


def _children_angles(nside, pix, factor):
    """(theta, phi) of the NESTED children covering each pixel."""
    th, ph, _ = _children_angles_rings(nside, pix, factor)
    return th, ph


def _children_angles_rings(nside, pix, factor):
    """(theta, phi, ring) of the NESTED children covering each pixel.

    ``ring`` is the child's iso-latitude ring index at nside*factor —
    children of one pixel span at most 2*factor - 1 distinct rings (the
    diagonals of the nested rhombus), which the power scan exploits by
    pre-summing the azimuthal phases per ring (~factor/2 x less Wigner
    work than per-point contraction, with identical results).
    """
    from ..healpix import _pix2ring_ipix

    pn = np.asarray(ring2nest(nside, pix))
    kids = pn[:, None] * factor**2 + np.arange(factor**2)[None, :]
    kr = np.asarray(nest2ring(nside * factor, kids.ravel()))
    th, ph = pix2ang_ring(nside * factor, kr)
    ring, _ = _pix2ring_ipix(nside * factor, kr, np)
    return (
        th.reshape(kids.shape),
        ph.reshape(kids.shape),
        np.asarray(ring).reshape(kids.shape),
    )


def _lane_setup(lmax, pol):
    """(ms, ns, weights) for the power scan: scalar block (+ spin blocks)."""
    m = np.arange(lmax + 1)
    eps0 = np.where(m == 0, 1.0, 2.0)
    if not pol:
        return m, np.zeros_like(m), eps0[None, :]
    # full-m spin-2 power: |a_{+2,l0}|^2 once, then |a_+|^2 + |a_-|^2
    epsP = np.where(m == 0, 0.5, 1.0)
    ms = np.concatenate([m, m, m])
    ns = np.concatenate([np.zeros_like(m), np.full_like(m, 2),
                         np.full_like(m, -2)])
    weights = np.zeros((2, 3 * (lmax + 1)))
    weights[0, : lmax + 1] = eps0
    weights[1, lmax + 1 :] = np.concatenate([epsP, epsP])
    return ms, ns, weights


def _rep_powers(th, ph, lmax, pol, chunk=64, rings=None, cache_key=None):
    """(nreps, K, lmax+1) lane-weighted powers, chunked device passes.

    Reps are processed in fixed-size chunks, one jitted dispatch per
    chunk (a single device program covering every chunk crashes the
    remote TPU worker at production sizes); the per-point Fourier
    factors are built inside the jit so no complex array crosses the
    host boundary.

    With ``rings`` (the children's iso-latitude ring indices), the
    azimuthal phases are pre-summed per distinct ring (a one-hot MXU
    contraction) before the Wigner scan — children of one pixel span at
    most ~2*factor rings, so the scan contracts ~factor/2 x fewer rows
    than points, with bit-identical geometry (children on a ring share
    theta exactly).
    """
    import jax
    import jax.numpy as jnp

    fdt = np.float64 if jax.config.jax_enable_x64 else np.float32
    ms, ns, weights = _lane_setup(lmax, pol)
    v = 1.0 / th.shape[-1]
    nreps, nch = th.shape

    if rings is not None:
        # sort children by ring, build per-rep row ids + row geometry
        order = np.argsort(rings, axis=1, kind="stable")
        rs = np.take_along_axis(rings, order, 1)
        th_s = np.take_along_axis(th, order, 1)
        ph_s = np.take_along_axis(ph, order, 1)
        new = np.concatenate(
            [np.ones((nreps, 1), bool), rs[:, 1:] != rs[:, :-1]], axis=1
        )
        row_of = np.cumsum(new, axis=1) - 1  # (nreps, nch)
        NR = int(row_of.max()) + 1
        row_theta = np.full((nreps, NR), np.pi / 2)
        row_theta[np.arange(nreps)[:, None], row_of] = th_s
        th_rows, ph_pts = row_theta, ph_s
    else:
        NR = nch
        row_of = np.broadcast_to(np.arange(nch)[None, :], (nreps, nch))
        th_rows, ph_pts = th, ph

    x = np.cos(th_rows).astype(fdt)
    logch = np.log(np.cos(th_rows / 2)).astype(fdt)
    logsh = np.log(np.sin(th_rows / 2)).astype(fdt)
    ph_pts = ph_pts.astype(fdt)
    row_of = row_of.astype(np.int32)
    # seed planes in host f64: the device f32 log/lgamma error floors bias
    # the seed magnitudes ~1e-4..1e-3 at production m (see wigner_seed_host).
    # The f64 (CPU) path computes equally-accurate seeds on device already.
    # Children lie on iso-latitude rings of the FINE grid, so the distinct
    # colatitudes across every rep number O(nside * factor), not
    # nreps * NR — dedupe before the expensive host seed evaluation
    # (at nside = 2048 this is ~30x less work and ~40x less memory).
    use_host_seeds = fdt == np.float32
    _seed_tables = {}

    def seed_tables():
        # lazy: a resumed build with all chunks checkpointed never pays
        # the ~minutes-long host seed evaluation
        if "mu" not in _seed_tables:
            mu = np.empty((ms.size, _uniq.size), np.float32)
            ku = np.empty(mu.shape, np.int32)
            for s in range(0, _uniq.size, 8192):
                mu[:, s : s + 8192], ku[:, s : s + 8192] = (
                    wigner.wigner_seed_host(ms, ns, _uniq[s : s + 8192])
                )
            _seed_tables["mu"] = mu
            _seed_tables["ku"] = ku
        return _seed_tables["mu"], _seed_tables["ku"]

    if use_host_seeds:
        _uniq, seed_of = np.unique(th_rows, return_inverse=True)
        seed_of = seed_of.reshape(th_rows.shape).astype(np.int32)
    else:
        seed_of = np.zeros((nreps, 1), np.int32)

    pad = (-nreps) % chunk
    if pad:
        x, logch, logsh, ph_pts, row_of, seed_of = (
            np.concatenate([a, np.repeat(a[:1], pad, axis=0)])
            for a in (x, logch, logsh, ph_pts, row_of, seed_of)
        )
    nchunks = x.shape[0] // chunk

    def reshape(a):
        return a.reshape((nchunks, chunk) + a.shape[1:])

    ms_j = jnp.asarray(ms, jnp.int32)
    ns_j = jnp.asarray(ns, jnp.int32)
    w_j = jnp.asarray(weights.astype(fdt))
    mf = jnp.asarray(np.arange(lmax + 1).astype(fdt))
    nm_blocks = ms.size // (lmax + 1)

    @jax.jit
    def one_chunk(xx, lc, ls, pp, ro, sm, sk):
        def one(args):
            xi, lci, lsi, ppi, roi, smi, ski = args
            expm = jnp.exp(-1j * mf[None, :] * ppi[:, None])  # (nch, lmax+1)
            onehot = (
                roi[:, None] == jnp.arange(NR, dtype=jnp.int32)[None, :]
            ).astype(fdt)
            # HIGHEST: the TPU's default f32 einsum runs bf16 MXU passes,
            # which biased every lane by ~8e-5 (visible as w[0] != 1)
            Frow = v * jnp.einsum(
                "cn,cl->nl", onehot, expm,
                precision=jax.lax.Precision.HIGHEST,
            )  # (NR, lmax+1)
            Fw = jnp.concatenate([Frow] * nm_blocks, axis=-1)
            seed = (smi, ski) if use_host_seeds else None
            return wigner.lambda_power_scan(
                ms_j, ns_j, xi, lci, lsi, lmax, Fw, w_j, seed=seed
            )

        return jax.vmap(one)((xx, lc, ls, pp, ro, sm, sk))

    xs, lcs, lss, phs, ros, sos = (
        reshape(a)
        for a in (x, logch, logsh, ph_pts, row_of, seed_of)
    )
    # per-chunk checkpoints: the remote TPU worker can crash mid-build
    # (20+ min at production nside), and a fresh process resumes here
    ck_path = None
    if cache_key is not None:
        try:
            os.makedirs(_cache_dir(), exist_ok=True)
            # the compute dtype is part of the key: a crash-resumed build
            # in a different-precision session (TPU f32 vs CPU x64) must
            # not silently mix chunk precisions into one window table
            tag = "f64" if fdt == np.float64 else "f32"
            ck_path = os.path.join(
                _cache_dir(), f"pwchunk_{cache_key}_{tag}"
            )
        except OSError:
            ck_path = None

    outs = []
    for c in range(nchunks):
        if c and c % 16 == 0:
            logger.info("pixel window scan: chunk %d/%d", c, nchunks)
        if ck_path and os.path.exists(f"{ck_path}_{c}.npy"):
            try:
                outs.append(np.load(f"{ck_path}_{c}.npy"))
                continue
            except (OSError, ValueError):
                pass
        if use_host_seeds:
            seed_mu, seed_ku = seed_tables()
            idx = sos[c]  # (chunk, NR)
            sm = np.ascontiguousarray(
                seed_mu[:, idx].transpose(1, 0, 2)
            )
            sk = np.ascontiguousarray(
                seed_ku[:, idx].transpose(1, 0, 2)
            )
        else:
            sm = np.zeros((chunk, 1, 1), np.float32)
            sk = np.zeros((chunk, 1, 1), np.int32)
        outs.append(np.asarray(one_chunk(
            jnp.asarray(xs[c]), jnp.asarray(lcs[c]), jnp.asarray(lss[c]),
            jnp.asarray(phs[c]), jnp.asarray(ros[c]),
            jnp.asarray(sm), jnp.asarray(sk),
        )))
        if ck_path:
            try:
                np.save(f"{ck_path}_{c}.npy", outs[-1])
            except OSError:
                ck_path = None
    if ck_path:
        import glob as _glob

        for f in _glob.glob(f"{ck_path}_*.npy"):
            try:
                os.remove(f)
            except OSError:
                pass
    out = np.stack(outs)
    return out.reshape((-1,) + out.shape[2:])[:nreps]


@functools.lru_cache(maxsize=16)
def pixel_window_exact(nside, lmax, *, pol=False, factor=16, cap_samples=1):
    """Exact azimuthally-averaged pixel window(s) for ``nside``.

    Returns (lmax+1,) for ``pol=False``; (2, lmax+1) [temperature,
    polarization] for ``pol=True`` (the polarization window is zero for
    l < 2, matching healpy's table layout; the reference only consumes
    l >= |spin| entries, twopoint.py:148-168).  ``factor`` must be a
    power of two (NESTED subdivision).
    """
    nside, lmax = int(nside), int(lmax)
    if factor & (factor - 1):
        raise ValueError("factor must be a power of two")

    hit = find_cached(nside, lmax, pol)
    if hit is not None:
        return hit
    cache = None
    try:
        os.makedirs(_cache_dir(), exist_ok=True)
        cache = os.path.join(
            _cache_dir(),
            f"pixwin_{nside}_{lmax}_{int(pol)}_{factor}_{cap_samples}.npy",
        )
    except OSError:
        cache = None

    logger.info(
        "computing exact pixel window nside=%d lmax=%d pol=%s", nside, lmax, pol
    )
    pix, wts = _pixel_classes(nside, cap_samples)
    th, ph, rings = _children_angles_rings(nside, pix, factor)
    powers = _rep_powers(
        th, ph, lmax, pol, rings=rings,
        cache_key=f"{nside}_{lmax}_{int(pol)}_{factor}_{cap_samples}",
    )  # (nreps, K, l+1)

    ells = np.arange(lmax + 1)
    npix = 12.0 * nside * nside
    wsq = np.einsum("r,rkl->kl", wts / npix, powers.astype(np.float64))
    wsq *= 4.0 * np.pi / (2 * ells + 1)
    w = np.sqrt(np.maximum(wsq, 0.0))
    # the midpoint point-sum over-estimates the integral by the inverse
    # of the fine grid's own window; multiply it back in (second-moment
    # model, exact to O((l/nside_hi)^4) — see _subcell_moment)
    w *= _subcell_window(nside * factor, lmax)
    # w(l=0) = 1 analytically (Y_00 is constant over the pixel); the
    # device-f32 scan leaves a common-mode scale residual ~1e-7, which
    # dividing by the measured l=0 value removes from every lane
    if w[0, 0] > 0:
        w /= w[0, 0]
    # the true windows are non-increasing in l (scalar from l=0, the
    # polarized window from its l=2 onset); the residual ~1e-7 device
    # noise can exceed the tiny low-l decrement at large nside, so
    # project onto the monotone cone (changes values only at the noise
    # scale, and keeps w <= 1)
    w[0] = np.minimum.accumulate(np.minimum(w[0], 1.0))
    if pol and lmax >= 2:
        w[1, 2:] = np.minimum.accumulate(np.minimum(w[1, 2:], 1.0))

    if pol:
        w[1, : min(2, lmax + 1)] = 0.0
        out = w
    else:
        out = w[0]
    if cache:
        try:
            np.save(cache, out)
        except OSError:
            pass
    return out
