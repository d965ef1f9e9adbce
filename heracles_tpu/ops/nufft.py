"""Gridded (type-1 NUFFT) adjoint spherical-harmonic synthesis.

The exact pixel-free adjoint (``mappers.DiscreteMapper``) costs
O(N * lmax^2) per point block — exact, but hopeless for the 10^8..10^9-row
catalogues the reference handles through ducc's NUFFT-style
``adjoint_synthesis_general`` with an accuracy parameter ``epsilon``
(/root/reference/heracles/ducc.py:108-128).  This module is the TPU-native
equivalent: an *exponential-of-semicircle* (ES) kernel spreading of the
points onto a (theta, phi) torus grid, FFT-space kernel deconvolution,
and the repo's Wigner-scan ring analysis on a coarse exact grid.

Why a torus: a band-limited spin-s function on the sphere extends to a
2-pi-periodic function of colatitude (the "double Fourier sphere"),
f(-theta, phi) = (-1)^s f(theta, phi + pi), with *exact* Fourier degree
lmax in both directions (Wigner d-functions are trigonometric
polynomials).  Spreading therefore needs no pole special-casing — the
stencil simply wraps modulo the torus — and everything after the spread
is exact in exact arithmetic:

1. **Spread** (host): each point scatters onto a w x w stencil of the
   oversampled torus grid with separable ES kernel weights; error of the
   whole method is the kernel's aliasing error ~10^-(w-1) at 2x
   oversampling (same law as FINUFFT / ducc).
2. **Deconvolve** (device): FFT along phi and theta, divide out the
   kernel transforms, keeping harmonic orders m <= lmax and torus
   frequencies |k| <= lmax.  This yields S[k, m] = sum_p v_p
   e^{-ik theta_p} e^{-im phi_p} to accuracy epsilon.
3. **Reduce** (device): inverse-FFT S onto a *coarse* torus grid of
   2*(lmax+1) rows — exactly enough that the discrete row sum against
   any degree-lmax trig polynomial is the true coefficient sum (a
   Dirichlet-kernel identity, no quadrature weights) — fold the
   southern torus half with the (-1)^(m+s) extension sign, and contract
   with the standard ring analysis scan.

The result equals sum_p v_p conj(sYlm(p)) to ~epsilon * ||v||, at
O(N * w^2) spread cost instead of O(N * lmax^2).
"""

from __future__ import annotations

import ctypes
import functools
import hashlib
import logging
import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np

from . import sht

logger = logging.getLogger(__name__)

__all__ = ["adjoint_gridded", "kernel_width", "grid_shape"]

SIGMA = 2.0  # oversampling factor of the spread grid
_SPREAD_CHUNK = 1 << 20  # points per host spreading block


@functools.lru_cache(maxsize=1)
def _native_spread():
    """ctypes handle of the C++ ES spreading kernel, or None.

    Compiled on first use from ``_spread.cpp`` next to this module into
    $HERACLES_TPU_CACHE (content-addressed, so source edits recompile).
    ``HERACLES_TPU_NO_NATIVE=1`` forces the numpy fallback.
    """
    if os.environ.get("HERACLES_TPU_NO_NATIVE"):
        return None
    src = os.path.join(os.path.dirname(__file__), "_spread.cpp")
    try:
        with open(src, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        cache = os.environ.get("HERACLES_TPU_CACHE", "/tmp/heracles_tpu_cache")
        os.makedirs(cache, exist_ok=True)
        lib = os.path.join(cache, f"heracles_spread_{tag}.so")
        if not os.path.exists(lib):
            tmp = lib + f".build{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", tmp, src],
                check=True, capture_output=True,
            )
            os.replace(tmp, lib)
        dll = ctypes.CDLL(lib)
    except (OSError, subprocess.SubprocessError) as exc:
        logger.warning("native spread kernel unavailable (%s); "
                       "falling back to numpy", exc)
        return None
    fn = dll.spread_es
    p64 = ctypes.POINTER(ctypes.c_double)
    fn.argtypes = [ctypes.c_int64, p64, p64, ctypes.c_int64,
                   ctypes.c_int64, p64, p64, ctypes.c_int64,
                   ctypes.c_int64, ctypes.c_int32, ctypes.c_double]
    fn.restype = None
    return fn


def alloc_padded(nrows, lmax, w, complex_vals):
    """Wrap-padded spreading scratch for the paged accumulation path.

    Allocated once per catalogue (DiscreteMapper.begin) and reused for
    every page — per-page allocation + folding of the full-grid scratch
    would cost O(grid) per page regardless of page size.
    """
    ntheta, nphi = grid_shape(lmax)
    ncomp = 2 if complex_vals else 1
    return np.zeros((nrows, ntheta + w, nphi + w, ncomp))


def spread_padded(theta, phi, values, lmax, w, pad):
    """Spread one page of points into the padded scratch (no fold)."""
    fn = _native_spread()
    if fn is None:
        raise RuntimeError("native spreader unavailable")
    beta = _es_beta(w)
    complex_vals = np.iscomplexobj(values)
    ncomp = 2 if complex_vals else 1
    nrows = values.shape[0]
    ntheta, nphi = grid_shape(lmax)
    theta = np.ascontiguousarray(theta, np.float64)
    phi = np.ascontiguousarray(phi, np.float64)
    vals = np.ascontiguousarray(
        values, np.complex128 if complex_vals else np.float64
    )
    p64 = ctypes.POINTER(ctypes.c_double)
    fn(theta.size,
       theta.ctypes.data_as(p64), phi.ctypes.data_as(p64),
       nrows, ncomp, vals.view(np.float64).ctypes.data_as(p64),
       pad.ctypes.data_as(p64), ntheta, nphi, w, beta)
    return pad


def fold_padded(pad, lmax, w, complex_vals):
    """Fold the torus wrap margins; consumes ``pad``, returns the grid."""
    ntheta, nphi = grid_shape(lmax)
    pad[:, :w] += pad[:, ntheta:]
    pad = pad[:, :ntheta]
    pad[:, :, :w] += pad[:, :, nphi:]
    pad = np.ascontiguousarray(pad[:, :, :nphi])
    if complex_vals:
        pad = pad.view(np.complex128)
    return pad.reshape(pad.shape[0], ntheta, nphi)


def _spread_native(fn, theta, phi, values, lmax, w, grid):
    """Spread via the C++ kernel into a wrap-padded scratch, then fold."""
    complex_vals = np.iscomplexobj(values)
    pad = alloc_padded(values.shape[0], lmax, w, complex_vals)
    spread_padded(theta, phi, values, lmax, w, pad)
    grid += fold_padded(pad, lmax, w, complex_vals).reshape(grid.shape[0], -1)
    return grid


def kernel_width(epsilon):
    """ES kernel width (stencil size) needed for aliasing error epsilon.

    At 2x oversampling the ES kernel reaches ~10^-(w-1); clamp to the
    practical range (w=16 ~ 1e-15, beyond f64).
    """
    w = int(np.ceil(np.log10(1.0 / float(epsilon)))) + 1
    return max(4, min(w, 16))


def _es_beta(w):
    # FINUFFT's calibrated ES shape parameter at sigma = 2
    return float(np.pi * w * (1.0 - 1.0 / (2.0 * SIGMA)) * 0.976)


def _es_kernel(z, beta):
    """exp(beta * (sqrt(1 - z^2) - 1)) on |z| <= 1, 0 outside."""
    inside = np.abs(z) <= 1.0
    t = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    return np.where(inside, np.exp(beta * (t - 1.0)), 0.0)


def _kernel_ft(w, h, beta, ks):
    """kappahat(k) = int kappa(x / (w h / 2)) cos(k x) dx over the support."""
    half = 0.5 * w * h
    zq, wq = np.polynomial.legendre.leggauss(96)
    xq = zq * half
    kv = _es_kernel(zq, beta) * (half * wq)
    return np.cos(np.outer(np.asarray(ks, np.float64), xq)) @ kv


def _good_size(n):
    """Next 'fast FFT' size >= n: 2^a * {1, 3, 5} (device-friendly radices)."""
    best = 1 << (int(n - 1)).bit_length()
    for mult in (3, 5):
        p = 1
        while p * mult < n:
            p <<= 1
        best = min(best, p * mult)
    return best


def grid_shape(lmax):
    """(ntheta, nphi) of the oversampled torus spread grid."""
    n = _good_size(int(np.ceil(2 * SIGMA * (lmax + 1))))
    return n, n


def spread_torus(theta, phi, values, lmax, w, grid=None):
    """Spread weighted points onto the (ntheta, nphi) torus grid (host).

    ``values``: (nrows, npts) float64 or complex128.  Returns (and
    accumulates into ``grid`` if given) a (nrows, ntheta, nphi) array of
    the same scalar kind.  Stencils wrap modulo the torus, which *is*
    the double-Fourier-sphere extension — no pole cases.
    """
    ntheta, nphi = grid_shape(lmax)
    beta = _es_beta(w)
    values = np.asarray(values)
    complex_vals = np.iscomplexobj(values)
    if grid is None:
        grid = np.zeros(
            (values.shape[0], ntheta * nphi),
            np.complex128 if complex_vals else np.float64,
        )
    else:
        grid = grid.reshape(values.shape[0], ntheta * nphi)
    native = _native_spread()
    if native is not None:
        _spread_native(native, theta, phi, values, lmax, w, grid)
        return grid.reshape(values.shape[0], ntheta, nphi)
    ht = 2.0 * np.pi / ntheta
    hp = 2.0 * np.pi / nphi
    offs = np.arange(w)
    half_w = 0.5 * w
    for start in range(0, theta.size, _SPREAD_CHUNK):
        sl = slice(start, start + _SPREAD_CHUNK)
        ut = np.asarray(theta[sl], np.float64) / ht - 0.5  # nodes at (j+1/2)ht
        up = np.asarray(phi[sl], np.float64) / hp  # nodes at k*hp
        jt0 = np.ceil(ut - half_w).astype(np.int64)
        jp0 = np.ceil(up - half_w).astype(np.int64)
        wt = _es_kernel((jt0[:, None] + offs - ut[:, None]) / half_w, beta)
        wp = _es_kernel((jp0[:, None] + offs - up[:, None]) / half_w, beta)
        jt = (jt0[:, None] + offs) % ntheta
        jp = (jp0[:, None] + offs) % nphi
        v = values[:, sl]
        for a in range(w):
            base = jt[:, a] * nphi
            for b in range(w):
                idx = base + jp[:, b]
                coef = wt[:, a] * wp[:, b]
                for r in range(v.shape[0]):
                    vr = v[r] * coef
                    grid[r] += np.bincount(
                        idx, weights=vr.real, minlength=grid.shape[1]
                    )
                    if complex_vals:
                        grid[r] += 1j * np.bincount(
                            idx, weights=vr.imag, minlength=grid.shape[1]
                        )
    return grid.reshape(values.shape[0], ntheta, nphi)


@functools.lru_cache(maxsize=8)
def _coarse_geometry(lmax, f32):
    """Host-f64 ring geometry of the coarse contraction grid."""
    from ..mappers import _point_geometry

    nc = 2 * (lmax + 1)
    hc = 2.0 * np.pi / nc
    th = (np.arange(nc // 2) + 0.5) * hc
    return _point_geometry(th, np.float32 if f32 else np.float64)


def _deconv_factors(lmax, w, fdt):
    """Host constants of the device reduce: 1/kernel-FT rows and phases."""
    ntheta, nphi = grid_shape(lmax)
    beta = _es_beta(w)
    ms = np.arange(lmax + 1)
    inv_phi = (2.0 * np.pi / nphi) / _kernel_ft(w, 2 * np.pi / nphi, beta, ms)
    ks = np.arange(-lmax, lmax + 1)
    ht = 2.0 * np.pi / ntheta
    # S_k = e^{-ik ht/2} FFT_k (half-offset rows), deconvolved; the coarse
    # inverse transform carries the matching e^{+ik hc/2} row phase
    nc = 2 * (lmax + 1)
    hc = 2.0 * np.pi / nc
    dec = (ht / _kernel_ft(w, ht, beta, ks)) * np.exp(
        1j * ks * (hc - ht) / 2.0
    )
    cdt = np.complex64 if fdt == np.float32 else np.complex128
    return inv_phi.astype(fdt), dec.astype(cdt)


@functools.partial(
    jax.jit, static_argnames=("lmax", "spin", "real_grid", "m_chunk")
)
def _reduce_grid(grid_re, grid_im, inv_phi, dec_re, dec_im, geom, lmax,
                 spin, real_grid, m_chunk):
    """Device: torus grid -> packed alm real/imag planes.

    ``grid_re``/``grid_im``: (nrows, ntheta, nphi) real planes (the
    imaginary plane is a dummy for ``real_grid``); ``geom``: the
    coarse-grid ``_point_geometry`` tuple.  All inputs and outputs are
    real planes — complex arrays cannot cross the jit/transfer boundary
    on the tunnelled TPU backend (see sht.map2alm_host).  Returns
    (re, im) of the packed alms: (nrows, nlm) for spin 0, else
    (nrows, 2, nlm) stacked (E, B).
    """
    grid = grid_re if real_grid else grid_re + 1j * grid_im
    dec_theta = dec_re + 1j * dec_im
    nm = lmax + 1
    nm_pad = sht._mmax_pad(lmax, m_chunk)
    ntheta = grid.shape[-2]
    nc = 2 * (lmax + 1)

    # phi FFT -> harmonic orders 0..lmax (+ the conjugate lane for spin)
    if real_grid:
        F = jnp.fft.rfft(grid, axis=-1)[..., :nm]
        lanes = (F,)
        ns = (0,)
    else:
        full = jnp.fft.fft(grid, axis=-1)
        F1 = full[..., :nm]
        idx = (-jnp.arange(nm)) % grid.shape[-1]
        F2 = jnp.conj(full[..., idx])
        lanes = (F1, F2)
        ns = (spin, -spin)

    outs = []
    for F in lanes:
        F = F * inv_phi
        # theta FFT over the torus rows; keep |k| <= lmax
        T = jnp.fft.fft(F, axis=-2)
        S = jnp.concatenate([T[..., -lmax:, :], T[..., : lmax + 1, :]],
                            axis=-2)
        S = S * dec_theta[:, None]
        # coarse synthesis G_j = (1/nc) sum_k S_k e^{ik (j+1/2) hc} over nc
        # rows: the 1/nc prefactor is the Dirichlet-identity normalisation
        # of the row sum against degree-lmax trig polynomials, and it is
        # exactly what jnp.fft.ifft carries
        spec = jnp.zeros(S.shape[:-2] + (nc, nm), S.dtype)
        spec = spec.at[..., : lmax + 1, :].set(S[..., lmax:, :])
        spec = spec.at[..., nc - lmax :, :].set(S[..., :lmax, :])
        G = jnp.fft.ifft(spec, axis=-2)
        # fold the southern torus half: row nc-1-j pairs with row j and
        # carries the extension sign (-1)^(m+s)
        GN = G[..., : nc // 2, :]
        GS = jnp.flip(G[..., nc // 2 :, :], axis=-2)
        sgn = jnp.where(jnp.arange(nm) % 2 == 0, 1.0, -1.0) * (
            -1.0 if spin % 2 else 1.0
        )
        Ff = GN + sgn * GS
        Ff = jnp.pad(Ff, [(0, 0)] * (Ff.ndim - 1) + [(0, nm_pad - nm)])
        outs.append(Ff)

    x, logch, logsh, lo_ch, lo_sh = geom
    lanes = sht._analysis_rect_points(
        tuple(outs), x, logch, logsh, lmax, ns, m_chunk,
        geom_lo=(lo_ch, lo_sh),
    )
    nm_out = lmax + 1
    if spin == 0:
        packed = sht.pack_alm(lanes[0][..., :nm_out], lmax, lmax)
    else:
        a_p, a_m = lanes
        alm_e = -(a_p[..., :nm_out] + a_m[..., :nm_out]) / 2
        alm_b = 1j * (a_p[..., :nm_out] - a_m[..., :nm_out]) / 2
        packed = sht.pack_alm(jnp.stack([alm_e, alm_b], axis=-3), lmax, lmax)
    return jnp.real(packed), jnp.imag(packed)


def adjoint_gridded(theta, phi, values, lmax, spin=0, epsilon=1e-12,
                    f32=False, grid=None):
    """a_lm = sum_p v_p conj(sYlm(p)) via kernel spreading, to ~epsilon.

    ``values``: (nrows, npts) real for spin 0; for spin != 0 one complex
    row u = v1 + i v2 per field.  Returns packed alms — (nrows, nlm)
    complex for spin 0; (nrows, 2, nlm) (E, B) for spin != 0.
    ``grid``: optionally a pre-spread torus grid (then theta/phi/values
    may be empty) — the paged accumulation path spreads incrementally
    and reduces once.
    """
    w = kernel_width(epsilon)
    if grid is None:
        if spin == 0:
            vals = np.asarray(values, np.float64)
        else:
            vals = np.asarray(values)
            if not np.iscomplexobj(vals):
                vals = vals[0] + 1j * vals[1]
                vals = vals.reshape(1, -1)
        grid = spread_torus(theta, phi, vals, lmax, w)
    fdt = np.float32 if f32 else np.float64
    inv_phi, dec = _deconv_factors(lmax, w, fdt)
    geom = _coarse_geometry(lmax, f32)
    real_grid = not np.iscomplexobj(grid)
    if real_grid:
        gre = jnp.asarray(np.ascontiguousarray(grid.real).astype(fdt))
        gim = jnp.zeros((1, 1, 1), fdt)
    else:
        gre = jnp.asarray(np.ascontiguousarray(grid.real).astype(fdt))
        gim = jnp.asarray(np.ascontiguousarray(grid.imag).astype(fdt))
    re, im = _reduce_grid(
        gre, gim, jnp.asarray(inv_phi),
        jnp.asarray(np.ascontiguousarray(dec.real).astype(fdt)),
        jnp.asarray(np.ascontiguousarray(dec.imag).astype(fdt)),
        geom, lmax, abs(int(spin)), real_grid, sht.DEFAULT_M_CHUNK,
    )
    return np.asarray(re) + 1j * np.asarray(im)
