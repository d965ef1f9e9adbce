"""HEALPix geometry in pure numpy / JAX (no healpy dependency).

Implements the RING-scheme geometry from the canonical HEALPix formulas
(Gorski et al. 2005): ring layout tables, ang2pix/pix2ang, RING<->NEST
conversion, and ud_grade resampling.  This replaces the reference's use of
the healpy C++ library (``/root/reference/heracles/healpy.py:157,205-209``)
with closed-form integer math that runs both on host (numpy, float64) and
on device (jax.numpy inside jit).

All functions are vectorised; ``xp`` selects the array backend so the same
algorithm serves host-side catalogue ingestion (exact float64 numpy) and
device-side jitted pipelines.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = [
    "nside2npix",
    "npix2nside",
    "nside2pixarea",
    "nside2nrings",
    "ring_geometry",
    "ang2pix_ring",
    "pix2ang_ring",
    "ring2nest",
    "nest2ring",
    "ud_grade",
]

# face row index (in units of nside) and face phi offset (in units of
# pi/4 / nside) for the 12 HEALPix base faces -- standard constants from
# the HEALPix paper.
_JRLL = np.array([2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4])
_JPLL = np.array([1, 3, 5, 7, 0, 2, 4, 6, 1, 3, 5, 7])


def nside2npix(nside):
    return 12 * nside * nside


def npix2nside(npix):
    nside = int(round((npix / 12) ** 0.5))
    if 12 * nside * nside != npix:
        raise ValueError(f"npix {npix} is not a valid HEALPix pixel count")
    return nside


def nside2pixarea(nside):
    return 4 * np.pi / nside2npix(nside)


def nside2nrings(nside):
    return 4 * nside - 1


@functools.lru_cache(maxsize=32)
def ring_geometry(nside):
    """Host-side ring layout tables for the RING scheme.

    Returns a dict of numpy arrays of length ``4*nside-1`` (one entry per
    isolatitude ring, north to south):

    - ``npix``:   number of pixels in the ring
    - ``start``:  RING-scheme index of the ring's first pixel
    - ``z``:      cos(theta) of the ring (float64)
    - ``theta``:  colatitude of the ring
    - ``phi0``:   azimuth of the first pixel centre
    - ``pair``:   index of the mirror ring (4*nside-2-r)
    """
    nside = int(nside)
    nr = 4 * nside - 1
    i = np.arange(1, nr + 1)  # 1-based ring index from the north pole
    npix_r = np.where(
        i < nside, 4 * i, np.where(i <= 3 * nside, 4 * nside, 4 * (4 * nside - i))
    )
    start = np.concatenate([[0], np.cumsum(npix_r)[:-1]])
    z = np.empty(nr)
    north = i < nside
    south = i > 3 * nside
    eq = ~(north | south)
    z[north] = 1.0 - (i[north] ** 2) / (3.0 * nside**2)
    z[eq] = 4.0 / 3.0 - 2.0 * i[eq] / (3.0 * nside)
    isouth = 4 * nside - i[south]
    z[south] = -1.0 + (isouth**2) / (3.0 * nside**2)
    # first pixel centre azimuth
    phi0 = np.empty(nr)
    phi0[north] = np.pi / (4.0 * i[north])
    # belt rings alternate: half-step offset iff (i + nside) is even
    s = (i[eq] - nside + 1) % 2
    phi0[eq] = np.where(s == 1, np.pi / (4.0 * nside), 0.0)
    phi0[south] = np.pi / (4.0 * isouth)
    theta = np.arccos(np.clip(z, -1.0, 1.0))
    # better accuracy near the poles: theta from sin for cap rings
    sth_cap = np.sqrt((1 - z) * (1 + z))
    theta = np.where(np.abs(z) > 0.99, np.where(z > 0, np.arcsin(sth_cap), np.pi - np.arcsin(sth_cap)), theta)
    return {
        "npix": npix_r.astype(np.int64),
        "start": start.astype(np.int64),
        "z": z,
        "theta": theta,
        "phi0": phi0,
        "pair": (nr - 1) - np.arange(nr),
    }


def _isqrt(x, xp):
    """Integer sqrt robust to float rounding (for cap ring lookup)."""
    s = xp.sqrt(x.astype(np.float64) + 0.5).astype(x.dtype)
    # two correction sweeps cover float32 backends without x64
    for _ in range(2):
        s = xp.where((s + 1) * (s + 1) <= x, s + 1, s)
        s = xp.where(s * s > x, s - 1, s)
    return s


def ang2pix_ring(nside, theta, phi, *, lonlat=False, xp=np):
    """RING-scheme pixel index of direction(s) (theta, phi) in radians.

    With ``lonlat=True``, arguments are (lon, lat) in degrees as in
    healpy's ``ang2pix(..., lonlat=True)`` used by the reference mapper
    (healpy.py:157).  Closed-form algorithm from the HEALPix paper.
    """
    if lonlat:
        lon, lat = theta, phi
        phi = xp.radians(lon)
        theta = xp.radians(90.0 - xp.asarray(lat))
    theta = xp.asarray(theta)
    phi = xp.asarray(phi)
    z = xp.cos(theta)
    za = xp.abs(z)
    tt = xp.mod(phi, 2 * np.pi) / (0.5 * np.pi)  # in [0, 4)

    # --- equatorial zone (|z| <= 2/3) ---
    temp1 = nside * (0.5 + tt)
    temp2 = nside * z * 0.75
    jp = xp.floor(temp1 - temp2).astype(np.int64)  # ascending edge line
    jm = xp.floor(temp1 + temp2).astype(np.int64)  # descending edge line
    ir = nside + 1 + jp - jm  # ring number counted from z = 2/3 (1..2*nside+1)
    kshift = 1 - (ir & 1)
    ip = (jp + jm - nside + kshift + 1) // 2
    ip = xp.mod(ip, 4 * nside)
    pix_eq = 2 * nside * (nside - 1) + (ir - 1) * (4 * nside) + ip

    # --- polar caps ---
    tp = tt - xp.floor(tt)
    # sin(theta) computed stably for both hemispheres
    tmp = nside * xp.sqrt(3.0 * (1.0 - za))
    jp_c = xp.floor(tp * tmp).astype(np.int64)
    jm_c = xp.floor((1.0 - tp) * tmp).astype(np.int64)
    ir_c = jp_c + jm_c + 1  # ring number counted from the closest pole
    ip_c = xp.floor(tt * ir_c).astype(np.int64)
    ip_c = xp.mod(ip_c, 4 * ir_c)
    pix_north = 2 * ir_c * (ir_c - 1) + ip_c
    pix_south = nside2npix(nside) - 2 * ir_c * (ir_c + 1) + ip_c
    pix_cap = xp.where(z > 0, pix_north, pix_south)

    return xp.where(za <= 2.0 / 3.0, pix_eq, pix_cap).astype(np.int64)


def _pix2ring_ipix(nside, pix, xp):
    """Return (1-based ring index, 0-based index in ring) for RING pixels."""
    npix = nside2npix(nside)
    ncap = 2 * nside * (nside - 1)
    pix = xp.asarray(pix)

    # north cap
    iring_n = (1 + _isqrt(1 + 2 * pix, xp)) // 2
    iphi_n = pix - 2 * iring_n * (iring_n - 1)

    # equatorial belt
    ipe = pix - ncap
    iring_e = ipe // (4 * nside) + nside
    iphi_e = xp.mod(ipe, 4 * nside)

    # south cap
    ips = npix - 1 - pix
    iring_s0 = (1 + _isqrt(1 + 2 * ips, xp)) // 2
    iring_s = 4 * nside - iring_s0
    iphi_s = 4 * iring_s0 - 1 - (ips - 2 * iring_s0 * (iring_s0 - 1))

    north = pix < ncap
    south = pix >= npix - ncap
    iring = xp.where(north, iring_n, xp.where(south, iring_s, iring_e))
    iphi = xp.where(north, iphi_n, xp.where(south, iphi_s, iphi_e))
    return iring, iphi


def pix2ang_ring(nside, pix, *, lonlat=False, xp=np):
    """(theta, phi) of RING pixel centres; (lon, lat) degrees if lonlat."""
    iring, iphi = _pix2ring_ipix(nside, pix, xp)
    # ring properties from closed form (backend-agnostic, no table gather)
    north = iring < nside
    south = iring > 3 * nside
    irs = 4 * nside - iring
    z = xp.where(
        north,
        1.0 - iring.astype(np.float64) ** 2 / (3.0 * nside**2),
        xp.where(
            south,
            -1.0 + irs.astype(np.float64) ** 2 / (3.0 * nside**2),
            4.0 / 3.0 - 2.0 * iring.astype(np.float64) / (3.0 * nside),
        ),
    )
    nr = xp.where(north, 4 * iring, xp.where(south, 4 * irs, 4 * nside))
    shift = xp.where(
        north | south, 1.0, ((iring - nside + 1) % 2).astype(np.float64)
    )
    phi = (iphi.astype(np.float64) + 0.5 * shift) * (2 * np.pi) / nr
    theta = xp.arccos(xp.clip(z, -1.0, 1.0))
    if lonlat:
        return xp.degrees(phi), 90.0 - xp.degrees(theta)
    return theta, phi


def _spread_bits(v):
    """Interleave zeros between the bits of v (numpy int64, v < 2**29)."""
    v = v.astype(np.int64)
    v = (v | (v << 16)) & 0x0000FFFF0000FFFF
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


def _compress_bits(v):
    v = v & 0x5555555555555555
    v = (v | (v >> 1)) & 0x3333333333333333
    v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v >> 4)) & 0x00FF00FF00FF00FF
    v = (v | (v >> 8)) & 0x0000FFFF0000FFFF
    v = (v | (v >> 16)) & 0x00000000FFFFFFFF
    return v


def _ring2xyf(nside, pix):
    """RING pixel -> (ix, iy, face). Host-side numpy, vectorised."""
    pix = np.asarray(pix, dtype=np.int64)
    npix = nside2npix(nside)
    ncap = 2 * nside * (nside - 1)
    iring, iphi1 = _pix2ring_ipix(nside, pix, np)
    iphi = iphi1 + 1  # 1-based within ring

    face = np.empty(pix.shape, dtype=np.int64)
    nr = np.empty(pix.shape, dtype=np.int64)
    kshift = np.empty(pix.shape, dtype=np.int64)

    north = pix < ncap
    south = pix >= npix - ncap
    eq = ~(north | south)

    # polar caps: each ring spans the 4 polar faces
    nr[north] = iring[north]
    face[north] = (iphi[north] - 1) // nr[north]
    kshift[north] = 0

    nr[south] = 4 * nside - iring[south]
    face[south] = (iphi[south] - 1) // nr[south] + 8
    kshift[south] = 0

    nr[eq] = nside
    kshift[eq] = (iring[eq] - nside) & 1
    ire = iring[eq] - nside + 1
    irm = 2 * nside + 2 - ire
    ifm = (iphi[eq] - ire // 2 + nside - 1) // nside
    ifp = (iphi[eq] - irm // 2 + nside - 1) // nside
    face_eq = np.where(ifp == ifm, ifp | 4, np.where(ifp < ifm, ifp, ifm + 8))
    face[eq] = face_eq

    irt = iring - _JRLL[face] * nside + 1
    ipt = 2 * iphi - _JPLL[face] * nr - kshift - 1
    ipt = np.where(ipt >= 2 * nside, ipt - 8 * nside, ipt)
    ix = (ipt - irt) >> 1
    iy = (-ipt - irt) >> 1
    return ix, iy, face


def _xyf2ring(nside, ix, iy, face):
    """(ix, iy, face) -> RING pixel. Host-side numpy, vectorised."""
    nl4 = 4 * nside
    jr = _JRLL[face] * nside - ix - iy - 1  # ring index (1-based)

    nr = np.empty(jr.shape, dtype=np.int64)
    n_before = np.empty(jr.shape, dtype=np.int64)
    kshift = np.empty(jr.shape, dtype=np.int64)

    north = jr < nside
    south = jr > 3 * nside
    eq = ~(north | south)

    nr[north] = jr[north]
    n_before[north] = 2 * nr[north] * (nr[north] - 1)
    kshift[north] = 0

    nrs = nl4 - jr[south]
    nr[south] = nrs
    n_before[south] = nside2npix(nside) - 2 * nrs * (nrs + 1)
    kshift[south] = 0

    nr[eq] = nside
    n_before[eq] = 2 * nside * (nside - 1) + (jr[eq] - nside) * nl4
    kshift[eq] = (jr[eq] - nside) & 1

    jp = (_JPLL[face] * nr + ix - iy + 1 + kshift) // 2
    jp = np.where(jp > nl4, jp - nl4, jp)
    jp = np.where(jp < 1, jp + nl4, jp)
    return n_before + jp - 1


def ring2nest(nside, pix):
    """Convert RING pixel indices to NEST (host numpy, vectorised)."""
    ix, iy, face = _ring2xyf(nside, pix)
    return face * nside * nside + (_spread_bits(ix) | (_spread_bits(iy) << 1))


def nest2ring(nside, pix):
    """Convert NEST pixel indices to RING (host numpy, vectorised)."""
    pix = np.asarray(pix, dtype=np.int64)
    face = pix // (nside * nside)
    rem = pix - face * nside * nside
    ix = _compress_bits(rem)
    iy = _compress_bits(rem >> 1)
    return _xyf2ring(nside, ix, iy, face)


@functools.lru_cache(maxsize=8)
def _udgrade_gather(nside_in, nside_out):
    """RING indices of the children (at nside_in) of each nside_out pixel.

    Returns an int array of shape (npix_out, (nside_in // nside_out)**2)
    suitable for a gather + mean (degrade).
    """
    assert nside_in % nside_out == 0
    rat = (nside_in // nside_out) ** 2
    npix_out = nside2npix(nside_out)
    nest_out = np.arange(npix_out, dtype=np.int64)
    children_nest = nest_out[:, None] * rat + np.arange(rat)[None, :]
    return nest2ring(nside_in, children_nest)


def ud_grade(m, nside_out, *, xp=np, power=None, dtype=None):
    """Up/downgrade a RING-ordered map to nside_out.

    Degrading averages the child pixels; upgrading repeats the parent value
    (matching healpy.ud_grade semantics used at reference healpy.py:209 and
    io.py:373).  ``power`` rescales by (nside_in/nside_out)**power.
    Works on batched maps with the pixel axis last.
    """
    m = xp.asarray(m)
    nside_in = npix2nside(m.shape[-1])
    if nside_in == nside_out:
        out = m
    elif nside_in > nside_out:
        gather = _udgrade_gather(nside_in, nside_out)
        out = xp.mean(m[..., gather], axis=-1)
    else:
        gather = _udgrade_gather(nside_out, nside_in)
        scatter = np.empty(nside2npix(nside_out), dtype=np.int64)
        scatter[gather.reshape(-1)] = np.repeat(
            np.arange(nside2npix(nside_in)), (nside_out // nside_in) ** 2
        )
        out = m[..., scatter]
    if power:
        out = out * (nside_in / nside_out) ** power
    if dtype is not None:
        out = out.astype(dtype)
    return out
