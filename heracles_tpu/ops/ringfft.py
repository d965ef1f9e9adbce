"""Batched Fourier analysis/synthesis over HEALPix isolatitude rings.

This is phase 1 of the TPU-native spherical harmonic transform (the role
played by libsharp's per-ring FFTs inside ``healpy.map2alm`` at reference
``/root/reference/heracles/healpy.py:183-189``).  HEALPix rings are ragged
(ring *i* has ``nph = 4i`` pixels in the caps and ``4*nside`` in the belt),
which does not map onto a single batched FFT.  Instead of per-ring native
FFTs (a CPU pattern), we use a TPU-first decomposition:

* the equatorial belt (2/3 of all pixels, every ring ``nph = 4*nside``) is
  one contiguous reshape + one batched complex FFT;
* polar-cap rings are grouped into near-octave buckets (rings with
  similar ``nph``) and each bucket is evaluated with a batched
  **Bluestein chirp-z transform** at a common power-of-two length, so
  every transform in a bucket has the same static shape regardless of
  the ring's true ``nph``;
* harmonic orders ``m >= nph`` are produced *directly* by the chirp
  transform (its modulus is the ring length while its output extent is
  the order range — ``e^{2 pi i m p / nph}`` is periodic in m), so the
  aliasing costs neither gathers nor scatters.

TPU gathers/scatters are avoided throughout: ring extraction is a scan
of contiguous dynamic slices, pixel write-back overwrites each row's
padding with the next row's data, and the belt is pure reshapes.
Everything is shape-static and jit-friendly: bucket boundaries are
host-side constants derived from ``nside`` only.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..healpix import nside2npix

__all__ = ["ring_analysis", "ring_synthesis", "ring_plan", "chirp_fft_planes"]


def _next_pow2(n):
    return 1 << max(0, int(math.ceil(math.log2(max(1, n)))))


@functools.lru_cache(maxsize=32)
def ring_plan(nside, mext=None):
    """Host-side static plan of ring buckets for a given nside.

    Returns a tuple of bucket dicts, in north-to-south ring order, each with

    - ``rings``: (start, stop) ring-index range [start, stop)
    - ``pix``:   (start, stop) RING pixel range of those rings
    - ``nph``:   numpy array of ring lengths in the bucket
    - ``phi0``:  numpy array of first-pixel azimuths
    - ``L``:     the common FFT length for the bucket
    - ``belt``:  True for the equatorial belt (direct FFT, no chirp)

    With ``mext`` (the number of harmonic orders, m0 + nm), cap rings are
    bucketed by the Bluestein transform length they actually need —
    ``next_pow2(nph + mext + 1)`` (data extent + output extent) — which
    both tightens the padded lengths (the octave rule pads the largest
    cap rings 2x beyond need at production lmax) and makes ``L`` directly
    usable by the chirp transforms with no further adjustment.
    """
    nside = int(nside)
    nr = 4 * nside - 1
    i = np.arange(1, nr + 1)
    nph = np.where(
        i < nside, 4 * i, np.where(i <= 3 * nside, 4 * nside, 4 * (4 * nside - i))
    ).astype(np.int64)
    start = np.concatenate([[0], np.cumsum(nph)[:-1]])
    phi0 = np.empty(nr)
    north = i < nside
    south = i > 3 * nside
    eq = ~(north | south)
    phi0[north] = np.pi / nph[north]
    phi0[south] = np.pi / nph[south]
    phi0[eq] = np.where((i[eq] - nside) % 2 == 0, np.pi / (4 * nside), 0.0)

    buckets = []

    def add_bucket(r0, r1, belt):
        n_max = int(nph[r0:r1].max())
        if belt:
            L = 4 * nside
        elif mext is not None:
            L = _next_pow2(n_max + int(mext) + 1)
        else:
            L = _next_pow2(2 * n_max)
        buckets.append(
            {
                "rings": (int(r0), int(r1)),
                "pix": (int(start[r0]), int(start[r1 - 1] + nph[r1 - 1])),
                "nph": nph[r0:r1].copy(),
                "phi0": phi0[r0:r1].copy(),
                "L": int(L),
                "belt": bool(belt),
            }
        )

    # cap grouping: without mext, rings whose nph fits within a factor
    # `stride` share a bucket (fewer, larger batched FFTs; padding waste
    # is bounded by the smallest rings, which hold few pixels); with
    # mext, group by the needed transform length directly
    stride = 4

    # north cap: rings 0 .. nside-2, nph ascending
    r = 0
    while r < nside - 1:
        if mext is not None:
            g = _next_pow2(int(nph[r]) + int(mext) + 1) - int(mext) - 1
        else:
            g = _next_pow2(int(nph[r])) * (stride // 2)
        r1 = r
        while r1 < nside - 1 and nph[r1] <= g:
            r1 += 1
        add_bucket(r, r1, belt=False)
        r = r1
    n_north = len(buckets)
    # belt: rings nside-1 .. 3*nside-1 inclusive
    add_bucket(nside - 1, 3 * nside, belt=True)
    # south cap: mirror the north buckets exactly (so N/S pairs align)
    for i in range(n_north - 1, -1, -1):
        nr0, nr1 = buckets[i]["rings"]
        add_bucket(nr - nr1, nr - nr0, belt=False)
    # record the mirror pairing: north bucket i <-> bucket len-1-i
    for i, b in enumerate(buckets):
        b["pair"] = len(buckets) - 1 - i
    return tuple(buckets)


def _real_dtype(dtype):
    return jnp.float64 if dtype in (jnp.float64, jnp.complex128) else jnp.float32


def _complex_dtype(dtype):
    return jnp.complex128 if dtype in (jnp.float64, jnp.complex128) else jnp.complex64


def _chirp_from_index(q, nph, sign, rdt):
    """exp(sign * 1j * pi * q^2 / nph) for any q >= 0.

    q^2 is reduced mod 2*nph in integer arithmetic so large q lose no
    precision in the reduced angle.  No support mask: the chirp identity
    holds for indices beyond the modulus too, which is what evaluates
    aliased orders (m >= nph) directly.
    """
    ang = jnp.pi * (q * q % (2 * nph)).astype(rdt) / nph.astype(rdt)
    return jnp.exp(1j * sign * ang)


def _chirp_rows(nph, L, T, b_sign, rdt):
    """Chirp sequence b[idx] = e^{b_sign i pi j^2 / nph}, split at ``T``.

    ``j = idx`` for idx < T (the positive offsets k - p, k the output
    index) and ``j = idx - L`` for idx >= T (the negative offsets; the
    chirp is even, so |j| = L - idx is used).  Validity needs only
    T >= output extent and L - T >= data extent - 1, i.e.
    L >= data extent + output extent - 1 — not the 2*max(extents) that a
    mid-split (T = L/2) would require.
    """
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    j = jnp.where(idx < T, idx, L - idx)
    return _chirp_from_index(j, nph, b_sign, rdt)


def _bluestein_dft(vals, nph, L, *, sign, out_extent=None, fftb=None):
    """Per-row chirp transform with per-row modulus ``nph``.

    vals: (..., R, L) complex, zero beyond each row's data extent.
    nph:  (R,) int32 moduli.  Returns (..., R, L) complex where entry k
    holds sum_p vals[r, p] * exp(sign * 2j*pi*k*p/nph[r]) for every
    output index k < ``out_extent`` (default L//2), provided
    L >= data extent + out_extent - 1.  Entries k >= nph[r] evaluate the
    aliased series exactly (e^{2pi i kp/n} is periodic in k mod n).

    ``fftb``: optional precomputed ``fft(b)`` for this bucket, split
    point and sign (see :func:`chirp_fft_planes`) — passed as a jit
    *argument* so the chirp FFT (a third of the cap cost) runs once per
    session instead of once per call; big device constants cannot be
    closed over on this platform (literal embedding is prohibitively
    slow over the tunnel).
    """
    rdt = _real_dtype(vals.dtype)
    nphc = nph[:, None]
    p = jnp.arange(L, dtype=jnp.int32)[None, :]
    # e^{sigma 2pi i kp/n} = w_k w_p b_{k-p} with w_x = e^{sigma i pi x^2/n},
    # b_j = e^{-sigma i pi j^2/n}
    w = _chirp_from_index(p, nphc, sign, rdt)
    if fftb is None:
        T = L // 2 if out_extent is None else out_extent
        b = _chirp_rows(nphc, L, T, -sign, rdt)
        fftb = jnp.fft.fft(b, axis=-1)
    conv = jnp.fft.ifft(jnp.fft.fft(vals * w, axis=-1) * fftb, axis=-1)
    return conv * w


def _build_chirp_fft(nph, T, L, rdt_str):
    """fft(b) planes for one cap bucket, chirp sign +1 (serves sign=-1).

    Returns (2, R, L) float planes [re, im] as a device array.  The
    other sign's spectrum is the conjugate-reflected one (see
    :func:`_fftb_of_sign`), so only one is stored.  ``nph`` and ``T``
    are traced (not static) so mirror buckets and both split kinds
    share one compilation per (R, L) shape — compiles are ~30 s each
    over the TPU tunnel.
    """
    rdt = jnp.dtype(rdt_str)
    fb = jnp.fft.fft(_chirp_rows(nph[:, None], L, T, 1, rdt), axis=-1)
    return jnp.stack([fb.real, fb.imag]).astype(rdt)


_build_chirp_fft_jit = jax.jit(
    _build_chirp_fft, static_argnames=("L", "rdt_str")
)


def chirp_fft_planes(nside, mext, rdt_str="float32", kind="analysis"):
    """Device-resident fft(chirp) planes per cap bucket of the plan.

    One entry per bucket of ``ring_plan(nside, mext)`` (None for the
    belt), each a (2, R, L) float array of [re, im] planes of
    ``fft(b)`` for chirp sign +1.  Pass the result to
    :func:`ring_analysis` (``kind="analysis"``) or
    :func:`ring_synthesis` (``kind="synthesis"``) as ``chirps=`` —
    through a jit boundary as a regular argument, NOT a closure.

    The two directions need different chirp split points (the output
    extent is the harmonic orders for analysis but the ring length for
    synthesis), hence the ``kind`` key.
    """
    if kind == "analysis":
        # analysis consumers run the Wigner kernels on 128-lane-padded
        # m axes; building the planes at the padded extent lets the FFT
        # produce the padded width directly (no separate pad pass).
        # Normalizing BEFORE the cached builder means different mext
        # values that round to the same 128 multiple share one entry.
        mext = -(-int(mext) // 128) * 128
    return _chirp_fft_planes_cached(int(nside), int(mext), rdt_str, kind)


@functools.lru_cache(maxsize=16)
def _chirp_fft_planes_cached(nside, mext, rdt_str, kind):
    plan = ring_plan(int(nside), int(mext))
    out = []
    for b in plan:
        if b["belt"]:
            out.append(None)
        else:
            T = int(mext) if kind == "analysis" else int(b["nph"].max())
            fb = _build_chirp_fft_jit(
                np.asarray(b["nph"], np.int32), np.int32(T), b["L"], rdt_str
            )
            fb.block_until_ready()
            out.append(fb)
    return tuple(out)


def _fftb_of_sign(planes, sign):
    """Complex fft(b) for the requested transform sign from stored planes.

    Stored planes hold fft(b) with chirp sign +1 (used by transform
    sign=-1).  The opposite chirp is the conjugate sequence, whose
    spectrum is the conjugated, index-reflected one:
    fft(conj(b))[k] = conj(fft(b)[(-k) mod L]).
    """
    fb = planes[0] + 1j * planes[1]
    if sign == -1:
        return fb
    head = fb[..., :1]
    tail = jnp.flip(fb[..., 1:], axis=-1)
    return jnp.conj(jnp.concatenate([head, tail], axis=-1))


def _gather_rows(maps, pix0, nph_np, L, maps_pad=None):
    """Extract the rings of a bucket from the flat pixel axis, padded to L.

    Rings are contiguous runs in the pixel array, so each padded row is a
    contiguous dynamic slice (fast) rather than an elementwise gather
    (slow on TPU).  The per-ring slices ride one vmapped dynamic-slice
    (a single slice-gather op) instead of an R-iteration ``lax.scan`` —
    measured on TPU at n4096 the scan's sequential while-loop costs
    ~5-10 ms on the 2048-row buckets that the batched gather does not.

    ``maps_pad``: the input already padded by >= L on the pixel axis —
    pass it when processing several buckets so the full-map pad pass
    (2.5 ms per copy of the nside=4096 map, one per bucket otherwise)
    happens once.
    """
    nph = jnp.asarray(nph_np, dtype=jnp.int32)
    starts = jnp.asarray(
        pix0 + np.concatenate([[0], np.cumsum(nph_np)[:-1]]), dtype=jnp.int32
    )
    p = jnp.arange(L, dtype=jnp.int32)[None, :]
    if maps_pad is None:
        # pad so every row's slice stays in bounds (masked below anyway)
        maps_pad = jnp.pad(maps, [(0, 0)] * (maps.ndim - 1) + [(0, L)])

    rows = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(maps_pad, s, L, axis=-1),
        out_axes=-2,
    )(starts)
    return jnp.where(p < nph[:, None], rows, 0)


def ring_analysis(maps, nside, nm, *, plan=None, m0=0, chirps=None,
                  weight=None):
    """Per-ring Fourier coefficients F[..., r, m] = sum_p v_p e^{-i m phi_p}.

    ``maps``: (..., npix) real or complex, RING ordering.  The ``nm``
    orders start at ``m0`` (may be a traced value — used by the m-sharded
    SHT, where each device owns a contiguous block of orders).
    Returns ``(F, Fneg)`` complex arrays of shape (..., nrings, nm); for
    real input ``Fneg`` is None (F_{-m} = conj(F_m)).

    Aliased orders (m >= nph of the small polar rings) are produced
    directly by the chirp transform (its modulus is the ring length, its
    output extent the order range), so there are no gathers on this path.

    ``chirps``: optional output of ``chirp_fft_planes(nside, m0 + nm)``
    passed through the enclosing jit as an argument — skips the
    per-call chirp FFT of every cap bucket (a third of the cap cost).
    ``weight``: optional (nrings,) real per-ring factor (the analysis
    quadrature weights) folded into each bucket's phase plane — the
    separate ``F * w`` pass over the full (nrings, nm) output costs a
    measurable fraction of the FFT stage at production size.
    """
    complex_in = jnp.iscomplexobj(maps)
    cdt = _complex_dtype(maps.dtype)
    rdt = _real_dtype(maps.dtype)
    static_m0 = isinstance(m0, int)
    if plan is None:
        plan = ring_plan(nside, m0 + nm if static_m0 else None)
    if chirps is None:
        chirps = (None,) * len(plan)
    if len(chirps) != len(plan):
        raise ValueError(
            f"chirps for {len(chirps)} buckets but the ring plan has "
            f"{len(plan)} — were they built for a different nm/mext?"
        )
    m = (jnp.asarray(m0, jnp.int32) + jnp.arange(nm, dtype=jnp.int32))[None, :]
    wv = None if weight is None else jnp.asarray(weight, rdt)

    # one shared slice-safety pad for every cap bucket (each bucket
    # padding separately copies the full map once per bucket — 4 x
    # 2.5 ms at nside 4096 in the device trace)
    cap_L = [b["L"] for b in plan if not b["belt"]]
    if static_m0:
        cap_L += [
            _next_pow2(int(b["nph"].max()) + m0 + nm + 1)
            for b in plan if not b["belt"]
        ]
    maps_pad = (
        jnp.pad(maps, [(0, 0)] * (maps.ndim - 1) + [(0, max(cap_L))])
        if cap_L else None
    )

    out_pos = []
    out_neg = []
    for b, fbp in zip(plan, chirps):
        nph = jnp.asarray(b["nph"], dtype=jnp.int32)
        L = b["L"]
        nph_min = int(b["nph"].min())
        phase = jnp.exp(
            -1j * m.astype(rdt) * jnp.asarray(b["phi0"], rdt)[:, None]
        )
        if wv is not None:
            # fold the per-ring quadrature weight into the phase plane
            # (w is real, so the conjugate-phase branches stay w-scaled)
            phase = phase * wv[b["rings"][0] : b["rings"][1], None]
        if b["belt"]:
            # contiguous constant-length rows: reshape + one batched FFT
            p0, p1 = b["pix"]
            nr_b = b["rings"][1] - b["rings"][0]
            rows = maps[..., p0:p1].reshape(maps.shape[:-1] + (nr_b, L))
            if (
                not complex_in
                and static_m0
                and m0 + nm <= L // 2 + 1
            ):
                # real input: half-spectrum FFT covers every order
                C = jnp.fft.rfft(rows.astype(rdt), axis=-1)
                Cm = jax.lax.slice_in_dim(C, m0, m0 + nm, axis=-1)
                out_pos.append(Cm.astype(cdt) * phase)
                continue
            C = jnp.fft.fft(rows.astype(cdt), axis=-1)
            if static_m0 and m0 + nm <= nph_min:
                Cm = jax.lax.slice_in_dim(C, m0, m0 + nm, axis=-1)
                out_pos.append(Cm * phase)
                if complex_in:
                    if m0 == 0:
                        Cneg = jnp.flip(
                            jax.lax.slice_in_dim(C, L - nm + 1, L, axis=-1),
                            axis=-1,
                        )
                        Cneg = jnp.concatenate(
                            [jax.lax.slice_in_dim(C, 0, 1, axis=-1), Cneg],
                            axis=-1,
                        )
                        out_neg.append(Cneg * jnp.conj(phase))
                    else:
                        kneg = (-m) % nph[:, None]
                        knb = jnp.broadcast_to(
                            kneg, C.shape[:-2] + kneg.shape
                        )
                        out_neg.append(
                            jnp.take_along_axis(C, knb, axis=-1)
                            * jnp.conj(phase)
                        )
            else:
                # rare (lmax >= 2*nside or traced m0): alias gather
                k = m % nph[:, None]
                kb = jnp.broadcast_to(k, C.shape[:-2] + k.shape)
                out_pos.append(jnp.take_along_axis(C, kb, axis=-1) * phase)
                if complex_in:
                    kneg = (-m) % nph[:, None]
                    knb = jnp.broadcast_to(kneg, C.shape[:-2] + kneg.shape)
                    out_neg.append(
                        jnp.take_along_axis(C, knb, axis=-1) * jnp.conj(phase)
                    )
            continue
        # cap buckets: direct chirp transform; the transform length must
        # cover data extent + output extent (mext-aware plans already
        # size L to nph_max + m0 + nm + 1)
        if static_m0:
            L_eff = max(L, _next_pow2(b["nph"].max() + m0 + nm + 1))
            if L_eff != L:
                fbp = None
            rows = _gather_rows(maps, b["pix"][0], b["nph"], L_eff,
                                maps_pad=maps_pad).astype(cdt)
            C = _bluestein_dft(
                rows, nph, L_eff, sign=-1, out_extent=m0 + nm,
                fftb=None if fbp is None else _fftb_of_sign(fbp, -1),
            )
            out_pos.append(
                jax.lax.slice_in_dim(C, m0, m0 + nm, axis=-1) * phase
            )
            if complex_in:
                Cn = _bluestein_dft(
                    rows, nph, L_eff, sign=+1, out_extent=m0 + nm,
                    fftb=None if fbp is None else _fftb_of_sign(fbp, +1),
                )
                out_neg.append(
                    jax.lax.slice_in_dim(Cn, m0, m0 + nm, axis=-1)
                    * jnp.conj(phase)
                )
        else:
            rows = _gather_rows(maps, b["pix"][0], b["nph"], L,
                                maps_pad=maps_pad).astype(cdt)
            C = _bluestein_dft(rows, nph, L, sign=-1)
            k = m % nph[:, None]
            kb = jnp.broadcast_to(k, C.shape[:-2] + k.shape)
            out_pos.append(jnp.take_along_axis(C, kb, axis=-1) * phase)
            if complex_in:
                kneg = (-m) % nph[:, None]
                knb = jnp.broadcast_to(kneg, C.shape[:-2] + kneg.shape)
                out_neg.append(
                    jnp.take_along_axis(C, knb, axis=-1) * jnp.conj(phase)
                )
    F = jnp.concatenate(out_pos, axis=-2)
    if complex_in:
        return F, jnp.concatenate(out_neg, axis=-2)
    return F, None


def _write_rows(v, nph_np, L):
    """Flatten padded rows (..., R, L) onto the ragged contiguous pixel axis.

    Rows are written in ascending order with full-L dynamic-update-slices
    into a padded buffer: each row's padding tail is overwritten by the
    next row's valid data, so no elementwise gather/scatter is needed.
    """
    starts = np.concatenate([[0], np.cumsum(nph_np)[:-1]])
    seg_len = int(starts[-1] + nph_np[-1])
    batch = v.shape[:-2]
    buf = jnp.zeros(batch + (seg_len + L,), v.dtype)
    v_rows = jnp.moveaxis(v, -2, 0)  # (R, ..., L)

    def write(buf, xs):
        row, s = xs
        return jax.lax.dynamic_update_slice_in_dim(buf, row, s, axis=-1), None

    buf, _ = jax.lax.scan(
        write, buf, (v_rows, jnp.asarray(starts, jnp.int32))
    )
    return buf[..., :seg_len]


def ring_synthesis(h_pos, h_neg, nside, *, plan=None, real_output=True,
                   chirps=None):
    """Inverse of :func:`ring_analysis`: evaluate per-ring Fourier series.

    v_p = sum_{m=0}^{nm-1} h_pos[..., r, m] e^{+i m phi_p}
        + sum_{m=1}^{nm-1} h_neg[..., r, m] e^{-i m phi_p}

    For real output pass ``h_neg=None`` (implies h_neg = conj(h_pos)).
    Returns (..., npix) maps (real if ``real_output``).

    Cap rings evaluate the +-m series directly with chirp transforms
    whose modulus is the ring length (orders m >= nph alias exactly), so
    there are no scatters on this path.  ``chirps``: optional
    ``chirp_fft_planes(nside, nm, kind="synthesis")`` passed through the
    enclosing jit as an argument (skips the per-call chirp FFTs) — the
    default analysis-kind planes have the same shape but the wrong chirp
    split point, so the kind matters.
    """
    nm = h_pos.shape[-1]
    if plan is None:
        plan = ring_plan(nside, nm)
    if chirps is None:
        chirps = (None,) * len(plan)
    if len(chirps) != len(plan):
        raise ValueError(
            f"chirps for {len(chirps)} buckets but the ring plan has "
            f"{len(plan)} — were they built for a different nm/mext?"
        )
    rdt = _real_dtype(h_pos.dtype)
    m = jnp.arange(nm, dtype=jnp.int32)[None, :]
    pieces = []
    r0 = 0
    for b, fbp in zip(plan, chirps):
        nr_b = b["rings"][1] - b["rings"][0]
        nph = jnp.asarray(b["nph"], dtype=jnp.int32)[:, None]
        phi0 = jnp.asarray(b["phi0"], rdt)[:, None]
        L = b["L"]
        phase = jnp.exp(1j * m.astype(rdt) * phi0)
        hp = h_pos[..., r0 : r0 + nr_b, :] * phase
        if h_neg is None:
            hn = jnp.conj(hp)
        else:
            hn = h_neg[..., r0 : r0 + nr_b, :] * jnp.conj(phase)
        hn = hn.at[..., 0].set(0.0)  # m=0 enters once

        if b["belt"] and 2 * nm - 1 <= L:
            # no aliasing and constant row length: build the frequency
            # rows by concatenation, one batched inverse FFT
            zeros = jnp.zeros(hp.shape[:-1] + (L - 2 * nm + 1,), hp.dtype)
            d = jnp.concatenate(
                [hp, zeros, jnp.flip(hn[..., 1:], axis=-1)], axis=-1
            )
            v = jnp.fft.ifft(d, axis=-1) * L
        elif b["belt"]:
            # rare (lmax >= 2*nside): scatter with real/imag planes
            # (complex scatter-add is unimplemented on TPU)
            k = jnp.broadcast_to(m % nph, (nr_b, nm))
            kneg = jnp.broadcast_to((-m) % nph, (nr_b, nm))
            rows = jnp.arange(nr_b, dtype=jnp.int32)[:, None]
            re = jnp.zeros(hp.shape[:-1] + (L,), hp.real.dtype)
            im = jnp.zeros_like(re)
            re = re.at[..., rows, k].add(hp.real)
            im = im.at[..., rows, k].add(hp.imag)
            re = re.at[..., rows, kneg].add(hn.real)
            im = im.at[..., rows, kneg].add(hn.imag)
            v = jnp.fft.ifft(re + 1j * im, axis=-1) * L
        else:
            # cap rings: direct chirp evaluation (modulus nph, data
            # extent nm, output extent nph <= L)
            L_eff = max(L, _next_pow2(int(b["nph"].max()) + nm + 1))
            if L_eff != L:
                fbp = None
            nph32 = jnp.asarray(b["nph"], jnp.int32)

            def fb_of(sign, fbp=fbp):
                return None if fbp is None else _fftb_of_sign(fbp, sign)

            def pad_L(a, Le=L_eff):
                return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, Le - nm)])

            if h_neg is None:
                # hn = conj(hp) (m > 0): v = hp_0 + 2 Re(B_+(hp, m>0))
                hp_mask = hp.at[..., 0].set(0.0)
                vb = 2.0 * _bluestein_dft(
                    pad_L(hp_mask), nph32, L_eff, sign=+1,
                    out_extent=int(b["nph"].max()), fftb=fb_of(+1),
                )
                v = (vb.real + hp[..., :1].real) if real_output else (
                    vb.real + hp[..., :1]
                )
            else:
                v = (
                    _bluestein_dft(pad_L(hp), nph32, L_eff, sign=+1,
                                   out_extent=int(b["nph"].max()),
                                   fftb=fb_of(+1))
                    + _bluestein_dft(pad_L(hn), nph32, L_eff, sign=-1,
                                     out_extent=int(b["nph"].max()),
                                     fftb=fb_of(-1))
                )
        if real_output:
            v = v.real
        if b["belt"]:
            # constant row length == nph: plain reshape, no gather
            pieces.append(v.reshape(v.shape[:-2] + (nr_b * L,)))
        else:
            pieces.append(_write_rows(v, b["nph"], v.shape[-1]))
        r0 += nr_b
    out = jnp.concatenate(pieces, axis=-1)
    assert out.shape[-1] == nside2npix(nside)
    return out
