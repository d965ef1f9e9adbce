"""Scaled Wigner-d / associated-Legendre recurrences for the SHT core.

This is phase 2 of the TPU-native spherical harmonic transform: the role of
libsharp's Legendre kernels inside ``healpy.map2alm``/``alm2map`` used by the
reference (``/root/reference/heracles/healpy.py:183-189``) and of
``ducc0.sht`` (``/root/reference/heracles/ducc.py:121-128``), for arbitrary
spin.

Everything is built on normalized spin-weighted functions

    slm(l, m; theta) = (-1)^m sqrt((2l+1)/4pi) d^l_{-m,-s}(theta)

so that sYlm = slm * e^{i m phi}; s = 0 reduces to the standard lambda_lm
with Condon-Shortley phase.  The three-term recurrence in l,

    a(l+1) d^{l+1} = (2l+1) (x - mn/(l(l+1))) d^l - a(l) d^{l-1},
    a(l) = sqrt((l^2-m^2)(l^2-n^2)) / l,

is evaluated with libsharp-style block scaling: each (m-lane, ring) carries
a mantissa and an integer exponent k counting factors of 2^60, because the
seed values ~ sin^m(theta) underflow any floating format near the poles
long before the recurrence reaches the oscillatory region where the
function is O(1).  Lanes only contribute to accumulations once k reaches
-1 or 0 (contributions below 2^-60 are dropped as exactly negligible).

The scan is organised for TPU: a `lax.scan` over l whose lanes are
(m-chunk x ring) vectors, fused with the accumulation, so the lambda table
(which would be O(lmax^2 * nrings) ~ hundreds of GB at production scale)
is never materialised.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "wigner_seed_host",
    "wigner_seed_log",
    "wigner_table",
    "wigner_table_host",
    "legendre_sum_host",
    "lambda_analysis_scan",
    "lambda_synthesis_scan",
    "lambda_analysis_scan_folded",
    "lambda_synthesis_scan_folded",
]

_SCALE_LOG2 = 60
_SCALE = float(2.0**_SCALE_LOG2)
_INV_SCALE = float(2.0**-_SCALE_LOG2)


def _lgamma(x):
    """log Gamma(x) for x >= 1, accurate in float32 on the TPU.

    XLA's TPU f32 lgamma lowering loses ~1e-3 *absolute* around x ~ 100
    — fatal for the Wigner seed magnitudes, whose exponents carry this
    error straight into every alm (observed as 2.6e-3 relative alm error
    in the discrete path).  On TPU, use an 8-shifted Stirling series
    instead: its error is dominated by the f32 representation of the
    result (~ulp).  CPU keeps the correctly-rounded native lgamma.
    """
    if jax.default_backend() != "tpu":
        return jax.lax.lgamma(x)
    shift = sum(jnp.log(x + k) for k in range(8))
    z = x + 8.0
    zi = 1.0 / z
    series = zi * (1.0 / 12.0 - zi * zi * (1.0 / 360.0 - zi * zi / 1260.0))
    half_log_2pi = 0.5 * np.log(2.0 * np.pi)
    return (z - 0.5) * jnp.log(z) - z + half_log_2pi + series - shift


def wigner_seed_log(mp, npar, logch, logsh):
    """Log-magnitude and sign of the seed d^{j0}_{mp, npar}(theta).

    ``mp``: (lanes,) int array (the Wigner row index, may be negative);
    ``npar``: (lanes,) int array (the Wigner column index);
    ``logch``/``logsh``: (nr,) log(cos(theta/2)), log(sin(theta/2)).

    Returns (j0, sign, logval) with shapes (lanes,), (lanes,), (lanes, nr).
    Derivation: the single surviving term of the Wigner-d sum formula at
    j0 = max(|m|, |n|); exponents collapse to |m+n| and |m-n| in all four
    sign cases.
    """
    mp = jnp.asarray(mp)
    npar = jnp.asarray(npar)
    a = jnp.abs(mp)
    b = jnp.abs(npar)
    j0 = jnp.maximum(a, b)
    c = jnp.where(a >= b, npar, mp)
    fdt = logch.dtype
    logC = 0.5 * (
        _lgamma((2 * j0 + 1).astype(fdt))
        - _lgamma((j0 + c + 1).astype(fdt))
        - _lgamma((j0 - c + 1).astype(fdt))
    )
    pc = jnp.abs(mp + npar).astype(fdt)
    ps = jnp.abs(mp - npar).astype(fdt)
    # sign = (-1)^k0 with k0 the index of the surviving term
    k0 = jnp.where(
        a >= b,
        jnp.where(mp >= 0, mp - npar, 0),
        jnp.where(npar > 0, 0, mp + b),
    )
    sign = jnp.where(k0 % 2 == 0, 1.0, -1.0).astype(fdt)
    logval = logC[:, None] + pc[:, None] * logch[None, :] + ps[:, None] * logsh[None, :]
    return j0, sign, logval


def _seed_scaled(sign, logval):
    """Split sign*exp(logval) into (mantissa, k) with value = mant * 2^(60k)."""
    ls = logval * jnp.asarray(1.0 / (np.log(2.0) * _SCALE_LOG2), logval.dtype)
    k = jnp.floor(ls).astype(jnp.int32)
    mant = sign[:, None] * jnp.exp2((ls - k) * _SCALE_LOG2)
    return mant, k


@functools.lru_cache(maxsize=8)
def _log_factorials(n):
    """log(k!) for k = 0..n-1, host f64 (no scipy dependency)."""
    lf = np.zeros(n)
    np.cumsum(np.log(np.arange(1, n)), out=lf[1:])
    return lf


def wigner_seed_host(ms, ns, theta, dd=False):
    """Host-f64 seed planes (mant, k) for the device scans.

    Seed value per (lane, ring) = ``mant * 2^(60*k)`` — the same split the
    scans derive on device from ``wigner_seed_log``.  Compute it here when
    the scan runs on the TPU: the device f32 ``log``/``lgamma`` carry
    absolute-error floors (~6e-5, growing with argument), and the seed
    log-magnitudes O(m ln 4) cancel catastrophically in f32 — measured
    1.5e-3 relative lambda error at m = 3000 with device-evaluated seeds,
    against ~1e-7 with these host planes.  This is the jnp-scan analog of
    the Pallas kernels' compensated host seeds (pallas_sht._comp_seed_frac).

    ``theta``: (nr,) colatitudes, float64.  Returns ``mant`` (lanes, nr)
    float32 (sign folded in, incl. the (-1)^m slm factor) and ``k``
    (lanes, nr) int32; with ``dd=True`` returns (mant_hi, mant_lo, k)
    for the double-single high-accuracy scans.
    """
    ms = np.asarray(ms, dtype=np.int64)
    ns = np.asarray(ns, dtype=np.int64)
    theta = np.asarray(theta, dtype=np.float64)
    mp = -ms
    npar = -ns
    a = np.abs(mp)
    b = np.abs(npar)
    j0 = np.maximum(a, b)
    c = np.where(a >= b, npar, mp)
    lf = _log_factorials(int(2 * j0.max()) + 2)
    logC = 0.5 * (lf[2 * j0] - lf[j0 + c] - lf[j0 - c])
    pc = np.abs(mp + npar).astype(np.float64)
    ps = np.abs(mp - npar).astype(np.float64)
    k0 = np.where(
        a >= b,
        np.where(mp >= 0, mp - npar, 0),
        np.where(npar > 0, 0, mp + b),
    )
    sign = np.where((k0 + ms) % 2 == 0, 1.0, -1.0)
    with np.errstate(divide="ignore"):
        logch = np.log(np.cos(theta / 2.0))
        logsh = np.log(np.sin(theta / 2.0))
    # 0 * log(0) is a unit factor (sin^0 = 1), not a zero one: guard the
    # exact poles lane-wise (the device path nans there, latent only
    # because HEALPix ring centres never sit exactly on a pole)
    with np.errstate(invalid="ignore"):
        logval = (
            logC[:, None]
            + np.where(pc[:, None] == 0, 0.0, pc[:, None] * logch[None, :])
            + np.where(ps[:, None] == 0, 0.0, ps[:, None] * logsh[None, :])
        )
    ls = logval / (np.log(2.0) * _SCALE_LOG2)
    with np.errstate(invalid="ignore"):
        k = np.floor(ls)
    tiny = ~np.isfinite(k)  # exact poles: sin or cos of theta/2 is 0
    k = np.where(tiny, -(2**30), k).astype(np.int32)
    mant64 = np.where(
        tiny, 0.0, sign[:, None] * np.exp2((ls - k) * _SCALE_LOG2)
    )
    mant = mant64.astype(np.float32)
    if dd:
        lo = (mant64 - mant.astype(np.float64)).astype(np.float32)
        return mant, lo, k
    return mant, k


def _recurrence_coeffs(ell, mp, npar, fdt):
    """Coefficients taking (d^{ell-1}, d^{ell-2}) -> d^{ell} per lane.

    Returns (A1, A0, B) such that d^{ell} = (A1*x + A0)*d^{ell-1} - B*d^{ell-2}.
    Safe (zero) for lanes where ell <= j0.
    """
    ell = ell.astype(fdt)
    m2 = (mp * mp).astype(fdt)
    n2 = (npar * npar).astype(fdt)
    mn = (mp * npar).astype(fdt)

    def a_of(l):
        v = (l * l - m2) * (l * l - n2)
        return jnp.sqrt(jnp.maximum(v, 0.0)) / jnp.maximum(l, 1.0)

    al = a_of(ell - 1.0)
    alp = a_of(ell)
    inv = jnp.where(alp > 0, 1.0 / jnp.maximum(alp, 1e-300 if fdt == jnp.float64 else 1e-30), 0.0)
    lm1 = jnp.maximum(ell - 1.0, 1.0)
    A1 = (2.0 * ell - 1.0) * inv
    A0 = -(2.0 * ell - 1.0) * mn / (lm1 * ell) * inv
    B = al * inv
    return A1, A0, B


def _emit_factor(k):
    """Multiplier turning a scaled mantissa into a contribution (0 if tiny)."""
    return jnp.where(k == 0, 1.0, jnp.where(k == -1, _INV_SCALE, 0.0))


# -- double-single (two-float32) arithmetic for the high-accuracy scans ------
#
# The f32 three-term recurrence loses ~2-3e-5 band-max Cl accuracy at the
# top multipoles (l >~ 0.9 lmax), measured on TPU at nside 512/2048/4096;
# error decomposition shows it is *recurrence* rounding (both the carried
# d-values and the per-l coefficients), not accumulation.  Carrying both
# as renormalised (hi, lo) f32 pairs removes it: a numpy probe of the
# normalised-Legendre recurrence at lmax=3000 gives top-band max relative
# errors 2.8e-3 (plain f32), 7.8e-4 (dd carries only), 3.1e-7 (dd carries
# + dd coefficients) vs f64.  Same primitives as ops/pallas_sht (Dekker
# two-products, Knuth two-sums), restated here so the jnp scans do not
# import the Pallas module at load time.


def _dd_two_sum(a, b):
    """Knuth two-sum: s + e == a + b exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _dd_split(a):
    """Dekker split into high/low halves of the f32 mantissa."""
    c = jnp.float32(4097.0) * a
    hi = c - (c - a)
    return hi, a - hi


def _dd_two_prod(a, b):
    """Dekker two-product: p + e == a * b exactly (FMA-free)."""
    p = a * b
    a1, a2 = _dd_split(a)
    b1, b2 = _dd_split(b)
    e = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, e


def _dd_add(h1, l1, h2, l2):
    """(h1, l1) + (h2, l2), renormalised."""
    s, e = _dd_two_sum(h1, h2)
    e = e + (l1 + l2)
    return _dd_two_sum(s, e)


def _dd_mul(h1, l1, h2, l2):
    """(h1, l1) * (h2, l2), renormalised (drops the l1*l2 term: O(eps^2))."""
    p, pe = _dd_two_prod(h1, h2)
    e = pe + (h1 * l2 + l1 * h2)
    return _dd_two_sum(p, e)


def _dd_div(h1, l1, h2, l2):
    """(h1, l1) / (h2, l2) via one Newton correction of the f32 quotient."""
    q0 = h1 / h2
    p, pe = _dd_two_prod(q0, h2)
    # r = (h1, l1) - q0 * (h2, l2)
    rh, rl = _dd_add(h1, l1, -p, -(pe + q0 * l2))
    q1 = (rh + rl) / h2
    return _dd_two_sum(q0, q1)


def _dd_sqrt(h, l):
    """sqrt of a dd value via one Newton correction (h must be > 0)."""
    s0 = jnp.sqrt(h)
    p, pe = _dd_two_prod(s0, s0)
    r = (h - p) + (l - pe)
    s1 = r / (2.0 * s0)
    return _dd_two_sum(s0, s1)


def _recurrence_coeffs_dd(ell, mp, npar):
    """Double-single recurrence coefficients, exact-integer construction.

    All inputs are integer-valued (l <= ~2^23, |m|, |n| <= ~4600), so
    l^2, m^2, n^2, m*n and their two-products are *exact* in dd form; the
    only rounding enters through the dd sqrt/div (O(eps^2) relative).
    Returns ((A1h, A1l), (A0h, A0l), (Bh, Bl)) per lane, zeroed where the
    recurrence is not yet live (a(l) == 0).
    """
    f = jnp.float32
    l = ell.astype(f)
    lm1 = jnp.maximum(l - 1.0, 1.0)
    m2 = (mp * mp).astype(f)
    n2 = (npar * npar).astype(f)
    mn = (mp * npar).astype(f)
    zeros = jnp.zeros_like(m2)

    def u_of(lf):
        # u = (l^2 - m^2)(l^2 - n^2), dd-exact
        l2h, l2l = _dd_two_prod(lf, lf)
        ah, al = _dd_add(l2h, l2l, -m2, zeros)
        bh, bl = _dd_add(l2h, l2l, -n2, zeros)
        return _dd_mul(ah, al, bh, bl)

    uh, ul = u_of(l)
    live = uh > 0
    sh_, sl_ = _dd_sqrt(jnp.where(live, uh, 1.0), jnp.where(live, ul, 0.0))
    # inv = 1 / a(l) = l / sqrt(u(l))
    invh, invl = _dd_div(l * jnp.ones_like(sh_), zeros, sh_, sl_)
    invh = jnp.where(live, invh, 0.0)
    invl = jnp.where(live, invl, 0.0)
    c2l = 2.0 * l - 1.0  # exact integer in f32
    A1h, A1l = _dd_mul(c2l * jnp.ones_like(invh), zeros, invh, invl)
    # A0 = -(2l-1) * mn / ((l-1) l) * inv
    nh, nl = _dd_two_prod(c2l * jnp.ones_like(mn), mn)
    dh, dl = _dd_two_prod(lm1, l)
    th, tl = _dd_div(nh, nl, dh + zeros, dl + zeros)
    th, tl = _dd_mul(th, tl, invh, invl)
    A0h, A0l = -th, -tl
    # B = a(l-1) * inv = sqrt(u(l-1)) / (l-1) * inv
    u1h, u1l = u_of(lm1)
    live1 = u1h > 0
    s1h, s1l = _dd_sqrt(jnp.where(live1, u1h, 1.0), jnp.where(live1, u1l, 0.0))
    s1h = jnp.where(live1, s1h, 0.0)
    s1l = jnp.where(live1, s1l, 0.0)
    a1h, a1l = _dd_div(s1h, s1l, lm1 * jnp.ones_like(s1h), zeros)
    Bh, Bl = _dd_mul(a1h, a1l, invh, invl)
    return (A1h, A1l), (A0h, A0l), (Bh, Bl)


def _prepare_scan_dd(ms, ns, seed):
    """Initial dd state from host seed planes (mant_hi, mant_lo, k)."""
    mp = -jnp.asarray(ms, dtype=jnp.int32)
    npar = -jnp.asarray(ns, dtype=jnp.int32)
    j0 = jnp.maximum(jnp.abs(mp), jnp.abs(npar))
    seed_hi = jnp.asarray(seed[0], jnp.float32)
    seed_lo = jnp.asarray(seed[1], jnp.float32)
    seed_k = jnp.asarray(seed[2], jnp.int32)
    zeros = jnp.zeros_like(seed_hi)
    k = jnp.full_like(seed_k, -(2**30))
    state = (zeros, zeros, zeros, zeros, k)
    return mp, npar, j0, seed_hi, seed_lo, seed_k, state


def _advance_dd(state, ell, mp, npar, j0, seed_hi, seed_lo, seed_k, xh, xl):
    """One l-step of the scaled recurrence in double-single arithmetic."""
    dph, dpl, dch, dcl, k = state
    (A1h, A1l), (A0h, A0l), (Bh, Bl) = _recurrence_coeffs_dd(ell, mp, npar)
    th, tl = _dd_mul(A1h[:, None], A1l[:, None], xh[None, :], xl[None, :])
    th, tl = _dd_add(th, tl, A0h[:, None], A0l[:, None])
    c1h, c1l = _dd_mul(th, tl, dch, dcl)
    c2h, c2l = _dd_mul(Bh[:, None], Bl[:, None], dph, dpl)
    ch_, cl_ = _dd_add(c1h, c1l, -c2h, -c2l)
    is_seed = (ell == j0)[:, None]
    grow = (ell > j0)[:, None]
    dh = jnp.where(is_seed, seed_hi, jnp.where(grow, ch_, 0.0))
    dl = jnp.where(is_seed, seed_lo, jnp.where(grow, cl_, 0.0))
    k_new = jnp.where(is_seed, seed_k, k)
    over = jnp.abs(dh) > _SCALE
    scale = jnp.where(over, jnp.float32(_INV_SCALE), jnp.float32(1.0))
    dh, dl = dh * scale, dl * scale  # exact power-of-2 rescale
    dp_h, dp_l = dch * scale, dcl * scale
    k_new = jnp.where(over, k_new + 1, k_new)
    fdt = dh.dtype
    norm = jnp.sqrt(
        (2.0 * ell.astype(fdt) + 1.0) * jnp.asarray(0.25 / np.pi, fdt)
    )
    lam = (dh + dl) * _emit_factor(k_new) * norm
    return (dp_h, dp_l, dh, dl, k_new), lam


def _scan_core(ms, ns, x, logch, logsh, lmax, step_extra, carry_extra, fdt,
               xs_extra=None, seed=None):
    """Shared scan skeleton: iterate l = 0..lmax updating scaled d-values.

    ``step_extra(l, lam, xs, extra)`` consumes the emitted lambda row
    (lanes, nr) plus the per-step slice of ``xs_extra`` and returns
    (ys, new_extra).
    """
    # the initial carry derives from the seeds so its sharding "vma" type
    # (varying over shard_map axes, e.g. the m-sharded SHT) matches the
    # per-step values
    mp, npar, j0, seed_mant, seed_k, d_prev, d_curr, k = _prepare_scan(
        ms, ns, x, logch, logsh, fdt, seed=seed
    )

    def step(carry, scan_xs):
        ell, xs = scan_xs
        d_prev, d_curr, k, extra = carry
        A1, A0, B = _recurrence_coeffs(ell, mp, npar, fdt)
        cand = (A1[:, None] * x[None, :] + A0[:, None]) * d_curr - B[:, None] * d_prev
        is_seed = (ell == j0)[:, None]
        d_new = jnp.where(is_seed, seed_mant, jnp.where((ell > j0)[:, None], cand, 0.0))
        k_new = jnp.where(is_seed, seed_k, k)
        # block rescale when the growing solution exceeds 2^60
        over = jnp.abs(d_new) > _SCALE
        d_new = jnp.where(over, d_new * _INV_SCALE, d_new)
        d_prev_new = jnp.where(over, d_curr * _INV_SCALE, d_curr)
        k_new = jnp.where(over, k_new + 1, k_new)
        norm = jnp.sqrt(
            (2.0 * ell.astype(fdt) + 1.0) * jnp.asarray(0.25 / np.pi, fdt)
        )
        lam = d_new * _emit_factor(k_new) * norm
        ys, extra = step_extra(ell, lam, xs, extra)
        return (d_prev_new, d_new, k_new, extra), ys

    ells = jnp.arange(lmax + 1, dtype=jnp.int32)
    if xs_extra is None:
        xs_extra = ells  # placeholder of matching leading dim
    # unroll: the per-step arrays can be small (e.g. the pixel-window
    # chunks), where per-iteration dispatch overhead dominates; fusing 8
    # l-steps per scan iteration amortises it at no cost to big steps
    (_, _, _, extra), ys = jax.lax.scan(
        step,
        (d_prev, d_curr, k, carry_extra),
        (ells, xs_extra),
        unroll=8,
    )
    return ys, extra


def _prepare_scan(ms, ns, x, logch, logsh, fdt, seed=None):
    """Seeds and initial scaled state shared by all scan variants.

    ``seed``: optional host-precomputed (mant, k) planes from
    :func:`wigner_seed_host`; on TPU these avoid the device f32
    log/lgamma error floors in the seed magnitudes.
    """
    mp = -jnp.asarray(ms, dtype=jnp.int32)
    npar = -jnp.asarray(ns, dtype=jnp.int32)
    j0 = jnp.maximum(jnp.abs(mp), jnp.abs(npar))
    if seed is not None:
        seed_mant = jnp.asarray(seed[0], fdt)
        seed_k = jnp.asarray(seed[1], jnp.int32)
    else:
        j0_, sign, logval = wigner_seed_log(mp, npar, logch, logsh)
        msign = jnp.where(
            jnp.asarray(ms, jnp.int32) % 2 == 0, 1.0, -1.0
        ).astype(fdt)
        seed_mant, seed_k = _seed_scaled(sign * msign, logval)
    d_prev = jnp.zeros_like(seed_mant)
    d_curr = jnp.zeros_like(seed_mant)
    k = jnp.full_like(seed_k, -(2**30))
    return mp, npar, j0, seed_mant, seed_k, d_prev, d_curr, k


def _advance(state, ell, mp, npar, j0, seed_mant, seed_k, x, fdt):
    """One l-step of the scaled recurrence; returns (state', lam)."""
    d_prev, d_curr, k = state
    A1, A0, B = _recurrence_coeffs(ell, mp, npar, fdt)
    cand = (A1[:, None] * x[None, :] + A0[:, None]) * d_curr - B[:, None] * d_prev
    is_seed = (ell == j0)[:, None]
    d_new = jnp.where(is_seed, seed_mant, jnp.where((ell > j0)[:, None], cand, 0.0))
    k_new = jnp.where(is_seed, seed_k, k)
    over = jnp.abs(d_new) > _SCALE
    d_new = jnp.where(over, d_new * _INV_SCALE, d_new)
    d_prev_new = jnp.where(over, d_curr * _INV_SCALE, d_curr)
    k_new = jnp.where(over, k_new + 1, k_new)
    norm = jnp.sqrt(
        (2.0 * ell.astype(fdt) + 1.0) * jnp.asarray(0.25 / np.pi, fdt)
    )
    lam = d_new * _emit_factor(k_new) * norm
    return (d_prev_new, d_new, k_new), lam


def _swap_blocks(arr, axis=-1):
    """Swap the two equal halves of ``arr`` along ``axis`` (the +-n blocks)."""
    n = arr.shape[axis]
    lo = jax.lax.slice_in_dim(arr, 0, n // 2, axis=axis)
    hi = jax.lax.slice_in_dim(arr, n // 2, n, axis=axis)
    return jnp.concatenate([hi, lo], axis=axis)


def lambda_analysis_scan_folded(ms, ns, x, logch, logsh, lmax, FN, FS,
                                cross=False, seed=None, dd=False,
                                x_lo=None):
    """Ring-pair-folded analysis: half the rings, parity-split spectra.

    The N/S mirror symmetry slm^{(n)}(pi-t) = (-1)^{l+m} slm^{(-n)}(t)
    folds the contraction onto the northern rings (incl. equator).  The
    caller passes FN (northern rows) and FS (mirrored southern rows
    premultiplied by (-1)^m).  For single-column lane sets (n = 0,
    ``cross=False``) the south term self-pairs, so FN +- FS precombine
    into one einsum per l; for +-n lane-pairs (``cross=True``) the south
    term of each column belongs to the *partner* column's output, so each
    step runs two einsums and swaps the lane blocks of the south result.
    Two l-steps run per scan iteration so the (-1)^l parity is static.

    ``x``/``logch``/``logsh``: (nhalf,) northern-ring geometry;
    ``FN``/``FS``: (..., nhalf, lanes) complex.
    ``dd``: run the recurrence in double-single (two-f32) arithmetic
    (the high-accuracy f32 mode); requires host seed planes
    (mant_hi, mant_lo, k) in ``seed`` and the x residual in ``x_lo``.
    Returns (..., lmax+1, lanes) complex.
    """
    fdt = x.dtype
    if dd:
        mp, npar, j0, seed_hi, seed_lo, seed_k, state0 = _prepare_scan_dd(
            ms, ns, seed
        )

        def adv(state, ell):
            return _advance_dd(state, ell, mp, npar, j0, seed_hi, seed_lo,
                               seed_k, x, x_lo)

    else:
        mp, npar, j0, seed_mant, seed_k, d_prev, d_curr, k = _prepare_scan(
            ms, ns, x, logch, logsh, fdt, seed=seed
        )
        state0 = (d_prev, d_curr, k)

        def adv(state, ell):
            return _advance(state, ell, mp, npar, j0, seed_mant,
                            seed_k, x, fdt)

    niter = (lmax + 2) // 2

    if not cross:
        Fe = FN + FS
        Fo = FN - FS

        def substep(state, ell, F):
            state, lam = adv(state, ell)
            return state, jnp.einsum("lr,...rl->...l", lam, F)

        def step(carry, i):
            state = carry
            state, out0 = substep(state, 2 * i, Fe)
            state, out1 = substep(state, 2 * i + 1, Fo)
            return state, (out0, out1)

    else:

        def substep(state, ell, sign):
            state, lam = adv(state, ell)
            north = jnp.einsum("lr,...rl->...l", lam, FN)
            south = jnp.einsum("lr,...rl->...l", lam, FS)
            return state, north + sign * _swap_blocks(south)

        def step(carry, i):
            state = carry
            state, out0 = substep(state, 2 * i, 1.0)
            state, out1 = substep(state, 2 * i + 1, -1.0)
            return state, (out0, out1)

    _, (ys0, ys1) = jax.lax.scan(
        step, state0, jnp.arange(niter, dtype=jnp.int32)
    )
    # interleave even/odd rows -> (2*niter, ..., lanes), trim to lmax+1
    ys = jnp.stack([ys0, ys1], axis=1)
    ys = ys.reshape((2 * niter,) + ys0.shape[1:])[: lmax + 1]
    return jnp.moveaxis(ys, 0, -2)


def lambda_synthesis_scan_folded(ms, ns, x, logch, logsh, lmax, alm,
                                 cross=False, seed=None, dd=False,
                                 x_lo=None):
    """Ring-pair-folded synthesis.

    Returns (GN, GS) of shape (..., nhalf, lanes): the ring spectra on
    the northern rings and on their (mirrored) southern partners,
    G(pi-t)[L] = (-1)^{m_L} sum_l (-1)^l a[l, P(L)] lam[l, L] routed back
    to column L via the block swap (P is the +-n block swap when
    ``cross``, identity otherwise).  ``dd``/``x_lo``: see
    :func:`lambda_analysis_scan_folded`.
    """
    fdt = x.dtype
    if dd:
        mp, npar, j0, seed_hi, seed_lo, seed_k, state0 = _prepare_scan_dd(
            ms, ns, seed
        )

        def adv(state, ell):
            return _advance_dd(state, ell, mp, npar, j0, seed_hi, seed_lo,
                               seed_k, x, x_lo)

    else:
        mp, npar, j0, seed_mant, seed_k, d_prev, d_curr, k = _prepare_scan(
            ms, ns, x, logch, logsh, fdt, seed=seed
        )
        state0 = (d_prev, d_curr, k)

        def adv(state, ell):
            return _advance(state, ell, mp, npar, j0, seed_mant,
                            seed_k, x, fdt)

    niter = (lmax + 2) // 2
    nlanes = mp.shape[0]
    nr = x.shape[0]
    batch = alm.shape[:-2]
    GN0 = jnp.zeros(batch + (nlanes, nr), dtype=alm.dtype)
    S0 = jnp.zeros_like(GN0)
    # per-iteration alm rows (pad odd tail)
    alm_t = jnp.moveaxis(alm, -2, 0)
    pad = 2 * niter - (lmax + 1)
    alm_t = jnp.concatenate(
        [alm_t, jnp.zeros((pad,) + alm_t.shape[1:], alm_t.dtype)], axis=0
    )
    almP_t = _swap_blocks(alm_t) if cross else alm_t
    alm_t = alm_t.reshape((niter, 2) + alm_t.shape[1:])
    almP_t = almP_t.reshape((niter, 2) + almP_t.shape[1:])

    def step(carry, xs):
        state, GN, S = carry
        i, a2, aP2 = xs
        state, lam0 = adv(state, 2 * i)
        GN = GN + a2[0][..., :, None] * lam0
        S = S + aP2[0][..., :, None] * lam0
        state, lam1 = adv(state, 2 * i + 1)
        GN = GN + a2[1][..., :, None] * lam1
        S = S - aP2[1][..., :, None] * lam1
        return (state, GN, S), None

    (_, GN, S), _ = jax.lax.scan(
        step,
        (state0, GN0, S0),
        (jnp.arange(niter, dtype=jnp.int32), alm_t, almP_t),
    )
    # route south back to its own column and apply the (-1)^m order sign
    GS = _swap_blocks(S, axis=-2) if cross else S
    msign = jnp.where(jnp.asarray(ms) % 2 == 0, 1.0, -1.0)[:, None]
    GS = GS * msign
    return jnp.swapaxes(GN, -1, -2), jnp.swapaxes(GS, -1, -2)


def lambda_analysis_scan(ms, ns, x, logch, logsh, lmax, Fw, seed=None):
    """alm[l, lane] = sum_r slm(l, m_lane; theta_r) * Fw[..., r, lane].

    ``ms``/``ns``: (lanes,) harmonic orders and spins (column index) per lane;
    ``Fw``: (..., nr, lanes) complex, ring coefficients premultiplied by the
    quadrature weights.  Returns (..., lmax+1, lanes) complex.
    """
    fdt = x.dtype

    def step_extra(ell, lam, xs, extra):
        out = jnp.einsum("lr,...rl->...l", lam, Fw)
        return out, extra

    ys, _ = _scan_core(ms, ns, x, logch, logsh, lmax, step_extra, 0, fdt,
                       seed=seed)
    # ys: (lmax+1, ..., lanes) -> (..., lmax+1, lanes)
    return jnp.moveaxis(ys, 0, -2)


def lambda_power_scan(ms, ns, x, logch, logsh, lmax, Fw, weights,
                      seed=None):
    """Per-l lane-weighted power of the analysis, fully reduced in-scan.

    out[..., k, l] = sum_lane weights[k, lane] * |a_l,lane|^2 with
    a_l,lane = sum_r slm(l, m_lane, n_lane; theta_r) * Fw[..., r, lane].
    Never materialises the (l, lane) alm table — used by the exact
    pixel-window computation, whose per-pixel alms would not fit memory.

    ``weights``: (K, lanes) real lane-combination matrix (e.g. the
    (2 - delta_m0) spectrum weights, one row per output channel).
    Returns (..., K, lmax+1) real.
    """
    fdt = x.dtype

    def step_extra(ell, lam, xs, extra):
        # HIGHEST: default-precision f32 einsums route via bf16 MXU
        # passes on TPU, biasing every lane (seen as w_pix(0) != 1)
        hi = jax.lax.Precision.HIGHEST
        a = jnp.einsum("lr,...rl->...l", lam, Fw, precision=hi)
        power = a.real**2 + a.imag**2
        return jnp.einsum("kl,...l->...k", weights, power, precision=hi), extra

    ys, _ = _scan_core(ms, ns, x, logch, logsh, lmax, step_extra, 0, fdt,
                       seed=seed)
    # ys: (lmax+1, ..., K) -> (..., K, lmax+1)
    return jnp.moveaxis(ys, 0, -1)


def wigner_table(m, n, x, logch, logsh, lmax, seed=None):
    """Raw Wigner-d table d^l_{-m,-n}(theta) for l = 0..lmax, all thetas.

    Single (m, n) pair; returns (lmax+1, nr).  Used by the mixing-matrix
    kernel, which needs the unnormalised d-functions on quadrature nodes.
    """
    fdt = x.dtype

    def step_extra(ell, lam, xs, extra):
        return lam[0], extra

    ys, _ = _scan_core(
        jnp.asarray([m], jnp.int32),
        jnp.asarray([n], jnp.int32),
        x, logch, logsh, lmax, step_extra, 0, fdt, seed=seed,
    )
    # undo the slm normalisation: slm = (-1)^m sqrt((2l+1)/4pi) d
    ells = jnp.arange(lmax + 1, dtype=fdt)
    norm = jnp.sqrt((2.0 * ells + 1.0) / (4.0 * np.pi))
    sign = -1.0 if m % 2 else 1.0
    return ys * (sign / norm)[:, None]


def wigner_table_host(m, n, theta, lmax):
    """Host-f64 Wigner-d table d^l_{-m,-n}(theta), shape (lmax+1, nr).

    Numpy twin of :func:`wigner_table` for small spins (the mixing-matrix
    tables: |m|, |n| <= ~32, where the unscaled recurrence neither under-
    nor overflows).  The f64 values feed the compensated double-f32
    mixing-matrix contraction on TPU (heracles_tpu.ops.df32) — the device
    f32 scans carry ~1e-6 per-entry noise that the quadrature's
    cancellation amplifies ~1000x at production lmax.
    """
    m, n = int(m), int(n)
    mp, npar = -m, -n
    a, b = abs(mp), abs(npar)
    j0 = max(a, b)
    if j0 > 64:
        raise ValueError("wigner_table_host: unscaled recurrence needs "
                         f"small spins, got j0={j0}")
    theta = np.asarray(theta, np.float64)
    out = np.zeros((lmax + 1, theta.size))
    if j0 > lmax:
        return out
    # seed d^{j0}_{m', n'} = (-1)^k0 C cos^pc(t/2) sin^ps(t/2)
    c = npar if a >= b else mp
    lf = _log_factorials(2 * j0 + 2)
    logC = 0.5 * (lf[2 * j0] - lf[j0 + c] - lf[j0 - c])
    pc = abs(mp + npar)
    ps = abs(mp - npar)
    k0 = (mp - npar if mp >= 0 else 0) if a >= b else (0 if npar > 0 else mp + b)
    sign = 1.0 if k0 % 2 == 0 else -1.0
    ch, sh = np.cos(theta / 2.0), np.sin(theta / 2.0)
    out[j0] = sign * np.exp(logC) * ch**pc * sh**ps
    x = np.cos(theta)
    mn = float(m * n)  # m'*n' = (-m)(-n) = m*n
    m2, n2 = float(m * m), float(n * n)

    def a_of(ell):
        return np.sqrt((ell * ell - m2) * (ell * ell - n2)) / ell

    d_prev = np.zeros_like(out[j0])
    d_curr = out[j0]
    for ell in range(j0 + 1, lmax + 1):
        lf_, lm1 = float(ell), float(ell - 1)
        mid = (2.0 * lf_ - 1.0) * (x - mn / max(lm1 * lf_, 1.0))
        a_lm1 = a_of(lm1) if ell - 1 > j0 else 0.0
        d_new = (mid * d_curr - a_lm1 * d_prev) / a_of(lf_)
        out[ell] = d_new
        d_prev, d_curr = d_curr, d_new
    return out


def legendre_sum_host(coeffs, x):
    """Host-f64 sum_l coeffs[l] P_l(x) via the streaming recurrence.

    O(1) memory in l — used for the mixing matrices' mask correlation
    xi(x) at l3max ~ thousands without materialising the P table.
    """
    coeffs = np.asarray(coeffs, np.float64)
    x = np.asarray(x, np.float64)
    acc = np.full_like(x, coeffs[0])
    if coeffs.shape[0] == 1:
        return acc
    p_prev = np.ones_like(x)
    p_curr = x.copy()
    acc += coeffs[1] * p_curr
    for ell in range(2, coeffs.shape[0]):
        p_new = ((2 * ell - 1) * x * p_curr - (ell - 1) * p_prev) / ell
        acc += coeffs[ell] * p_new
        p_prev, p_curr = p_curr, p_new
    return acc


def lambda_synthesis_scan(ms, ns, x, logch, logsh, lmax, alm, seed=None):
    """G[..., r, lane] = sum_l alm[..., l, lane] * slm(l, m_lane; theta_r).

    ``alm``: (..., lmax+1, lanes) complex.  Returns (..., nr, lanes) complex.
    """
    fdt = x.dtype
    nlanes = np.shape(ms)[0]
    nr = x.shape[0]
    batch = alm.shape[:-2]
    G0 = jnp.zeros(batch + (nlanes, nr), dtype=alm.dtype)
    alm_t = jnp.moveaxis(alm, -2, 0)  # (lmax+1, ..., lanes)

    def step_extra(ell, lam, a, G):
        # a: (..., lanes) alm row for this l
        G = G + a[..., :, None] * lam
        return 0, G

    _, G = _scan_core(
        ms, ns, x, logch, logsh, lmax, step_extra, G0, fdt, xs_extra=alm_t,
        seed=seed,
    )
    return jnp.swapaxes(G, -1, -2)  # (..., nr, lanes)
