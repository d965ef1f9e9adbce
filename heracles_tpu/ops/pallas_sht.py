"""Pallas TPU kernels for the folded Wigner-d scans (the SHT hot loop).

The jnp `lax.scan` implementations round-trip their large operands (the
ring spectra, or the synthesis accumulator) through HBM on every one of
the lmax+1 steps (~GBs of HBM traffic per m-chunk at production scale).
These kernels keep everything resident in VMEM: each (batch, m-chunk,
ring-block) grid step loads its blocks once, runs the full scaled
three-term recurrence over l on the VPU, and moves results in aligned
8-row tiles.

Four kernels are provided and auto-selected by :mod:`..ops.sht` on TPU:

* :func:`analysis_spin0_folded` — spin-0 map2alm contraction;
* :func:`analysis_pair_folded` — the +-s spin-pair (e.g. spin-2 E/B)
  analysis, both Wigner columns in one program;
* :func:`synthesis_spin0_folded` — spin-0 alm2map accumulation;
* :func:`synthesis_pair_folded` — the +-s spin-pair synthesis.

All wrappers accept arbitrary leading batch dimensions (DICES region
batches, vmapped bins): the batch is flattened into the leading grid
axis, so every batch element runs the same fused VMEM-resident program.

Numerics are identical to the jnp scans in
:mod:`heracles_tpu.ops.wigner` (libsharp-style 2^60 block scaling,
parity-split even/odd contraction, (2l+1)/4pi normalisation), validated
in tests/test_pallas.py in interpret mode.  `lgamma` has no Mosaic
lowering, so seed coefficients are precomputed on the host.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "analysis_spin0_folded",
    "analysis_pair_folded",
    "synthesis_spin0_folded",
    "synthesis_pair_folded",
    "spin0_seed_planes",
    "pair_seed_planes",
]

_SCALE_LOG2 = 60
_SCALE = float(2.0**_SCALE_LOG2)
_INV_SCALE = float(2.0**-_SCALE_LOG2)
_LN2 = float(np.log(2.0))

_SEMANTICS = ("parallel", "parallel", "arbitrary")


def _advance_spin0(carry, ell, m, x, seed_mant, k0):
    """One l-step of the scaled spin-0 recurrence; returns (carry', lam)."""
    d_prev, d_curr, k = carry
    l_f = ell.astype(jnp.float32)
    lm1 = l_f - 1.0
    a_l = jnp.sqrt(jnp.maximum(l_f * l_f - m * m, 0.0))
    a_lm1 = jnp.sqrt(jnp.maximum(lm1 * lm1 - m * m, 0.0))
    inv = jnp.where(a_l > 0.0, 1.0 / jnp.where(a_l > 0.0, a_l, 1.0), 0.0)
    cand = ((2.0 * l_f - 1.0) * inv) * x * d_curr - (a_lm1 * inv) * d_prev
    is_seed = l_f == m
    d_new = jnp.where(is_seed, seed_mant, jnp.where(l_f > m, cand, 0.0))
    k_new = jnp.where(is_seed, k0, k)
    over = jnp.abs(d_new) > _SCALE
    d_new = jnp.where(over, d_new * _INV_SCALE, d_new)
    d_prev_new = jnp.where(over, d_curr * _INV_SCALE, d_curr)
    k_new = jnp.where(over, k_new + 1.0, k_new)
    emit = jnp.where(k_new == 0.0, 1.0,
                     jnp.where(k_new == -1.0, _INV_SCALE, 0.0))
    norm = jnp.sqrt((2.0 * l_f + 1.0) / (4.0 * np.pi))
    return (d_prev_new, d_new, k_new), d_new * emit * norm


def _advance_spin0_comp(carry, ell, m, xh, xr, seed_mant, k0):
    """One l-step of the compensated spin-0 recurrence (diag region).

    Same seed/rescale logic as :func:`_advance_spin0` plus the
    x-truncation lo stream of :func:`_kernel_comp` (r = x_lo/x_hi rides
    in ``xr``); carry is (d_prev, d_prev_lo, d_curr, d_curr_lo, k).
    """
    d_prev, d_pl, d_curr, d_cl, k = carry
    l_f = ell.astype(jnp.float32)
    lm1 = l_f - 1.0
    a_l = jnp.sqrt(jnp.maximum(l_f * l_f - m * m, 0.0))
    a_lm1 = jnp.sqrt(jnp.maximum(lm1 * lm1 - m * m, 0.0))
    inv = jnp.where(a_l > 0.0, 1.0 / jnp.where(a_l > 0.0, a_l, 1.0), 0.0)
    c1 = (2.0 * l_f - 1.0) * inv
    c2 = a_lm1 * inv
    t1 = c1 * (xh * d_curr)
    cand = t1 - c2 * d_prev
    cand_lo = c1 * (xh * d_cl) + xr * t1 - c2 * d_pl
    is_seed = l_f == m
    live = l_f > m
    d_new = jnp.where(is_seed, seed_mant, jnp.where(live, cand, 0.0))
    d_nl = jnp.where(is_seed | ~live, 0.0, cand_lo)
    k_new = jnp.where(is_seed, k0, k)
    over = jnp.abs(d_new) > _SCALE
    sc = jnp.where(over, _INV_SCALE, 1.0)
    d_prev_new = d_curr * sc
    d_pl_new = d_cl * sc
    d_new = d_new * sc
    d_nl = d_nl * sc
    k_new = jnp.where(over, k_new + 1.0, k_new)
    emit = jnp.where(k_new == 0.0, 1.0,
                     jnp.where(k_new == -1.0, _INV_SCALE, 0.0))
    norm = jnp.sqrt((2.0 * l_f + 1.0) / (4.0 * np.pi))
    lam = (d_new + d_nl) * emit * norm
    return (d_prev_new, d_pl_new, d_new, d_nl, k_new), lam


def _advance_pair(carry, ell, m, s2, mn, x, j0, seed_mant, seed_k):
    """One l-step of the scaled spin-pair recurrence (column n, mn = m*n)."""
    d_prev, d_curr, k = carry
    l_f = ell.astype(jnp.float32)
    lm1 = l_f - 1.0

    def a_of(l):
        return jnp.sqrt(
            jnp.maximum((l * l - m * m) * (l * l - s2), 0.0)
        ) / jnp.maximum(l, 1.0)

    a_l = a_of(l_f)
    a_lm1 = a_of(lm1)
    inv = jnp.where(a_l > 0.0, 1.0 / jnp.where(a_l > 0.0, a_l, 1.0), 0.0)
    mid = (2.0 * l_f - 1.0) * (x - mn / jnp.maximum(lm1 * l_f, 1.0))
    cand = mid * inv * d_curr - (a_lm1 * inv) * d_prev
    is_seed = l_f == j0
    d_new = jnp.where(is_seed, seed_mant, jnp.where(l_f > j0, cand, 0.0))
    k_new = jnp.where(is_seed, seed_k, k)
    over = jnp.abs(d_new) > _SCALE
    d_new = jnp.where(over, d_new * _INV_SCALE, d_new)
    d_prev_new = jnp.where(over, d_curr * _INV_SCALE, d_curr)
    k_new = jnp.where(over, k_new + 1.0, k_new)
    emit = jnp.where(k_new == 0.0, 1.0,
                     jnp.where(k_new == -1.0, _INV_SCALE, 0.0))
    norm = jnp.sqrt((2.0 * l_f + 1.0) / (4.0 * np.pi))
    return (d_prev_new, d_new, k_new), d_new * emit * norm


def _advance_pair_comp(carry, ell, m, s2, mn, xh, xr, j0, seed_mant,
                       seed_k):
    """One l-step of the compensated pair recurrence (diag region).

    :func:`_advance_pair` plus the x-truncation lo stream; carry is
    (d_prev, d_prev_lo, d_curr, d_curr_lo, k).
    """
    d_prev, d_pl, d_curr, d_cl, k = carry
    l_f = ell.astype(jnp.float32)
    lm1 = l_f - 1.0

    def a_of(l):
        return jnp.sqrt(
            jnp.maximum((l * l - m * m) * (l * l - s2), 0.0)
        ) / jnp.maximum(l, 1.0)

    a_l = a_of(l_f)
    a_lm1 = a_of(lm1)
    inv = jnp.where(a_l > 0.0, 1.0 / jnp.where(a_l > 0.0, a_l, 1.0), 0.0)
    c0 = (2.0 * l_f - 1.0) * inv
    cm = c0 * (mn / jnp.maximum(lm1 * l_f, 1.0))
    c2 = a_lm1 * inv
    t1 = c0 * (xh * d_curr)
    cand = t1 - cm * d_curr - c2 * d_prev
    cand_lo = c0 * (xh * d_cl) + xr * t1 - cm * d_cl - c2 * d_pl
    is_seed = l_f == j0
    live = l_f > j0
    d_new = jnp.where(is_seed, seed_mant, jnp.where(live, cand, 0.0))
    d_nl = jnp.where(is_seed | ~live, 0.0, cand_lo)
    k_new = jnp.where(is_seed, seed_k, k)
    over = jnp.abs(d_new) > _SCALE
    sc = jnp.where(over, _INV_SCALE, 1.0)
    d_prev_new = d_curr * sc
    d_pl_new = d_cl * sc
    d_new = d_new * sc
    d_nl = d_nl * sc
    k_new = jnp.where(over, k_new + 1.0, k_new)
    emit = jnp.where(k_new == 0.0, 1.0,
                     jnp.where(k_new == -1.0, _INV_SCALE, 0.0))
    norm = jnp.sqrt((2.0 * l_f + 1.0) / (4.0 * np.pi))
    lam = (d_new + d_nl) * emit * norm
    return (d_prev_new, d_pl_new, d_new, d_nl, k_new), lam


def _diag_end(m0, m_chunk, nblocks):
    """Last 8-l block (exclusive) of the "diagonal" region of an m-chunk.

    Blocks below it run the exact per-step seed/rescale logic; blocks at
    or above it run the cheap bulk step with per-block deferred
    rescaling.  The margin 128 + m0//32 l's beyond the chunk's top order
    bounds the per-8-step mantissa growth to ~2^25 (the growth factor is
    ~sqrt(2l/(l-m)) per step), so a deferred rescale can only miss
    emissions below ~2^-35 — far under the f32 recurrence noise floor.
    """
    return jnp.minimum((m0 + m_chunk + 128 + m0 // 32) // 8, nblocks)


def _bulk_coeffs_spin0(ell, m):
    """(c1, c2) recurrence rows for l > m (no seed/guard logic needed)."""
    lm1 = ell - 1.0
    a_l = jnp.sqrt(ell * ell - m * m)
    a_lm1 = jnp.sqrt(lm1 * lm1 - m * m)
    inv = 1.0 / a_l
    return (2.0 * ell - 1.0) * inv, a_lm1 * inv


def _bulk_coeffs_pair(ell, m, s2, mn):
    """(c0, cm, c2) rows for the pair recurrence at l > max(m, s).

    d_new = c0 * (x * d_curr) - cm * d_curr - c2 * d_prev.
    """
    lm1 = ell - 1.0

    def a_of(l):
        return jnp.sqrt((l * l - m * m) * (l * l - s2)) / l

    inv = 1.0 / a_of(ell)
    c0 = (2.0 * ell - 1.0) * inv
    cm = c0 * (mn / (lm1 * ell))
    return c0, cm, a_of(lm1) * inv


def _emit_of(k):
    return jnp.where(k == 0.0, 1.0, jnp.where(k == -1.0, _INV_SCALE, 0.0))


def _block_rescale(d_prev, d_curr, k):
    """Deferred overflow check, once per 8-l block (exact binary scaling)."""
    over = jnp.abs(d_curr) > _SCALE
    d_curr = jnp.where(over, d_curr * _INV_SCALE, d_curr)
    d_prev = jnp.where(over, d_prev * _INV_SCALE, d_prev)
    return d_prev, d_curr, jnp.where(over, k + 1.0, k)


def _rsum(a):
    """Sum over axis 0 to (1, lanes) via halving tree.

    A flat reduce lowers to a serial accumulate over all sublane tiles
    (latency-bound chain); pairwise halving keeps the same add count but
    a log-depth dependency chain, and is also ~half an ulp more accurate.
    """
    n = a.shape[0]
    while n > 8 and n % 2 == 0:
        n //= 2
        a = a[:n] + a[n:]
    return jnp.sum(a, axis=0, keepdims=True)


def _env_contract(default="tree"):
    """Default ring-contraction strategy: "tree" or "fma".

    Resolved at trace time from ``HERACLES_TPU_SHT_CONTRACT`` when the
    wrappers' ``contract`` argument is None; pass the argument
    explicitly (as the kernel tuner does) to override per call.  Each
    wrapper supplies its tuned per-kernel ``default``
    (tools/kernel_tune.json, n4096_l3000: fma wins only for the pair
    analysis — 415 ms rb256 vs 454 ms tree rb128; the synthesis kernels
    regress under fma and keep the tree).
    """
    return os.environ.get("HERACLES_TPU_SHT_CONTRACT", default)


def _env_skip(default="none"):
    """Synthesis bulk-block skip strategy: "none", "wavefront" or "full".

    The synthesis kernels' accumulators are loop-carried VALUES, so a
    skip branch is a ``lax.cond`` over the whole accumulator carry —
    which Mosaic handles badly: measured on TPU at n4096/l3000,
    spin-0 synthesis rb1024 runs 231 ms with no skip, 362 ms with the
    wavefront cond and 402 ms with the round-3 nested wavefront+emit
    conds (pair rb128: 583 / 612 / 677) — while interpret mode shows
    the conds as free.  Default "none"; resolved at trace time from
    ``HERACLES_TPU_SHT_SKIP`` when the wrappers' ``skip`` argument is
    None.  The analysis kernels accumulate into revisited output REFS
    and keep their cheap ``pl.when`` skips regardless.
    """
    v = os.environ.get("HERACLES_TPU_SHT_SKIP", default)
    if v not in ("none", "wavefront", "full"):
        raise ValueError(
            f"HERACLES_TPU_SHT_SKIP={v!r}: expected 'none', 'wavefront' "
            "or 'full'"
        )
    return v


def _check_l_chunk(l_chunk):
    """The l-chunked kernel tiles alm blocks in 8-row units; any other
    granularity silently corrupts the block indexing (lo_blk vs row0)."""
    if l_chunk < 8 or l_chunk % 8 != 0:
        raise ValueError(
            f"l_chunk={l_chunk}: must be a positive multiple of 8"
        )
    return l_chunk


def _env_lc():
    """Default l-chunk for the l-chunked pair synthesis kernel (0 = off).

    ``HERACLES_TPU_SHT_LCHUNK`` overrides; the wrapper's ``l_chunk``
    argument wins over both.
    """
    v = int(os.environ.get("HERACLES_TPU_SHT_LCHUNK", "0"))
    return _check_l_chunk(v) if v > 0 else None


def _chain_bounds(n):
    """Split ``n`` rows (a multiple of 8) into up to 4 tile chains."""
    tiles = n // 8
    nch = min(4, tiles)
    return [8 * ((c * tiles) // nch) for c in range(nch + 1)]


def _chain_reduce(accs):
    """Pairwise-combine per-chain (8, lanes) partials, then row-reduce."""
    while len(accs) > 1:
        nxt = [accs[i] + accs[i + 1] for i in range(0, len(accs) - 1, 2)]
        if len(accs) % 2:
            nxt.append(accs[-1])
        accs = nxt
    return jnp.sum(accs[0], axis=0, keepdims=True)


def _dot_rows(a, b):
    """sum over axis 0 of a*b -> (1, lanes) in fused multiply-add form.

    ``_rsum(a * b)`` lowers to a full elementwise multiply plus a
    halving-tree of adds (~2 VPU ops per element).  Accumulating one
    (8, lanes) sublane tile at a time as ``acc = a_t * b_t + acc`` maps
    each tile onto a single fused multiply-add (~1 op per element);
    four independent chains keep the FMA latency off the critical path
    and the rounding depth near the tree's (and each FMA rounds once
    where mul+add round twice).
    """
    n = a.shape[0]
    if n % 8 or n <= 8:
        return _rsum(a * b)
    bounds = _chain_bounds(n)
    accs = []
    for c in range(len(bounds) - 1):
        lo, hi = bounds[c], bounds[c + 1]
        acc = a[lo:lo + 8] * b[lo:lo + 8]
        for i in range(lo + 8, hi, 8):
            acc = a[i:i + 8] * b[i:i + 8] + acc
        accs.append(acc)
    return _chain_reduce(accs)


def _dot_rows2(a1, b1, a2, b2):
    """sum over axis 0 of a1*b1 + a2*b2, fused (see :func:`_dot_rows`).

    Callers fold any sign into ``a2`` once per l-step (shared across
    maps/components) rather than per call.
    """
    n = a1.shape[0]
    if n % 8 or n <= 8:
        return _rsum(a1 * b1 + a2 * b2)
    bounds = _chain_bounds(n)
    accs = []
    for c in range(len(bounds) - 1):
        lo, hi = bounds[c], bounds[c + 1]
        acc = a1[lo:lo + 8] * b1[lo:lo + 8]
        acc = a2[lo:lo + 8] * b2[lo:lo + 8] + acc
        for i in range(lo + 8, hi, 8):
            acc = a1[i:i + 8] * b1[i:i + 8] + acc
            acc = a2[i:i + 8] * b2[i:i + 8] + acc
        accs.append(acc)
    return _chain_reduce(accs)


def _norm_col(blk):
    """(8, 1) column of sqrt((2l+1)/4pi) for the block's 8 l values."""
    t = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0).astype(jnp.float32)
    l_f = 8.0 * blk.astype(jnp.float32) + t
    return jnp.sqrt((2.0 * l_f + 1.0) / (4.0 * np.pi))


def _f32(a):
    """Coerce Python-float operands to f32 for the error-free transforms.

    A bare Python float rides through ``_split_hi``/``_two_sum`` as
    *trace-time f64 Python arithmetic*, so the Dekker split silently
    never happens and the "exact" error term is wrong by ~eps of the
    product (measured: a 1.2e-7 frac error -> 5e-6 seed-value error in
    the dd kernel via the ``inv`` constant).
    """
    return jnp.float32(a) if isinstance(a, (int, float)) else a


def _two_sum(a, b):
    """Knuth two-sum: s + err == a + b exactly (f32)."""
    a, b = _f32(a), _f32(b)
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _split_hi(a):
    """Dekker 12-bit split: a == hi + lo with hi*hi products exact."""
    t = a * 4097.0
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    """Dekker two-product: p + err == a * b exactly (f32, FMA-free)."""
    a, b = _f32(a), _f32(b)
    p = a * b
    a1, a2 = _split_hi(a)
    b1, b2 = _split_hi(b)
    err = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, err


def _comp_seed_frac(lc_hi, lc_lo, terms):
    """Compensated scaled-seed exponent from logval = lc + sum c_i*g_i.

    The seed log-magnitudes are O(m) large and cancel almost completely
    at the rings where the seed matters, so plain f32 evaluation loses
    ~ulp(m * ln 4) ~ 2^-12 absolute at m ~ 3000 — a ~5e-4 relative seed
    error.  Carrying every big quantity as an (hi, lo) float pair keeps
    the *difference* accurate to ~f32 eps.

    ``terms``: sequence of (c, g_hi, g_lo) with c an integer-valued f32
    (exactly representable).  Returns (frac, k0) such that the seed is
    sign * 2^(frac * SCALE_LOG2) * 2^(SCALE_LOG2 * k0).
    """
    s = lc_hi
    lo = lc_lo
    for c, g_hi, g_lo in terms:
        p, pe = _two_prod(c, g_hi)
        s, se = _two_sum(s, p)
        lo = lo + (pe + se + c * g_lo)
    inv = 1.0 / (_LN2 * _SCALE_LOG2)
    ls, le = _two_prod(s, inv)
    ls_lo = le + lo * inv
    k0 = jnp.floor(ls + ls_lo)
    frac = (ls - k0) + ls_lo
    return frac, k0


# -- double-single (two-f32) arithmetic for the dd high-accuracy kernels ----
#
# Same primitives as ops/df32.py and the jnp dd scans (ops/wigner.py):
# genuinely wider arithmetic, not sub-ulp compensation tricks — the lo
# channel carries its own f32 value, which Mosaic's rounding preserves
# (the df32 Gram kernels measure ~1e-15 relative on TPU hardware).


def _dd_add(h1, l1, h2, l2):
    """(h1, l1) + (h2, l2), renormalised."""
    s, e = _two_sum(h1, h2)
    e = e + (l1 + l2)
    return _two_sum(s, e)


def _dd_mul(h1, l1, h2, l2):
    """(h1, l1) * (h2, l2), renormalised (drops l1*l2: O(eps^2))."""
    p, pe = _two_prod(h1, h2)
    e = pe + (h1 * l2 + l1 * h2)
    return _two_sum(p, e)


def _dd_div(h1, l1, h2, l2):
    """(h1, l1) / (h2, l2) via one Newton correction of the f32 quotient."""
    q0 = h1 / h2
    p, pe = _two_prod(q0, h2)
    rh, rl = _dd_add(h1, l1, -p, -pe)
    rl = rl - q0 * l2
    q1 = (rh + rl) / h2
    return _two_sum(q0, q1)


def _dd_sqrt(h, l):
    """sqrt of (h, l) via one Newton correction (h > 0)."""
    s0 = jnp.sqrt(h)
    p, pe = _two_prod(s0, s0)
    r = (h - p) + (l - pe)
    s1 = r / (2.0 * s0)
    return _two_sum(s0, s1)


def _comp_seed_frac_dd(lc_hi, lc_lo, terms):
    """Like :func:`_comp_seed_frac` but keeps the fraction as (hi, lo)."""
    s = lc_hi
    lo = lc_lo
    for c, g_hi, g_lo in terms:
        p, pe = _two_prod(c, g_hi)
        s, se = _two_sum(s, p)
        lo = lo + (pe + se + c * g_lo)
    # 1/(ln2 * 60) as an (hi, lo) pair: a single-f32 constant scales the
    # whole log-magnitude s (|s| can be hundreds) by (1 + ~eps), which
    # survives the k0 subtraction as an O(|s|*eps) fraction error — a
    # measured 2.5e-6 seed-value error floor in the dd kernel.
    inv = 1.0 / (_LN2 * _SCALE_LOG2)
    inv_hi = float(np.float32(inv))
    inv_lo = float(np.float32(inv - inv_hi))
    ls, le = _two_prod(s, inv_hi)
    ls_lo = le + (lo * inv_hi + s * inv_lo)
    k0 = jnp.floor(ls + ls_lo)
    # ls - k0 is NOT exact in general: ls - k0 lands in [0, 1), which can
    # be a coarser binade than ls itself (e.g. |ls| ~ 0.29 -> 0.71 has a
    # 4x wider ulp), losing an eps/2 of frac = 1.2e-6 of seed value.
    # Keep the subtraction as a pair.
    th, te = _two_sum(ls, -k0)
    fh, fe = _two_sum(th, ls_lo + te)
    return fh, fe, k0


def _seed_dd(frac_h, frac_e, sign):
    """(hi, lo) seed mantissa = sign * 2^(frac * SCALE_LOG2).

    exp2 of the hi fraction, first-order-corrected by the lo residual in
    the *lo channel* — unlike the reverted plain-f32 seed corrections
    (commit 4f60b13), the correction here rides in its own float, which
    hardware rounding cannot absorb.
    """
    ah, ae = _two_prod(frac_h, float(_SCALE_LOG2))
    ae = ae + frac_e * float(_SCALE_LOG2)
    # exp2 evaluated only on the small fractional part: exp2(x) for x up
    # to 60 costs ~x*eps relative (argument scaling by a rounded ln2
    # inside the implementation — measured 5e-6 at x~48 on CPU); the
    # integer power is built exactly from the exponent bits.
    ai = jnp.round(ah)
    af = ah - ai  # exact: |af| <= 0.5 and ah, ai share scale
    p2 = jax.lax.bitcast_convert_type(
        (ai.astype(jnp.int32) + 127) << 23, jnp.float32
    )
    s0 = p2 * jnp.exp2(af)
    lo = s0 * (ae * _LN2)
    return sign * s0, sign * lo


def _coeffs_spin0_dd(ell, m):
    """dd recurrence rows for l > m: c1 = (2l-1)/a(l), c2 = a(l-1)/a(l).

    Integer-valued inputs make l^2, m^2 and their two-products exact;
    rounding enters only through the dd sqrt/div (O(eps^2) relative).
    Row-shaped ((1, m_chunk)) — cheap next to the ring-block-shaped
    recurrence math.
    """
    lm1 = ell - 1.0
    zeros = jnp.zeros_like(m)

    def a_of(lf):
        l2h, l2l = _two_prod(lf, lf)
        m2h, m2l = _two_prod(m, m)
        uh, ul = _dd_add(l2h, l2l, -m2h, -m2l)
        return _dd_sqrt(uh, ul)

    ah, al = a_of(ell * jnp.ones_like(m))
    c1h, c1l = _dd_div(2.0 * ell - 1.0 + zeros, zeros, ah, al)
    a1h, a1l = a_of(lm1 * jnp.ones_like(m))
    c2h, c2l = _dd_div(a1h, a1l, ah, al)
    return (c1h, c1l), (c2h, c2l)


def _advance_spin0_dd(carry, ell, m, xh, xl, seed_h, seed_l, k0):
    """One l-step of the scaled spin-0 recurrence in dd arithmetic."""
    dph, dpl, dch, dcl, k = carry
    l_f = ell.astype(jnp.float32)
    zeros = jnp.zeros_like(m)

    def u_of(lf):
        l2h, l2l = _two_prod(lf + zeros, lf + zeros)
        m2h, m2l = _two_prod(m, m)
        return _dd_add(l2h, l2l, -m2h, -m2l)

    uh, ul = u_of(l_f)
    live = uh > 0.0
    ah, al = _dd_sqrt(jnp.where(live, uh, 1.0), jnp.where(live, ul, 0.0))
    c1h, c1l = _dd_div(2.0 * l_f - 1.0 + zeros, zeros, ah, al)
    c1h = jnp.where(live, c1h, 0.0)
    c1l = jnp.where(live, c1l, 0.0)
    u1h, u1l = u_of(l_f - 1.0)
    live1 = u1h > 0.0
    a1h, a1l = _dd_sqrt(jnp.where(live1, u1h, 1.0),
                        jnp.where(live1, u1l, 0.0))
    a1h = jnp.where(live1, a1h, 0.0)
    a1l = jnp.where(live1, a1l, 0.0)
    c2h, c2l = _dd_div(a1h, a1l, ah, al)
    c2h = jnp.where(live, c2h, 0.0)
    c2l = jnp.where(live, c2l, 0.0)

    xdh, xdl = _dd_mul(xh, xl, dch, dcl)
    t1h, t1l = _dd_mul(c1h, c1l, xdh, xdl)
    t2h, t2l = _dd_mul(c2h, c2l, dph, dpl)
    ch_, cl_ = _dd_add(t1h, t1l, -t2h, -t2l)

    is_seed = l_f == m
    grow = l_f > m
    d_h = jnp.where(is_seed, seed_h, jnp.where(grow, ch_, 0.0))
    d_l = jnp.where(is_seed, seed_l, jnp.where(grow, cl_, 0.0))
    k_new = jnp.where(is_seed, k0, k)
    over = jnp.abs(d_h) > _SCALE
    sc = jnp.where(over, _INV_SCALE, 1.0)
    d_h, d_l = d_h * sc, d_l * sc  # exact power-of-2 rescale
    dp_h, dp_l = dch * sc, dcl * sc
    k_new = jnp.where(over, k_new + 1.0, k_new)
    emit = _emit_of(k_new)
    norm = jnp.sqrt((2.0 * l_f + 1.0) / (4.0 * np.pi))
    lam = (d_h + d_l) * emit * norm
    return (dp_h, dp_l, d_h, d_l, k_new), lam


def _coeffs_pair_dd(l_f, m, s2_h, mn, guard=False):
    """dd rows for the pair recurrence at l (jnp analog: wigner.py dd).

    d_new = c0*(x*d_curr) - cm*d_curr - c2*d_prev with
    a(l) = sqrt((l^2-m^2)(l^2-s^2))/l, c0 = (2l-1)/a(l),
    cm = c0*mn/((l-1)l), c2 = a(l-1)/a(l).  All integer-valued inputs
    two_prod exactly; ``guard`` masks the sub-seed region (u <= 0).
    Returns ((c0h, c0l), (cmh, cml), (c2h, c2l)).
    """
    zeros = jnp.zeros_like(m)
    lm1 = l_f - 1.0

    def u_of(lf):
        l2h, l2l = _two_prod(lf + zeros, lf + zeros)
        m2h, m2l = _two_prod(m, m)
        ah, al = _dd_add(l2h, l2l, -m2h, -m2l)
        bh, bl = _dd_add(l2h, l2l, -s2_h, 0.0)
        return _dd_mul(ah, al, bh, bl)

    def a_of(lf):
        uh, ul = u_of(lf)
        live = uh > 0.0
        sh_, sl_ = _dd_sqrt(jnp.where(live, uh, 1.0),
                            jnp.where(live, ul, 0.0))
        sh_ = jnp.where(live, sh_, 0.0)
        sl_ = jnp.where(live, sl_, 0.0)
        qh, ql = _dd_div(sh_, sl_, lf + zeros, zeros)
        return qh, ql, live

    ah, al, live = a_of(l_f)
    saf_h = jnp.where(live, ah, 1.0)
    saf_l = jnp.where(live, al, 0.0)
    c0h, c0l = _dd_div(2.0 * l_f - 1.0 + zeros, zeros, saf_h, saf_l)
    # mn / ((l-1) l): exact two_prod denominator, one dd division
    dh, dl = _two_prod(jnp.maximum(lm1, 1.0) + zeros,
                       jnp.maximum(l_f, 1.0) + zeros)
    qh, ql = _dd_div(mn, jnp.zeros_like(mn), dh, dl)
    cmh, cml = _dd_mul(c0h, c0l, qh, ql)
    a1h, a1l, _ = a_of(lm1)
    c2h, c2l = _dd_div(a1h, a1l, saf_h, saf_l)
    if guard:
        c0h = jnp.where(live, c0h, 0.0)
        c0l = jnp.where(live, c0l, 0.0)
        cmh = jnp.where(live, cmh, 0.0)
        cml = jnp.where(live, cml, 0.0)
        c2h = jnp.where(live, c2h, 0.0)
        c2l = jnp.where(live, c2l, 0.0)
    return (c0h, c0l), (cmh, cml), (c2h, c2l)


def _advance_pair_dd(carry, ell, m, s2_h, mn, xh, xl, j0, seed_h, seed_l,
                     seed_k):
    """One l-step of the scaled spin-pair recurrence in dd arithmetic."""
    dph, dpl, dch, dcl, k = carry
    l_f = ell.astype(jnp.float32)
    (c0h, c0l), (cmh, cml), (c2h, c2l) = _coeffs_pair_dd(
        l_f, m, s2_h, mn, guard=True
    )
    xdh, xdl = _dd_mul(xh, xl, dch, dcl)
    t0h, t0l = _dd_mul(c0h, c0l, xdh, xdl)
    tmh, tml = _dd_mul(cmh, cml, dch, dcl)
    t2h, t2l = _dd_mul(c2h, c2l, dph, dpl)
    sh_, sl_ = _dd_add(t0h, t0l, -tmh, -tml)
    ch_, cl_ = _dd_add(sh_, sl_, -t2h, -t2l)

    is_seed = l_f == j0
    grow = l_f > j0
    d_h = jnp.where(is_seed, seed_h, jnp.where(grow, ch_, 0.0))
    d_l = jnp.where(is_seed, seed_l, jnp.where(grow, cl_, 0.0))
    k_new = jnp.where(is_seed, seed_k, k)
    over = jnp.abs(d_h) > _SCALE
    sc = jnp.where(over, _INV_SCALE, 1.0)
    d_h, d_l = d_h * sc, d_l * sc  # exact power-of-2 rescale
    dp_h, dp_l = dch * sc, dcl * sc
    k_new = jnp.where(over, k_new + 1.0, k_new)
    emit = _emit_of(k_new)
    norm = jnp.sqrt((2.0 * l_f + 1.0) / (4.0 * np.pi))
    lam = (d_h + d_l) * emit * norm
    return (dp_h, dp_l, d_h, d_l, k_new), lam


def _vmem_limit(*words):
    """Mosaic VMEM budget (bytes) for f32 word-count estimates.

    Doubled for compiler temporaries, clamped to [64 MB, 96 MB] — 64 MB
    is known to compile on the target chips (synthesis_pair at
    lmax=3000 has always run with it).
    """
    b = 8 * sum(int(w) for w in words)
    return int(min(max(b, 64 * 2**20), 96 * 2**20))


def _flatten_batch(arrays, core_ndim=2):
    """Flatten leading dims of each array to one batch axis; return meta."""
    batch = arrays[0].shape[:-core_ndim]
    B = int(np.prod(batch)) if batch else 1
    flats = tuple(
        a.reshape((B,) + a.shape[a.ndim - core_ndim:]) for a in arrays
    )
    return B, batch, flats


def _kernel(x_ref, logsum_ref, seed_ref, Fe_ref, Fo_ref, out_ref, *, lmax,
            m_chunk, ring_block, nb=1, contract="tree"):
    """Grid: (B//nb, n_mchunks, n_ringblocks); ring blocks accumulate.

    The l-loop is split per m-chunk: blocks below the chunk's lowest
    order are skipped outright (lam = 0 for l < m — the triangle, ~2x at
    production lmax), the "diagonal" region runs the exact per-step
    seed/rescale logic, and the bulk region runs a stripped step with
    per-block deferred rescaling and hoisted emit factors.

    ``nb`` maps share one program: the Wigner recurrence (the dominant
    VPU cost) runs once per (m-chunk, ring-block) tile and its lam
    contracts against all ``nb`` maps' ring spectra — batched DICES
    regions and multi-bin transforms pay the recurrence once, not per
    map.  Refs carry the maps on a leading axis of size nb*2 (re/im
    plane pairs per map); out is (1, nb*2, lpad, m_chunk).

    The triangle-skip/bulk boundaries derive from the chunk's own lane
    orders (``seed_ref[3, 0, 0]``), NOT from ``program_id * m_chunk``:
    the m-sharded multi-chip path feeds each device seed planes with
    globally-offset orders, where a program-id-local base would start
    the bulk loop at l < m (NaN from sqrt(l^2 - m^2)).
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    # seed_ref (4, 1, m_chunk): [logc_hi, logc_lo, msign, m] — the lane
    # orders come from the planes, so any contiguous m block works (the
    # m-sharded path feeds each device its own block)
    m = seed_ref[3]
    msign = seed_ref[2]
    x = x_ref[...]  # (ring_block, 1) cos(theta)
    # (ring_block, 2): hi/lo pair of log(cos t/2) + log(sin t/2)
    logsum_hi = logsum_ref[:, 0:1]
    logsum_lo = logsum_ref[:, 1:2]

    # seed: slm includes a (-1)^m factor on the positive Wigner seed
    # d^m_{-m,0} = C (cos sin)^m (t/2); log C precomputed on the host
    # (lgamma has no Mosaic lowering), compensated hi/lo evaluation
    frac, k0 = _comp_seed_frac(
        seed_ref[0], seed_ref[1], [(m, logsum_hi, logsum_lo)]
    )
    seed_mant = msign * jnp.exp2(frac * _SCALE_LOG2)

    dot1 = _dot_rows if contract == "fma" else (lambda a, b: _rsum(a * b))

    def F_planes(q, t):
        ref = Fe_ref if t % 2 == 0 else Fo_ref
        return ref[0, 2 * q], ref[0, 2 * q + 1]

    # 8 l-steps per iteration: one aligned (8, m_chunk) store per plane
    def diag_body(blk, carry):
        rows = [[] for _ in range(2 * nb)]
        for t in range(8):
            carry, lam = _advance_spin0(carry, 8 * blk + t, m, x, seed_mant, k0)
            for q in range(nb):
                Fr, Fi = F_planes(q, t)
                rows[2 * q].append(dot1(lam, Fr))
                rows[2 * q + 1].append(dot1(lam, Fi))
        sl = pl.ds(8 * blk, 8)
        for p in range(2 * nb):
            out_ref[0, p, sl, :] += jnp.concatenate(rows[p], axis=0)
        return carry

    def bulk_body(blk, carry):
        d_prev, d_curr, k = carry
        emit = _emit_of(k)
        ds = []
        for t in range(8):
            ell = (8 * blk + t).astype(jnp.float32)
            c1, c2 = _bulk_coeffs_spin0(ell, m)
            d_new = c1 * (x * d_curr) - c2 * d_prev
            ds.append(d_new)
            d_prev, d_curr = d_curr, d_new

        def _contract(lams):
            rows = [[] for _ in range(2 * nb)]
            for t in range(8):
                for q in range(nb):
                    Fr, Fi = F_planes(q, t)
                    rows[2 * q].append(dot1(lams[t], Fr))
                    rows[2 * q + 1].append(dot1(lams[t], Fi))
            norm = _norm_col(blk)
            sl = pl.ds(8 * blk, 8)
            for p in range(2 * nb):
                out_ref[0, p, sl, :] += (
                    jnp.concatenate(rows[p], axis=0) * norm
                )

        # wavefront skip: emit is computed once per block from k at
        # entry, so k < -1 everywhere means every lam of this block is
        # exactly zero in the current numbering — skip the contraction
        # (polar tiles spend most l's below the Legendre wavefront).
        # emit skip: k == 0 everywhere means emit == 1.0 exactly — the
        # emit multiply is a bitwise no-op, so skip it (most blocks past
        # the wavefront run this branch; saves 1 of ~8 VPU ops/element)
        kmin, kmax = jnp.min(k), jnp.max(k)

        @pl.when(kmin > -0.5)
        def _emit_fast():
            _contract(ds)

        @pl.when((kmax > -1.5) & (kmin <= -0.5))
        def _emit_scaled():
            _contract([d * emit for d in ds])

        return _block_rescale(d_prev, d_curr, k)

    nblocks = (lmax + 8) // 8
    m0 = seed_ref[3, 0, 0].astype(jnp.int32)
    diag_end = _diag_end(m0, m_chunk, nblocks)
    zeros = jnp.zeros((ring_block, m_chunk), jnp.float32)
    kinit = jnp.full((ring_block, m_chunk), -(2.0**30), jnp.float32)
    carry = jax.lax.fori_loop(
        m0 // 8, diag_end, diag_body, (zeros, zeros, kinit)
    )
    jax.lax.fori_loop(diag_end, nblocks, bulk_body, carry)


def _kernel_comp(x_ref, logsum_ref, seed_ref, Fe_ref, Fo_ref, out_ref, *,
                 lmax, m_chunk, ring_block, nb=1, contract="tree"):
    """Compensated variant of :func:`_kernel`: plain recurrence + an
    x-truncation correction stream (~1.5x plain, ~10x lower error).

    The plain kernel's top-band error is dominated by the f32
    representation error of x = cos(theta): an eps-scale *systematic*
    per-step perturbation that dephases the recurrence coherently
    (error ~ (l - m) * eps * x/sin(theta); measured in
    tools/recurrence_error_model.py — exact-rounded coefficients change
    nothing, while correcting only the x truncation is ~10x).  This
    kernel carries one extra lo stream obeying the same recurrence with
    the x_lo forcing folded in via the ratio r = x_lo/x_hi::

        t1     = c1 * (x * d_curr)
        hi_new = t1 - c2 * d_prev                (identical to plain)
        lo_new = c1 * (x * dl_curr) + r * t1 - c2 * dl_prev

    ``r * t1 ~= c1 * x_lo * d_curr`` reuses the already-computed t1.
    The lo/hi ratio stays ~(l-m)*eps << 1, so no renormalisation is
    needed; lo joins hi once at emission.  The remaining error is the
    random walk of the hi products (~sqrt(l-m)*eps) and the (short)
    plain diagonal region.  x_ref carries (x_hi, r) in its second axis.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    m = seed_ref[3]
    msign = seed_ref[2]
    xh = x_ref[:, 0:1]
    xr = x_ref[:, 1:2]
    logsum_hi = logsum_ref[:, 0:1]
    logsum_lo = logsum_ref[:, 1:2]

    frac, k0 = _comp_seed_frac(
        seed_ref[0], seed_ref[1], [(m, logsum_hi, logsum_lo)]
    )
    seed_mant = msign * jnp.exp2(frac * _SCALE_LOG2)

    dot1 = _dot_rows if contract == "fma" else (lambda a, b: _rsum(a * b))

    def F_planes(q, t):
        ref = Fe_ref if t % 2 == 0 else Fo_ref
        return ref[0, 2 * q], ref[0, 2 * q + 1]

    # diagonal region: exact per-step seed/rescale logic, with the lo
    # stream riding along (so the whole chain is drift-corrected)
    def diag_body(blk, carry):
        rows = [[] for _ in range(2 * nb)]
        for t in range(8):
            carry, lam = _advance_spin0_comp(carry, 8 * blk + t, m, xh, xr,
                                             seed_mant, k0)
            for q in range(nb):
                Fr, Fi = F_planes(q, t)
                rows[2 * q].append(dot1(lam, Fr))
                rows[2 * q + 1].append(dot1(lam, Fi))
        sl = pl.ds(8 * blk, 8)
        for p in range(2 * nb):
            out_ref[0, p, sl, :] += jnp.concatenate(rows[p], axis=0)
        return carry

    def bulk_body(blk, carry):
        dph, dpl, dch, dcl, k = carry
        emit = _emit_of(k)
        ds = []
        for t in range(8):
            ell = (8 * blk + t).astype(jnp.float32)
            c1, c2 = _bulk_coeffs_spin0(ell, m)
            t1 = c1 * (xh * dch)
            hi_new = t1 - c2 * dph
            lo_new = c1 * (xh * dcl) + xr * t1 - c2 * dpl
            ds.append(hi_new + lo_new)
            dph, dpl, dch, dcl = dch, dcl, hi_new, lo_new

        def _contract(lams):
            rows = [[] for _ in range(2 * nb)]
            for t in range(8):
                for q in range(nb):
                    Fr, Fi = F_planes(q, t)
                    rows[2 * q].append(dot1(lams[t], Fr))
                    rows[2 * q + 1].append(dot1(lams[t], Fi))
            norm = _norm_col(blk)
            sl = pl.ds(8 * blk, 8)
            for p in range(2 * nb):
                out_ref[0, p, sl, :] += (
                    jnp.concatenate(rows[p], axis=0) * norm
                )

        kmin, kmax = jnp.min(k), jnp.max(k)

        @pl.when(kmin > -0.5)
        def _emit_fast():
            _contract(ds)

        @pl.when((kmax > -1.5) & (kmin <= -0.5))
        def _emit_scaled():
            _contract([d * emit for d in ds])

        over = jnp.abs(dch) > _SCALE
        sc = jnp.where(over, _INV_SCALE, 1.0)
        return (dph * sc, dpl * sc, dch * sc, dcl * sc,
                jnp.where(over, k + 1.0, k))

    nblocks = (lmax + 8) // 8
    m0 = seed_ref[3, 0, 0].astype(jnp.int32)
    diag_end = _diag_end(m0, m_chunk, nblocks)
    zeros = jnp.zeros((ring_block, m_chunk), jnp.float32)
    kinit = jnp.full((ring_block, m_chunk), -(2.0**30), jnp.float32)
    carry = jax.lax.fori_loop(
        m0 // 8, diag_end, diag_body,
        (zeros, zeros, zeros, zeros, kinit),
    )
    jax.lax.fori_loop(diag_end, nblocks, bulk_body, carry)


def _kernel_dd(x_ref, logsum_ref, seed_ref, Fe_ref, Fo_ref, out_ref, *,
               lmax, m_chunk, ring_block, nb=1, contract="tree"):
    """dd (double-single f32) variant of :func:`_kernel`.

    Same grid/blocking/triangle-skip structure; the recurrence carries
    and coefficients are (hi, lo) f32 pairs, removing the f32 recurrence
    rounding that dominates the top multipole band (~2-3e-5 band-max Cl
    at l >~ 0.9 lmax with the plain kernel; <~1e-6 in dd — see
    ops/wigner.py's jnp dd scans, same arithmetic).  ``x_ref`` carries
    the (hi, lo) pair of cos(theta) in its second axis.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    m = seed_ref[3]
    msign = seed_ref[2]
    xh = x_ref[:, 0:1]
    xl = x_ref[:, 1:2]
    logsum_hi = logsum_ref[:, 0:1]
    logsum_lo = logsum_ref[:, 1:2]

    frac_h, frac_e, k0 = _comp_seed_frac_dd(
        seed_ref[0], seed_ref[1], [(m, logsum_hi, logsum_lo)]
    )
    seed_h, seed_l = _seed_dd(frac_h, frac_e, msign)

    dot1 = _dot_rows if contract == "fma" else (lambda a, b: _rsum(a * b))

    def F_planes(q, t):
        ref = Fe_ref if t % 2 == 0 else Fo_ref
        return ref[0, 2 * q], ref[0, 2 * q + 1]

    def diag_body(blk, carry):
        rows = [[] for _ in range(2 * nb)]
        for t in range(8):
            carry, lam = _advance_spin0_dd(
                carry, 8 * blk + t, m, xh, xl, seed_h, seed_l, k0
            )
            for q in range(nb):
                Fr, Fi = F_planes(q, t)
                rows[2 * q].append(dot1(lam, Fr))
                rows[2 * q + 1].append(dot1(lam, Fi))
        sl = pl.ds(8 * blk, 8)
        for p in range(2 * nb):
            out_ref[0, p, sl, :] += jnp.concatenate(rows[p], axis=0)
        return carry

    def bulk_body(blk, carry):
        dph, dpl, dch, dcl, k = carry
        emit = _emit_of(k)
        ds = []
        for t in range(8):
            ell = (8 * blk + t).astype(jnp.float32)
            (c1h, c1l), (c2h, c2l) = _coeffs_spin0_dd(ell, m)
            xdh, xdl = _dd_mul(xh, xl, dch, dcl)
            t1h, t1l = _dd_mul(c1h, c1l, xdh, xdl)
            t2h, t2l = _dd_mul(c2h, c2l, dph, dpl)
            dnh, dnl = _dd_add(t1h, t1l, -t2h, -t2l)
            ds.append(dnh + dnl)
            dph, dpl, dch, dcl = dch, dcl, dnh, dnl

        @pl.when(jnp.max(k) > -1.5)
        def _emit_block():
            rows = [[] for _ in range(2 * nb)]
            for t in range(8):
                lam = ds[t] * emit
                for q in range(nb):
                    Fr, Fi = F_planes(q, t)
                    rows[2 * q].append(dot1(lam, Fr))
                    rows[2 * q + 1].append(dot1(lam, Fi))
            norm = _norm_col(blk)
            sl = pl.ds(8 * blk, 8)
            for p in range(2 * nb):
                out_ref[0, p, sl, :] += (
                    jnp.concatenate(rows[p], axis=0) * norm
                )

        over = jnp.abs(dch) > _SCALE
        sc = jnp.where(over, _INV_SCALE, 1.0)
        return (dph * sc, dpl * sc, dch * sc, dcl * sc,
                jnp.where(over, k + 1.0, k))

    nblocks = (lmax + 8) // 8
    m0 = seed_ref[3, 0, 0].astype(jnp.int32)
    diag_end = _diag_end(m0, m_chunk, nblocks)
    zeros = jnp.zeros((ring_block, m_chunk), jnp.float32)
    kinit = jnp.full((ring_block, m_chunk), -(2.0**30), jnp.float32)
    carry = jax.lax.fori_loop(
        m0 // 8, diag_end, diag_body, (zeros, zeros, zeros, zeros, kinit)
    )
    jax.lax.fori_loop(diag_end, nblocks, bulk_body, carry)


def _pair_kernel(x_ref, logch_ref, logsh_ref, seed_ref, FNp_ref, Sp_ref,
                 FNm_ref, Sm_ref, out_ref, *, lmax, spin, m_chunk, ring_block,
                 nb=1, contract="tree"):
    """Spin-pair (cross) analysis: columns n = +s and n = -s together.

    Grid (B//nb, n_mchunks, n_ringblocks).  The two Wigner columns share
    the recurrence coefficients up to the sign of the m*n term; the
    mirror (southern) term of each column contributes to the *partner*
    column's output with an alternating (-1)^l sign:
        a_p[l] = sum lam_p FN_p + (-1)^l sum lam_m S_p
        a_m[l] = sum lam_m FN_m + (-1)^l sum lam_p S_m
    (S_* are the partner-paired, (-1)^m-signed southern rows built by the
    caller, exactly as in the jnp cross path.)  ``nb`` maps share one
    program — both Wigner recurrences run once per tile and contract
    against every map's spectra (F refs carry nb*2 re/im planes, out is
    (1, nb*4, lpad, m_chunk)).
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    x = x_ref[...]  # (ring_block, 1)
    # (ring_block, 2) hi/lo pairs of log(cos t/2), log(sin t/2)
    logch = (logch_ref[:, 0:1], logch_ref[:, 1:2])
    logsh = (logsh_ref[:, 0:1], logsh_ref[:, 1:2])
    # seed_ref: (8, 1, m_chunk):
    # [logc_p_hi, logc_p_lo, sign_p, logc_m_hi, logc_m_lo, sign_m, j0, m]
    m = seed_ref[7]
    j0 = seed_ref[6]
    s2 = float(spin * spin)

    def seed_vals(lc_hi, lc_lo, sign, pc, ps):
        frac, k0 = _comp_seed_frac(
            lc_hi, lc_lo,
            [(pc, logch[0], logch[1]), (ps, logsh[0], logsh[1])],
        )
        return sign * jnp.exp2(frac * _SCALE_LOG2), k0

    # exponent pairs: (m', n') = (-m, -n) with pc = |m'+n'|, ps = |m'-n'|;
    # branch p: n = +s -> pc = m+s, ps = |m-s|; branch m mirrored
    pc_p = m + float(spin)
    ps_p = jnp.abs(m - float(spin))
    pc_m = jnp.abs(m - float(spin))
    ps_m = m + float(spin)
    seed_p, k0_p = seed_vals(seed_ref[0], seed_ref[1], seed_ref[2], pc_p, ps_p)
    seed_m, k0_m = seed_vals(seed_ref[3], seed_ref[4], seed_ref[5], pc_m, ps_m)
    # recurrence middle term uses m'*n' = (-m)(-n) = m*n; branch p (the
    # a_{+s} column) has n = +s, branch m has n = -s
    mn_p = m * float(spin)
    mn_m = m * float(-spin)

    def F_of(ref, q):
        return (ref[0, 2 * q], ref[0, 2 * q + 1])

    fma = contract == "fma"

    def rows_of_t(rows, t, lam_p, lam_m):
        """Append the 4*nb (1, m_chunk) rows for one l-step."""
        if fma:
            # fold the (-1)^l mirror sign into the partner lambda once
            # per step (shared across maps/components), then contract
            # both products in one fused-multiply-add chain
            lam_ps = lam_p if t % 2 == 0 else -lam_p
            lam_ms = lam_m if t % 2 == 0 else -lam_m
        for q in range(nb):
            FNp, Sp = F_of(FNp_ref, q), F_of(Sp_ref, q)
            FNm, Sm = F_of(FNm_ref, q), F_of(Sm_ref, q)
            for c in range(2):
                if fma:
                    rows[4 * q + c].append(
                        _dot_rows2(lam_p, FNp[c], lam_ms, Sp[c])
                    )
                    rows[4 * q + 2 + c].append(
                        _dot_rows2(lam_m, FNm[c], lam_ps, Sm[c])
                    )
                else:
                    tp = lam_p * FNp[c]
                    tm = lam_m * Sp[c]
                    rows[4 * q + c].append(
                        _rsum(tp + tm if t % 2 == 0 else tp - tm)
                    )
                    tp2 = lam_m * FNm[c]
                    tm2 = lam_p * Sm[c]
                    rows[4 * q + 2 + c].append(
                        _rsum(tp2 + tm2 if t % 2 == 0 else tp2 - tm2)
                    )

    def diag_body(blk, carry):
        carry_p, carry_m = carry
        rows = [[] for _ in range(4 * nb)]
        for t in range(8):
            ell = 8 * blk + t
            carry_p, lam_p = _advance_pair(
                carry_p, ell, m, s2, mn_p, x, j0, seed_p, k0_p
            )
            carry_m, lam_m = _advance_pair(
                carry_m, ell, m, s2, mn_m, x, j0, seed_m, k0_m
            )
            rows_of_t(rows, t, lam_p, lam_m)
        sl = pl.ds(8 * blk, 8)
        for plane in range(4 * nb):
            out_ref[0, plane, sl, :] += jnp.concatenate(rows[plane], axis=0)
        return carry_p, carry_m

    def bulk_body(blk, carry):
        (dp_prev, dp_curr, k_p), (dm_prev, dm_curr, k_m) = carry
        emit_p = _emit_of(k_p)
        emit_m = _emit_of(k_m)
        dps, dms = [], []
        for t in range(8):
            ell = (8 * blk + t).astype(jnp.float32)
            c0p, cmp_, c2p = _bulk_coeffs_pair(ell, m, s2, mn_p)
            c0m, cmm, c2m = _bulk_coeffs_pair(ell, m, s2, mn_m)
            # fold cm into the x coefficient: one fewer VPU op/column
            dp_new = (c0p * x - cmp_) * dp_curr - c2p * dp_prev
            dm_new = (c0m * x - cmm) * dm_curr - c2m * dm_prev
            dps.append(dp_new)
            dms.append(dm_new)
            dp_prev, dp_curr = dp_curr, dp_new
            dm_prev, dm_curr = dm_curr, dm_new

        def _contract(lams_p, lams_m):
            rows = [[] for _ in range(4 * nb)]
            for t in range(8):
                rows_of_t(rows, t, lams_p[t], lams_m[t])
            norm = _norm_col(blk)
            sl = pl.ds(8 * blk, 8)
            for plane in range(4 * nb):
                out_ref[0, plane, sl, :] += (
                    jnp.concatenate(rows[plane], axis=0) * norm
                )

        # wavefront skip (see _kernel.bulk_body): block emit factors come
        # from k at entry, so k < -1 on both branches means every lam of
        # this block is exactly zero — skip the contraction work.
        # emit skip: k == 0 on both branches means both emit factors are
        # exactly 1.0 — the two emit multiplies are bitwise no-ops
        kmin = jnp.minimum(jnp.min(k_p), jnp.min(k_m))
        kmax = jnp.maximum(jnp.max(k_p), jnp.max(k_m))

        @pl.when(kmin > -0.5)
        def _emit_fast():
            _contract(dps, dms)

        @pl.when((kmax > -1.5) & (kmin <= -0.5))
        def _emit_scaled():
            _contract([d * emit_p for d in dps], [d * emit_m for d in dms])

        return (
            _block_rescale(dp_prev, dp_curr, k_p),
            _block_rescale(dm_prev, dm_curr, k_m),
        )

    nblocks = (lmax + 8) // 8
    # chunk base order from the chunk's own seed lanes (m-sharded path:
    # lane orders are globally offset; see _kernel docstring)
    m0 = seed_ref[7, 0, 0].astype(jnp.int32)
    diag_end = _diag_end(m0, m_chunk, nblocks)
    zeros = jnp.zeros((ring_block, m_chunk), jnp.float32)
    kinit = jnp.full((ring_block, m_chunk), -(2.0**30), jnp.float32)
    init = ((zeros, zeros, kinit), (zeros, zeros, kinit))
    # the pair seed sits at j0 = max(m, spin) >= m0 for every lane, so
    # blocks below m0//8 contribute nothing for the whole chunk
    carry = jax.lax.fori_loop(m0 // 8, diag_end, diag_body, init)
    jax.lax.fori_loop(diag_end, nblocks, bulk_body, carry)


def _pair_kernel_comp(x_ref, logch_ref, logsh_ref, seed_ref, FNp_ref, Sp_ref,
                      FNm_ref, Sm_ref, out_ref, *, lmax, spin, m_chunk,
                      ring_block, nb=1, contract="tree"):
    """Compensated spin-pair analysis (see :func:`_kernel_comp`).

    The plain pair bulk step plus one x-truncation correction stream per
    Wigner column; ``x_ref`` carries (x_hi, r = x_lo/x_hi).  The m*n
    middle term needs no correction: its magnitude is <= s/l << |x|, so
    its truncation forcing is far below the x one the stream removes.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    x = x_ref[:, 0:1]
    xr = x_ref[:, 1:2]
    logch = (logch_ref[:, 0:1], logch_ref[:, 1:2])
    logsh = (logsh_ref[:, 0:1], logsh_ref[:, 1:2])
    m = seed_ref[7]
    j0 = seed_ref[6]
    s2 = float(spin * spin)

    def seed_vals(lc_hi, lc_lo, sign, pc, ps):
        frac, k0 = _comp_seed_frac(
            lc_hi, lc_lo,
            [(pc, logch[0], logch[1]), (ps, logsh[0], logsh[1])],
        )
        return sign * jnp.exp2(frac * _SCALE_LOG2), k0

    pc_p = m + float(spin)
    ps_p = jnp.abs(m - float(spin))
    pc_m = jnp.abs(m - float(spin))
    ps_m = m + float(spin)
    seed_p, k0_p = seed_vals(seed_ref[0], seed_ref[1], seed_ref[2], pc_p, ps_p)
    seed_m, k0_m = seed_vals(seed_ref[3], seed_ref[4], seed_ref[5], pc_m, ps_m)
    mn_p = m * float(spin)
    mn_m = m * float(-spin)

    def F_of(ref, q):
        return (ref[0, 2 * q], ref[0, 2 * q + 1])

    fma = contract == "fma"

    def rows_of_t(rows, t, lam_p, lam_m):
        if fma:
            lam_ps = lam_p if t % 2 == 0 else -lam_p
            lam_ms = lam_m if t % 2 == 0 else -lam_m
        for q in range(nb):
            FNp, Sp = F_of(FNp_ref, q), F_of(Sp_ref, q)
            FNm, Sm = F_of(FNm_ref, q), F_of(Sm_ref, q)
            for c in range(2):
                if fma:
                    rows[4 * q + c].append(
                        _dot_rows2(lam_p, FNp[c], lam_ms, Sp[c])
                    )
                    rows[4 * q + 2 + c].append(
                        _dot_rows2(lam_m, FNm[c], lam_ps, Sm[c])
                    )
                else:
                    tp = lam_p * FNp[c]
                    tm = lam_m * Sp[c]
                    rows[4 * q + c].append(
                        _rsum(tp + tm if t % 2 == 0 else tp - tm)
                    )
                    tp2 = lam_m * FNm[c]
                    tm2 = lam_p * Sm[c]
                    rows[4 * q + 2 + c].append(
                        _rsum(tp2 + tm2 if t % 2 == 0 else tp2 - tm2)
                    )

    def diag_body(blk, carry):
        carry_p, carry_m = carry
        rows = [[] for _ in range(4 * nb)]
        for t in range(8):
            ell = 8 * blk + t
            carry_p, lam_p = _advance_pair_comp(
                carry_p, ell, m, s2, mn_p, x, xr, j0, seed_p, k0_p
            )
            carry_m, lam_m = _advance_pair_comp(
                carry_m, ell, m, s2, mn_m, x, xr, j0, seed_m, k0_m
            )
            rows_of_t(rows, t, lam_p, lam_m)
        sl = pl.ds(8 * blk, 8)
        for plane in range(4 * nb):
            out_ref[0, plane, sl, :] += jnp.concatenate(rows[plane], axis=0)
        return carry_p, carry_m

    def bulk_body(blk, carry):
        ((dp_prev, dpl_prev, dp_curr, dpl_curr, k_p),
         (dm_prev, dml_prev, dm_curr, dml_curr, k_m)) = carry
        emit_p = _emit_of(k_p)
        emit_m = _emit_of(k_m)
        dps, dms = [], []
        for t in range(8):
            ell = (8 * blk + t).astype(jnp.float32)
            c0p, cmp_, c2p = _bulk_coeffs_pair(ell, m, s2, mn_p)
            c0m, cmm, c2m = _bulk_coeffs_pair(ell, m, s2, mn_m)
            # folded coefficient (see the plain kernel); the xr
            # correction picks up a spurious -cm*x_lo/x*d term, ~s/l of
            # the real c0*x_lo*d forcing -- far below the noise it fixes
            tp = c0p * x - cmp_
            tm = c0m * x - cmm
            tp1 = tp * dp_curr
            tm1 = tm * dm_curr
            dp_new = tp1 - c2p * dp_prev
            dm_new = tm1 - c2m * dm_prev
            dpl_new = tp * dpl_curr + xr * tp1 - c2p * dpl_prev
            dml_new = tm * dml_curr + xr * tm1 - c2m * dml_prev
            dps.append(dp_new + dpl_new)
            dms.append(dm_new + dml_new)
            dp_prev, dpl_prev, dp_curr, dpl_curr = (
                dp_curr, dpl_curr, dp_new, dpl_new)
            dm_prev, dml_prev, dm_curr, dml_curr = (
                dm_curr, dml_curr, dm_new, dml_new)

        def _contract(lams_p, lams_m):
            rows = [[] for _ in range(4 * nb)]
            for t in range(8):
                rows_of_t(rows, t, lams_p[t], lams_m[t])
            norm = _norm_col(blk)
            sl = pl.ds(8 * blk, 8)
            for plane in range(4 * nb):
                out_ref[0, plane, sl, :] += (
                    jnp.concatenate(rows[plane], axis=0) * norm
                )

        kmin = jnp.minimum(jnp.min(k_p), jnp.min(k_m))
        kmax = jnp.maximum(jnp.max(k_p), jnp.max(k_m))

        @pl.when(kmin > -0.5)
        def _emit_fast():
            _contract(dps, dms)

        @pl.when((kmax > -1.5) & (kmin <= -0.5))
        def _emit_scaled():
            _contract([d * emit_p for d in dps], [d * emit_m for d in dms])

        def resc(dp, dpl, dc, dcl, k):
            over = jnp.abs(dc) > _SCALE
            sc = jnp.where(over, _INV_SCALE, 1.0)
            return (dp * sc, dpl * sc, dc * sc, dcl * sc,
                    jnp.where(over, k + 1.0, k))

        return (
            resc(dp_prev, dpl_prev, dp_curr, dpl_curr, k_p),
            resc(dm_prev, dml_prev, dm_curr, dml_curr, k_m),
        )

    nblocks = (lmax + 8) // 8
    m0 = seed_ref[7, 0, 0].astype(jnp.int32)
    diag_end = _diag_end(m0, m_chunk, nblocks)
    zeros = jnp.zeros((ring_block, m_chunk), jnp.float32)
    kinit = jnp.full((ring_block, m_chunk), -(2.0**30), jnp.float32)
    state0 = (zeros, zeros, zeros, zeros, kinit)
    carry = jax.lax.fori_loop(
        m0 // 8, diag_end, diag_body, (state0, state0)
    )
    jax.lax.fori_loop(diag_end, nblocks, bulk_body, carry)


def _pair_kernel_dd(x_ref, logch_ref, logsh_ref, seed_ref, FNp_ref, Sp_ref,
                    FNm_ref, Sm_ref, out_ref, *, lmax, spin, m_chunk,
                    ring_block, nb=1, contract="tree"):
    """dd (double-single f32) variant of :func:`_pair_kernel`.

    Same grid/blocking/output layout; both branch recurrences carry
    (hi, lo) f32 pairs (see :func:`_kernel_dd`).  ``x_ref`` carries the
    (hi, lo) pair of cos(theta) in its second axis.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    xh = x_ref[:, 0:1]
    xl = x_ref[:, 1:2]
    logch = (logch_ref[:, 0:1], logch_ref[:, 1:2])
    logsh = (logsh_ref[:, 0:1], logsh_ref[:, 1:2])
    m = seed_ref[7]
    j0 = seed_ref[6]
    s2 = float(spin * spin)

    def seed_vals(lc_hi, lc_lo, sign, pc, ps):
        fh, fe, k0 = _comp_seed_frac_dd(
            lc_hi, lc_lo,
            [(pc, logch[0], logch[1]), (ps, logsh[0], logsh[1])],
        )
        sh_, sl_ = _seed_dd(fh, fe, sign)
        return sh_, sl_, k0

    pc_p = m + float(spin)
    ps_p = jnp.abs(m - float(spin))
    pc_m = jnp.abs(m - float(spin))
    ps_m = m + float(spin)
    sp_h, sp_l, k0_p = seed_vals(seed_ref[0], seed_ref[1], seed_ref[2],
                                 pc_p, ps_p)
    sm_h, sm_l, k0_m = seed_vals(seed_ref[3], seed_ref[4], seed_ref[5],
                                 pc_m, ps_m)
    mn_p = m * float(spin)
    mn_m = m * float(-spin)

    def F_of(ref, q):
        return (ref[0, 2 * q], ref[0, 2 * q + 1])

    fma = contract == "fma"

    def rows_of_t(rows, t, lam_p, lam_m):
        """Append the 4*nb (1, m_chunk) rows for one l-step."""
        if fma:
            lam_ps = lam_p if t % 2 == 0 else -lam_p
            lam_ms = lam_m if t % 2 == 0 else -lam_m
        for q in range(nb):
            FNp, Sp = F_of(FNp_ref, q), F_of(Sp_ref, q)
            FNm, Sm = F_of(FNm_ref, q), F_of(Sm_ref, q)
            for c in range(2):
                if fma:
                    rows[4 * q + c].append(
                        _dot_rows2(lam_p, FNp[c], lam_ms, Sp[c])
                    )
                    rows[4 * q + 2 + c].append(
                        _dot_rows2(lam_m, FNm[c], lam_ps, Sm[c])
                    )
                else:
                    tp = lam_p * FNp[c]
                    tm = lam_m * Sp[c]
                    rows[4 * q + c].append(
                        _rsum(tp + tm if t % 2 == 0 else tp - tm)
                    )
                    tp2 = lam_m * FNm[c]
                    tm2 = lam_p * Sm[c]
                    rows[4 * q + 2 + c].append(
                        _rsum(tp2 + tm2 if t % 2 == 0 else tp2 - tm2)
                    )

    def diag_body(blk, carry):
        carry_p, carry_m = carry
        rows = [[] for _ in range(4 * nb)]
        for t in range(8):
            ell = 8 * blk + t
            carry_p, lam_p = _advance_pair_dd(
                carry_p, ell, m, s2, mn_p, xh, xl, j0, sp_h, sp_l, k0_p
            )
            carry_m, lam_m = _advance_pair_dd(
                carry_m, ell, m, s2, mn_m, xh, xl, j0, sm_h, sm_l, k0_m
            )
            rows_of_t(rows, t, lam_p, lam_m)
        sl = pl.ds(8 * blk, 8)
        for plane in range(4 * nb):
            out_ref[0, plane, sl, :] += jnp.concatenate(rows[plane], axis=0)
        return carry_p, carry_m

    def bulk_body(blk, carry):
        (dph, dpl, dch, dcl, k_p), (eph, epl, ech, ecl, k_m) = carry
        emit_p = _emit_of(k_p)
        emit_m = _emit_of(k_m)
        dps, dms = [], []
        for t in range(8):
            ell = (8 * blk + t).astype(jnp.float32)
            (c0p, c0pl), (cmp_, cmpl), (c2p, c2pl) = _coeffs_pair_dd(
                ell, m, s2, mn_p
            )
            (c0m, c0ml), (cmm, cmml), (c2m, c2ml) = _coeffs_pair_dd(
                ell, m, s2, mn_m
            )

            def step(c0, c0l_, cm, cml_, c2, c2l_, ph, pll, ch_, cl_):
                xdh, xdl = _dd_mul(xh, xl, ch_, cl_)
                t0h, t0l = _dd_mul(c0, c0l_, xdh, xdl)
                tmh, tml = _dd_mul(cm, cml_, ch_, cl_)
                t2h, t2l = _dd_mul(c2, c2l_, ph, pll)
                sh_, sl_ = _dd_add(t0h, t0l, -tmh, -tml)
                return _dd_add(sh_, sl_, -t2h, -t2l)

            dnh, dnl = step(c0p, c0pl, cmp_, cmpl, c2p, c2pl,
                            dph, dpl, dch, dcl)
            enh, enl = step(c0m, c0ml, cmm, cmml, c2m, c2ml,
                            eph, epl, ech, ecl)
            dps.append(dnh + dnl)
            dms.append(enh + enl)
            dph, dpl, dch, dcl = dch, dcl, dnh, dnl
            eph, epl, ech, ecl = ech, ecl, enh, enl

        @pl.when(jnp.maximum(jnp.max(k_p), jnp.max(k_m)) > -1.5)
        def _emit_block():
            rows = [[] for _ in range(4 * nb)]
            for t in range(8):
                lam_p = dps[t] * emit_p
                lam_m = dms[t] * emit_m
                rows_of_t(rows, t, lam_p, lam_m)
            norm = _norm_col(blk)
            sl = pl.ds(8 * blk, 8)
            for plane in range(4 * nb):
                out_ref[0, plane, sl, :] += (
                    jnp.concatenate(rows[plane], axis=0) * norm
                )

        def resc(ph, pll, ch_, cl_, k):
            over = jnp.abs(ch_) > _SCALE
            sc = jnp.where(over, _INV_SCALE, 1.0)
            return (ph * sc, pll * sc, ch_ * sc, cl_ * sc,
                    jnp.where(over, k + 1.0, k))

        return (resc(dph, dpl, dch, dcl, k_p),
                resc(eph, epl, ech, ecl, k_m))

    nblocks = (lmax + 8) // 8
    m0 = seed_ref[7, 0, 0].astype(jnp.int32)
    diag_end = _diag_end(m0, m_chunk, nblocks)
    zeros = jnp.zeros((ring_block, m_chunk), jnp.float32)
    kinit = jnp.full((ring_block, m_chunk), -(2.0**30), jnp.float32)
    init = ((zeros, zeros, zeros, zeros, kinit),
            (zeros, zeros, zeros, zeros, kinit))
    carry = jax.lax.fori_loop(m0 // 8, diag_end, diag_body, init)
    jax.lax.fori_loop(diag_end, nblocks, bulk_body, carry)


def pair_seed_planes(ms, spin):
    """Host seed-constant planes (8, 1, len(ms)) for the pair kernels.

    ``ms``: the harmonic orders of the lanes (any contiguous block — the
    m-sharded path builds planes for all orders and shards them).  The
    seed log-coefficients are computed in f64 and shipped as (hi, lo)
    f32 pairs for the compensated seed evaluation.
    """
    mm = np.asarray(ms)
    _, sgp, logcp = _seed_consts(mm, spin)
    _, sgm, logcm = _seed_consts(mm, -spin)
    msign = np.where(mm % 2 == 0, 1.0, -1.0)

    def split(a):
        hi = a.astype(np.float32).astype(np.float64)
        return hi, a - hi

    cp_hi, cp_lo = split(logcp)
    cm_hi, cm_lo = split(logcm)
    return np.stack([
        cp_hi,
        cp_lo,
        sgp * msign,
        cm_hi,
        cm_lo,
        sgm * msign,
        np.maximum(mm, abs(spin)).astype(np.float64),
        mm.astype(np.float64),
    ]).astype(np.float32)[:, None, :]


def _vec_pair(hi, lo, pad):
    """(nr_pad, 2) hi/lo column pair of a per-ring log vector."""
    if lo is None:
        lo = jnp.zeros_like(hi)
    hi = jnp.pad(hi.astype(jnp.float32), (0, pad), constant_values=-1e4)
    lo = jnp.pad(lo.astype(jnp.float32), (0, pad))
    return jnp.stack([hi, lo], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("lmax", "spin", "m_chunk", "ring_block", "nb",
                     "interpret", "dd", "contract"),
)
def analysis_pair_folded(FNp, Sp, FNm, Sm, x, logch, logsh, lmax, spin, *,
                         logch_lo=None, logsh_lo=None, seed_planes=None,
                         m_chunk=128, ring_block=None, nb=None,
                         interpret=False, dd=False, x_lo=None,
                         contract=None):
    """Folded spin-pair analysis on the Pallas kernel.

    Inputs as built by the jnp cross path: FN* northern rows per branch,
    S* the partner-paired (-1)^m-signed southern rows, each with optional
    leading batch dims (..., nhalf, nm_pad).  ``logch_lo``/``logsh_lo``
    are the optional f32 residuals of the f64 ring geometry (compensated
    seed path).  Batched maps group ``nb`` per program (recurrence runs
    once per tile).  ``dd``: run both branch recurrences in double-single
    arithmetic (the high-accuracy mode); pass the f32 residual of f64
    cos(theta) in ``x_lo``.  Returns (alm_p, alm_m) rectangular
    (..., lmax+1, nm_pad) complex64.
    """
    contract = contract or _env_contract("fma")
    B, batch, (FNp, Sp, FNm, Sm) = _flatten_batch((FNp, Sp, FNm, Sm))
    if nb is None:
        # out tiles are 2x the spin-0 ones: halve the map grouping
        nb = _pick_nb(B, lmax, limit=4 if lmax <= 1600 else 2)
    nhalf, nm_pad = FNp.shape[-2:]
    if ring_block is None:
        # 4 double-buffered F blocks + 6 carries + the (nb*4, lmax+1, m)
        # output block must fit the VMEM budget; with the fma contraction
        # rb256 beats rb128 at north-star size (tools/kernel_tune.json:
        # 415 vs 448 ms)
        ring_block = min(nhalf, 256)
    nr_pad = -(-nhalf // ring_block) * ring_block
    pad = nr_pad - nhalf

    def prep(F):
        planes = jnp.stack([F.real, F.imag], axis=1).astype(jnp.float32)
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return planes.reshape(B // nb, nb * 2, nr_pad, nm_pad)

    # host-side seed constants per (m, branch): the Wigner-d seed
    # coefficient and sign at j0 = max(m, s) (lgamma-free in the kernel);
    # branch p (a_{+s}) needs d^{j0}_{-m,-s}, branch m needs d^{j0}_{-m,+s}
    seed = (pair_seed_planes(np.arange(nm_pad), spin)
            if seed_planes is None else seed_planes)

    lpad = -(-(lmax + 1) // 8) * 8
    n_mchunks = nm_pad // m_chunk
    n_rblocks = nr_pad // ring_block

    logchp = _vec_pair(logch, logch_lo, pad)
    logshp = _vec_pair(logsh, logsh_lo, pad)

    pair_spec = pl.BlockSpec((ring_block, 2), lambda b, i, j: (j, 0),
                             memory_space=pltpu.VMEM)
    if dd == "comp":
        if x_lo is None:
            x_lo = jnp.zeros_like(x)
        xf = x.astype(jnp.float32)
        r = jnp.where(xf != 0.0, x_lo.astype(jnp.float32) / xf, 0.0)
        xp = jnp.stack(
            [jnp.pad(xf, (0, pad)), jnp.pad(r, (0, pad))], axis=-1
        )
        kernel = _pair_kernel_comp
        vec_spec = pair_spec
        carry_words = 10
    elif dd:
        if x_lo is None:
            x_lo = jnp.zeros_like(x)
        xp = jnp.stack(
            [
                jnp.pad(x.astype(jnp.float32), (0, pad)),
                jnp.pad(x_lo.astype(jnp.float32), (0, pad)),
            ],
            axis=-1,
        )
        kernel = _pair_kernel_dd
        vec_spec = pair_spec
        carry_words = 10
    else:
        xp = jnp.pad(x.astype(jnp.float32), (0, pad))[:, None]
        kernel = _pair_kernel
        vec_spec = pl.BlockSpec((ring_block, 1), lambda b, i, j: (j, 0),
                                memory_space=pltpu.VMEM)
        carry_words = 6
    F_spec = pl.BlockSpec((1, nb * 2, ring_block, m_chunk),
                          lambda b, i, j: (b, 0, j, i),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            kernel, lmax=lmax, spin=abs(int(spin)), m_chunk=m_chunk,
            ring_block=ring_block, nb=nb, contract=contract,
        ),
        grid=(B // nb, n_mchunks, n_rblocks),
        in_specs=[
            vec_spec, pair_spec, pair_spec,
            pl.BlockSpec((8, 1, m_chunk), lambda b, i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            F_spec, F_spec, F_spec, F_spec,
        ],
        out_specs=pl.BlockSpec((1, nb * 4, lpad, m_chunk),
                               lambda b, i, j: (b, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B // nb, nb * 4, lpad, nm_pad), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_SEMANTICS,
            vmem_limit_bytes=_vmem_limit(
                nb * 4 * lpad * m_chunk,
                2 * 4 * nb * 2 * ring_block * m_chunk,
                carry_words * ring_block * m_chunk,
            ),
        ),
        interpret=interpret,
    )(xp, logchp, logshp, jnp.asarray(seed), prep(FNp), prep(Sp),
      prep(FNm), prep(Sm))

    out = out.reshape((B, 4, lpad, nm_pad))[:, :, : lmax + 1]
    alm_p = (out[:, 0] + 1j * out[:, 1]).astype(jnp.complex64)
    alm_m = (out[:, 2] + 1j * out[:, 3]).astype(jnp.complex64)
    shape = batch + (lmax + 1, nm_pad)
    return alm_p.reshape(shape), alm_m.reshape(shape)


def _synth_kernel(x_ref, logsum_ref, seed_ref, alm_ref, out_ref, *, lmax,
                  m_chunk, ring_block, nb=1, contract="tree",
                  skip="wavefront"):
    """Folded spin-0 synthesis: G accumulates in VMEM, written once.

    Grid (B//nb, n_mchunks, n_ringblocks); outputs 4 planes per map
    [GN_re, GN_im, GS_re, GS_im] per (ring-block, m-chunk) tile, with
    the (-1)^m order sign already applied to GS (spin 0: the lane-block
    swap is trivial).  ``nb`` maps share one program: the recurrence
    runs once per tile; alm_ref carries nb*2 re/im planes and out_ref
    nb*4 planes.
    """
    m = seed_ref[3]
    msign = seed_ref[2]
    x = x_ref[...]

    frac, k0 = _comp_seed_frac(
        seed_ref[0], seed_ref[1],
        [(m, logsum_ref[:, 0:1], logsum_ref[:, 1:2])],
    )
    seed_mant = msign * jnp.exp2(frac * _SCALE_LOG2)

    fma = contract == "fma"

    def acc_step(rows, t, lam, acc):
        """One l-step of the G accumulation across the nb maps."""
        new = []
        if fma:
            # re-multiply per accumulator (alm row broadcast x lam) so
            # each update is a single fused multiply-add; the mirror
            # parity sign folds into lam once per step
            lam_s = lam if t % 2 == 0 else -lam
            for q in range(nb):
                GNr, GNi, Sr, Si = acc[q]
                apr = rows[2 * q, t, :][None, :]
                api = rows[2 * q + 1, t, :][None, :]
                new.append((GNr + apr * lam, GNi + api * lam,
                            Sr + apr * lam_s, Si + api * lam_s))
            return new
        sgn = 1.0 if t % 2 == 0 else -1.0
        for q in range(nb):
            GNr, GNi, Sr, Si = acc[q]
            t_re = rows[2 * q, t, :][None, :] * lam
            t_im = rows[2 * q + 1, t, :][None, :] * lam
            new.append((GNr + t_re, GNi + t_im,
                        Sr + sgn * t_re, Si + sgn * t_im))
        return new

    def diag_body(blk, carry):
        state, acc = carry
        rows = alm_ref[0, :, pl.ds(8 * blk, 8), :]  # (nb*2, 8, m_chunk)
        for t in range(8):
            state, lam = _advance_spin0(state, 8 * blk + t, m, x, seed_mant, k0)
            acc = acc_step(rows, t, lam, acc)
        return state, acc

    def bulk_body(blk, carry):
        (d_prev, d_curr, k), acc = carry
        emit = _emit_of(k)
        ds = []
        for t in range(8):
            ell = (8 * blk + t).astype(jnp.float32)
            c1, c2 = _bulk_coeffs_spin0(ell, m)
            d_new = c1 * (x * d_curr) - c2 * d_prev
            ds.append(d_new)
            d_prev, d_curr = d_curr, d_new

        # wavefront skip (see _kernel.bulk_body): emit comes from k at
        # entry, so k < -1 everywhere makes this block's lam all zero —
        # skip the accumulation work on polar tiles below the wavefront.
        # emit skip: k == 0 everywhere means emit == 1.0 exactly — the
        # emit multiply is a bitwise no-op, so skip it in the common
        # (post-wavefront) branch
        def _accumulate_fast(acc):
            norm = _norm_col(blk)
            rows = alm_ref[0, :, pl.ds(8 * blk, 8), :] * norm
            for t in range(8):
                acc = acc_step(rows, t, ds[t], acc)
            return acc

        def _accumulate_scaled(acc):
            norm = _norm_col(blk)
            rows = alm_ref[0, :, pl.ds(8 * blk, 8), :] * norm
            for t in range(8):
                acc = acc_step(rows, t, ds[t] * emit, acc)
            return acc

        if skip == "none":
            acc = _accumulate_scaled(acc)
        elif skip == "wavefront":
            acc = jax.lax.cond(
                jnp.max(k) > -1.5, _accumulate_scaled, lambda a: a, acc
            )
        else:  # "full": wavefront + emit skip (value-carry conds; see
            # _env_skip for why this can lose on Mosaic)
            kmin, kmax = jnp.min(k), jnp.max(k)
            acc = jax.lax.cond(
                kmax > -1.5,
                lambda a: jax.lax.cond(
                    kmin > -0.5, _accumulate_fast, _accumulate_scaled, a
                ),
                lambda a: a, acc,
            )
        return _block_rescale(d_prev, d_curr, k), acc

    nblocks = (lmax + 8) // 8
    # chunk base order from the chunk's own seed lanes (see _kernel)
    m0 = seed_ref[3, 0, 0].astype(jnp.int32)
    diag_end = _diag_end(m0, m_chunk, nblocks)
    zeros = jnp.zeros((ring_block, m_chunk), jnp.float32)
    kinit = jnp.full((ring_block, m_chunk), -(2.0**30), jnp.float32)
    acc0 = [(zeros, zeros, zeros, zeros) for _ in range(nb)]
    carry = jax.lax.fori_loop(
        m0 // 8, diag_end, diag_body, ((zeros, zeros, kinit), acc0)
    )
    _, acc = jax.lax.fori_loop(diag_end, nblocks, bulk_body, carry)
    for q in range(nb):
        GNr, GNi, Sr, Si = acc[q]
        out_ref[0, 4 * q + 0] = GNr
        out_ref[0, 4 * q + 1] = GNi
        out_ref[0, 4 * q + 2] = Sr * msign
        out_ref[0, 4 * q + 3] = Si * msign


def _synth_kernel_comp(x_ref, logsum_ref, seed_ref, alm_ref, out_ref, *,
                       lmax, m_chunk, ring_block, nb=1, contract="tree",
                       skip="wavefront"):
    """Compensated spin-0 synthesis (see :func:`_kernel_comp`).

    Plain recurrence + the x-truncation correction stream; the G
    accumulation stays plain f32 (as in the dd variant).  ``x_ref``
    carries (x_hi, r = x_lo/x_hi) in its second axis.
    """
    m = seed_ref[3]
    msign = seed_ref[2]
    xh = x_ref[:, 0:1]
    xr = x_ref[:, 1:2]

    frac, k0 = _comp_seed_frac(
        seed_ref[0], seed_ref[1],
        [(m, logsum_ref[:, 0:1], logsum_ref[:, 1:2])],
    )
    seed_mant = msign * jnp.exp2(frac * _SCALE_LOG2)

    fma = contract == "fma"

    def acc_step(rows, t, lam, acc):
        new = []
        if fma:
            lam_s = lam if t % 2 == 0 else -lam  # see _synth_kernel
            for q in range(nb):
                GNr, GNi, Sr, Si = acc[q]
                apr = rows[2 * q, t, :][None, :]
                api = rows[2 * q + 1, t, :][None, :]
                new.append((GNr + apr * lam, GNi + api * lam,
                            Sr + apr * lam_s, Si + api * lam_s))
            return new
        sgn = 1.0 if t % 2 == 0 else -1.0
        for q in range(nb):
            GNr, GNi, Sr, Si = acc[q]
            t_re = rows[2 * q, t, :][None, :] * lam
            t_im = rows[2 * q + 1, t, :][None, :] * lam
            new.append((GNr + t_re, GNi + t_im,
                        Sr + sgn * t_re, Si + sgn * t_im))
        return new

    def diag_body(blk, carry):
        state, acc = carry
        rows = alm_ref[0, :, pl.ds(8 * blk, 8), :]  # (nb*2, 8, m_chunk)
        for t in range(8):
            state, lam = _advance_spin0_comp(state, 8 * blk + t, m, xh, xr,
                                             seed_mant, k0)
            acc = acc_step(rows, t, lam, acc)
        return state, acc

    def bulk_body(blk, carry):
        (d_prev, d_prev_lo, d_curr, d_curr_lo, k), acc = carry
        emit = _emit_of(k)
        ds = []
        for t in range(8):
            ell = (8 * blk + t).astype(jnp.float32)
            c1, c2 = _bulk_coeffs_spin0(ell, m)
            t1 = c1 * (xh * d_curr)
            hi_new = t1 - c2 * d_prev
            lo_new = c1 * (xh * d_curr_lo) + xr * t1 - c2 * d_prev_lo
            ds.append(hi_new + lo_new)
            d_prev, d_prev_lo, d_curr, d_curr_lo = (
                d_curr, d_curr_lo, hi_new, lo_new)

        def _accumulate_scaled(acc):
            norm = _norm_col(blk)
            rows = alm_ref[0, :, pl.ds(8 * blk, 8), :] * norm
            for t in range(8):
                acc = acc_step(rows, t, ds[t] * emit, acc)
            return acc

        if skip == "none":
            acc = _accumulate_scaled(acc)
        else:  # "wavefront"/"full": value-carry cond (see _env_skip)
            acc = jax.lax.cond(
                jnp.max(k) > -1.5, _accumulate_scaled, lambda a: a, acc
            )
        over = jnp.abs(d_curr) > _SCALE
        sc = jnp.where(over, _INV_SCALE, 1.0)
        return (
            (d_prev * sc, d_prev_lo * sc, d_curr * sc, d_curr_lo * sc,
             jnp.where(over, k + 1.0, k)),
            acc,
        )

    nblocks = (lmax + 8) // 8
    m0 = seed_ref[3, 0, 0].astype(jnp.int32)
    diag_end = _diag_end(m0, m_chunk, nblocks)
    zeros = jnp.zeros((ring_block, m_chunk), jnp.float32)
    kinit = jnp.full((ring_block, m_chunk), -(2.0**30), jnp.float32)
    acc0 = [(zeros, zeros, zeros, zeros) for _ in range(nb)]
    carry = jax.lax.fori_loop(
        m0 // 8, diag_end, diag_body,
        ((zeros, zeros, zeros, zeros, kinit), acc0),
    )
    _, acc = jax.lax.fori_loop(diag_end, nblocks, bulk_body, carry)
    for q in range(nb):
        GNr, GNi, Sr, Si = acc[q]
        out_ref[0, 4 * q + 0] = GNr
        out_ref[0, 4 * q + 1] = GNi
        out_ref[0, 4 * q + 2] = Sr * msign
        out_ref[0, 4 * q + 3] = Si * msign


def _synth_kernel_dd(x_ref, logsum_ref, seed_ref, alm_ref, out_ref, *, lmax,
                     m_chunk, ring_block, nb=1, contract="tree",
                     skip="wavefront"):
    """dd (double-single f32) variant of :func:`_synth_kernel`.

    Same grid/blocking/output layout; the Wigner recurrence carries and
    coefficients are (hi, lo) f32 pairs (see :func:`_kernel_dd`) while
    the G accumulation stays plain f32 (random-walk noise well below the
    recurrence error it removes — same split as the jnp dd scans).
    ``x_ref`` carries the (hi, lo) pair of cos(theta) in its second axis.
    """
    m = seed_ref[3]
    msign = seed_ref[2]
    xh = x_ref[:, 0:1]
    xl = x_ref[:, 1:2]

    frac_h, frac_e, k0 = _comp_seed_frac_dd(
        seed_ref[0], seed_ref[1],
        [(m, logsum_ref[:, 0:1], logsum_ref[:, 1:2])],
    )
    seed_h, seed_l = _seed_dd(frac_h, frac_e, msign)

    fma = contract == "fma"

    def step_maps(rows, t, lam, acc):
        new = []
        if fma:
            lam_s = lam if t % 2 == 0 else -lam  # see _synth_kernel
            for q in range(nb):
                GNr, GNi, Sr, Si = acc[q]
                apr = rows[2 * q, t, :][None, :]
                api = rows[2 * q + 1, t, :][None, :]
                new.append((GNr + apr * lam, GNi + api * lam,
                            Sr + apr * lam_s, Si + api * lam_s))
            return new
        sgn = 1.0 if t % 2 == 0 else -1.0
        for q in range(nb):
            GNr, GNi, Sr, Si = acc[q]
            t_re = rows[2 * q, t, :][None, :] * lam
            t_im = rows[2 * q + 1, t, :][None, :] * lam
            new.append((GNr + t_re, GNi + t_im,
                        Sr + sgn * t_re, Si + sgn * t_im))
        return new

    def diag_body(blk, carry):
        state, acc = carry
        rows = alm_ref[0, :, pl.ds(8 * blk, 8), :]  # (nb*2, 8, m_chunk)
        for t in range(8):
            state, lam = _advance_spin0_dd(
                state, 8 * blk + t, m, xh, xl, seed_h, seed_l, k0
            )
            acc = step_maps(rows, t, lam, acc)
        return state, acc

    def bulk_body(blk, carry):
        (dph, dpl, dch, dcl, k), acc = carry
        emit = _emit_of(k)
        ds = []
        for t in range(8):
            ell = (8 * blk + t).astype(jnp.float32)
            (c1h, c1l), (c2h, c2l) = _coeffs_spin0_dd(ell, m)
            xdh, xdl = _dd_mul(xh, xl, dch, dcl)
            t1h, t1l = _dd_mul(c1h, c1l, xdh, xdl)
            t2h, t2l = _dd_mul(c2h, c2l, dph, dpl)
            dnh, dnl = _dd_add(t1h, t1l, -t2h, -t2l)
            ds.append(dnh + dnl)
            dph, dpl, dch, dcl = dch, dcl, dnh, dnl

        def _accumulate(acc):
            norm = _norm_col(blk)
            rows = alm_ref[0, :, pl.ds(8 * blk, 8), :] * norm
            for t in range(8):
                acc = step_maps(rows, t, ds[t] * emit, acc)
            return acc

        if skip == "none":
            acc = _accumulate(acc)
        else:
            acc = jax.lax.cond(
                jnp.max(k) > -1.5, _accumulate, lambda a: a, acc
            )
        over = jnp.abs(dch) > _SCALE
        sc = jnp.where(over, _INV_SCALE, 1.0)
        return (dph * sc, dpl * sc, dch * sc, dcl * sc,
                jnp.where(over, k + 1.0, k)), acc

    nblocks = (lmax + 8) // 8
    m0 = seed_ref[3, 0, 0].astype(jnp.int32)
    diag_end = _diag_end(m0, m_chunk, nblocks)
    zeros = jnp.zeros((ring_block, m_chunk), jnp.float32)
    kinit = jnp.full((ring_block, m_chunk), -(2.0**30), jnp.float32)
    acc0 = [(zeros, zeros, zeros, zeros) for _ in range(nb)]
    carry = jax.lax.fori_loop(
        m0 // 8, diag_end, diag_body,
        ((zeros, zeros, zeros, zeros, kinit), acc0),
    )
    _, acc = jax.lax.fori_loop(diag_end, nblocks, bulk_body, carry)
    for q in range(nb):
        GNr, GNi, Sr, Si = acc[q]
        out_ref[0, 4 * q + 0] = GNr
        out_ref[0, 4 * q + 1] = GNi
        out_ref[0, 4 * q + 2] = Sr * msign
        out_ref[0, 4 * q + 3] = Si * msign


@functools.partial(
    jax.jit,
    static_argnames=("lmax", "m_chunk", "ring_block", "nb", "interpret",
                     "dd", "contract", "skip"),
)
def synthesis_spin0_folded(alm, x, logch, logsh, lmax, *, logch_lo=None,
                           logsh_lo=None, seed_planes=None, m_chunk=128,
                           ring_block=None, nb=None, interpret=False,
                           dd=False, x_lo=None, contract=None, skip=None):
    """Folded spin-0 synthesis: rectangular alm -> (GN, GS) ring spectra.

    ``alm``: (..., lmax+1, nm_pad) complex; returns (GN, GS) complex64 of
    shape (..., nhalf, nm_pad) where nhalf = len(x) (northern rings) and
    GS is the mirrored-southern spectrum with the (-1)^m sign applied,
    matching :func:`heracles_tpu.ops.wigner.lambda_synthesis_scan_folded`.
    Batched alms group ``nb`` per program (shared recurrence).
    ``dd``: run the recurrence in double-single arithmetic; pass the f32
    residual of f64 cos(theta) in ``x_lo``.
    """
    contract = contract or _env_contract()
    skip = skip or _env_skip()
    B, batch, (alm,) = _flatten_batch((alm,))
    if nb is None:
        # alm blocks double-buffer per map: stay below the spin-0
        # analysis grouping
        nb = _pick_nb(B, lmax, limit=4 if lmax <= 1600 else 2)
    nhalf = x.shape[0]
    nm_pad = alm.shape[-1]
    if ring_block is None:
        # double-buffered alm block + (nb*4, ring_block, m_chunk) out
        # tile + per-map accumulator carries must fit the VMEM budget;
        # large ring blocks win for single maps (tools/kernel_tune.json,
        # n4096_l3000: rb1024 223 ms vs rb256 306 ms)
        if nb > 1:
            ring_block = min(nhalf, 256 if lmax > 2048 else 512)
        else:
            ring_block = min(nhalf, 1024)
    nr_pad = -(-nhalf // ring_block) * ring_block
    pad = nr_pad - nhalf

    lpad = -(-(lmax + 1) // 8) * 8 + 8  # one spare block for the 8-step tail
    planes = jnp.stack([alm.real, alm.imag], axis=1).astype(jnp.float32)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, lpad - (lmax + 1)), (0, 0)))
    planes = planes.reshape(B // nb, nb * 2, lpad, nm_pad)

    if seed_planes is None:
        seed_planes = spin0_seed_planes(np.arange(nm_pad))
    if dd == "comp":
        if x_lo is None:
            x_lo = jnp.zeros_like(x)
        xf = x.astype(jnp.float32)
        r = jnp.where(xf != 0.0, x_lo.astype(jnp.float32) / xf, 0.0)
        xp = jnp.stack(
            [jnp.pad(xf, (0, pad)), jnp.pad(r, (0, pad))], axis=-1
        )
        kernel = _synth_kernel_comp
        x_width = 2
        carry_words = 4 * nb + 5
    elif dd:
        if x_lo is None:
            x_lo = jnp.zeros_like(x)
        xp = jnp.stack(
            [
                jnp.pad(x.astype(jnp.float32), (0, pad)),
                jnp.pad(x_lo.astype(jnp.float32), (0, pad)),
            ],
            axis=-1,
        )
        kernel = _synth_kernel_dd
        x_width = 2
        carry_words = 4 * nb + 6
    else:
        xp = jnp.pad(x.astype(jnp.float32), (0, pad))[:, None]
        kernel = _synth_kernel
        x_width = 1
        carry_words = 4 * nb + 3
    logsum = _logsum_pair(logch, logsh, logch_lo, logsh_lo, pad)

    n_mchunks = nm_pad // m_chunk
    n_rblocks = nr_pad // ring_block

    out = pl.pallas_call(
        functools.partial(
            kernel, lmax=lmax, m_chunk=m_chunk, ring_block=ring_block,
            nb=nb, contract=contract, skip=skip,
        ),
        grid=(B // nb, n_mchunks, n_rblocks),
        in_specs=[
            pl.BlockSpec((ring_block, x_width), lambda b, i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ring_block, 2), lambda b, i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, m_chunk), lambda b, i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb * 2, lpad, m_chunk),
                         lambda b, i, j: (b, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, nb * 4, ring_block, m_chunk), lambda b, i, j: (b, 0, j, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B // nb, nb * 4, nr_pad, nm_pad), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_SEMANTICS,
            vmem_limit_bytes=_vmem_limit(
                2 * nb * 2 * lpad * m_chunk,
                nb * 4 * ring_block * m_chunk,
                carry_words * ring_block * m_chunk,
            ),
        ),
        interpret=interpret,
    )(xp, logsum, jnp.asarray(seed_planes), planes)

    out = out.reshape((B, 4, nr_pad, nm_pad))[:, :, :nhalf]
    GN = (out[:, 0] + 1j * out[:, 1]).astype(jnp.complex64)
    GS = (out[:, 2] + 1j * out[:, 3]).astype(jnp.complex64)
    shape = batch + (nhalf, nm_pad)
    return GN.reshape(shape), GS.reshape(shape)


def _synth_pair_kernel(x_ref, logch_ref, logsh_ref, seed_ref, ap_ref, am_ref,
                       out_ref, *, lmax, spin, m_chunk, ring_block, nb=1,
                       contract="tree", skip="wavefront"):
    """Folded spin-pair synthesis: both Wigner columns in one program.

    Grid (B, n_mchunks, n_ringblocks); outputs 8 planes per tile:
    [GNp_re, GNp_im, GSp_re, GSp_im, GNm_re, GNm_im, GSm_re, GSm_im].
    The southern spectrum of each branch sums the *partner* column's
    lambda against its own alm rows with the (-1)^l parity sign,
        GS_p = (-1)^m sum_l (-1)^l a_p[l] lam_m[l],
    matching the jnp cross path (wigner.lambda_synthesis_scan_folded:
    S[L] accumulates a[P(L)]*lam[L], then GS = swap(S) * (-1)^m).
    """
    x = x_ref[...]
    logch = (logch_ref[:, 0:1], logch_ref[:, 1:2])
    logsh = (logsh_ref[:, 0:1], logsh_ref[:, 1:2])
    m = seed_ref[7]
    j0 = seed_ref[6]
    # (-1)^m from the planes' m row, so any m block works (sharded path)
    msign = jnp.where(m - 2.0 * jnp.floor(m * 0.5) == 0.0, 1.0, -1.0)
    s2 = float(spin * spin)

    def seed_vals(lc_hi, lc_lo, sign, pc, ps):
        frac, k0 = _comp_seed_frac(
            lc_hi, lc_lo,
            [(pc, logch[0], logch[1]), (ps, logsh[0], logsh[1])],
        )
        return sign * jnp.exp2(frac * _SCALE_LOG2), k0

    pc_p = m + float(spin)
    ps_p = jnp.abs(m - float(spin))
    seed_p, k0_p = seed_vals(seed_ref[0], seed_ref[1], seed_ref[2],
                             pc_p, ps_p)
    seed_m, k0_m = seed_vals(seed_ref[3], seed_ref[4], seed_ref[5],
                             ps_p, pc_p)
    mn_p = m * float(spin)
    mn_m = m * float(-spin)

    fma = contract == "fma"

    def step_maps(rows_p, rows_m, t, lam_p, lam_m, acc):
        new = []
        if fma:
            # mirror parity sign folded into the partner lambda once per
            # step so every accumulator update is one fused multiply-add
            lam_ps = lam_p if t % 2 == 0 else -lam_p
            lam_ms = lam_m if t % 2 == 0 else -lam_m
        else:
            sgn = 1.0 if t % 2 == 0 else -1.0
        for q in range(nb):
            GNpr, GNpi, Spr, Spi, GNmr, GNmi, Smr, Smi = acc[q]
            apr = rows_p[2 * q, t, :][None, :]
            api = rows_p[2 * q + 1, t, :][None, :]
            amr = rows_m[2 * q, t, :][None, :]
            ami = rows_m[2 * q + 1, t, :][None, :]
            if fma:
                new.append((
                    GNpr + apr * lam_p, GNpi + api * lam_p,
                    Spr + apr * lam_ms, Spi + api * lam_ms,
                    GNmr + amr * lam_m, GNmi + ami * lam_m,
                    Smr + amr * lam_ps, Smi + ami * lam_ps,
                ))
            else:
                new.append((
                    GNpr + apr * lam_p, GNpi + api * lam_p,
                    Spr + sgn * apr * lam_m, Spi + sgn * api * lam_m,
                    GNmr + amr * lam_m, GNmi + ami * lam_m,
                    Smr + sgn * amr * lam_p, Smi + sgn * ami * lam_p,
                ))
        return new

    def diag_body(blk, carry):
        state_p, state_m, acc = carry
        rows_p = ap_ref[0, :, pl.ds(8 * blk, 8), :]  # (nb*2, 8, m_chunk)
        rows_m = am_ref[0, :, pl.ds(8 * blk, 8), :]
        for t in range(8):
            ell = 8 * blk + t
            state_p, lam_p = _advance_pair(
                state_p, ell, m, s2, mn_p, x, j0, seed_p, k0_p
            )
            state_m, lam_m = _advance_pair(
                state_m, ell, m, s2, mn_m, x, j0, seed_m, k0_m
            )
            acc = step_maps(rows_p, rows_m, t, lam_p, lam_m, acc)
        return state_p, state_m, acc

    def bulk_body(blk, carry):
        (dp_prev, dp_curr, k_p), (dm_prev, dm_curr, k_m), acc = carry
        emit_p = _emit_of(k_p)
        emit_m = _emit_of(k_m)
        dps, dms = [], []
        for t in range(8):
            ell = (8 * blk + t).astype(jnp.float32)
            c0p, cmp_, c2p = _bulk_coeffs_pair(ell, m, s2, mn_p)
            c0m, cmm, c2m = _bulk_coeffs_pair(ell, m, s2, mn_m)
            # fold cm into the x coefficient: one fewer VPU op/column
            dp_new = (c0p * x - cmp_) * dp_curr - c2p * dp_prev
            dm_new = (c0m * x - cmm) * dm_curr - c2m * dm_prev
            dps.append(dp_new)
            dms.append(dm_new)
            dp_prev, dp_curr = dp_curr, dp_new
            dm_prev, dm_curr = dm_curr, dm_new

        # wavefront skip (see _kernel.bulk_body); emit skip: k == 0 on
        # both branches makes both emit factors exactly 1.0 (a bitwise
        # no-op multiply), so the common post-wavefront branch drops it
        def _accumulate_fast(acc):
            norm = _norm_col(blk)
            rows_p = ap_ref[0, :, pl.ds(8 * blk, 8), :] * norm
            rows_m = am_ref[0, :, pl.ds(8 * blk, 8), :] * norm
            for t in range(8):
                acc = step_maps(rows_p, rows_m, t, dps[t], dms[t], acc)
            return acc

        def _accumulate_scaled(acc):
            norm = _norm_col(blk)
            rows_p = ap_ref[0, :, pl.ds(8 * blk, 8), :] * norm
            rows_m = am_ref[0, :, pl.ds(8 * blk, 8), :] * norm
            for t in range(8):
                lam_p = dps[t] * emit_p
                lam_m = dms[t] * emit_m
                acc = step_maps(rows_p, rows_m, t, lam_p, lam_m, acc)
            return acc

        if skip == "none":
            acc = _accumulate_scaled(acc)
        elif skip == "wavefront":
            kmax = jnp.maximum(jnp.max(k_p), jnp.max(k_m))
            acc = jax.lax.cond(
                kmax > -1.5, _accumulate_scaled, lambda a: a, acc
            )
        else:  # "full" (see _env_skip)
            kmin = jnp.minimum(jnp.min(k_p), jnp.min(k_m))
            kmax = jnp.maximum(jnp.max(k_p), jnp.max(k_m))
            acc = jax.lax.cond(
                kmax > -1.5,
                lambda a: jax.lax.cond(
                    kmin > -0.5, _accumulate_fast, _accumulate_scaled, a
                ),
                lambda a: a, acc,
            )
        return (
            _block_rescale(dp_prev, dp_curr, k_p),
            _block_rescale(dm_prev, dm_curr, k_m),
            acc,
        )

    nblocks = (lmax + 8) // 8
    # chunk base order from the chunk's own seed lanes (see _kernel)
    m0 = seed_ref[7, 0, 0].astype(jnp.int32)
    diag_end = _diag_end(m0, m_chunk, nblocks)
    zeros = jnp.zeros((ring_block, m_chunk), jnp.float32)
    kinit = jnp.full((ring_block, m_chunk), -(2.0**30), jnp.float32)
    state0 = (zeros, zeros, kinit)
    acc0 = [(zeros,) * 8 for _ in range(nb)]
    carry = jax.lax.fori_loop(
        m0 // 8, diag_end, diag_body, (state0, state0, acc0)
    )
    _, _, acc = jax.lax.fori_loop(diag_end, nblocks, bulk_body, carry)
    for q in range(nb):
        GNpr, GNpi, Spr, Spi, GNmr, GNmi, Smr, Smi = acc[q]
        out_ref[0, 8 * q + 0] = GNpr
        out_ref[0, 8 * q + 1] = GNpi
        out_ref[0, 8 * q + 2] = Spr * msign
        out_ref[0, 8 * q + 3] = Spi * msign
        out_ref[0, 8 * q + 4] = GNmr
        out_ref[0, 8 * q + 5] = GNmi
        out_ref[0, 8 * q + 6] = Smr * msign
        out_ref[0, 8 * q + 7] = Smi * msign


def _synth_pair_kernel_lc(x_ref, logch_ref, logsh_ref, seed_ref, ap_ref,
                          am_ref, out_ref,
                          dpp_ref, dpc_ref, kp_ref,
                          dmp_ref, dmc_ref, km_ref, *,
                          lmax, spin, m_chunk, ring_block, l_chunk,
                          n_lchunks, nb=1, contract="tree"):
    """l-chunked variant of :func:`_synth_pair_kernel`.

    A fourth (sequential) grid dimension walks the l axis in
    ``l_chunk``-row alm blocks, with the recurrence state carried
    between chunks in VMEM scratch.  The alm blocks shrink from the
    full (lpad, m_chunk) column to (l_chunk, m_chunk), so the VMEM
    budget no longer caps ``ring_block`` at 128 — the per-l coefficient
    rows then amortise over 4-8x more rings per program.
    """
    lc = pl.program_id(3)
    x = x_ref[...]
    logch = (logch_ref[:, 0:1], logch_ref[:, 1:2])
    logsh = (logsh_ref[:, 0:1], logsh_ref[:, 1:2])
    m = seed_ref[7]
    j0 = seed_ref[6]
    msign = jnp.where(m - 2.0 * jnp.floor(m * 0.5) == 0.0, 1.0, -1.0)
    s2 = float(spin * spin)

    def seed_vals(lc_hi, lc_lo, sign, pc, ps):
        frac, k0 = _comp_seed_frac(
            lc_hi, lc_lo,
            [(pc, logch[0], logch[1]), (ps, logsh[0], logsh[1])],
        )
        return sign * jnp.exp2(frac * _SCALE_LOG2), k0

    pc_p = m + float(spin)
    ps_p = jnp.abs(m - float(spin))
    seed_p, k0_p = seed_vals(seed_ref[0], seed_ref[1], seed_ref[2],
                             pc_p, ps_p)
    seed_m, k0_m = seed_vals(seed_ref[3], seed_ref[4], seed_ref[5],
                             ps_p, pc_p)
    mn_p = m * float(spin)
    mn_m = m * float(-spin)

    @pl.when(lc == 0)
    def _init_state():
        z = jnp.zeros((ring_block, m_chunk), jnp.float32)
        kinit = jnp.full((ring_block, m_chunk), -(2.0**30), jnp.float32)
        dpp_ref[...] = z
        dpc_ref[...] = z
        kp_ref[...] = kinit
        dmp_ref[...] = z
        dmc_ref[...] = z
        km_ref[...] = kinit

    fma = contract == "fma"
    row0 = lc * l_chunk  # the alm block's first (global) l row

    def step_maps(rows_p, rows_m, t, lam_p, lam_m, acc):
        new = []
        if fma:
            lam_ps = lam_p if t % 2 == 0 else -lam_p
            lam_ms = lam_m if t % 2 == 0 else -lam_m
        else:
            sgn = 1.0 if t % 2 == 0 else -1.0
        for q in range(nb):
            GNpr, GNpi, Spr, Spi, GNmr, GNmi, Smr, Smi = acc[q]
            apr = rows_p[2 * q, t, :][None, :]
            api = rows_p[2 * q + 1, t, :][None, :]
            amr = rows_m[2 * q, t, :][None, :]
            ami = rows_m[2 * q + 1, t, :][None, :]
            if fma:
                new.append((
                    GNpr + apr * lam_p, GNpi + api * lam_p,
                    Spr + apr * lam_ms, Spi + api * lam_ms,
                    GNmr + amr * lam_m, GNmi + ami * lam_m,
                    Smr + amr * lam_ps, Smi + ami * lam_ps,
                ))
            else:
                new.append((
                    GNpr + apr * lam_p, GNpi + api * lam_p,
                    Spr + sgn * apr * lam_m, Spi + sgn * api * lam_m,
                    GNmr + amr * lam_m, GNmi + ami * lam_m,
                    Smr + sgn * amr * lam_p, Smi + sgn * ami * lam_p,
                ))
        return new

    def diag_body(blk, carry):
        state_p, state_m, acc = carry
        rows_p = ap_ref[0, :, pl.ds(8 * blk - row0, 8), :]
        rows_m = am_ref[0, :, pl.ds(8 * blk - row0, 8), :]
        for t in range(8):
            ell = 8 * blk + t
            state_p, lam_p = _advance_pair(
                state_p, ell, m, s2, mn_p, x, j0, seed_p, k0_p
            )
            state_m, lam_m = _advance_pair(
                state_m, ell, m, s2, mn_m, x, j0, seed_m, k0_m
            )
            acc = step_maps(rows_p, rows_m, t, lam_p, lam_m, acc)
        return state_p, state_m, acc

    def bulk_body(blk, carry):
        (dp_prev, dp_curr, k_p), (dm_prev, dm_curr, k_m), acc = carry
        emit_p = _emit_of(k_p)
        emit_m = _emit_of(k_m)
        dps, dms = [], []
        for t in range(8):
            ell = (8 * blk + t).astype(jnp.float32)
            c0p, cmp_, c2p = _bulk_coeffs_pair(ell, m, s2, mn_p)
            c0m, cmm, c2m = _bulk_coeffs_pair(ell, m, s2, mn_m)
            # fold cm into the x coefficient: one fewer VPU op/column
            dp_new = (c0p * x - cmp_) * dp_curr - c2p * dp_prev
            dm_new = (c0m * x - cmm) * dm_curr - c2m * dm_prev
            dps.append(dp_new)
            dms.append(dm_new)
            dp_prev, dp_curr = dp_curr, dp_new
            dm_prev, dm_curr = dm_curr, dm_new
        norm = _norm_col(blk)
        rows_p = ap_ref[0, :, pl.ds(8 * blk - row0, 8), :] * norm
        rows_m = am_ref[0, :, pl.ds(8 * blk - row0, 8), :] * norm
        for t in range(8):
            acc = step_maps(rows_p, rows_m, t, dps[t] * emit_p,
                            dms[t] * emit_m, acc)
        return (
            _block_rescale(dp_prev, dp_curr, k_p),
            _block_rescale(dm_prev, dm_curr, k_m),
            acc,
        )

    nblocks = (lmax + 8) // 8
    m0 = seed_ref[7, 0, 0].astype(jnp.int32)
    diag_end = _diag_end(m0, m_chunk, nblocks)
    lo_blk = lc * (l_chunk // 8)
    hi_blk = jnp.minimum(lo_blk + l_chunk // 8, nblocks)

    zeros = jnp.zeros((ring_block, m_chunk), jnp.float32)
    state_p = (dpp_ref[...], dpc_ref[...], kp_ref[...])
    state_m = (dmp_ref[...], dmc_ref[...], km_ref[...])
    acc0 = [(zeros,) * 8 for _ in range(nb)]
    carry = jax.lax.fori_loop(
        jnp.minimum(jnp.maximum(lo_blk, m0 // 8), hi_blk),
        jnp.minimum(diag_end, hi_blk),
        diag_body, (state_p, state_m, acc0),
    )
    (state_p, state_m, acc) = jax.lax.fori_loop(
        jnp.maximum(lo_blk, diag_end), hi_blk, bulk_body, carry
    )
    dpp_ref[...], dpc_ref[...], kp_ref[...] = state_p
    dmp_ref[...], dmc_ref[...], km_ref[...] = state_m

    planes = []
    for q in range(nb):
        GNpr, GNpi, Spr, Spi, GNmr, GNmi, Smr, Smi = acc[q]
        planes += [GNpr, GNpi, Spr, Spi, GNmr, GNmi, Smr, Smi]

    @pl.when(lc == 0)
    def _first_write():
        for i, pln in enumerate(planes):
            out_ref[0, i] = pln

    @pl.when(lc > 0)
    def _accum_write():
        for i, pln in enumerate(planes):
            out_ref[0, i] = out_ref[0, i] + pln

    @pl.when(lc == n_lchunks - 1)
    def _final_sign():
        for q in range(nb):
            for i in (8 * q + 2, 8 * q + 3, 8 * q + 6, 8 * q + 7):
                out_ref[0, i] = out_ref[0, i] * msign


def _synth_pair_kernel_comp(x_ref, logch_ref, logsh_ref, seed_ref, ap_ref,
                            am_ref, out_ref, *, lmax, spin, m_chunk,
                            ring_block, nb=1, contract="tree",
                            skip="wavefront"):
    """Compensated spin-pair synthesis (see :func:`_kernel_comp`).

    Plain pair recurrences + one x-truncation correction stream per
    Wigner column; ``x_ref`` carries (x_hi, r = x_lo/x_hi).
    """
    xh = x_ref[:, 0:1]
    xr = x_ref[:, 1:2]
    logch = (logch_ref[:, 0:1], logch_ref[:, 1:2])
    logsh = (logsh_ref[:, 0:1], logsh_ref[:, 1:2])
    m = seed_ref[7]
    j0 = seed_ref[6]
    msign = jnp.where(m - 2.0 * jnp.floor(m * 0.5) == 0.0, 1.0, -1.0)
    s2 = float(spin * spin)

    def seed_vals(lc_hi, lc_lo, sign, pc, ps):
        frac, k0 = _comp_seed_frac(
            lc_hi, lc_lo,
            [(pc, logch[0], logch[1]), (ps, logsh[0], logsh[1])],
        )
        return sign * jnp.exp2(frac * _SCALE_LOG2), k0

    pc_p = m + float(spin)
    ps_p = jnp.abs(m - float(spin))
    seed_p, k0_p = seed_vals(seed_ref[0], seed_ref[1], seed_ref[2],
                             pc_p, ps_p)
    seed_m, k0_m = seed_vals(seed_ref[3], seed_ref[4], seed_ref[5],
                             ps_p, pc_p)
    mn_p = m * float(spin)
    mn_m = m * float(-spin)

    fma = contract == "fma"

    def step_maps(rows_p, rows_m, t, lam_p, lam_m, acc):
        new = []
        if fma:
            lam_ps = lam_p if t % 2 == 0 else -lam_p
            lam_ms = lam_m if t % 2 == 0 else -lam_m
        else:
            sgn = 1.0 if t % 2 == 0 else -1.0
        for q in range(nb):
            GNpr, GNpi, Spr, Spi, GNmr, GNmi, Smr, Smi = acc[q]
            apr = rows_p[2 * q, t, :][None, :]
            api = rows_p[2 * q + 1, t, :][None, :]
            amr = rows_m[2 * q, t, :][None, :]
            ami = rows_m[2 * q + 1, t, :][None, :]
            if fma:
                new.append((
                    GNpr + apr * lam_p, GNpi + api * lam_p,
                    Spr + apr * lam_ms, Spi + api * lam_ms,
                    GNmr + amr * lam_m, GNmi + ami * lam_m,
                    Smr + amr * lam_ps, Smi + ami * lam_ps,
                ))
            else:
                new.append((
                    GNpr + apr * lam_p, GNpi + api * lam_p,
                    Spr + sgn * apr * lam_m, Spi + sgn * api * lam_m,
                    GNmr + amr * lam_m, GNmi + ami * lam_m,
                    Smr + sgn * amr * lam_p, Smi + sgn * ami * lam_p,
                ))
        return new

    def diag_body(blk, carry):
        state_p, state_m, acc = carry
        rows_p = ap_ref[0, :, pl.ds(8 * blk, 8), :]
        rows_m = am_ref[0, :, pl.ds(8 * blk, 8), :]
        for t in range(8):
            ell = 8 * blk + t
            state_p, lam_p = _advance_pair_comp(
                state_p, ell, m, s2, mn_p, xh, xr, j0, seed_p, k0_p
            )
            state_m, lam_m = _advance_pair_comp(
                state_m, ell, m, s2, mn_m, xh, xr, j0, seed_m, k0_m
            )
            acc = step_maps(rows_p, rows_m, t, lam_p, lam_m, acc)
        return state_p, state_m, acc

    def bulk_body(blk, carry):
        ((dp_prev, dpl_prev, dp_curr, dpl_curr, k_p),
         (dm_prev, dml_prev, dm_curr, dml_curr, k_m), acc) = carry
        emit_p = _emit_of(k_p)
        emit_m = _emit_of(k_m)
        dps, dms = [], []
        for t in range(8):
            ell = (8 * blk + t).astype(jnp.float32)
            c0p, cmp_, c2p = _bulk_coeffs_pair(ell, m, s2, mn_p)
            c0m, cmm, c2m = _bulk_coeffs_pair(ell, m, s2, mn_m)
            # folded coefficient (see the plain kernel / analysis comp)
            tp = c0p * xh - cmp_
            tm = c0m * xh - cmm
            tp1 = tp * dp_curr
            tm1 = tm * dm_curr
            dp_new = tp1 - c2p * dp_prev
            dm_new = tm1 - c2m * dm_prev
            dpl_new = tp * dpl_curr + xr * tp1 - c2p * dpl_prev
            dml_new = tm * dml_curr + xr * tm1 - c2m * dml_prev
            dps.append(dp_new + dpl_new)
            dms.append(dm_new + dml_new)
            dp_prev, dpl_prev, dp_curr, dpl_curr = (
                dp_curr, dpl_curr, dp_new, dpl_new)
            dm_prev, dml_prev, dm_curr, dml_curr = (
                dm_curr, dml_curr, dm_new, dml_new)

        def _accumulate_scaled(acc):
            norm = _norm_col(blk)
            rows_p = ap_ref[0, :, pl.ds(8 * blk, 8), :] * norm
            rows_m = am_ref[0, :, pl.ds(8 * blk, 8), :] * norm
            for t in range(8):
                lam_p = dps[t] * emit_p
                lam_m = dms[t] * emit_m
                acc = step_maps(rows_p, rows_m, t, lam_p, lam_m, acc)
            return acc

        if skip == "none":
            acc = _accumulate_scaled(acc)
        else:  # "wavefront"/"full": value-carry cond (see _env_skip)
            kmax = jnp.maximum(jnp.max(k_p), jnp.max(k_m))
            acc = jax.lax.cond(
                kmax > -1.5, _accumulate_scaled, lambda a: a, acc
            )

        def resc(dp, dpl, dc, dcl, k):
            over = jnp.abs(dc) > _SCALE
            sc = jnp.where(over, _INV_SCALE, 1.0)
            return (dp * sc, dpl * sc, dc * sc, dcl * sc,
                    jnp.where(over, k + 1.0, k))

        return (
            resc(dp_prev, dpl_prev, dp_curr, dpl_curr, k_p),
            resc(dm_prev, dml_prev, dm_curr, dml_curr, k_m),
            acc,
        )

    nblocks = (lmax + 8) // 8
    m0 = seed_ref[7, 0, 0].astype(jnp.int32)
    diag_end = _diag_end(m0, m_chunk, nblocks)
    zeros = jnp.zeros((ring_block, m_chunk), jnp.float32)
    kinit = jnp.full((ring_block, m_chunk), -(2.0**30), jnp.float32)
    state0 = (zeros, zeros, zeros, zeros, kinit)
    acc0 = [(zeros,) * 8 for _ in range(nb)]
    carry = jax.lax.fori_loop(
        m0 // 8, diag_end, diag_body, (state0, state0, acc0)
    )
    _, _, acc = jax.lax.fori_loop(diag_end, nblocks, bulk_body, carry)
    for q in range(nb):
        GNpr, GNpi, Spr, Spi, GNmr, GNmi, Smr, Smi = acc[q]
        out_ref[0, 8 * q + 0] = GNpr
        out_ref[0, 8 * q + 1] = GNpi
        out_ref[0, 8 * q + 2] = Spr * msign
        out_ref[0, 8 * q + 3] = Spi * msign
        out_ref[0, 8 * q + 4] = GNmr
        out_ref[0, 8 * q + 5] = GNmi
        out_ref[0, 8 * q + 6] = Smr * msign
        out_ref[0, 8 * q + 7] = Smi * msign


def _synth_pair_kernel_dd(x_ref, logch_ref, logsh_ref, seed_ref, ap_ref,
                          am_ref, out_ref, *, lmax, spin, m_chunk,
                          ring_block, nb=1, contract="tree",
                          skip="wavefront"):
    """dd (double-single f32) variant of :func:`_synth_pair_kernel`.

    Same grid/blocking/output layout; both branch recurrences carry
    (hi, lo) f32 pairs while the G accumulation stays plain f32 (see
    :func:`_synth_kernel_dd`).  ``x_ref`` carries the (hi, lo) pair of
    cos(theta) in its second axis.
    """
    xh = x_ref[:, 0:1]
    xl = x_ref[:, 1:2]
    logch = (logch_ref[:, 0:1], logch_ref[:, 1:2])
    logsh = (logsh_ref[:, 0:1], logsh_ref[:, 1:2])
    m = seed_ref[7]
    j0 = seed_ref[6]
    msign = jnp.where(m - 2.0 * jnp.floor(m * 0.5) == 0.0, 1.0, -1.0)
    s2 = float(spin * spin)

    def seed_vals(lc_hi, lc_lo, sign, pc, ps):
        fh, fe, k0 = _comp_seed_frac_dd(
            lc_hi, lc_lo,
            [(pc, logch[0], logch[1]), (ps, logsh[0], logsh[1])],
        )
        sh_, sl_ = _seed_dd(fh, fe, sign)
        return sh_, sl_, k0

    pc_p = m + float(spin)
    ps_p = jnp.abs(m - float(spin))
    sp_h, sp_l, k0_p = seed_vals(seed_ref[0], seed_ref[1], seed_ref[2],
                                 pc_p, ps_p)
    sm_h, sm_l, k0_m = seed_vals(seed_ref[3], seed_ref[4], seed_ref[5],
                                 ps_p, pc_p)
    mn_p = m * float(spin)
    mn_m = m * float(-spin)

    fma = contract == "fma"

    def step_maps(rows_p, rows_m, t, lam_p, lam_m, acc):
        new = []
        if fma:
            lam_ps = lam_p if t % 2 == 0 else -lam_p  # see _synth_pair_kernel
            lam_ms = lam_m if t % 2 == 0 else -lam_m
        else:
            sgn = 1.0 if t % 2 == 0 else -1.0
        for q in range(nb):
            GNpr, GNpi, Spr, Spi, GNmr, GNmi, Smr, Smi = acc[q]
            apr = rows_p[2 * q, t, :][None, :]
            api = rows_p[2 * q + 1, t, :][None, :]
            amr = rows_m[2 * q, t, :][None, :]
            ami = rows_m[2 * q + 1, t, :][None, :]
            if fma:
                new.append((
                    GNpr + apr * lam_p, GNpi + api * lam_p,
                    Spr + apr * lam_ms, Spi + api * lam_ms,
                    GNmr + amr * lam_m, GNmi + ami * lam_m,
                    Smr + amr * lam_ps, Smi + ami * lam_ps,
                ))
            else:
                new.append((
                    GNpr + apr * lam_p, GNpi + api * lam_p,
                    Spr + sgn * apr * lam_m, Spi + sgn * api * lam_m,
                    GNmr + amr * lam_m, GNmi + ami * lam_m,
                    Smr + sgn * amr * lam_p, Smi + sgn * ami * lam_p,
                ))
        return new

    def diag_body(blk, carry):
        state_p, state_m, acc = carry
        rows_p = ap_ref[0, :, pl.ds(8 * blk, 8), :]
        rows_m = am_ref[0, :, pl.ds(8 * blk, 8), :]
        for t in range(8):
            ell = 8 * blk + t
            state_p, lam_p = _advance_pair_dd(
                state_p, ell, m, s2, mn_p, xh, xl, j0, sp_h, sp_l, k0_p
            )
            state_m, lam_m = _advance_pair_dd(
                state_m, ell, m, s2, mn_m, xh, xl, j0, sm_h, sm_l, k0_m
            )
            acc = step_maps(rows_p, rows_m, t, lam_p, lam_m, acc)
        return state_p, state_m, acc

    def bulk_body(blk, carry):
        ((dph, dpl, dch, dcl, k_p),
         (eph, epl, ech, ecl, k_m), acc) = carry
        emit_p = _emit_of(k_p)
        emit_m = _emit_of(k_m)
        dps, dms = [], []
        for t in range(8):
            ell = (8 * blk + t).astype(jnp.float32)
            (c0p, c0pl), (cmp_, cmpl), (c2p, c2pl) = _coeffs_pair_dd(
                ell, m, s2, mn_p
            )
            (c0m, c0ml), (cmm, cmml), (c2m, c2ml) = _coeffs_pair_dd(
                ell, m, s2, mn_m
            )

            def step(c0, c0l_, cm, cml_, c2, c2l_, ph, pll, ch_, cl_):
                xdh, xdl = _dd_mul(xh, xl, ch_, cl_)
                t0h, t0l = _dd_mul(c0, c0l_, xdh, xdl)
                tmh, tml = _dd_mul(cm, cml_, ch_, cl_)
                t2h, t2l = _dd_mul(c2, c2l_, ph, pll)
                sh_, sl_ = _dd_add(t0h, t0l, -tmh, -tml)
                return _dd_add(sh_, sl_, -t2h, -t2l)

            dnh, dnl = step(c0p, c0pl, cmp_, cmpl, c2p, c2pl,
                            dph, dpl, dch, dcl)
            enh, enl = step(c0m, c0ml, cmm, cmml, c2m, c2ml,
                            eph, epl, ech, ecl)
            dps.append(dnh + dnl)
            dms.append(enh + enl)
            dph, dpl, dch, dcl = dch, dcl, dnh, dnl
            eph, epl, ech, ecl = ech, ecl, enh, enl

        def _accumulate(acc):
            norm = _norm_col(blk)
            rows_p = ap_ref[0, :, pl.ds(8 * blk, 8), :] * norm
            rows_m = am_ref[0, :, pl.ds(8 * blk, 8), :] * norm
            for t in range(8):
                acc = step_maps(rows_p, rows_m, t, dps[t] * emit_p,
                                dms[t] * emit_m, acc)
            return acc

        if skip == "none":
            acc = _accumulate(acc)
        else:
            acc = jax.lax.cond(
                jnp.maximum(jnp.max(k_p), jnp.max(k_m)) > -1.5,
                _accumulate, lambda a: a, acc,
            )

        def resc(ph, pll, ch_, cl_, k):
            over = jnp.abs(ch_) > _SCALE
            sc = jnp.where(over, _INV_SCALE, 1.0)
            return (ph * sc, pll * sc, ch_ * sc, cl_ * sc,
                    jnp.where(over, k + 1.0, k))

        return (resc(dph, dpl, dch, dcl, k_p),
                resc(eph, epl, ech, ecl, k_m), acc)

    nblocks = (lmax + 8) // 8
    m0 = seed_ref[7, 0, 0].astype(jnp.int32)
    diag_end = _diag_end(m0, m_chunk, nblocks)
    zeros = jnp.zeros((ring_block, m_chunk), jnp.float32)
    kinit = jnp.full((ring_block, m_chunk), -(2.0**30), jnp.float32)
    state0 = (zeros, zeros, zeros, zeros, kinit)
    acc0 = [(zeros,) * 8 for _ in range(nb)]
    carry = jax.lax.fori_loop(
        m0 // 8, diag_end, diag_body, (state0, state0, acc0)
    )
    _, _, acc = jax.lax.fori_loop(diag_end, nblocks, bulk_body, carry)
    for q in range(nb):
        GNpr, GNpi, Spr, Spi, GNmr, GNmi, Smr, Smi = acc[q]
        out_ref[0, 8 * q + 0] = GNpr
        out_ref[0, 8 * q + 1] = GNpi
        out_ref[0, 8 * q + 2] = Spr * msign
        out_ref[0, 8 * q + 3] = Spi * msign
        out_ref[0, 8 * q + 4] = GNmr
        out_ref[0, 8 * q + 5] = GNmi
        out_ref[0, 8 * q + 6] = Smr * msign
        out_ref[0, 8 * q + 7] = Smi * msign


@functools.partial(
    jax.jit,
    static_argnames=("lmax", "spin", "m_chunk", "ring_block", "nb",
                     "interpret", "dd", "contract", "skip", "l_chunk"),
)
def synthesis_pair_folded(alm_p, alm_m, x, logch, logsh, lmax, spin, *,
                          logch_lo=None, logsh_lo=None, seed_planes=None,
                          m_chunk=128, ring_block=None, nb=None,
                          interpret=False, dd=False, x_lo=None,
                          contract=None, skip=None, l_chunk=None):
    """Folded spin-pair synthesis on the Pallas kernel.

    ``alm_p``/``alm_m``: rectangular (..., lmax+1, nm_pad) complex alms
    for the n = +spin and n = -spin engine columns (as passed to
    :func:`heracles_tpu.ops.sht._synthesis_rect` by the spin-2 path).
    Returns (GNp, GSp, GNm, GSm) complex64 of shape (..., nhalf, nm_pad):
    northern ring spectra and the (-1)^m-signed mirrored-southern
    spectra per branch, matching the jnp cross scan.
    """
    contract = contract or _env_contract()
    skip = skip or _env_skip()
    if l_chunk is None and not dd and _env_lc():
        l_chunk = _env_lc()
    if l_chunk is not None:
        _check_l_chunk(l_chunk)
    use_lc = l_chunk is not None and not dd
    B, batch, (alm_p, alm_m) = _flatten_batch((alm_p, alm_m))
    if nb is None:
        # two alm-block streams double-buffer per map — halve the
        # grouping relative to the spin-0 synthesis
        nb = _pick_nb(B, lmax, limit=4 if lmax <= 1600 else 2)
    nhalf = x.shape[0]
    nm_pad = alm_p.shape[-1]
    if ring_block is None:
        # two double-buffered (nb*2, lpad, m_chunk) alm blocks + the
        # (nb*8, ring_block, m_chunk) out tile + per-map carries; the alm
        # blocks alone exceed Mosaic's default 16MB scoped-VMEM budget at
        # production lmax, so the pallas_call below raises the limit.
        # The l-chunked kernel streams small alm blocks instead and
        # affords larger ring blocks.
        if use_lc:
            ring_block = min(nhalf, 512)
        else:
            ring_block = min(nhalf, 128 if lmax > 2048 else 256)
    nr_pad = -(-nhalf // ring_block) * ring_block
    pad = nr_pad - nhalf

    nblocks8 = ((lmax + 8) // 8) * 8
    if use_lc:
        lpad = -(-nblocks8 // l_chunk) * l_chunk
    else:
        lpad = -(-(lmax + 1) // 8) * 8 + 8

    def prep(a):
        planes = jnp.stack([a.real, a.imag], axis=1).astype(jnp.float32)
        planes = jnp.pad(
            planes, ((0, 0), (0, 0), (0, lpad - (lmax + 1)), (0, 0))
        )
        return planes.reshape(B // nb, nb * 2, lpad, nm_pad)

    seed = (pair_seed_planes(np.arange(nm_pad), spin)
            if seed_planes is None else seed_planes)

    pair_spec = pl.BlockSpec((ring_block, 2), lambda b, i, j: (j, 0),
                             memory_space=pltpu.VMEM)
    if dd == "comp":
        if x_lo is None:
            x_lo = jnp.zeros_like(x)
        xf = x.astype(jnp.float32)
        r = jnp.where(xf != 0.0, x_lo.astype(jnp.float32) / xf, 0.0)
        xp = jnp.stack(
            [jnp.pad(xf, (0, pad)), jnp.pad(r, (0, pad))], axis=-1
        )
        kernel = _synth_pair_kernel_comp
        vec_spec = pair_spec
        carry_words = 8 * nb + 10
    elif dd:
        if x_lo is None:
            x_lo = jnp.zeros_like(x)
        xp = jnp.stack(
            [
                jnp.pad(x.astype(jnp.float32), (0, pad)),
                jnp.pad(x_lo.astype(jnp.float32), (0, pad)),
            ],
            axis=-1,
        )
        kernel = _synth_pair_kernel_dd
        vec_spec = pair_spec
        carry_words = 8 * nb + 10
    else:
        xp = jnp.pad(x.astype(jnp.float32), (0, pad))[:, None]
        kernel = _synth_pair_kernel
        vec_spec = pl.BlockSpec((ring_block, 1), lambda b, i, j: (j, 0),
                                memory_space=pltpu.VMEM)
        carry_words = 8 * nb + 6
    logchp = _vec_pair(logch, logch_lo, pad)
    logshp = _vec_pair(logsh, logsh_lo, pad)

    n_mchunks = nm_pad // m_chunk
    n_rblocks = nr_pad // ring_block

    if use_lc:
        n_lchunks = lpad // l_chunk
        alm_spec = pl.BlockSpec((1, nb * 2, l_chunk, m_chunk),
                                lambda b, i, j, lc: (b, 0, lc, i),
                                memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((ring_block, m_chunk), jnp.float32)] * 6
        out = pl.pallas_call(
            functools.partial(
                _synth_pair_kernel_lc, lmax=lmax, spin=abs(int(spin)),
                m_chunk=m_chunk, ring_block=ring_block, l_chunk=l_chunk,
                n_lchunks=n_lchunks, nb=nb, contract=contract,
            ),
            grid=(B // nb, n_mchunks, n_rblocks, n_lchunks),
            in_specs=[
                pl.BlockSpec((ring_block, 1), lambda b, i, j, lc: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ring_block, 2), lambda b, i, j, lc: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ring_block, 2), lambda b, i, j, lc: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 1, m_chunk), lambda b, i, j, lc: (0, 0, i),
                             memory_space=pltpu.VMEM),
                alm_spec, alm_spec,
            ],
            out_specs=pl.BlockSpec(
                (1, nb * 8, ring_block, m_chunk),
                lambda b, i, j, lc: (b, 0, j, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (B // nb, nb * 8, nr_pad, nm_pad), jnp.float32
            ),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
                vmem_limit_bytes=_vmem_limit(
                    2 * 2 * nb * 2 * l_chunk * m_chunk,
                    2 * nb * 8 * ring_block * m_chunk,
                    (carry_words + 6) * ring_block * m_chunk,
                ),
            ),
            interpret=interpret,
        )(xp, logchp, logshp, jnp.asarray(seed), prep(alm_p), prep(alm_m))
    else:
        alm_spec = pl.BlockSpec((1, nb * 2, lpad, m_chunk),
                                lambda b, i, j: (b, 0, 0, i),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(
                kernel, lmax=lmax, spin=abs(int(spin)),
                m_chunk=m_chunk, ring_block=ring_block, nb=nb,
                contract=contract, skip=skip,
            ),
            grid=(B // nb, n_mchunks, n_rblocks),
            in_specs=[
                vec_spec, pair_spec, pair_spec,
                pl.BlockSpec((8, 1, m_chunk), lambda b, i, j: (0, 0, i),
                             memory_space=pltpu.VMEM),
                alm_spec, alm_spec,
            ],
            out_specs=pl.BlockSpec(
                (1, nb * 8, ring_block, m_chunk),
                lambda b, i, j: (b, 0, j, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (B // nb, nb * 8, nr_pad, nm_pad), jnp.float32
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=_SEMANTICS,
                vmem_limit_bytes=_vmem_limit(
                    2 * 2 * nb * 2 * lpad * m_chunk,
                    nb * 8 * ring_block * m_chunk,
                    carry_words * ring_block * m_chunk,
                ),
            ),
            interpret=interpret,
        )(xp, logchp, logshp, jnp.asarray(seed), prep(alm_p), prep(alm_m))

    out = out.reshape((B, 8, nr_pad, nm_pad))[:, :, :nhalf]
    shape = batch + (nhalf, nm_pad)

    def cplx(r, i):
        return (out[:, r] + 1j * out[:, i]).astype(jnp.complex64).reshape(shape)

    return cplx(0, 1), cplx(2, 3), cplx(4, 5), cplx(6, 7)


def _gammaln(x):
    """Host-f64 log-gamma: scipy when available, math.lgamma otherwise.

    scipy is only a [test] extra; the default TPU path must not require
    it (XLA's TPU f32 lgamma is too lossy, so this always runs on host).
    """
    try:
        from scipy.special import gammaln
    except ImportError:  # pragma: no cover - depends on install
        import math

        gammaln = np.vectorize(math.lgamma, otypes=[np.float64])
    return gammaln(x)


def _seed_consts(mm, n):
    """(j0, sign, logC) of the Wigner seed d^{j0}_{-m, -n} (host numpy)."""
    mp = -mm.astype(np.int64)
    npar = int(-n)
    a = np.abs(mp)
    b = abs(npar)
    j0 = np.maximum(a, b)
    c = np.where(a >= b, npar, mp)
    logC = 0.5 * (
        _gammaln(2 * j0 + 1) - _gammaln(j0 + c + 1) - _gammaln(j0 - c + 1)
    )
    k0 = np.where(
        a >= b,
        np.where(mp >= 0, mp - npar, 0),
        np.where(npar > 0, 0, mp + b),
    )
    sign = np.where(k0 % 2 == 0, 1.0, -1.0)
    return j0, sign, logC


def spin0_seed_planes(ms):
    """Host spin-0 seed planes (4, 1, len(ms)): [logc_hi, logc_lo, msign, m].

    ``ms``: the harmonic orders of the lanes (any contiguous block — the
    m-sharded path builds planes for all orders and shards them).  The
    coefficients 0.5*(lgamma(2m+1) - 2 lgamma(m+1)) are computed on the
    host in f64 (XLA's TPU f32 lgamma loses ~1e-3 absolute at arguments
    ~100) and split into an (hi, lo) f32 pair so the kernel's compensated
    seed evaluation keeps full f32 precision even where logC ~ m*ln4 is
    thousands.
    """
    mm = np.asarray(ms)
    logc64 = 0.5 * (_gammaln(2.0 * mm + 1.0) - 2.0 * _gammaln(mm + 1.0))
    hi = logc64.astype(np.float32)
    lo = (logc64 - hi.astype(np.float64)).astype(np.float32)
    msign = np.where(mm % 2 == 0, 1.0, -1.0).astype(np.float32)
    return np.stack([hi, lo, msign, mm.astype(np.float32)])[:, None, :]


def _logsum_pair(logch, logsh, logch_lo, logsh_lo, pad):
    """(nr_pad, 2) hi/lo pair of logch + logsh, pad rows at -1e4."""
    if logch_lo is None:
        logch_lo = jnp.zeros_like(logch)
    if logsh_lo is None:
        logsh_lo = jnp.zeros_like(logsh)
    s, e = _two_sum(logch.astype(jnp.float32), logsh.astype(jnp.float32))
    lo = e + logch_lo.astype(jnp.float32) + logsh_lo.astype(jnp.float32)
    s = jnp.pad(s, (0, pad), constant_values=-1e4)
    lo = jnp.pad(lo, (0, pad))
    return jnp.stack([s, lo], axis=-1)


def _pick_nb(B, lmax, limit=None):
    """Maps per program: largest divisor of B whose VMEM footprint fits.

    The recurrence amortizes across the nb maps of one program, so
    bigger is better until the per-program output tiles (nb * 2 * lpad *
    m_chunk f32) plus double-buffered F blocks blow the VMEM budget.
    """
    if limit is None:
        limit = 8 if lmax <= 1600 else (4 if lmax <= 3200 else 2)
    for nb in range(min(B, limit), 0, -1):
        if B % nb == 0:
            return nb
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("lmax", "m_chunk", "ring_block", "nb", "interpret",
                     "dd", "contract"),
)
def analysis_spin0_folded(Fe, Fo, x, logch, logsh, lmax, *, logch_lo=None,
                          logsh_lo=None, seed_planes=None, m_chunk=128,
                          ring_block=None, nb=None, interpret=False,
                          dd=False, x_lo=None, contract=None):
    """alm[l, m] = sum_r lam_{lm}(x_r) * F(e/o by l parity)[r, m].

    ``Fe``/``Fo``: (..., nhalf, nm_pad) complex64/128 parity-combined
    ring spectra (northern rings), with optional leading batch dims;
    ``x``/``logch``/``logsh``: (nhalf,) ring geometry, with optional
    ``logch_lo``/``logsh_lo`` f32 residuals of the f64 values (the
    compensated seed path; pass them for full accuracy at high m).
    Batched maps are grouped ``nb`` per program (auto): the Wigner
    recurrence runs once per tile for all nb maps.
    ``dd``: ``True`` runs the recurrence in double-single arithmetic
    (the high-accuracy mode, ~2-4x slower); ``"comp"`` runs the plain
    recurrence with the x-truncation correction stream
    (:func:`_kernel_comp`, ~1.5x, ~10x lower top-band error).  Both
    need the f32 residual of f64 cos(theta) in ``x_lo``.
    Returns (..., lmax+1, nm_pad) complex64.
    """
    contract = contract or _env_contract()
    B, batch, (Fe, Fo) = _flatten_batch((Fe, Fo))
    if nb is None:
        nb = _pick_nb(B, lmax)
    nhalf, nm_pad = Fe.shape[-2:]
    if ring_block is None:
        # keep the VMEM working set (double-buffered Fe/Fo blocks + the
        # revisited (nb*2, lmax+1, m_chunk) output block + carry) within
        # the VMEM budget
        if nb > 1:
            ring_block = min(nhalf, 256)
        else:
            # tuned at north-star size (tools/kernel_tune.json,
            # n4096_l3000): rb256 176 ms vs rb512 179 ms vs rb1024 182
            ring_block = min(nhalf, 256 if lmax > 2048 else 1024)
    # pad rings to a multiple of the block (zero rows contribute nothing:
    # their F is zero; lam of x=0 rows is finite)
    nr_pad = -(-nhalf // ring_block) * ring_block
    pad = nr_pad - nhalf

    def prep(F):
        planes = jnp.stack([F.real, F.imag], axis=1).astype(jnp.float32)
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return planes.reshape(B // nb, nb * 2, nr_pad, nm_pad)

    Fe2 = prep(Fe)
    Fo2 = prep(Fo)
    if seed_planes is None:
        seed_planes = spin0_seed_planes(np.arange(nm_pad))
    if dd == "comp":
        # (nr_pad, 2): x_hi and the truncation ratio r = x_lo/x_hi
        if x_lo is None:
            x_lo = jnp.zeros_like(x)
        xf = x.astype(jnp.float32)
        r = jnp.where(xf != 0.0, x_lo.astype(jnp.float32) / xf, 0.0)
        xp = jnp.stack(
            [jnp.pad(xf, (0, pad)), jnp.pad(r, (0, pad))], axis=-1
        )
        kernel = _kernel_comp
        x_spec = pl.BlockSpec((ring_block, 2), lambda b, i, j: (j, 0),
                              memory_space=pltpu.VMEM)
        carry_words = 6
    elif dd:
        # (nr_pad, 2) hi/lo pair of cos(theta)
        if x_lo is None:
            x_lo = jnp.zeros_like(x)
        xp = jnp.stack(
            [
                jnp.pad(x.astype(jnp.float32), (0, pad)),
                jnp.pad(x_lo.astype(jnp.float32), (0, pad)),
            ],
            axis=-1,
        )
        kernel = _kernel_dd
        x_spec = pl.BlockSpec((ring_block, 2), lambda b, i, j: (j, 0),
                              memory_space=pltpu.VMEM)
        carry_words = 10
    else:
        xp = jnp.pad(x.astype(jnp.float32), (0, pad))[:, None]
        kernel = _kernel
        x_spec = pl.BlockSpec((ring_block, 1), lambda b, i, j: (j, 0),
                              memory_space=pltpu.VMEM)
        carry_words = 4
    logsum = _logsum_pair(logch, logsh, logch_lo, logsh_lo, pad)

    lpad = -(-(lmax + 1) // 8) * 8
    n_mchunks = nm_pad // m_chunk
    n_rblocks = nr_pad // ring_block

    F_spec = pl.BlockSpec((1, nb * 2, ring_block, m_chunk),
                          lambda b, i, j: (b, 0, j, i),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            kernel, lmax=lmax, m_chunk=m_chunk, ring_block=ring_block,
            nb=nb, contract=contract,
        ),
        grid=(B // nb, n_mchunks, n_rblocks),
        in_specs=[
            x_spec,
            pl.BlockSpec((ring_block, 2), lambda b, i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, m_chunk), lambda b, i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            F_spec,
            F_spec,
        ],
        out_specs=pl.BlockSpec((1, nb * 2, lpad, m_chunk),
                               lambda b, i, j: (b, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B // nb, nb * 2, lpad, nm_pad), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_SEMANTICS,
            vmem_limit_bytes=_vmem_limit(
                nb * 2 * lpad * m_chunk,           # resident out tile
                2 * 2 * nb * 2 * ring_block * m_chunk,  # dbuf Fe/Fo
                carry_words * ring_block * m_chunk,  # recurrence carries
            ),
        ),
        interpret=interpret,
    )(xp, logsum, jnp.asarray(seed_planes), Fe2, Fo2)

    out = out.reshape((B, 2, lpad, nm_pad))[:, :, : lmax + 1]
    alm = (out[:, 0] + 1j * out[:, 1]).astype(jnp.complex64)
    return alm.reshape(batch + (lmax + 1, nm_pad))
