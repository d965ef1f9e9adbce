"""Double-single (two-float32) compensated contractions for the TPU.

The TPU has no float64.  A plain f32 quadrature of the MASTER mixing
matrices loses ~1e-4 relative accuracy at production degree: the
Gauss-Legendre sum over ~4500 nodes cancels by orders of magnitude for
far-off-diagonal (l1, l2), so both the f32 product rounding and the f32
running-sum rounding are amplified ~1000x (measured 6.5e-4 row-relative
matrix error at lmax=3000, tools/mixmat_accuracy.py).  The reference
computes these sums in f64 throughout (convolvecl, used at reference
twopoint.py:379-388).

This module reaches f64-quality results on the f32-only chip with
double-single arithmetic: every value is an unevaluated (hi, lo) f32
pair, products use Dekker two-products (exact error terms), and sums use
Knuth two-sums (compensated), so the only dropped terms are O(eps^2)
relative — far below the cancellation amplification.

:func:`gram_df32` computes the weighted Gram matrix

    M[a, b] = sum_k A[k, a] * B[k, b] * u[k]

with A, B, u given as (hi, lo) f32 pairs, as a Pallas kernel (VMEM
resident accumulator tiles, compensated halving-tree reduction over the
node axis) with a lax.scan reference implementation for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sht import _split_hi, _two_prod, _two_sum, _vmem_limit

__all__ = ["split_f64", "gram_df32", "gram_df32_ref", "gram_df32_sharded",
           "matmul_df32", "add_df32"]


def split_f64(a):
    """f64 array -> (hi, lo) f32 pair with hi + lo == a to f32^2 precision."""
    a = np.asarray(a, np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def _term_df32(ah, al, bh, bl, uh=None, ul=None):
    """(hi, lo) of a*b[*u] for df32 operands (dropping O(eps^2) parts)."""
    p, pe = _two_prod(ah, bh)
    plo = pe + ah * bl + al * bh
    if uh is None:
        return p, plo
    q, qe = _two_prod(p, uh)
    qlo = qe + p * ul + plo * uh
    return q, qlo


def _dd_add(h1, l1, h2, l2):
    """Renormalised double-single add: |lo| stays below ulp(hi).

    Without the final quick-two-sum renormalisation the lo stream grows
    with the running compensation terms and its plain-f32 rounding
    re-introduces an ~n^1.5 eps^2 error (measured 2e-10 on a 300-term
    synthetic sum; 1.6e-11 with renormalisation).
    """
    s, e = _two_sum(h1, h2)
    lo = l1 + l2 + e
    hi = s + lo
    return hi, lo - (hi - s)


def _rsum2(h, lo):
    """Compensated halving-tree sum over axis 0 -> (1, lanes) hi/lo.

    Every level renormalises (:func:`_dd_add`).  Cheaper trees were
    measured and rejected: skipping the renormalisation (8 ops vs 11)
    even on the first level only costs ~eps^2 of the *largest summand*,
    which the quadrature's cancellation amplifies to 5.8e-12 relative —
    above the 1e-12 df32 floor the mixing matrices are specified to
    (tests/test_df32.py); deeper sloppy levels compound to 2e-9..7e-8.
    """
    n = h.shape[0]
    while n > 1:
        n //= 2
        h, lo = _dd_add(h[:n], lo[:n], h[n:], lo[n:])
    return h, lo


def _gram_kernel(Ah_ref, Al_ref, Bh_ref, Bl_ref, u_ref, out_ref, *, a_tile,
                 unit_u=False):
    """Grid (L1/a_tile, L2/b_tile, K/k_chunk); K accumulates in VMEM.

    Block shapes: A (1, k_chunk, a_tile) — A rides in as a
    (L1/a_tile, K, a_tile) array so its block's trailing dim equals the
    array's (Mosaic requires trailing block dims divisible by (8, 128)
    or equal to the array's; a bare (k_chunk, a_tile=8) lane dim fails
    to lower at production L1) — B (k_chunk, b_tile), u (k_chunk, 2)
    [hi, lo columns], out (2, a_tile, b_tile) [hi, lo planes],
    revisited across the K grid axis.  ``unit_u`` skips the weight
    product (the df32 matmul case) — ~40% fewer VPU ops.

    The Dekker split of the (weighted) B block is hoisted out of the
    per-a loop: the split depends only on B, so recomputing it inside
    every ``_two_prod`` wasted ~8 of the ~17 product ops per element.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    Bh = Bh_ref[...]
    Bl = Bl_ref[...]
    if not unit_u:
        # hoist the B*u pair product out of the per-a loop (shared)
        Bh, Bl = _term_df32(Bh, Bl, u_ref[:, 0:1], u_ref[:, 1:2])
    B1, B2 = _split_hi(Bh)

    rows_h, rows_l = [], []
    for a in range(a_tile):
        ah = Ah_ref[0, :, a : a + 1]
        al = Al_ref[0, :, a : a + 1]
        a1, a2 = _split_hi(ah)
        # two-product with both splits precomputed (p + pe == ah*Bh)
        q = ah * Bh
        pe = ((a1 * B1 - q) + a1 * B2 + a2 * B1) + a2 * B2
        qlo = pe + ah * Bl + al * Bh
        rh, rl = _rsum2(q, qlo)
        rows_h.append(rh)
        rows_l.append(rl)
    Rh = jnp.concatenate(rows_h, axis=0)  # (a_tile, b_tile)
    Rl = jnp.concatenate(rows_l, axis=0)
    hi, lo = _dd_add(out_ref[0], out_ref[1], Rh, Rl)
    out_ref[0] = hi
    out_ref[1] = lo


@functools.partial(
    jax.jit,
    static_argnames=("a_tile", "b_tile", "k_chunk", "unit_u", "interpret"),
)
def _gram_call(Ah, Al, Bh, Bl, uh, ul, *, a_tile, b_tile, k_chunk,
               unit_u=False, interpret=False):
    K, L1 = Ah.shape
    L2 = Bh.shape[1]

    def pad2(z, rows, cols):
        return jnp.pad(z, ((0, rows - z.shape[0]), (0, cols - z.shape[1])))

    Kp = -(-K // k_chunk) * k_chunk
    L1p = -(-L1 // a_tile) * a_tile
    L2p = -(-L2 // b_tile) * b_tile
    Ah, Al = pad2(Ah, Kp, L1p), pad2(Al, Kp, L1p)
    Bh, Bl = pad2(Bh, Kp, L2p), pad2(Bl, Kp, L2p)
    # (K, L1) -> (L1/a_tile, K, a_tile): the A block's trailing dim then
    # equals the array's, which Mosaic lowers for any a_tile (see kernel)
    Ah, Al = (
        z.reshape(Kp, L1p // a_tile, a_tile).swapaxes(0, 1)
        for z in (Ah, Al)
    )
    u2 = jnp.stack(
        [jnp.pad(uh, (0, Kp - K)), jnp.pad(ul, (0, Kp - K))], axis=-1
    )

    out = pl.pallas_call(
        functools.partial(_gram_kernel, a_tile=a_tile, unit_u=unit_u),
        grid=(L1p // a_tile, L2p // b_tile, Kp // k_chunk),
        in_specs=[
            pl.BlockSpec((1, k_chunk, a_tile), lambda i, j, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_chunk, a_tile), lambda i, j, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_chunk, b_tile), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_chunk, b_tile), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_chunk, 2), lambda i, j, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, a_tile, b_tile), lambda i, j, k: (0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, L1p, L2p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_vmem_limit(
                2 * a_tile * b_tile,
                2 * 2 * k_chunk * (a_tile + b_tile),
                8 * k_chunk * b_tile,
            ),
        ),
        interpret=interpret,
    )(Ah, Al, Bh, Bl, u2)
    return out[0][:L1, :L2], out[1][:L1, :L2]


def _k_chunk_guard(K, k_chunk):
    """Keep the K grid at >= 2 chunks (halving; stays a power of two).

    A single-K-chunk grid combined with multiple output blocks loses the
    compensated lo stream to XLA's loop compilation of the grid
    (measured 3e-8 vs 5e-15 relative on CPU interpret; the production
    multi-chunk path is measured-accurate on TPU).  Two chunks restore
    the df32 floor at every K tested, and cost nothing at production
    node counts (K ~ 4500 is multi-chunk regardless).
    """
    while k_chunk > 8 and -(-K // k_chunk) < 2:
        k_chunk //= 2
    return k_chunk


def gram_df32(A, B, u, *, a_tile=64, b_tile=512, k_chunk=512,
              interpret=False, block=True):
    """M[a, b] = sum_k A[k, a] B[k, b] u[k] in double-single precision.

    ``A``/``B``/``u``: (hi, lo) f32 pairs (jax or numpy arrays; see
    :func:`split_f64`), shapes (K, L1)/(K, L2)/(K,).  Returns an (L1, L2)
    float64 numpy-convertible result hi + lo (the pair is exact to
    ~1e-14 relative of the *summands*, so cancellation does not amplify
    the error).

    ``block=False`` returns the device (hi, lo) pair with its
    device-to-host copies already started (``copy_to_host_async``);
    pass it to :func:`gram_result` to materialise.  Callers with many
    contractions dispatch them all first so transfers overlap compute.

    ``a_tile=64`` is the measured TPU optimum at production degree
    (l=3000, K=4501: 2.6 s/contraction vs 4.7-6.5 s at a_tile=8 —
    the per-block B*u product and grid overheads amortise over more
    output rows).
    """
    (Ah, Al), (Bh, Bl), (uh, ul) = A, B, u
    k_chunk = _k_chunk_guard(np.shape(Ah)[0], k_chunk)
    hi, lo = _gram_call(
        jnp.asarray(Ah), jnp.asarray(Al), jnp.asarray(Bh), jnp.asarray(Bl),
        jnp.asarray(uh), jnp.asarray(ul),
        a_tile=a_tile, b_tile=b_tile, k_chunk=k_chunk, interpret=interpret,
    )
    if not block:
        for z in (hi, lo):
            try:
                z.copy_to_host_async()
            except Exception:  # pragma: no cover - transport-specific
                pass
        return hi, lo
    return gram_result((hi, lo))


def gram_df32_sharded(mesh, A, B, u, *, a_tile=64, b_tile=512, k_chunk=512,
                      interpret=False, block=True):
    """:func:`gram_df32` with the node axis sharded over a device mesh.

    The GL node axis K is embarrassingly parallel: every device runs the
    compensated Gram kernel on its contiguous K block, and the per-device
    (hi, lo) partials are combined with an all-gather + renormalised
    double-single reduction — NOT a plain ``psum``, whose single f32 sum
    would re-introduce exactly the cancellation amplification the df32
    kernel exists to remove (partial quadrature sums over node blocks can
    exceed the cancelled total by orders of magnitude).

    All of ``mesh``'s axes are flattened into the K sharding; the result
    is replicated on every device.  ``block=False`` returns the (hi, lo)
    device pair (for :func:`gram_result`), mirroring :func:`gram_df32`.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(mesh.axis_names)
    ndev = int(np.prod([mesh.shape[a] for a in axes]))
    (Ah, Al), (Bh, Bl), (uh, ul) = (
        tuple(jnp.asarray(z, jnp.float32) for z in p) for p in (A, B, u)
    )
    K = Ah.shape[0]
    # pad K so each device gets an equal block; padded weights are zero,
    # so the padded rows contribute exactly nothing
    Kp = -(-K // ndev) * ndev

    def padk(z):
        return jnp.pad(z, ((0, Kp - K),) + ((0, 0),) * (z.ndim - 1))

    Ah, Al, Bh, Bl, uh, ul = map(padk, (Ah, Al, Bh, Bl, uh, ul))
    shard2 = NamedSharding(mesh, P(axes, None))
    shard1 = NamedSharding(mesh, P(axes))
    Ah, Al = jax.device_put(Ah, shard2), jax.device_put(Al, shard2)
    Bh, Bl = jax.device_put(Bh, shard2), jax.device_put(Bl, shard2)
    uh, ul = jax.device_put(uh, shard1), jax.device_put(ul, shard1)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axes, None), P(axes, None), P(axes, None),
                  P(axes, None), P(axes), P(axes)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def local(ah, al, bh, bl, vh, vl):
        hi, lo = _gram_call(
            ah, al, bh, bl, vh, vl,
            a_tile=a_tile, b_tile=b_tile,
            k_chunk=_k_chunk_guard(Kp // ndev, k_chunk),
            interpret=interpret,
        )
        part = jnp.stack([hi, lo])  # (2, L1, L2)
        parts = jax.lax.all_gather(part, axes, tiled=False)
        parts = parts.reshape((ndev, 2) + part.shape[1:])
        hi, lo = parts[0, 0], parts[0, 1]
        for d in range(1, ndev):
            hi, lo = _dd_add(hi, lo, parts[d, 0], parts[d, 1])
        return hi, lo

    hi, lo = local(Ah, Al, Bh, Bl, uh, ul)
    if not block:
        for z in (hi, lo):
            try:
                z.copy_to_host_async()
            except Exception:  # pragma: no cover - transport-specific
                pass
        return hi, lo
    return gram_result((hi, lo))


def gram_result(pair):
    """Materialise a ``gram_df32(..., block=False)`` handle as host f64."""
    hi, lo = pair
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


def matmul_df32(P, Q, *, a_tile=64, b_tile=512, k_chunk=512,
                interpret=False):
    """C = P @ Q in double-single precision; pairs in, pair out (on device).

    ``P``: (hi, lo) pair of (n, k) jax arrays, ``Q``: pair of (k, m).
    Returns the (hi, lo) f32 pair of the (n, m) product — stays on the
    device for chained use (e.g. the Newton-Schulz mixing-matrix
    inversion refinement).
    """
    Ph, Pl = (jnp.swapaxes(z, -1, -2) for z in P)
    Qh, Ql = Q
    k = Ph.shape[0]
    z = jnp.zeros((k,), jnp.float32)
    return _gram_call(
        Ph, Pl, Qh, Ql, z, z,
        a_tile=a_tile, b_tile=b_tile, k_chunk=_k_chunk_guard(k, k_chunk),
        unit_u=True, interpret=interpret,
    )


def add_df32(X, Y):
    """Elementwise renormalised df32 add of two (hi, lo) pairs."""
    return _dd_add(X[0], X[1], Y[0], Y[1])


def gram_df32_ref(A, B, u):
    """lax.scan reference of :func:`gram_df32` (same math, no Pallas)."""
    (Ah, Al), (Bh, Bl), (uh, ul) = (
        tuple(jnp.asarray(z) for z in p) for p in (A, B, u)
    )

    def step(carry, args):
        S, Sl = carry
        ah, al, bh, bl, vh, vl = args
        q, qlo = _term_df32(
            ah[:, None], al[:, None], bh[None, :], bl[None, :], vh, vl
        )
        return _dd_add(S, Sl, q, qlo), None

    L1, L2 = Ah.shape[1], Bh.shape[1]
    S0 = jnp.zeros((L1, L2), jnp.float32)
    (S, Sl), _ = jax.lax.scan(step, (S0, S0), (Ah, Al, Bh, Bl, uh, ul))
    return np.asarray(S, np.float64) + np.asarray(Sl, np.float64)
