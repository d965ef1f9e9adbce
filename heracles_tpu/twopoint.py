"""Angular power spectra and mask-coupling (mixing) matrices.

Capability parity with ``/root/reference/heracles/twopoint.py``:

* :func:`alm2cl` — (cross-)spectra of packed alms with broadcasting over
  leading axes and lmax truncation (reference twopoint.py:63-101); here a
  single masked contraction over the rectangular (l, m) layout instead of
  the reference's per-m Python loop;
* :func:`angular_power_spectra` — all auto/cross spectra over field x bin
  combinations with pair dedup/canonical ordering, metadata merge with
  ``_1``/``_2`` suffixes, noise bias from the mapped-field ingredients
  ``bias = (1/2 if spin2 x spin2) * fsky * musq / dens``, optional debias
  and binning (twopoint.py:173-299);
* :func:`debias_cls` / ``_debias_cl`` — additive bias removal for
  l >= max(|s1|, |s2|), EE/BB only for spin2 x spin2, divided by the
  pixel window when the maps were deconvolved (twopoint.py:104-170);
* :func:`mixing_matrices` / :func:`invert_mixing_matrix` /
  :func:`apply_mixing_matrix` — MASTER coupling matrices from mask
  spectra (twopoint.py:316-524).

TPU-native mixing matrices: instead of per-(l1,l2) Wigner-3j recurrences
(the reference's compiled ``convolvecl`` kernels), the 3j sums are
evaluated in real space,

    M[l1, l2] = (2 l2 + 1)/2 * Integral xi(x) d^{l1}_{-s1,-s2}(x)
                                          d^{l2}_{s1,s2}(x) dx,

where xi is the mask correlation function; the integral is exact on
Gauss-Legendre nodes of degree (l1max+l2max+l3max)/2+1.  This turns the
whole computation into two Wigner-d scans plus one large matmul on the
MXU.  The parity-filtered EE/BB blocks come from the same integral with
xi(-x) (node reversal).
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import replace
from datetime import timedelta
from functools import lru_cache, partial
from itertools import combinations_with_replacement, product

import jax
import jax.numpy as jnp
import numpy as np

from .core import TocDict, toc_match, update_metadata
from .ops import sht
from .ops.wigner import (
    legendre_sum_host,
    wigner_table,
    wigner_table_host,
)
from .progress import NoProgress
from .result import Result, binned, get_result_array

__all__ = [
    "alm2cl",
    "alm2lmax",
    "angular_power_spectra",
    "angular_power_spectra_samples",
    "angular_power_spectra_sample_stacks",
    "debias_cls",
    "mixing_matrices",
    "invert_mixing_matrix",
    "apply_mixing_matrix",
    "mixmat",
    "mixmat_eb",
]

logger = logging.getLogger(__name__)


def alm2lmax(alm, mmax=None):
    """lmax of a packed alm array (assumes mmax == lmax)."""
    return (int((8 * np.shape(alm)[-1] + 1) ** 0.5 + 0.01) - 3) // 2


@partial(jax.jit, static_argnames=("lmax1", "lmax2", "lout"))
def _alm2cl_rect(re1, im1, re2, im2, lmax1, lmax2, lout):
    """cl[..., l] = 1/(2l+1) sum_m (2 - delta_m0) Re(alm1 conj(alm2)).

    Takes real/imag planes (complex arrays cannot cross jit boundaries on
    some TPU transports).
    """
    alm1 = re1 + 1j * im1
    alm2 = re2 + 1j * im2
    a1 = sht.unpack_alm(alm1, lmax1)[..., : lout + 1, : lout + 1]
    a2 = sht.unpack_alm(alm2, lmax2)[..., : lout + 1, : lout + 1]
    prod = a1.real * a2.real + a1.imag * a2.imag
    m = jnp.arange(lout + 1)
    eps = jnp.where(m == 0, 1.0, 2.0)
    ells = jnp.arange(lout + 1, dtype=prod.dtype)
    return (prod * eps).sum(axis=-1) / (2 * ells + 1)


def alm2cl(alm, alm2=None, *, lmax=None):
    """Angular (cross-)power spectrum of packed alms.

    Broadcasts over leading axes as an outer product: alm (A..., nlm) and
    alm2 (B..., nlm) give cl of shape (A..., B..., lout+1) with
    lout = min(lmax, lmax(alm), lmax(alm2)).
    """
    if alm2 is None:
        alm2 = alm
    alm = np.asanyarray(alm)
    alm2 = np.asanyarray(alm2)
    lmax1, lmax2 = alm2lmax(alm), alm2lmax(alm2)
    lout = min(lmax1, lmax2) if lmax is None else min(lmax, lmax1, lmax2)
    if alm2.ndim > 1:
        alm = alm.reshape(
            *alm.shape[:-1], *((1,) * (alm2.ndim - 1)), alm.shape[-1]
        )
    # np.array: a writable host copy (jax buffers are read-only views)
    return np.array(
        _alm2cl_rect(
            np.ascontiguousarray(alm.real), np.ascontiguousarray(alm.imag),
            np.ascontiguousarray(alm2.real), np.ascontiguousarray(alm2.imag),
            lmax1, lmax2, lout,
        )
    )


def rect_pair_grid(a1, a2, ms):
    """All-pairs spectra of rectangular alm plane stacks (jit-traceable).

    ``a1``: (nA, nl, nm) complex, ``a2``: (nB, nl, nm) complex, ``ms``:
    (nm,) harmonic orders of the m axis (may be a traced array — the
    m-sharded pipeline passes each device's order block).  Returns the
    *partial* grid (nA, nB, nl): the (2 - delta_m0)-weighted sum over the
    given orders divided by (2l+1); summing partial grids over an m
    decomposition (e.g. a psum over the mesh's "m" axis) yields the full
    spectra.
    """
    eps = jnp.where(ms == 0, 1.0, 2.0).astype(jnp.real(a1).dtype)
    # HIGHEST: default f32 einsums round inputs to bf16 on the MXU
    # (measured 4e-3 relative on the GL mixmat integral before pinning)
    hi = jax.lax.Precision.HIGHEST
    grid = jnp.einsum("alm,blm->abl", a1.real * eps, a2.real, precision=hi)
    grid += jnp.einsum("alm,blm->abl", a1.imag * eps, a2.imag, precision=hi)
    ells = jnp.arange(a1.shape[-2], dtype=grid.dtype)
    return grid / (2 * ells + 1)


@partial(jax.jit, static_argnames=("lmax1", "lmax2", "lout"))
def _alm2cl_grid(re1, im1, re2, im2, lmax1, lmax2, lout):
    """All-pairs spectra grid: (nA, nlm1) x (nB, nlm2) -> (nA, nB, lout+1).

    One device dispatch for the whole pair grid: both plane stacks are
    unpacked to the rectangular (l, m) layout and contracted over m with
    the (2 - delta_m0) weight as a single batched-over-l matmul, which
    keeps the computation on the MXU instead of a per-pair Python loop
    (the reference loops pairs at twopoint.py:199-239).
    """
    a1 = sht.unpack_alm(re1 + 1j * im1, lmax1)[..., : lout + 1, : lout + 1]
    a2 = sht.unpack_alm(re2 + 1j * im2, lmax2)[..., : lout + 1, : lout + 1]
    return rect_pair_grid(a1, a2, jnp.arange(lout + 1))


def _nlm2lmax(nlm):
    """lmax of a packed alm length (assumes mmax == lmax)."""
    return (int((8 * nlm + 1) ** 0.5 + 0.01) - 3) // 2


def _to_device_complex(a):
    """Host complex -> device complex via real/imag planes (the tunnel
    cannot transfer complex arrays directly)."""
    if isinstance(a, jax.Array):
        return a
    a = np.asanyarray(a)
    if not np.iscomplexobj(a):
        return jnp.asarray(a)
    re = jnp.asarray(np.ascontiguousarray(a.real))
    im = jnp.asarray(np.ascontiguousarray(a.imag))
    return jax.lax.complex(re, im)


def _grid_budget():
    """Per-dispatch device budget (bytes) for unpacked rectangular alms."""
    return int(os.environ.get("HERACLES_TPU_GRID_BUDGET", 2 * 2**30))


def _stack_resident(stack):
    """Move a host plane stack to the device once (accelerator only).

    The grid contraction slices chunks from the resident stack instead
    of re-uploading per chunk pair — at njk=50/nside=1024 the re-uploads
    were ~10x the stack size and dominated the whole spectra stage.  On
    CPU the host array is used as is (keeps f64 test numerics).
    """
    if isinstance(stack, jax.Array):
        return stack
    if jax.default_backend() != "tpu":
        return stack
    if stack.nbytes > _grid_budget():
        return stack  # too big to keep resident; chunk uploads instead
    return _to_device_complex(stack)


def _stack_planes(arrays):
    """Group packed alm arrays by nlm and stack their component planes.

    Returns ``(stacks, slot)`` where ``stacks[nlm]`` is the (nplanes, nlm)
    float-complex stack of every distinct input array with that packed
    length, and ``slot[id(arr)]`` locates an array inside its stack as
    ``(nlm, first_row, leading_shape)``.

    Device-resident alms (``DeviceMap`` wrappers from
    ``HealpixMapper(device_maps=True)``) stay on the device: their group
    stacks with ``jnp`` and any host members of the same group are
    uploaded, so the grid contraction reads every plane from HBM.
    """
    from .devicemap import DeviceMap

    rows = {}
    slot = {}
    device_groups = set()
    for arr in arrays:
        if id(arr) in slot:
            continue
        if isinstance(arr, DeviceMap):
            a = arr.array
        else:
            a = np.asanyarray(arr)
        nlm = a.shape[-1]
        group = rows.setdefault(nlm, [])
        slot[id(arr)] = (nlm, sum(p.shape[0] for p in group), a.shape[:-1])
        group.append(a.reshape(-1, nlm))
        if isinstance(a, jax.Array):
            device_groups.add(nlm)
    stacks = {}
    for nlm, group in rows.items():
        if nlm in device_groups:
            stacks[nlm] = jnp.concatenate(
                [_to_device_complex(p) for p in group], axis=0
            )
        else:
            stacks[nlm] = np.ascontiguousarray(
                np.concatenate(group, axis=0)
            )
    return stacks, slot


def _cross_grids(plan, lmax, mesh=None):
    """Compute every needed (nlm1 x nlm2) spectra grid in O(1) dispatches.

    ``plan`` is a list of (key, alm1, alm2) work items; the return value
    is ``(grids, slot)`` with ``grids[nlm1, nlm2]`` the host (nA, nB,
    lout+1) array and ``slot`` the plane locator from
    :func:`_stack_planes`.

    With ``mesh``, the first plane stack of each grid is sharded over
    every mesh device and the second replicated, so XLA partitions the
    whole pair-grid contraction across the mesh (pure data parallelism,
    no collectives beyond the output gather).
    """
    stacks, slot = _stack_planes(
        [a for _, alm1, alm2 in plan for a in (alm1, alm2)]
    )
    wanted = {
        (np.shape(alm1)[-1], np.shape(alm2)[-1]) for _, alm1, alm2 in plan
    }
    grids = {}
    for n1, n2 in wanted:
        if (n2, n1) in grids:
            grids[n1, n2] = grids[n2, n1].transpose(1, 0, 2)
            continue
        if mesh is None:
            stacks[n1] = _stack_resident(stacks[n1])
            stacks[n2] = _stack_resident(stacks[n2])
        s1, s2 = stacks[n1], stacks[n2]
        l1, l2 = _nlm2lmax(n1), _nlm2lmax(n2)
        lout = min(l1, l2) if lmax is None else min(lmax, l1, l2)
        # chunk the plane stacks so the rectangular unpacked layouts stay
        # within a fixed device budget per dispatch (~72 MB per plane at
        # lmax=3000; a 50-bin tomographic stack would otherwise unpack
        # several GB at once)
        rect_bytes = 8 * (max(l1, l2) + 1) ** 2
        budget = _grid_budget()
        if mesh is not None:
            budget *= mesh.devices.size  # per-device budget, sharded rows
        per = max(1, budget // rect_bytes)
        grid = None
        for i0 in range(0, s1.shape[0], per):
            b1 = s1[i0 : i0 + per]
            for j0 in range(0, s2.shape[0], per):
                b2 = s2[j0 : j0 + per]
                # real/imag planes: complex arrays cannot cross the jit
                # boundary on some TPU transports (device-resident
                # stacks split on the device, no transfer involved)
                if isinstance(b1, jax.Array):
                    args = (b1.real, b1.imag, b2.real, b2.imag)
                else:
                    args = (
                        np.ascontiguousarray(b1.real),
                        np.ascontiguousarray(b1.imag),
                        np.ascontiguousarray(b2.real),
                        np.ascontiguousarray(b2.imag),
                    )
                if mesh is not None:
                    args, nrows = _shard_grid_args(mesh, args)
                block = np.asarray(
                    _alm2cl_grid(*args, l1, l2, lout)
                )
                if mesh is not None:
                    block = block[:nrows]
                if grid is None:
                    grid = np.empty(
                        (s1.shape[0], s2.shape[0], lout + 1), block.dtype
                    )
                grid[i0 : i0 + per, j0 : j0 + per] = block
        grids[n1, n2] = grid
    return grids, slot


@partial(jax.jit, static_argnames=("lmax1", "lmax2", "lout"))
def _alm2cl_grid_batched(re1, im1, re2, im2, lmax1, lmax2, lout):
    """Per-sample pair grids: (S, nA, nlm1) x (S, nB, nlm2) -> (S, nA, nB, l).

    The sample axis is batched (NOT an outer product): sample s's planes
    only pair with sample s's planes — the device pass for a whole
    batch of jackknife samples costs S x one sample, not S^2.
    """
    a1 = sht.unpack_alm(re1 + 1j * im1, lmax1)[..., : lout + 1, : lout + 1]
    a2 = sht.unpack_alm(re2 + 1j * im2, lmax2)[..., : lout + 1, : lout + 1]
    ms = jnp.arange(lout + 1)
    eps = jnp.where(ms == 0, 1.0, 2.0).astype(jnp.real(a1).dtype)
    hi = jax.lax.Precision.HIGHEST
    grid = jnp.einsum("salm,sblm->sabl", a1.real * eps, a2.real, precision=hi)
    grid += jnp.einsum("salm,sblm->sabl", a1.imag * eps, a2.imag, precision=hi)
    ells = jnp.arange(a1.shape[-2], dtype=grid.dtype)
    return grid / (2 * ells + 1)


def _cross_grids_samples(plan, nsamples, lmax, mesh=None):
    """Sample-batched version of :func:`_cross_grids`.

    ``plan`` items are (key, alm1, alm2) where each alm is an
    (S, ..., nlm) stack over samples; grids come back as
    (S, nA, nB, lout+1) host arrays, all samples in one device dispatch
    per (nlm1, nlm2) group (SURVEY section 3.4's sample-stacking win).
    """
    rows = {}
    slot = {}
    for arr in (a for _, a1, a2 in plan for a in (a1, a2)):
        if id(arr) in slot:
            continue
        # device stacks stay device-resident: concatenation and chunk
        # slicing below run as jnp ops, and the alms never cross the
        # host boundary (the grids that come back are small and real)
        a = arr if isinstance(arr, jax.Array) else np.asanyarray(arr)
        nlm = a.shape[-1]
        group = rows.setdefault(nlm, [])
        slot[id(arr)] = (nlm, sum(p.shape[1] for p in group), a.shape[1:-1])
        group.append(a.reshape(nsamples, -1, nlm))

    def cat(group):
        if any(isinstance(p, jax.Array) for p in group):
            return jnp.concatenate([jnp.asarray(p) for p in group], axis=1)
        return np.ascontiguousarray(np.concatenate(group, axis=1))

    stacks = {nlm: cat(group) for nlm, group in rows.items()}
    wanted = {(a1.shape[-1], a2.shape[-1]) for _, a1, a2 in plan}
    grids = {}
    for n1, n2 in wanted:
        if (n2, n1) in grids:
            grids[n1, n2] = grids[n2, n1].transpose(0, 2, 1, 3)
            continue
        if mesh is None:
            stacks[n1] = _stack_resident(stacks[n1])
            stacks[n2] = _stack_resident(stacks[n2])
        s1, s2 = stacks[n1], stacks[n2]
        l1, l2 = _nlm2lmax(n1), _nlm2lmax(n2)
        lout = min(l1, l2) if lmax is None else min(lmax, l1, l2)
        rect_bytes = 8 * (max(l1, l2) + 1) ** 2 * nsamples
        budget = _grid_budget()
        if mesh is not None:
            budget *= mesh.devices.size
        per = max(1, budget // rect_bytes)
        grid = None
        for i0 in range(0, s1.shape[1], per):
            b1 = s1[:, i0 : i0 + per]
            for j0 in range(0, s2.shape[1], per):
                b2 = s2[:, j0 : j0 + per]
                if isinstance(b1, jax.Array):
                    args = (b1.real, b1.imag, b2.real, b2.imag)
                else:
                    args = (
                        np.ascontiguousarray(b1.real),
                        np.ascontiguousarray(b1.imag),
                        np.ascontiguousarray(b2.real),
                        np.ascontiguousarray(b2.imag),
                    )
                if mesh is not None:
                    args, ns = _shard_sample_args(mesh, args)
                block = np.asarray(_alm2cl_grid_batched(*args, l1, l2, lout))
                if mesh is not None:
                    block = block[:ns]
                if grid is None:
                    grid = np.empty(
                        (nsamples, s1.shape[1], s2.shape[1], lout + 1),
                        block.dtype,
                    )
                grid[:, i0 : i0 + per, j0 : j0 + per] = block
        grids[n1, n2] = grid
    return grids, slot


def _shard_sample_args(mesh, args):
    """Shard every stack's leading sample axis over all mesh devices.

    Samples are zero-padded to the device count (padded grids are
    discarded by the caller); each device computes its samples' grids
    independently — pure data parallelism.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    n_dev = mesh.devices.size
    flat = jax.sharding.Mesh(mesh.devices.reshape(-1), ("s",))
    S = args[0].shape[0]
    pad = (-S) % n_dev
    out = []
    for a in args:
        if pad:
            xp = jnp if isinstance(a, jax.Array) else np
            a = xp.concatenate([a, xp.zeros((pad,) + a.shape[1:], a.dtype)])
        sh = NamedSharding(flat, PartitionSpec(*(("s",) + (None,) * (a.ndim - 1))))
        out.append(jax.device_put(a, sh))
    return tuple(out), S


def _shard_grid_args(mesh, args):
    """Row-shard (re1, im1) over every mesh device; replicate (re2, im2).

    Rows are zero-padded to the device count; jit partitions the grid
    contraction over the sharded rows (GSPMD), and the caller trims the
    padded output rows.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    n_dev = mesh.devices.size
    flat = jax.sharding.Mesh(mesh.devices.reshape(-1), ("rows",))
    re1, im1, re2, im2 = args
    nrows = re1.shape[0]
    pad = (-nrows) % n_dev
    if pad:
        z = np.zeros((pad,) + re1.shape[1:], re1.dtype)
        re1 = np.concatenate([re1, z])
        im1 = np.concatenate([im1, z])
    row_sh = NamedSharding(flat, PartitionSpec("rows", None))
    rep_sh = NamedSharding(flat, PartitionSpec(None, None))
    return (
        jax.device_put(re1, row_sh),
        jax.device_put(im1, row_sh),
        jax.device_put(re2, rep_sh),
        jax.device_put(im2, rep_sh),
    ), nrows


def _grid_block(grids, slot, alm1, alm2):
    """Extract one pair's cl block from the precomputed grids.

    The block gets the outer-product leading shape of the two inputs,
    matching :func:`alm2cl` broadcasting semantics.
    """
    n1, row, shape1 = slot[id(alm1)]
    n2, col, shape2 = slot[id(alm2)]
    g = grids[n1, n2]
    nc1 = int(np.prod(shape1, dtype=int))
    nc2 = int(np.prod(shape2, dtype=int))
    block = g[row : row + nc1, col : col + nc2]
    return np.array(block.reshape(shape1 + shape2 + (g.shape[-1],)))


def _debias_cl(cl, bias=None, md=None, *, inplace=False):
    """Subtract the additive noise bias (pixel-window aware)."""
    if md is None:
        md = cl.dtype.metadata or {}
    if not inplace:
        cl = cl.copy()
        update_metadata(cl, **md)
    if bias is None:
        bias = md.get("bias")
        if bias is None:
            return cl

    spin1, spin2 = md.get("spin_1", 0), md.get("spin_2", 0)
    lmin = max(abs(spin1), abs(spin2))
    lmax = cl.shape[-1] - 1

    bl = np.zeros(cl.shape)
    if spin1 != 0 and spin2 != 0:
        # spin x spin: bias only in the EE and BB blocks
        assert cl.shape[:2] == (2, 2)
        bl[[0, 1], [0, 1], ..., lmin:] = bias
    else:
        bl[..., lmin:] = bias

    # if the maps were pixel-window deconvolved, the shot noise in the
    # spectrum was amplified by 1/pixwin^2... the reference divides the
    # flat bias by the (healpix) window once per deconvolved side
    for i, s in ((1, spin1), (2, spin2)):
        if md.get(f"kernel_{i}") == "healpix":
            nside = md.get(f"nside_{i}")
            deconv = md.get(f"deconv_{i}", True)
            if nside is not None and deconv:
                if s == 0:
                    pw = sht.pixel_window(nside, lmax)
                elif s == 2:
                    # polarization window for spin-2 sides, matching the
                    # reference (twopoint.py:148-168)
                    pw = sht.pixel_window(nside, lmax, pol=True)[1]
                else:
                    pw = None
                if pw is not None:
                    bl[..., lmin:] /= pw[lmin:]

    cl[:] -= bl
    return cl


def angular_power_spectra(
    alms,
    alms2=None,
    *,
    lmax=None,
    debias=True,
    bins=None,
    weights=None,
    include=None,
    exclude=None,
    out=None,
    mesh=None,
):
    """All auto/cross angular power spectra of a set of alms.

    Keys of ``alms`` are (field, bin); results are keyed
    (field1, field2, bin1, bin2) with symmetric-pair dedup and canonical
    field ordering (reference twopoint.py:199-239).

    ``mesh``: optional ``jax.sharding.Mesh``; the batched pair-grid
    contraction then shards its plane stacks across every mesh device
    (results identical to the single-device path).
    """
    logger.info(
        "computing cls for %d%s alm(s)",
        len(alms),
        f"x{len(alms2)}" if alms2 is not None else "",
    )
    t = time.monotonic()

    if alms2 is None:
        pairs = combinations_with_replacement(alms, 2)
        alms2 = alms
    else:
        pairs = product(alms, alms2)

    twopoint_names = set()
    cls = TocDict() if out is None else out

    # pass 1 (host): decide which pairs to compute, in canonical order
    plan = []
    for (k1, i1), (k2, i2) in pairs:
        if (k1, k2, i1, i2) in cls or (k2, k1, i2, i1) in cls:
            continue
        if (k1, k2) not in twopoint_names and (k2, k1) in twopoint_names:
            k1, k2, i1, i2 = k2, k1, i2, i1
            alm1, alm2 = alms2[k1, i1], alms[k2, i2]
        else:
            alm1, alm2 = alms[k1, i1], alms2[k2, i2]
        if not toc_match((k1, k2, i1, i2), include, exclude):
            continue
        plan.append(((k1, k2, i1, i2), alm1, alm2))
        twopoint_names.add((k1, k2))

    # pass 2 (device): the whole pair grid in O(1) batched dispatches
    grids, slot = _cross_grids(plan, lmax, mesh)

    # pass 3 (host): metadata, noise bias, Result assembly
    for (k1, k2, i1, i2), alm1, alm2 in plan:
        cl = _grid_block(grids, slot, alm1, alm2)

        md1 = alm1.dtype.metadata or {}
        md2 = alm2.dtype.metadata or {}
        s1, s2 = md1.get("spin"), md2.get("spin")
        if s1 is None or s2 is None:
            raise ValueError(f"missing spin metadata for {k1} or {k2}")
        md = {f"{key}_1": value for key, value in md1.items()}
        md.update({f"{key}_2": value for key, value in md2.items()})
        bias = None
        if k1 == k2 and i1 == i2:
            fsky = md1.get("fsky")
            musq = md1.get("musq")
            dens = md1.get("dens")
            if fsky is not None and musq is not None and dens is not None:
                factor = 0.5 if s1 == s2 == 2 else 1.0
                bias = factor * fsky * musq / dens
        if bias is not None:
            md["bias"] = bias
        if debias and bias is not None:
            _debias_cl(cl, bias, md, inplace=True)
        update_metadata(cl, **md)

        result = Result(cl, spin=(s1, s2), axis=-1)
        if bins is not None:
            result = binned(result, bins, weights)
        cls[k1, k2, i1, i2] = result

    logger.info(
        "computed %d cl(s) in %s",
        len(cls),
        timedelta(seconds=(time.monotonic() - t)),
    )
    return cls


def _sample_pair_plan(keys, include, exclude):
    """Canonical pair plan over a shared key structure (host pass)."""
    twopoint_names = set()
    plan_keys = []
    for (k1, i1), (k2, i2) in combinations_with_replacement(keys, 2):
        if (k1, k2) not in twopoint_names and (k2, k1) in twopoint_names:
            k1, k2, i1, i2 = k2, k1, i2, i1
        if not toc_match((k1, k2, i1, i2), include, exclude):
            continue
        plan_keys.append((k1, k2, i1, i2))
        twopoint_names.add((k1, k2))
    return plan_keys


def angular_power_spectra_samples(
    alms_list,
    *,
    lmax=None,
    debias=True,
    bins=None,
    weights=None,
    include=None,
    exclude=None,
    mesh=None,
):
    """:func:`angular_power_spectra` for many alm sets in one device pass.

    ``alms_list``: a sequence of alm dicts sharing the same keys (e.g.
    the delete-k jackknife samples).  Each key's alms are stacked over a
    leading sample axis and the whole (sample x pair x ell) grid is
    computed batched — sample s's planes only pair with sample s's
    (SURVEY section 3.4 names this sample stacking as the TPU rebuild's
    biggest DICES win).  Returns a list of cls dicts, one per input,
    identical to mapping :func:`angular_power_spectra` over the list.

    Values may be host arrays (dtype metadata carries the science
    metadata) or device-resident ``DeviceMap`` alms — device values are
    stacked with jnp and never cross the host boundary.

    ``mesh``: optional device mesh; samples then shard across devices.
    """
    from .devicemap import DeviceMap

    if not alms_list:
        return []
    nsamples = len(alms_list)
    base = alms_list[0]

    plan_keys = _sample_pair_plan(base, include, exclude)

    # stack each needed key's alms over samples (device-aware)
    stacks = {}
    metadata = {}
    for k1, k2, i1, i2 in plan_keys:
        for k, i in ((k1, i1), (k2, i2)):
            if (k, i) in stacks:
                continue
            vals = [al[k, i] for al in alms_list]
            arrs = [v.array if isinstance(v, DeviceMap) else v
                    for v in vals]
            if any(isinstance(a, jax.Array) for a in arrs):
                stacks[k, i] = jnp.stack([jnp.asarray(a) for a in arrs])
            else:
                stacks[k, i] = np.stack([np.asanyarray(a) for a in arrs])
            v0 = vals[0]
            metadata[k, i] = (
                v0.metadata if isinstance(v0, DeviceMap)
                else dict(getattr(v0.dtype, "metadata", None) or {})
            )
    return angular_power_spectra_sample_stacks(
        stacks, metadata, nsamples, lmax=lmax, debias=debias, bins=bins,
        weights=weights, mesh=mesh, plan_keys=plan_keys,
    )


def angular_power_spectra_sample_stacks(
    stacks,
    metadata,
    nsamples,
    *,
    lmax=None,
    debias=True,
    bins=None,
    weights=None,
    include=None,
    exclude=None,
    mesh=None,
    plan_keys=None,
):
    """Sample spectra from pre-stacked alms (the device-resident core).

    ``stacks``: {(name, bin): (nsamples, ..., nlm) array} — host numpy
    or device jax (a device stack's pair grids compute without the alms
    ever crossing the host boundary; the DICES device cache feeds the
    delete-k stacks it assembles on the device straight through here).
    ``metadata``: {(name, bin): dict} science metadata per key (shared
    by all samples — sample-specific bias corrections are applied
    downstream, as in the jackknife flow).
    """
    if plan_keys is None:
        plan_keys = _sample_pair_plan(list(stacks), include, exclude)

    plan = [
        ((k1, k2, i1, i2), stacks[k1, i1], stacks[k2, i2])
        for k1, k2, i1, i2 in plan_keys
    ]

    # pass 2 (device): every sample's pair grid, batched
    grids, slot = _cross_grids_samples(plan, nsamples, lmax, mesh)

    # pass 3 (host): per-sample metadata, bias, Result assembly
    outs = [TocDict() for _ in range(nsamples)]
    for (k1, k2, i1, i2), a1, a2 in plan:
        n1, row, shape1 = slot[id(a1)]
        n2, col, shape2 = slot[id(a2)]
        g = grids[n1, n2]
        nc1 = int(np.prod(shape1, dtype=int))
        nc2 = int(np.prod(shape2, dtype=int))
        block = g[:, row : row + nc1, col : col + nc2]
        block = block.reshape((nsamples,) + shape1 + shape2 + (g.shape[-1],))
        for s in range(nsamples):
            cl = np.array(block[s])
            md1 = metadata[k1, i1] or {}
            md2 = metadata[k2, i2] or {}
            s1, s2 = md1.get("spin"), md2.get("spin")
            if s1 is None or s2 is None:
                raise ValueError(f"missing spin metadata for {k1} or {k2}")
            md = {f"{key}_1": value for key, value in md1.items()}
            md.update({f"{key}_2": value for key, value in md2.items()})
            bias = None
            if k1 == k2 and i1 == i2:
                fsky = md1.get("fsky")
                musq = md1.get("musq")
                dens = md1.get("dens")
                if fsky is not None and musq is not None and dens is not None:
                    factor = 0.5 if s1 == s2 == 2 else 1.0
                    bias = factor * fsky * musq / dens
            if bias is not None:
                md["bias"] = bias
            if debias and bias is not None:
                _debias_cl(cl, bias, md, inplace=True)
            update_metadata(cl, **md)
            result = Result(cl, spin=(s1, s2), axis=-1)
            if bins is not None:
                result = binned(result, bins, weights)
            outs[s][k1, k2, i1, i2] = result
    return outs


def debias_cls(cls, bias=None, *, inplace=False):
    """Remove (metadata or explicit) noise bias from every cl."""
    out = cls if inplace else TocDict()
    for key in cls:
        out[key] = _debias_cl(cls[key], bias and bias.get(key), inplace=inplace)
    return out


# -- mixing matrices ------------------------------------------------------


@lru_cache(maxsize=4)
def _leggauss(npoints):
    """Cached GL nodes (leggauss is ~20 s at the production 4501 nodes,
    and all three mixing-matrix spin combinations share the same rule)."""
    return np.polynomial.legendre.leggauss(npoints)


def _gl_nodes(npoints, dtype):
    """Gauss-Legendre nodes/weights + half-angle logs (host numpy consts)."""
    x, w = _leggauss(npoints)
    logch = 0.5 * np.log((1.0 + x) / 2)
    logsh = 0.5 * np.log((1.0 - x) / 2)
    dt = np.dtype(str(np.dtype(dtype)))
    return x.astype(dt), w.astype(dt), logch.astype(dt), logsh.astype(dt)


@lru_cache(maxsize=4)
def _mixmat_tables_df32(l1max, l2max, s1, s2, npoints):
    """Device-resident (hi, lo) Wigner-d tables on the GL nodes.

    Built once per (sizes, spins) from the exact host-f64 recurrence —
    the device f32 scans carry per-entry noise that the quadrature's
    cancellation amplifies — and kept on the device across masks (the
    tables are mask-independent; only the node weights change per call).
    """
    from .ops import df32

    x, w = _leggauss(npoints)
    theta = np.arccos(x)
    A = df32.split_f64(np.ascontiguousarray(
        wigner_table_host(s1, s2, theta, l1max).T
    ))
    B = df32.split_f64(np.ascontiguousarray(
        wigner_table_host(-s1, -s2, theta, l2max).T
    ))
    A = tuple(jax.device_put(jnp.asarray(z)) for z in A)
    B = tuple(jax.device_put(jnp.asarray(z)) for z in B)
    return x, w, A, B


def _mixmat_gl_df32_dispatch(cl3, l1max, l2max, s1, s2, eb, mesh=None):
    """Double-single GL quadrature: f64-parity mixing matrices on f32 HW.

    The E/B blocks are parity-filtered at the integrand: with symmetric
    GL nodes, M_plus/M_minus for (l1+l2) even/odd are separate integrals
    against the even/odd parts of the mask correlation xi — no
    subtraction of two O(1) integrals, so the small M_minus (EE->BB
    leakage) entries come out at the kernel's own precision instead of
    eps * |M_plus|.

    Dispatch/finalize split: the device contractions are launched (with
    their device-to-host copies started) and a zero-argument finalize
    callable is returned.  :func:`mixing_matrices` dispatches every
    key's contractions before finalizing any, so the ~35 MB/plane
    result transfers overlap the later keys' kernels and host work.
    """
    from .ops import df32

    l3max = cl3.shape[-1] - 1
    deg = l1max + l2max + l3max
    npoints = deg // 2 + 1
    x, w, A, B = _mixmat_tables_df32(l1max, l2max, s1, s2, npoints)

    ells3 = np.arange(l3max + 1, dtype=np.float64)
    xi = legendre_sum_host((2 * ells3 + 1) / (4 * np.pi) * cl3, x)

    # HERACLES_TPU_MIXMAT_KERNEL=interpret forces the Pallas kernel in
    # interpret mode off-TPU (tests / accuracy tooling); off TPU the
    # default is the equivalent host-f64 einsum
    mode = os.environ.get("HERACLES_TPU_MIXMAT_KERNEL", "").strip().lower()
    use_kernel = jax.default_backend() == "tpu" or mode == "interpret"

    def host_contract(u64):
        A64 = np.asarray(A[0], np.float64) + np.asarray(A[1], np.float64)
        B64 = np.asarray(B[0], np.float64) + np.asarray(B[1], np.float64)
        # matmul (BLAS dgemm), not einsum: np.einsum without optimize
        # runs a naive loop — ~40 s per contraction at production degree
        return (A64 * u64[:, None]).T @ B64

    def contract(u64):
        nonlocal use_kernel
        if use_kernel:
            try:
                if mesh is not None:
                    # GL node axis sharded over the mesh (compensated
                    # cross-device reduction; see gram_df32_sharded)
                    handle = df32.gram_df32_sharded(
                        mesh, A, B, df32.split_f64(u64),
                        interpret=mode == "interpret", block=False,
                    )
                else:
                    handle = df32.gram_df32(
                        A, B, df32.split_f64(u64),
                        interpret=mode == "interpret", block=False,
                    )
                return lambda: df32.gram_result(handle)
            except Exception:  # pragma: no cover - device-specific
                logger.exception(
                    "df32 gram kernel failed; falling back to the host "
                    "f64 contraction"
                )
                use_kernel = False
        result = host_contract(u64)
        return lambda: result

    ells2 = np.arange(l2max + 1, dtype=np.float64)
    pref = 2 * np.pi * (2 * ells2 + 1) / (4 * np.pi)
    if not eb:
        get = contract(w * xi)
        return lambda: get() * pref[None, :]
    # GL nodes are symmetric (x[::-1] == -x), so the even/odd parts of
    # xi split the integral by (l1 + l2) parity exactly
    xi_e = 0.5 * (xi + xi[::-1])
    xi_o = 0.5 * (xi - xi[::-1])
    get_e = contract(w * xi_e)
    get_o = contract(w * xi_o)

    def finalize():
        G_e = get_e()
        G_o = get_o()
        ells1 = np.arange(l1max + 1)
        even = (ells1[:, None] + ells2[None, :].astype(int)) % 2 == 0
        M_plus = np.where(even, G_e, G_o) * pref[None, :]
        M_minus = np.where(even, G_o, G_e) * pref[None, :]
        return np.stack([M_plus, M_minus, M_plus - M_minus], axis=0)

    return finalize


def _mixmat_gl_df32(cl3, l1max, l2max, s1, s2, eb):
    return _mixmat_gl_df32_dispatch(cl3, l1max, l2max, s1, s2, eb)()


@partial(jax.jit, static_argnames=("l1max", "l2max", "s1", "s2", "eb"))
def _mixmat_gl_f64(cl3, l1max, l2max, s1, s2, eb):
    """On-device f64 scan + MXU einsum evaluation (CPU x64 path)."""
    fdt = jnp.float64
    cl3 = cl3.astype(fdt)
    l3max = cl3.shape[-1] - 1
    deg = l1max + l2max + l3max
    npoints = deg // 2 + 1
    x, w, logch, logsh = _gl_nodes(npoints, fdt)

    # mask correlation at the nodes: xi = sum (2l+1)/4pi cl3 P_l(x)
    P3 = wigner_table(0, 0, x, logch, logsh, l3max)
    ells3 = jnp.arange(l3max + 1, dtype=fdt)
    hi = jax.lax.Precision.HIGHEST
    xi = jnp.matmul(
        (2 * ells3 + 1) / (4 * jnp.pi) * cl3, P3, precision=hi
    )  # (nx,)

    # d tables: wigner_table(m, n, ...) = d^l_{-m,-n}
    D1 = wigner_table(s1, s2, x, logch, logsh, l1max)  # d^{l1}_{-s1,-s2}
    D2 = wigner_table(-s1, -s2, x, logch, logsh, l2max)  # d^{l2}_{s1,s2}

    ells2 = jnp.arange(l2max + 1, dtype=fdt)
    pref = 2 * jnp.pi * (2 * ells2 + 1) / (4 * jnp.pi)

    def integral(xi_nodes):
        return jnp.einsum(
            "ax,x,bx->ab", D1, w * xi_nodes, D2,
            preferred_element_type=fdt, precision=hi,
        )

    I_full = integral(xi) * pref[None, :]
    if not eb:
        return I_full
    # parity-filtered blocks via xi(-x): GL nodes are symmetric, so
    # xi(-x) is a node reversal
    I_flip = integral(xi[::-1]) * pref[None, :]
    ells1 = jnp.arange(l1max + 1, dtype=fdt)
    par = jnp.where((ells1[:, None] + ells2[None, :]) % 2 == 0, 1.0, -1.0)
    M_plus = (I_full + par * I_flip) / 2
    M_minus = (I_full - par * I_flip) / 2
    return jnp.stack([M_plus, M_minus, M_plus - M_minus], axis=0)


def _mixmat_gl_f64_sharded(cl3, l1max, l2max, s1, s2, eb, mesh):
    """f64 GL quadrature with the node axis sharded over a device mesh.

    The per-node work (Wigner tables x xi x weights einsum) is
    embarrassingly parallel; each device contracts its node block and a
    single f64 ``psum`` combines them (f64 headroom absorbs the
    quadrature cancellation that forces the df32 path's compensated
    reduction).
    """
    from functools import partial as _partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    fdt = jnp.float64
    cl3 = jnp.asarray(cl3, fdt)
    l3max = cl3.shape[-1] - 1
    deg = l1max + l2max + l3max
    npoints = deg // 2 + 1
    axes = tuple(mesh.axis_names)
    ndev = int(np.prod([mesh.shape[a] for a in axes]))
    # pad the rule so each device holds an equal node block; padded
    # nodes carry zero weight, contributing exactly nothing
    npad = -(-npoints // ndev) * ndev
    x, w, logch, logsh = _gl_nodes(npoints, fdt)
    x, w, logch, logsh = (
        np.pad(a, (0, npad - npoints)) for a in (x, w, logch, logsh)
    )
    nodes = jnp.stack([jnp.asarray(a) for a in (x, w, logch, logsh)],
                      axis=-1)
    nodes = jax.device_put(nodes, NamedSharding(mesh, P(axes, None)))

    @_partial(jax.shard_map, mesh=mesh, in_specs=(P(axes, None), P()),
              out_specs=(P(), P()))
    def local(nodes_local, cl3_in):
        xb, wb, lcb, lsb = (nodes_local[:, i] for i in range(4))
        P3 = wigner_table(0, 0, xb, lcb, lsb, l3max)
        ells3 = jnp.arange(l3max + 1, dtype=fdt)
        hi = jax.lax.Precision.HIGHEST
        xi = jnp.matmul(
            (2 * ells3 + 1) / (4 * jnp.pi) * cl3_in, P3, precision=hi
        )
        D1 = wigner_table(s1, s2, xb, lcb, lsb, l1max)
        D2 = wigner_table(-s1, -s2, xb, lcb, lsb, l2max)

        def integral(xi_nodes):
            part = jnp.einsum(
                "ax,x,bx->ab", D1, wb * xi_nodes, D2,
                preferred_element_type=fdt, precision=hi,
            )
            return jax.lax.psum(part, axes)

        I_full = integral(xi)
        # xi at the reversed (negated) nodes for the parity split: the
        # global reversal is local negation (x -> -x), no communication
        I_flip = integral(
            jnp.matmul(
                (2 * ells3 + 1) / (4 * jnp.pi) * cl3_in,
                wigner_table(0, 0, -xb, lsb, lcb, l3max),
                precision=hi,
            )
        ) if eb else None
        return (I_full, I_flip) if eb else (I_full, I_full)

    I_full, I_flip = local(nodes, cl3)
    ells2 = np.arange(l2max + 1, dtype=np.float64)
    pref = 2 * np.pi * (2 * ells2 + 1) / (4 * np.pi)
    I_full = np.asarray(I_full) * pref[None, :]
    if not eb:
        return I_full
    I_flip = np.asarray(I_flip) * pref[None, :]
    ells1 = np.arange(l1max + 1)
    par = np.where((ells1[:, None] + ells2[None, :].astype(int)) % 2 == 0,
                   1.0, -1.0)
    M_plus = (I_full + par * I_flip) / 2
    M_minus = (I_full - par * I_flip) / 2
    return np.stack([M_plus, M_minus, M_plus - M_minus], axis=0)


def _mixmat_dispatch(cl, *, l1max, l2max, l3max, spin, eb, mesh=None):
    """Shared mixmat/mixmat_eb preprocessing; returns a finalize callable."""
    cl = np.asanyarray(cl)
    if l3max is not None:
        cl = cl[..., : l3max + 1]
    lmax_default = cl.shape[-1] - 1
    l1max = lmax_default if l1max is None else int(l1max)
    l2max = lmax_default if l2max is None else int(l2max)
    s1, s2 = spin
    cl_j = jnp.asarray(cl)
    if cl_j.dtype != jnp.float64:
        return _mixmat_gl_df32_dispatch(
            np.asarray(cl_j, np.float64), l1max, l2max, abs(s1), abs(s2),
            eb, mesh=mesh,
        )
    if mesh is not None:
        out = _mixmat_gl_f64_sharded(
            cl_j, l1max, l2max, abs(s1), abs(s2), eb, mesh
        )
        return lambda: np.asarray(out)
    out = _mixmat_gl_f64(cl_j, l1max, l2max, abs(s1), abs(s2), eb)
    return lambda: np.asarray(out)


def mixmat(cl, *, l1max=None, l2max=None, l3max=None, spin=(0, 0),
           mesh=None):
    """MASTER mixing matrix M[l1, l2] for a (possibly spin-weighted) pair.

    Equivalent of ``convolvecl.mixmat`` (used at reference
    twopoint.py:379-388): M = (2 l2+1)/4pi sum_l3 (2 l3+1) cl[l3]
    (3j(l1,l2,l3; -s1,s1,0))(3j(l1,l2,l3; -s2,s2,0)).
    ``mesh``: shard the GL node axis over a device mesh (every axis).
    """
    return _mixmat_dispatch(
        cl, l1max=l1max, l2max=l2max, l3max=l3max, spin=spin, eb=False,
        mesh=mesh,
    )()


def mixmat_eb(cl, *, l1max=None, l2max=None, l3max=None, spin=(2, 2),
              mesh=None):
    """E/B mixing-matrix blocks (EE<->EE, EE<->BB, EB<->EB) for spin pairs.

    Equivalent of ``convolvecl.mixmat_eb``; the EB block equals
    M_plus - M_minus, consistent with the reference's block-diagonal
    inversion (twopoint.py:443-458).
    ``mesh``: shard the GL node axis over a device mesh (every axis).
    """
    return _mixmat_dispatch(
        cl, l1max=l1max, l2max=l2max, l3max=l3max, spin=spin, eb=True,
        mesh=mesh,
    )()


def mixing_matrices(
    fields,
    cls,
    *,
    l1max=None,
    l2max=None,
    l3max=None,
    bins=None,
    weights=None,
    out=None,
    progress=None,
    mesh=None,
):
    """Mixing matrices for all field pairs covered by the given mask cls.

    ``cls`` are mask (cross-)spectra keyed (mask1, mask2, bin1, bin2);
    fields are matched through their ``mask`` attribute (reference
    twopoint.py:316-401).  The result is keyed (field1, field2, bin1,
    bin2) and wrapped as a Result with the *output* ell on axis -2.
    ``mesh``: shard each matrix build's GL node axis over a device mesh
    (see :func:`mixmat`).
    """
    if out is None:
        out = TocDict()
    if progress is None:
        progress = NoProgress()

    masks = {}
    for key, field in fields.items():
        if field.mask is not None:
            masks.setdefault(field.mask, {})[key] = field

    # phase 1: dispatch every pair's device contractions (the df32 path
    # starts its result transfers asynchronously, so later pairs' host
    # work and kernels overlap earlier pairs' readbacks)
    done = set()
    pending = []
    current, total = 0, len(cls)
    for (k1, k2, i1, i2), cl in cls.items():
        current += 1
        progress.update(current, total)
        try:
            fields1 = masks[k1]
            fields2 = masks[k2]
        except KeyError:
            continue
        for f1, f2 in product(fields1, fields2):
            if (f1, f2, i1, i2) in done or (f2, f1, i2, i1) in done:
                continue
            done.add((f1, f2, i1, i2))
            spin1, spin2 = fields1[f1].spin, fields2[f2].spin
            finalize = _mixmat_dispatch(
                np.asarray(getattr(cl, "array", cl)),
                l1max=l1max,
                l2max=l2max,
                l3max=l3max,
                spin=(spin1, spin2),
                eb=not (spin1 == 0 or spin2 == 0),
                mesh=mesh,
            )
            pending.append(((f1, f2, i1, i2), (spin1, spin2), finalize))

    # phase 2: materialise, in dispatch order
    for key, spins, finalize in pending:
        with progress.task(f"({key[0]}, {key[1]}, {key[2]}, {key[3]})"):
            mm = finalize()
            ell = np.arange(mm.shape[-2])
            result = Result(mm, spin=spins, ell=ell, axis=-2)
            if bins is not None:
                result = binned(result, bins, weights)
            out[key] = result
            del mm
    return out


def _pinv_batch(a, rcond, refine, interpret=False):
    """Batched rcond-cut pseudo-inverse on the default device.

    ``a``: host (k, n, m) float64 stack — the spin-2 blocks (M+, M-, EB)
    invert independently.  With f64 on the device (CPU runs) this is one
    batched SVD dispatch.  ``refine`` (f32-only devices): f32 SVD per
    block, then three double-single Newton-Schulz iterations
    X' = 2X - X A X with compensated matmuls (:mod:`.ops.df32`) — each
    iteration squares the relative error, so the f32 SVD's
    ~cond * 6e-8 floor drops to the df32 floor in two-three steps.
    Newton-Schulz preserves the truncated pinv's row and column spaces
    (both terms are X-sandwiched), so the rcond cut survives refinement.
    """
    a = np.asarray(a, np.float64)
    if not refine:
        return np.asarray(jnp.linalg.pinv(jnp.asarray(a), rcond))
    from .ops import df32

    out = []
    for blk in a:
        try:
            Ap = tuple(jnp.asarray(z) for z in df32.split_f64(blk))
            X = jnp.linalg.pinv(Ap[0], rcond)
            Xp = (X, jnp.zeros_like(X))
            for _ in range(3):
                T = df32.matmul_df32(Ap, Xp, interpret=interpret)  # (n, n)
                U = df32.matmul_df32(Xp, T, interpret=interpret)   # (m, n)
                Xp = df32.add_df32(
                    (2.0 * Xp[0], 2.0 * Xp[1]), (-U[0], -U[1])
                )
            out.append(
                np.asarray(Xp[0], np.float64) + np.asarray(Xp[1], np.float64)
            )
        except Exception:  # pragma: no cover - device-specific
            logger.exception(
                "df32 pinv refinement failed; falling back to host f64 pinv"
            )
            out.append(np.linalg.pinv(blk, rcond))
    return np.stack(out)


def invert_mixing_matrix(M, rcond=1e-5, progress=None):
    """Pseudo-inverses of mixing matrices.

    For spin2 x spin2, the (EE, BB) sector is block-diagonalised by the
    M+ = M_EE + M_BB / M- = M_EE - M_BB transformation before pinv and
    recombined; EB inverts independently (reference twopoint.py:404-481).
    The pinvs run batched on the default jax device (one SVD dispatch
    per key) instead of the reference's sequential host LAPACK calls —
    at lmax=3000 the host SVDs dominate the whole mixmats stage.
    """
    from collections.abc import Mapping as _Mapping

    if progress is None:
        progress = NoProgress()

    inv = {}
    current, total = 0, len(M)
    for key, value in M.items():
        current += 1
        progress.update(current, total)
        arr = value.array
        s1, s2 = value.spin
        *_, n, m = arr.shape
        if isinstance(rcond, _Mapping):
            if key not in rcond:
                raise KeyError(f"Missing rcond value for wm key: {key}")
            rc = rcond[key]
        else:
            rc = rcond
        with progress.task(f"invert {key}"):
            # f32-only devices (TPU) take the df32-refined path; the
            # env override exercises it off-TPU in tests/tools
            mode = os.environ.get(
                "HERACLES_TPU_MIXMAT_KERNEL", ""
            ).strip().lower()
            refine = (
                not jax.config.jax_enable_x64 or mode == "interpret"
            )
            interp = refine and jax.default_backend() != "tpu"
            ahost = np.asarray(arr, np.float64)
            if s1 != 0 and s2 != 0:
                blocks = np.stack(
                    [ahost[0] + ahost[1], ahost[0] - ahost[1], ahost[2]]
                )
                inv_p, inv_m, inv_eb = _pinv_batch(
                    blocks, rc, refine, interp
                )
                inv_ee = (inv_p + inv_m) / 2
                inv_bb = (inv_p - inv_m) / 2
                arr_inv = np.array([inv_ee, inv_bb, inv_eb])
            else:
                arr_inv = _pinv_batch(ahost[None], rc, refine, interp)[0]
            if n != m:
                # pinv swaps input/output ell axes; rebuild angular arrays
                axis = value.axis[0]
                out_size = arr_inv.shape[axis]
                inv[key] = replace(
                    value,
                    array=arr_inv,
                    ell=np.arange(out_size),
                    lower=np.arange(out_size),
                    upper=np.arange(1, out_size + 1),
                    weight=np.ones(out_size),
                )
            else:
                inv[key] = replace(value, array=arr_inv)
    return inv


def apply_mixing_matrix(d, M):
    """Apply mixing matrices to data cls (block E/B handling for spin-2)."""
    out = {}
    for key in d.keys():
        dtype = d[key].array.dtype
        s1, s2 = d[key].spin
        data = np.atleast_2d(d[key].array)
        mat = M[key].array
        ell = get_result_array(M[key], "ell")[0]
        lower = get_result_array(M[key], "lower")[0]
        upper = get_result_array(M[key], "upper")[0]
        weight = get_result_array(M[key], "weight")[0]
        if s1 != 0 and s2 != 0:
            ee = mat[0] @ data[0, 0] + mat[1] @ data[1, 1]
            bb = mat[1] @ data[0, 0] + mat[0] @ data[1, 1]
            eb = mat[2] @ data[0, 1]
            be = mat[2] @ data[1, 0]
            mixed = np.array([[ee, eb], [be, bb]])
        else:
            mixed = np.squeeze(np.array([mat @ cl for cl in data]))
        mixed = np.asarray(mixed, dtype=dtype)
        out[key] = replace(
            d[key], array=mixed, ell=ell, lower=lower, upper=upper, weight=weight
        )
    return out
