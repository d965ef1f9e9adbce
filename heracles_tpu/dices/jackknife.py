"""Delete-1/delete-2 jackknife spectra and covariances.

Behaviour parity with ``/root/reference/heracles/dices/jackknife.py``:

* per-region alms are computed once from region-masked maps and cached to
  FITS (restartable, idempotent — the file-level checkpoint contract);
* delete-k alms are formed by *alm subtraction* full - sum(regions),
  exploiting the linearity of the SHT;
* per-sample noise bias is rescaled by the sky-fraction ratio;
* footprint correction is "Fast" (divide by the fsky ratio) or "Full"
  (NaturalSpice with the mask-correlation ratio);
* the covariance is a streaming outer-product over samples with the
  delete-1 prefactor (njk-1)^2/njk or the delete-2 prefactor
  (njk(njk-1)-2)/(2 njk(njk+1));
* delete-2 debiasing builds the ensemble
  Q = njk*x0 - (njk-1)(x1_k + x1_k') + (njk-2) x2_kk', covariances it,
  and keeps only its diagonal.

TPU-native difference: region masking and the per-region SHTs run
batched on the accelerator through the same jitted ``map2alm`` as the
main pipeline; the orchestration below keeps the reference's caching
layout so long covariance runs resume for free.
"""

from __future__ import annotations

import functools
import itertools
import os
from copy import deepcopy
from dataclasses import replace
from itertools import combinations

import numpy as np

from ..core import update_metadata
from ..io import read, read_alms, write, write_alms
from ..mapping import transform
from ..progress import NoProgress
from ..result import Result, binned, get_result_array
from ..transforms import cl2corr
from ..twopoint import (
    angular_power_spectra,
    angular_power_spectra_sample_stacks,
    angular_power_spectra_samples,
)
from ..unmixing import _naturalspice
from ..utils import add_to_Cls, sub_to_Cls

__all__ = [
    "jackknife_cls",
    "compute_jk_alms",
    "jackknife_fsky",
    "jackknife_bias",
    "correct_bias",
    "correct_footprint_fsky",
    "correct_footprint_naturalspice",
    "jackknife_covariance",
    "sample_covariance",
    "delete2_correction",
    "debias_covariance",
]


def _n_regions(jk_map):
    labels = np.unique(jk_map)
    return len(labels[labels != 0])


def jackknife_cls(
    data_maps,
    vis_maps,
    jk_map,
    fields,
    mask_correction="Fast",
    unmixed=False,
    nd=1,
    dir="./dices",
    progress=None,
    mesh=None,
):
    """Spectra of all delete-``nd`` jackknife samples (cached to ``dir``).

    ``mesh``: optional ``jax.sharding.Mesh`` with ("batch", "m") axes;
    region-masked SHT batches and the sample-stacked spectra grids then
    shard across its devices (results identical to single-device).

    ``dir=None`` selects the in-memory mode: no FITS caches are written
    or read (single-process runs that do not need restartability skip
    the file checkpoint cost entirely).  The default keeps the
    reference's restartable file-cache contract
    (reference jackknife.py:93-153).
    """
    if progress is None:
        progress = NoProgress()

    alms_cache = compute_jk_alms(data_maps, vis_maps, jk_map, fields,
                                 dir=dir, progress=progress, mesh=mesh)
    return compute_jk_cls_from_alms(
        jk_map,
        fields,
        mask_correction=mask_correction,
        unmixed=unmixed,
        nd=nd,
        dir=dir,
        progress=progress,
        mesh=mesh,
        alms_cache=alms_cache,
    )


@functools.lru_cache(maxsize=1)
def _assemble_deletek_jit():
    import jax

    @jax.jit
    def assemble(full_a, R_a, idx):
        # linearity of the SHT: delete-k alms = full - sum(regions)
        return full_a[None] - R_a[idx].sum(axis=1)

    return assemble


def _assemble_deletek(full_a, R_a, idx):
    return _assemble_deletek_jit()(full_a, R_a, idx)


def _device_cache_budget():
    """HBM budget (bytes) for the DICES device alm cache (default 4 GiB;
    HERACLES_TPU_DICES_DEVICE_BYTES overrides)."""
    return int(os.environ.get("HERACLES_TPU_DICES_DEVICE_BYTES",
                              4 * 1024**3))


def _estimate_alm_bytes(data_maps, vis_maps, fields, njk):
    """Estimated device bytes of a full per-region alm cache."""
    total = 0
    for key in list(data_maps) + list(vis_maps):
        field = fields[key[0]]
        mapper = field.mapper_or_error
        lmax = mapper.lmax
        nlm = (lmax + 1) * (lmax + 2) // 2
        planes = 2 if abs(field.spin) == 2 else 1
        total += planes * nlm * 8  # complex64
    return (njk + 1) * total


def compute_jk_alms(data_maps, vis_maps, jk_map, fields, dir="./dices",
                    progress=None, region_batch=8, mesh=None,
                    device_cache=None):
    """Compute and cache the alms of every jackknife region (and the full sky).

    TPU-native fast path: regions are processed in batches of
    ``region_batch`` — the region-masked maps stack on a leading batch
    axis and one batched SHT transforms them all at once, instead of the
    reference's one-SHT-per-region loop (reference jackknife.py:93-153).
    The per-region FITS cache layout is unchanged, so runs stay
    restartable and interoperable.  ``region_batch=1`` reproduces the
    sequential behaviour.

    ``device_cache``: keep every region's alms ON the device
    (:class:`~heracles_tpu.devicemap.DeviceMap` values) — no readback
    at all; the spectra stage then assembles delete-k samples on the
    device too, so only the small Cl grids ever cross the host
    boundary.  Requires ``dir=None`` (no FITS checkpoints) and the
    batched device path.  Default (None): auto — on when ``dir`` is
    None, the device path is available, and the estimated cache size
    fits the HBM budget (:func:`_device_cache_budget`).
    """
    if progress is None:
        progress = NoProgress()
    if dir is not None:
        os.makedirs(dir, exist_ok=True)
    njk = _n_regions(jk_map)
    progress.update(0, njk + 1)
    # alms computed in this process are handed back so the spectra stage
    # need not re-read them from the FITS caches (which remain the
    # cross-process/resume checkpoint).  With ``dir=None`` the FITS
    # caches are skipped entirely (in-memory mode for single-process
    # runs; no restartability).
    cache = {}
    if mesh is not None:
        # fill the mesh: whole multiples of the batch axis per dispatch
        nb = mesh.shape["batch"]
        region_batch = max(region_batch, nb) // nb * nb
    batched_ok = region_batch > 1 and mesh is None and all(
        getattr(fields[key[0]].mapper_or_error, "batched_transform", False)
        for key in list(data_maps) + list(vis_maps)
    )
    if device_cache:
        if dir is not None:
            raise ValueError(
                "device_cache=True requires dir=None (the device cache "
                "replaces the FITS checkpoints)"
            )
        if not batched_ok:
            raise ValueError(
                "device_cache requires the batched device path "
                "(region_batch > 1, no mesh, batched-transform mappers)"
            )
        resident = True
    elif device_cache is None:
        resident = (
            dir is None and batched_ok
            and _estimate_alm_bytes(data_maps, vis_maps, fields, njk)
            <= _device_cache_budget()
        )
    else:
        resident = False
    if region_batch <= 1:
        for k in range(njk + 1):
            with progress.task(f"ALMs {k}"):
                _compute_single_jk_alm(k, data_maps, vis_maps, jk_map,
                                       fields, dir, cache=cache)
            progress.update(k + 1, njk + 1)
        return cache
    pending = [
        k
        for k in range(1, njk + 1)
        if dir is None or not (
            os.path.exists(os.path.join(dir, f"data_alms_{k}.fits"))
            and os.path.exists(os.path.join(dir, f"vis_alms_{k}.fits"))
        )
    ]
    device_state = None
    if batched_ok and (pending or resident):
        import jax
        import jax.numpy as jnp

        dev_data = _device_region_maps(data_maps)
        dev_vis = _device_region_maps(vis_maps)
        jk_dt = next(iter(dev_data.values()))[0].dtype
        jk_dev = jax.device_put(jnp.asarray(np.asarray(jk_map), jk_dt))
        device_state = (dev_data, dev_vis, jk_dev, _masked_stack_fn())
    # full-footprint alms (k = 0)
    with progress.task("ALMs 0"):
        if resident:
            dev_data, dev_vis, _, _ = device_state
            for name, dev_maps in (("data", dev_data), ("vis", dev_vis)):
                alms = {}
                for key, (arr, md) in dev_maps.items():
                    field = fields[key[0]]
                    alms[key] = field.mapper_or_error.transform_resident(
                        arr, spin=field.spin, metadata=md
                    )
                cache[name, 0] = alms
        else:
            _compute_single_jk_alm(0, data_maps, vis_maps, jk_map, fields,
                                   dir, mesh=mesh, cache=cache)
    progress.update(1, njk + 1)
    done = njk - len(pending)
    progress.update(1 + done, njk + 1)
    if not pending:
        return cache
    # software pipeline: dispatch batch k+1's SHTs (async readbacks
    # already in flight for batch k) before finishing batch k, so the
    # tunnel transfer of one batch overlaps the device compute of the
    # next (in resident mode there is nothing to transfer and the
    # finishers are trivial slices)
    prev_finish = None
    for start in range(0, len(pending), region_batch):
        ks = pending[start : start + region_batch]
        with progress.task(f"ALMs {ks[0]}..{ks[-1]}"):
            fin = _dispatch_batched_jk_alms(
                ks, data_maps, vis_maps, jk_map, fields, dir, mesh=mesh,
                device_state=device_state, cache=cache, resident=resident,
            )
            if prev_finish is not None:
                prev_finish()
                done += prev_len
                progress.update(1 + done, njk + 1)
            prev_finish, prev_len = fin, len(ks)
    if prev_finish is not None:
        prev_finish()
        done += prev_len
        progress.update(1 + done, njk + 1)
    return cache


def _masked_stack_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def masked_stack(arr, jk_dev, ks_arr):
        masks = (jk_dev[None, :] == ks_arr[:, None]).astype(arr.dtype)
        shape = masks.shape[:1] + (1,) * (arr.ndim - 1) + masks.shape[-1:]
        return arr[None, ...] * masks.reshape(shape)

    return masked_stack


def _device_region_maps(maps):
    """Upload each full map once; returns {key: (device array, metadata)}.

    The region-masked stacks are then products computed on the device —
    the (batch, npix) stacks never exist on the host and never cross the
    host->device boundary (at production sizes the host masking + stack
    upload dominated the whole jackknife stage).
    """
    import jax
    import jax.numpy as jnp

    x64 = bool(jax.config.jax_enable_x64)
    out = {}
    for key, m in maps.items():
        md = dict(m.dtype.metadata or {})
        arr = np.asarray(m)
        dt = jnp.float64 if (arr.dtype == np.float64 and x64) else jnp.float32
        out[key] = (jax.device_put(jnp.asarray(arr, dt)), md)
    return out


def _dispatch_batched_jk_alms(ks, data_maps, vis_maps, jk_map, fields, dir,
                              mesh=None, device_state=None, cache=None,
                              resident=False):
    """Dispatch one batched SHT over a group of region-masked map sets.

    Returns a zero-argument *finisher* that completes the device->host
    alm readbacks and writes the per-region FITS caches.  On the device
    fast path the SHTs are dispatched with async readbacks
    (:meth:`HealpixMapper.transform_async`), so the caller can dispatch
    the NEXT batch's SHTs while this batch's ~100 MB alm blocks are
    still crossing the host boundary — the DICES profile showed that
    boundary as ~90% of the stage cost.

    ``resident=True`` (device cache mode): the alms never leave the
    device — the finisher slices the batched stack into per-region
    :class:`DeviceMap` cache entries, all as device ops.
    """
    if mesh is None and device_state is not None:
        dev_data, dev_vis, jk_dev, masked_stack = device_state
        import jax.numpy as jnp

        ks_arr = jnp.asarray(np.asarray(ks, np.float32), jk_dev.dtype)

        if resident:
            from ..devicemap import DeviceMap

            def batched_resident(dev_maps):
                out = {}
                for key, (arr, md) in dev_maps.items():
                    field = fields[key[0]]
                    stacked = masked_stack(arr, jk_dev, ks_arr)
                    out[key] = field.mapper_or_error.transform_resident(
                        stacked, spin=field.spin, metadata=md
                    )
                return out

            data_res = batched_resident(dev_data)
            vis_res = batched_resident(dev_vis)

            def finish():
                for i, k in enumerate(ks):
                    for batched, name in ((data_res, "data"),
                                          (vis_res, "vis")):
                        cache[name, k] = {
                            key: DeviceMap(dm.array[i],
                                           metadata=dm.metadata)
                            for key, dm in batched.items()
                        }

            return finish

        def batched_transform(dev_maps):
            handles = {}
            for key, (arr, md) in dev_maps.items():
                field = fields[key[0]]
                stacked = masked_stack(arr, jk_dev, ks_arr)
                handles[key] = field.mapper_or_error.transform_async(
                    stacked, spin=field.spin, metadata=md
                )
            return handles

        data_handles = batched_transform(dev_data)
        vis_handles = batched_transform(dev_vis)

        def finish():
            data_batched = {k: h() for k, h in data_handles.items()}
            vis_batched = {k: h() for k, h in vis_handles.items()}
            _store_batched_jk_alms(ks, data_batched, vis_batched, dir, cache)

        return finish

    masks = np.stack(
        [(np.asarray(jk_map) == float(k)).astype(float) for k in ks]
    )

    def batched_transform(maps):
        out_per_key = {}
        for key, m in maps.items():
            md = dict(m.dtype.metadata or {})
            arr = np.asarray(m)
            stacked = arr[None, ...] * masks.reshape(
                (len(ks),) + (1,) * (arr.ndim - 1) + (masks.shape[-1],)
            )
            update_metadata(stacked, **md)
            field = fields[key[0]]
            spin = field.spin
            mapper = field.mapper_or_error
            if mesh is not None and hasattr(mapper, "transform_sharded"):
                out_per_key[key] = mapper.transform_sharded(
                    mesh, stacked, spin=spin
                )
            else:
                out_per_key[key] = mapper.transform(stacked, spin=spin)
        return out_per_key

    data_batched = batched_transform(data_maps)
    vis_batched = batched_transform(vis_maps)

    def finish():
        _store_batched_jk_alms(ks, data_batched, vis_batched, dir, cache)

    return finish


def _store_batched_jk_alms(ks, data_batched, vis_batched, dir, cache):
    for i, k in enumerate(ks):
        for batched, name in ((data_batched, "data"), (vis_batched, "vis")):
            alms = {}
            for key, stack_alm in batched.items():
                alm = np.ascontiguousarray(stack_alm[i])
                update_metadata(alm, **dict(stack_alm.dtype.metadata or {}))
                alms[key] = alm
            if dir is not None:
                write_alms(os.path.join(dir, f"{name}_alms_{k}.fits"), alms,
                           clobber=True)
            if cache is not None:
                cache[name, k] = alms


def _compute_single_jk_alm(k, data_maps, vis_maps, jk_map, fields, dir,
                           mesh=None, cache=None):
    if dir is not None:
        data_path = os.path.join(dir, f"data_alms_{k}.fits")
        vis_path = os.path.join(dir, f"vis_alms_{k}.fits")
        if os.path.exists(data_path) and os.path.exists(vis_path):
            return k, False
    if k == 0:
        data_alms = transform(fields, data_maps, mesh=mesh)
        vis_alms = transform(fields, vis_maps, mesh=mesh)
    else:
        data_alms = transform(
            fields, _get_region_maps(data_maps, jk_map, k), mesh=mesh
        )
        vis_alms = transform(
            fields, _get_region_maps(vis_maps, jk_map, k), mesh=mesh
        )
    if dir is not None:
        write_alms(data_path, data_alms, clobber=True)
        write_alms(vis_path, vis_alms, clobber=True)
    if cache is not None:
        cache["data", k] = dict(data_alms)
        cache["vis", k] = dict(vis_alms)
    return k, True


def compute_jk_cls_from_alms(
    jk_map,
    fields,
    mask_correction="Fast",
    unmixed=False,
    nd=1,
    dir="./dices",
    progress=None,
    sample_batch=16,
    mesh=None,
    alms_cache=None,
):
    """Spectra of every delete-``nd`` region combination from cached alms.

    Samples are processed ``sample_batch`` at a time: the delete-k alm
    sets stack over a leading sample axis and every sample's whole pair
    grid computes in one batched device dispatch
    (:func:`heracles_tpu.twopoint.angular_power_spectra_samples`) — the
    reference dispatches one :func:`angular_power_spectra` per sample
    (jackknife.py:179-246).  The per-sample FITS cache is unchanged.
    """
    cache = alms_cache or {}

    def _load_alms(name, k):
        alms = cache.get((name, k))
        if alms is None:
            if dir is None:
                raise KeyError(
                    f"alms ({name}, {k}) not in alms_cache and dir=None "
                    "(in-memory mode has no FITS fallback)"
                )
            alms = read_alms(os.path.join(dir, f"{name}_alms_{k}.fits"))
        return alms

    if nd == 0:
        data_alms_full = _load_alms("data", 0)
        return {(): angular_power_spectra(data_alms_full, mesh=mesh)}
    if nd < 1 or nd > 2:
        raise ValueError("number of deletions must be 1 or 2")
    if progress is None:
        progress = NoProgress()

    njk = _n_regions(jk_map)
    all_regions = list(combinations(range(1, njk + 1), nd))
    cls = {}
    progress.update(0, len(all_regions))

    def tag_path(regions):
        tag = "_".join(map(str, regions))
        return os.path.join(dir, f"cls_{tag}_unmixed_{unmixed}.fits")

    if dir is None:
        pending = list(all_regions)
    else:
        pending = [r for r in all_regions if not os.path.exists(tag_path(r))]
        for regions in all_regions:
            if regions not in pending:
                cls[regions] = read(tag_path(regions))
    done = len(all_regions) - len(pending)
    progress.update(done, len(all_regions))
    if not pending:
        return cls

    data_alms_full = _load_alms("data", 0)
    vis_alms_full = _load_alms("vis", 0)
    mls0 = (
        angular_power_spectra(vis_alms_full, mesh=mesh)
        if mask_correction == "Full" else None
    )

    # device-cache mode: every region's alms are DeviceMaps in HBM —
    # build per-key region stacks once, then assemble each batch's
    # delete-k sample stack in ONE jitted gather-subtract per key and
    # feed it straight to the device pair grids; nothing but the small
    # Cl grids ever crosses the host boundary
    from ..devicemap import DeviceMap

    device_mode = any(
        isinstance(v, DeviceMap) for v in data_alms_full.values()
    )
    if device_mode:
        import jax.numpy as jnp

        def region_stacks(name):
            full = _load_alms(name, 0)
            return {
                key: jnp.stack([
                    _load_alms(name, r)[key].array
                    for r in range(1, njk + 1)
                ])
                for key in full
            }

        R_data = region_stacks("data")
        R_vis = (region_stacks("vis")
                 if mask_correction == "Full" else None)

        def _device_samples(full_alms, R, batch):
            idx = jnp.asarray(np.asarray(batch, np.int32) - 1)
            stacks = {
                key: _assemble_deletek(full_alms[key].array, R[key], idx)
                for key in full_alms
            }
            md = {key: full_alms[key].metadata for key in full_alms}
            return angular_power_spectra_sample_stacks(
                stacks, md, len(batch), mesh=mesh
            )

    for start in range(0, len(pending), max(1, sample_batch)):
        batch = pending[start : start + max(1, sample_batch)]
        with progress.task(f"Cls {batch[0]}..{batch[-1]}"):
            if device_mode:
                cls_samples = _device_samples(data_alms_full, R_data, batch)
                if mask_correction == "Full":
                    mm_samples = _device_samples(vis_alms_full, R_vis,
                                                 batch)
            else:
                # linearity of the SHT: delete-k = full - sum of regions
                data_samples = [
                    _subtract_alms(
                        data_alms_full,
                        _accumulate_alms(
                            _load_alms("data", r) for r in regions
                        ),
                    )
                    for regions in batch
                ]
                cls_samples = angular_power_spectra_samples(
                    data_samples, mesh=mesh
                )
                if mask_correction == "Full":
                    vis_samples = [
                        _subtract_alms(
                            vis_alms_full,
                            _accumulate_alms(
                                _load_alms("vis", r) for r in regions
                            ),
                        )
                        for regions in batch
                    ]
                    mm_samples = angular_power_spectra_samples(
                        vis_samples, mesh=mesh
                    )
            for i, regions in enumerate(batch):
                cls_jk = correct_bias(cls_samples[i], jk_map, fields, *regions)
                if mask_correction == "Full":
                    cls_jk = correct_footprint_naturalspice(
                        cls_jk, mm_samples[i], mls0, fields, unmixed=unmixed
                    )
                elif mask_correction == "Fast":
                    cls_jk = correct_footprint_fsky(
                        cls_jk, jk_map, *regions, unmixed=unmixed
                    )
                else:
                    raise ValueError(
                        "mask_correction must be 'Fast' or 'Full'"
                    )
                if dir is not None:
                    write(tag_path(regions), cls_jk, clobber=True)
                cls[regions] = cls_jk
        done += len(batch)
        progress.update(done, len(all_regions))
    return cls


def _get_region_maps(maps, jk_map, jk):
    """Zero out all pixels outside jackknife region ``jk``."""
    out = deepcopy(maps)
    mask = (np.asarray(jk_map) == float(jk)).astype(int)
    for key in maps.keys():
        out[key] *= mask
    return out


def _accumulate_alms(alm_sets):
    """Sum already-loaded alm sets, one at a time."""
    total = None
    for alms in alm_sets:
        if total is None:
            total = {key: arr.copy() for key, arr in alms.items()}
        else:
            for key in total:
                total[key] += alms[key]
    return total


def _subtract_alms(full_alms, region_sum):
    out = {}
    for key in full_alms:
        out[key] = full_alms[key].copy()
        if region_sum is not None:
            out[key] -= region_sum[key]
    return out


def bias(cls):
    """Per-key noise bias read back from the cl metadata."""
    return {
        key: (cls[key].dtype.metadata or {}).get("bias", 0) for key in cls.keys()
    }


def jackknife_fsky(jk_map, jk=0, jk2=0, ratio=True):
    """Sky fraction after deleting (up to) two regions.

    With ``ratio=True`` (default) relative to the full footprint.
    """
    jk_map = np.asarray(jk_map)
    mask = (jk_map > 0).astype(int)
    fsky = mask.sum() / mask.size
    keep = (mask == 1) & (jk_map != jk) & (jk_map != jk2)
    fskyjk = keep.sum() / mask.size
    return fskyjk / fsky if ratio else fskyjk


def jackknife_bias(bias, fsky, fields):
    """Rescale each bias by the delete-region sky fraction ratio."""
    return {key: value * fsky for key, value in bias.items()}


def correct_bias(cls, jk_map, fields, jk=0, jk2=0):
    """Swap the full-footprint bias for the jackknife-footprint bias.

    Adds back the bias subtracted during ``angular_power_spectra`` and
    subtracts the fsky-rescaled one, updating the metadata accordingly.
    """
    b = bias(cls)
    fskyjk = jackknife_fsky(jk_map, jk=jk, jk2=jk2)
    b_jk = jackknife_bias(b, fskyjk, fields)
    cls = add_to_Cls(cls, b)
    cls = sub_to_Cls(cls, b_jk)
    out = {}
    for key in cls.keys():
        arr = cls[key].array
        update_metadata(arr, bias=b_jk[key])
        out[key] = replace(cls[key], array=arr)
    return out


def correct_footprint_fsky(cls, jk_map, jk=0, jk2=0, unmixed=False):
    """"Fast" footprint correction: divide by the deleted-sky fraction."""
    ratio = not unmixed
    fskyjk = jackknife_fsky(jk_map, jk=jk, jk2=jk2, ratio=ratio)
    return {
        key: replace(value, array=value.array / fskyjk)
        for key, value in cls.items()
    }


def _mask_correlation_ratio(mljk, mls0, unmixed=False):
    """alpha = xi_mask_jk / xi_mask_full at the quadrature nodes."""
    alphas = {}
    wmls0 = cl2corr(mls0)
    wmljk = cl2corr(mljk)
    for key in wmljk.keys():
        alpha = wmljk[key].array
        if not unmixed:
            alpha = alpha / wmls0[key].array
        alphas[key] = replace(mls0[key], array=alpha)
    return alphas


def correct_footprint_naturalspice(cls, cls_mm, mls0, fields, unmixed=False):
    """"Full" footprint correction: NaturalSpice with the mask ratio."""
    alphas = _mask_correlation_ratio(cls_mm, mls0, unmixed=unmixed)
    first_cls = next(iter(cls.values()))
    first_mls = next(iter(mls0.values()))
    lmax = first_cls.shape[first_cls.axis[0]]
    lmax_mask = first_mls.shape[first_mls.axis[0]]
    cls = binned(cls, np.arange(0, lmax_mask + 1))
    wcls = cl2corr(cls)
    wcls = _naturalspice(wcls, alphas, fields)
    from ..transforms import corr2cl

    cls = corr2cl(wcls)
    return binned(cls, np.arange(0, lmax + 1))


def _delete_count_prefactor(m, nd):
    """Unbiased-covariance prefactor for a delete-``nd`` sample ensemble.

    ``m`` is the ensemble size: njk samples for delete-1, njk-choose-2
    for delete-2 (inverted via the quadratic formula).
    """
    if nd == 1:
        return (m - 1) ** 2 / m
    if nd == 2:
        njk = (1 + np.sqrt(1 + 8 * m)) / 2
        return (njk * (njk - 1) - 2) / (2 * njk * (njk + 1))
    raise ValueError("number of deletions must be 1 or 2")


def _stacked_covariance(stacks, template, nd):
    """Jackknife covariance blocks from per-key sample stacks.

    ``stacks`` maps each 4-tuple spectra key to an (m, ...) array of
    samples; ``template`` supplies the per-key spin/axis/ell metadata.
    Every key pair produces one covariance Result whose trailing axes are
    the ell axes of both halves, in that order.
    """
    cov = {}
    for key1, key2 in itertools.combinations_with_replacement(stacks, 2):
        stack1, stack2 = stacks[key1], stacks[key2]
        if len(stack1) <= 1:
            continue
        block = _delete_count_prefactor(len(stack1), nd) * sample_covariance(
            stack1, stack2
        )
        r1, r2 = template[key1], template[key2]
        src = r1.axis + tuple(r1.ndim + ax for ax in r2.axis)
        dst = tuple(range(-len(src), 0))
        cov[key1[0], key1[1], key2[0], key2[1],
            key1[2], key1[3], key2[2], key2[3]] = Result(
            np.moveaxis(block, src, dst),
            axis=dst,
            spin=(*r1.spin, *r2.spin),
            ell=get_result_array(r1, "ell") + get_result_array(r2, "ell"),
        )
    return cov


def jackknife_covariance(samples, nd=1):
    """Jackknife covariance of a dict of per-sample spectra dicts."""
    return _jackknife_covariance(samples.values(), nd=nd)


def _jackknife_covariance(samples, nd=1):
    samples = list(samples)
    template = samples[0]
    stacks = {
        key: np.stack([np.asarray(s[key]) for s in samples])
        for key in template
    }
    return _stacked_covariance(stacks, template, nd)


def sample_covariance(samples, samples2=None):
    """Sample covariance / cross-covariance over the leading axis.

    One two-pass centred matmul over the flattened feature axes — the
    result has the feature shape of ``samples`` followed by that of
    ``samples2``.
    """
    x = np.asarray(samples)
    y = x if samples2 is None else np.asarray(samples2)
    n = len(x)
    if len(y) != n:
        raise ValueError("different numbers of samples")
    xc = (x - x.mean(axis=0)).reshape(n, -1)
    yc = (y - y.mean(axis=0)).reshape(n, -1)
    return (xc.T @ yc).reshape(x.shape[1:] + y.shape[1:]) / (n - 1)


def delete2_correction(cls0, cls1, cls2):
    """Delete-2 debiasing ensemble, diagonalised.

    Q ensemble members: njk*x0 - (njk-1)(x1_k + x1_k') + (njk-2)*x2_kk'
    over all delete-2 pairs; the correction is their (delete-2
    prefactored) covariance with only the diagonal kept.  The ensemble
    is assembled as one broadcast expression per key over the stacked
    delete-1/delete-2 samples.
    """
    njk = len(cls1)
    pairs = list(cls2)
    stacks = {}
    for key, block in cls0.items():
        x0 = np.asarray(block.array)
        x1 = np.stack(
            [
                np.asarray(cls1[(k,)][key].array)
                for pair in pairs
                for k in pair
            ]
        ).reshape((len(pairs), 2) + x0.shape)
        x2 = np.stack([np.asarray(cls2[pair][key].array) for pair in pairs])
        stacks[key] = (
            njk * x0 - (njk - 1) * x1.sum(axis=1) + (njk - 2) * x2
        )
    corr = _stacked_covariance(stacks, cls0, nd=2)
    # keep only the ell-diagonal of each correction block
    for key, block in corr.items():
        q = np.asarray(block)
        corr[key] = replace(block, array=q * np.eye(q.shape[-1]))
    return corr


def debias_covariance(cov_jk, cls0, cls1, cls2):
    """Subtract the delete-2 correction from the delete-1 covariance."""
    correction = delete2_correction(cls0, cls1, cls2)
    return {
        key: replace(block, array=block.array - correction[key].array)
        for key, block in cov_jk.items()
    }
