"""Mapping orchestration: catalogues -> maps -> alms.

Parity with ``/root/reference/heracles/mapping.py``:

* :func:`map_catalogs` — run every (field x catalogue) work item; items of
  one catalogue run concurrently on the cooperative scheduler so they
  share cached pages (``parallel=True`` flattens all groups into one);
  include/exclude filtering; results in a :class:`~heracles_tpu.core.TocDict`
  keyed ``(field, catalog)``.
* :func:`transform` — per-map harmonic transform dispatch with
  spin-metadata fill-in and mismatch checking.
"""

from __future__ import annotations

import os

import numpy as np

from . import _scheduler as coroutines
from .core import TocDict, toc_match, update_metadata
from .progress import NoProgress

__all__ = ["map_catalogs", "transform"]


async def _map_field(key, field, catalog, progress, task_done):
    label = "(" + ", ".join(map(str, key)) + ")"
    with progress.task(label) as task:
        result = await field(catalog, progress=task)
    task_done()
    return result


def map_catalogs(
    fields,
    catalogs,
    *,
    parallel=False,
    out=None,
    include=None,
    exclude=None,
    progress=None,
):
    """Map a set of catalogues into fields; returns {(field, catalog): map}."""
    if out is None:
        out = TocDict()
    if progress is None:
        progress = NoProgress()

    groups = [
        [((i, j), field, catalog) for i, field in fields.items()]
        for j, catalog in catalogs.items()
    ]
    if parallel:
        groups = [sum(groups, [])]

    current, total = 0, sum(len(g) for g in groups)
    progress.update(0, total)

    def task_done():
        nonlocal current
        current += 1
        progress.update(current, total)

    for items in groups:
        keys, coros = [], []
        for key, field, catalog in items:
            if toc_match(key, include, exclude):
                keys.append(key)
                coros.append(_map_field(key, field, catalog, progress, task_done))
        try:
            results = coroutines.run(coroutines.gather(*coros))
        finally:
            for coro in coros:
                coro.close()
        for key, value in zip(keys, results):
            out[key] = value
        del results

    return out


def transform(fields, data, *, out=None, progress=None, batch=8, mesh=None):
    """Transform maps to alms via each field's mapper.

    Fills in missing spin metadata from the field and raises on a
    mismatch (reference mapping.py:160-171).

    Unlike the reference's strictly sequential per-map loop (reference
    mapping.py:151), maps that share a mapper, spin and shape are
    stacked and transformed in groups of up to ``batch`` — one batched
    SHT dispatch per group (the Pallas kernels take leading batch dims),
    which matters on accelerators where each dispatch carries fixed
    overhead.  ``batch=1`` restores the sequential behaviour.  Per-map
    metadata is preserved on the batched path.

    ``mesh``: an optional ``jax.sharding.Mesh`` with ("batch", "m") axes
    (see :func:`heracles_tpu.parallel.make_mesh`).  Groups then shard
    their stacked maps over the mesh's "batch" axis and each SHT's
    harmonic orders over "m" (results are identical to the single-device
    path); whole groups go out in one sharded dispatch.
    """
    if out is None:
        out = TocDict()
    if progress is None:
        progress = NoProgress()

    from .devicemap import DeviceMap

    # pass 1: validate, fill spins, collect work items in input order
    items = []
    for (k, i), m in data.items():
        if not isinstance(m, DeviceMap):
            m = getattr(m, "array", m)
        try:
            field = fields[k]
        except KeyError:
            raise ValueError(f"unknown field name: {k}") from None
        spin = field.spin
        m_spin = (m.dtype.metadata or {}).get("spin")
        if m_spin is None:
            update_metadata(m, spin=spin)
        elif m_spin != spin:
            raise ValueError(
                f"spin mismatch for field {k!r}: "
                f"map has spin {m_spin}, field has spin {spin}"
            )
        items.append(((k, i), field, m))

    # pass 2: group compatible maps (same mapper object, spin, shape)
    groups = {}
    for idx, (key, field, m) in enumerate(items):
        mapper = field.mapper_or_error
        if (
            (mesh is not None or (batch and batch > 1))
            and getattr(mapper, "batched_transform", False)
        ):
            # dtype is part of the key: stacking f32 with f64 maps would
            # promote both and change the batch=1 numerics; device maps
            # group apart from host maps (they stack on the device)
            dev = isinstance(m, DeviceMap)
            dt = m.dtype if dev else np.asarray(m).dtype
            gkey = (id(mapper), field.spin, np.shape(m), np.dtype(dt.str),
                    dev)
        else:
            gkey = ("solo", idx)
        groups.setdefault(gkey, []).append(idx)

    # pass 3: transform per group (chunked stacks), emit in input order
    results = {}
    current, total = 0, len(items)
    progress.update(0, total)
    for gkey, idxs in groups.items():
        solo_ok = mesh is None or not hasattr(
            items[idxs[0]][1].mapper_or_error, "transform_sharded"
        )
        if gkey[0] == "solo" or (len(idxs) == 1 and solo_ok):
            for idx in idxs:
                key, field, m = items[idx]
                with progress.task("(" + ", ".join(map(str, key)) + ")"):
                    results[idx] = field.mapper_or_error.transform(
                        m, spin=field.spin
                    )
                current += 1
                progress.update(current, total)
            continue
        field0 = items[idxs[0]][1]
        mapper = field0.mapper_or_error
        spin = field0.spin
        use_mesh = mesh is not None and hasattr(mapper, "transform_sharded")
        if use_mesh:
            group_step = len(idxs)
        else:
            # cap the stack so its device working set (map + ring
            # spectra + FFT intermediates, ~20x the map bytes in f32)
            # fits HBM: one nside=4096 map is ~2e8 pixels, and a single
            # map of that size already uses a sizeable fraction of a
            # 16 GB chip, so big maps transform solo while small maps
            # keep the full dispatch batching
            elems = int(np.prod(np.shape(items[idxs[0]][2]))) or 1
            budget = int(os.environ.get(
                "HERACLES_TPU_BATCH_ELEMS", 2 * 10**8))
            group_step = max(1, min(batch, budget // elems))
        device_group = isinstance(items[idxs[0]][2], DeviceMap)
        for start in range(0, len(idxs), group_step):
            chunk = idxs[start : start + group_step]
            labels = ", ".join(str(items[idx][0]) for idx in chunk)
            with progress.task(f"[{labels}]"):
                if device_group and not use_mesh:
                    # device maps stack on the device: the pixel data
                    # never crosses the host boundary on its way to the
                    # SHT
                    import jax.numpy as jnp

                    stack = jnp.stack(
                        [items[idx][2].array for idx in chunk]
                    )
                    alms = mapper.transform(
                        stack, spin=spin, metadata={"spin": spin}
                    )
                else:
                    stack = np.stack(
                        [np.asarray(items[idx][2]) for idx in chunk]
                    )
                    update_metadata(stack, spin=spin)
                    if use_mesh:
                        alms = mapper.transform_sharded(
                            mesh, stack, spin=spin
                        )
                    else:
                        alms = mapper.transform(stack, spin=spin)
            extra = dict(alms.dtype.metadata or {})
            for row, idx in enumerate(chunk):
                key, field, m = items[idx]
                if isinstance(alms, DeviceMap):
                    alm = alms[row]  # device-resident slice
                else:
                    alm = np.ascontiguousarray(alms[row])
                md = dict(m.dtype.metadata or {})
                update_metadata(alm, **{**md, **extra})
                results[idx] = alm
            current += len(chunk)
            progress.update(current, total)

    for idx, (key, _, _) in enumerate(items):
        out[key] = results[idx]
    return out
