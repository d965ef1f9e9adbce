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


def transform(fields, data, *, out=None, progress=None):
    """Transform maps to alms via each field's mapper.

    Fills in missing spin metadata from the field and raises on a
    mismatch (reference mapping.py:160-171).
    """
    if out is None:
        out = TocDict()
    if progress is None:
        progress = NoProgress()

    current, total = 0, len(data)
    for (k, i), m in data.items():
        current += 1
        progress.update(current, total)
        m = getattr(m, "array", m)
        with progress.task(f"({k}, {i})"):
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
            out[k, i] = field.mapper_or_error.transform(m, spin=spin)

    return out
