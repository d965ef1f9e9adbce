"""Core utilities: tuple-key pattern matching, TOC dicts, metadata plumbing.

TPU-native rebuild of the reference's core layer (see
``/root/reference/heracles/core.py:34-149`` for the behavioural contract):

* products of the pipeline live in plain mappings keyed by tuples such as
  ``(FIELD, bin)`` or ``(F1, F2, i, j)``,
* ``...`` (Ellipsis) acts as a wildcard in both lookups and include/exclude
  filters,
* scientific metadata (nside, lmax, spin, nbar, ...) rides on the numpy
  dtype metadata of each host-side array so that it survives slicing and
  FITS round trips.

JAX arrays cannot carry dtype metadata; device computation therefore works
on bare arrays plus explicit static metadata structs, and the host-side
containers defined here re-attach the metadata on the way out.
"""

from __future__ import annotations

from collections import UserDict
from collections.abc import Mapping, Sequence

import numpy as np

__all__ = [
    "TocDict",
    "toc_match",
    "toc_filter",
    "update_metadata",
    "ExceptionExplainer",
    "external_dependency_explainer",
]


def _head_match(pattern, key):
    """Compare *pattern* elementwise against the head of *key*.

    ``...`` entries match anything; comparison stops at the shorter of
    the two tuples (a short pattern matches any continuation).
    """
    return all(p is ... or p == k for p, k in zip(pattern, key))


def toc_match(key, include=None, exclude=None):
    """Return whether a tuple key passes the include/exclude patterns.

    ``include=None`` admits every key; otherwise at least one include
    pattern must match.  Any matching exclude pattern rejects the key.
    Contract: reference core.py:34-48.
    """
    if not isinstance(key, tuple):
        key = (key,)
    if any(_head_match(p, key) for p in exclude or ()):
        return False
    return include is None or any(_head_match(p, key) for p in include)


def toc_filter(obj, include=None, exclude=None):
    """Filter a mapping (or sequence of mappings) by key patterns."""
    if isinstance(obj, Sequence):
        return [toc_filter(item, include, exclude) for item in obj]
    if isinstance(obj, Mapping):
        return {k: v for k, v in obj.items() if toc_match(k, include, exclude)}
    raise TypeError("invalid input type")


class TocDict(UserDict):
    """Table-of-contents dict with ``...``-wildcard pattern lookup.

    ``d["POS", 0]`` returns the single entry; ``d["POS"]`` or
    ``d["POS", ...]`` returns a new TocDict of all matching entries.
    Behaviour contract: reference core.py:63-99.
    """

    @staticmethod
    def _selects(pattern, key):
        as_tuple = key if isinstance(key, tuple) else (key,)
        return len(as_tuple) >= len(pattern) and _head_match(pattern, as_tuple)

    def __getitem__(self, pattern):
        # exact entries win; unhashable patterns fall through to matching
        try:
            return self.data[pattern]
        except (KeyError, TypeError):
            pass
        if not isinstance(pattern, tuple):
            pattern = (pattern,)
        if not pattern:
            return self.copy()
        selected = self.__class__(
            {k: v for k, v in self.data.items() if self._selects(pattern, k)}
        )
        if not selected:
            raise KeyError(pattern)
        return selected


def update_metadata(array, *sources, **metadata):
    """Attach or update dtype metadata of a numpy array in place.

    Metadata is merged from the array's existing metadata, then from the
    ``.metadata`` attribute of each *source*, then from keyword arguments.
    Contract: reference core.py:102-122.
    """
    merged = get_metadata(array)
    for source in sources:
        merged.update(source.metadata)
    merged.update(metadata)
    spec = array.dtype.fields or array.dtype.str
    tagged = np.dtype(spec, metadata=merged)
    if not np.can_cast(tagged, array.dtype, casting="no"):
        raise ValueError(f"cannot attach metadata to dtype {array.dtype!r}")
    array.dtype = tagged


def get_metadata(array):
    """Return the dtype metadata of *array* as a plain dict (empty if none)."""
    md = getattr(getattr(array, "dtype", None), "metadata", None)
    return dict(md) if md else {}


class ExceptionExplainer:
    """Context manager that adds an explanatory note to chosen exceptions."""

    def __init__(self, exc_type, note):
        self.exc_type = exc_type
        self.note = note

    def __enter__(self):
        return None

    def __exit__(self, exc_type, exc_value, traceback):
        if exc_type and issubclass(exc_type, self.exc_type):
            try:
                exc_value.add_note(self.note)
            except AttributeError:
                pass
        return None


external_dependency_explainer = ExceptionExplainer(
    ModuleNotFoundError,
    "You are trying to import a heracles_tpu module that relies on a missing "
    "external dependency. Install the missing package to use this feature.",
)
