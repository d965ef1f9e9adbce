"""Field definitions: catalogue -> map coroutines with online statistics.

Capability parity with the reference fields layer
(``/root/reference/heracles/fields.py``): each concrete field pages
through a catalogue, accumulates a map (or direct alms for the discrete
mapper) and online moments of the weights/values, then normalises and
attaches the noise-bias ingredients as metadata:

* :class:`Positions` — number counts / overdensity, nbar normalisation,
  3-sigma sanity check on a user-supplied nbar, bias ingredients
  ``musq=1``, ``dens=(nbar/area)^2 / (ngal/4 pi fsky) / <w^2>``
  (reference fields.py:197-315);
* :class:`ScalarField` — weighted values, ``wbar`` normalisation,
  ``musq=var/<w^2>``, ``dens=ngal/(4 pi fsky)/deff`` (fields.py:318-384);
* :class:`ComplexField` (spin 0) and :class:`Spin2Field` (= ``Shears`` =
  ``Ellipticities``) — two-component values (fields.py:387-457, 562-567);
* :class:`Visibility` — copy/resample the catalogue's visibility map
  (fields.py:460-493);
* :class:`Weights` — map of the weights themselves (fields.py:496-559);
* :func:`get_masks` — mask names/combinations incl. E/B suffix filtering
  (fields.py:570-621).

TPU-native accumulation: when the mapper exposes the device interface
(``begin``/``add``/``finish``), pages are zero-padded to a static block
size and scatter-added on the accelerator under jit, so the map stays
device-resident across the whole catalogue; otherwise the mapper's
host ``map_values`` is used.
"""

from __future__ import annotations

import warnings
from abc import ABCMeta, abstractmethod
from functools import partial
from itertools import combinations_with_replacement, product

import numpy as np

from . import _scheduler as coroutines
from .core import toc_match, update_metadata

__all__ = [
    "Field",
    "Positions",
    "ScalarField",
    "ComplexField",
    "Visibility",
    "Weights",
    "Spin2Field",
    "Shears",
    "Ellipticities",
    "get_masks",
]

# static block size for padded device scatters (pages are padded up to the
# next multiple, so jit compiles O(1) distinct shapes)
_PAGE_BLOCK = 1 << 18


class Field(metaclass=ABCMeta):
    """Abstract base class for field definitions.

    Subclasses declare their catalogue columns via ``uses`` (trailing
    ``[name]`` entries are optional) and their spin weight via the
    ``spin=`` class keyword; instances bind a mapper, concrete column
    names and an optional mask name.
    """

    uses = None

    _spin = None

    def __init_subclass__(cls, *, spin=None, **kwargs):
        super().__init_subclass__(**kwargs)
        if spin is not None:
            cls._spin = spin
        uses = cls.uses
        if uses is None:
            uses = ()
        elif isinstance(uses, str):
            uses = (uses,)
        nopt = 0
        for name in reversed(uses):
            if name.startswith("[") and name.endswith("]"):
                nopt += 1
            else:
                break
        cls._ncol = (len(uses) - nopt, len(uses))

    def __init__(self, mapper, *columns, mask=None):
        self._mapper = mapper
        self._columns = self._init_columns(*columns) if columns else None
        self._mask = mask

    @classmethod
    def _init_columns(cls, *columns):
        nmin, nmax = cls._ncol
        if not nmin <= len(columns) <= nmax:
            uses = cls.uses or ()
            if isinstance(uses, str):
                uses = (uses,)
            count = f"{nmin}" if nmin == nmax else f"{nmin} to {nmax}"
            msg = f"field of type '{cls.__name__}' accepts {count} columns"
            if uses:
                msg += " (" + ", ".join(uses) + ")"
            msg += f", received {len(columns)}"
            raise ValueError(msg)
        return columns + (None,) * (nmax - len(columns))

    @property
    def mapper(self):
        return self._mapper

    @property
    def mapper_or_error(self):
        if self._mapper is None:
            raise ValueError("no mapper for field")
        return self._mapper

    @property
    def columns(self):
        return self._columns

    @property
    def columns_or_error(self):
        if self._columns is None:
            raise ValueError("no columns for field")
        return self._columns

    @property
    def spin(self):
        if self._spin is None:
            raise ValueError(
                f"field of type '{self.__class__.__name__}' has undefined spin weight"
            )
        return self._spin

    @property
    def mask(self):
        return self._mask

    @abstractmethod
    async def __call__(self, catalog, *, progress=None):
        """Map a catalogue; returns the finished map with metadata."""


async def aiter_pages(catalog, progress):
    """Async page iterator with progress updates and suspension points."""
    page_size = catalog.page_size
    current, total = 0, catalog.size
    for page in catalog:
        if progress is not None:
            progress.update(current, total)
        await coroutines.sleep()
        yield page
        current += page_size
    await coroutines.sleep()


class _Accumulator:
    """Map accumulation strategy: device scatter when available.

    Pads each page up to a multiple of ``_PAGE_BLOCK`` (zero weights are
    scatter no-ops) so the jitted device kernel sees O(1) static shapes.
    """

    def __init__(self, mapper, *dims, spin=0):
        self._mapper = mapper
        self._spin = spin
        self._device = all(
            hasattr(mapper, attr) for attr in ("begin", "add", "finish")
        )
        if self._device:
            self._state = mapper.begin(*dims, spin=spin)
        else:
            self._state = mapper.create(*dims, spin=spin)

    def add(self, lon, lat, values):
        if not self._device:
            self._mapper.map_values(lon, lat, self._state, values, spin=self._spin)
            return
        n = lon.shape[-1]
        padded = -(-max(n, 1) // _PAGE_BLOCK) * _PAGE_BLOCK
        if padded != n:
            pad = padded - n
            lon = np.pad(lon, (0, pad))
            lat = np.pad(lat, (0, pad))
            values = np.pad(values, [(0, 0)] * (values.ndim - 1) + [(0, pad)])
        self._state = self._mapper.add(self._state, lon, lat, values)

    def result(self):
        if self._device:
            return self._mapper.finish(self._state, spin=self._spin)
        return self._state


class Positions(Field, spin=0):
    """Field of galaxy positions: number counts or overdensity.

    Normalisation and bias ingredients as in reference fields.py:235-315.
    """

    uses = "longitude", "latitude", "[weight]"

    def __init__(self, mapper, *columns, overdensity=True, nbar=None, mask=None):
        super().__init__(mapper, *columns, mask=mask)
        self._overdensity = overdensity
        self._nbar = nbar

    @property
    def overdensity(self):
        return self._overdensity

    @property
    def nbar(self):
        return self._nbar

    @nbar.setter
    def nbar(self, nbar):
        self._nbar = nbar

    async def __call__(self, catalog, *, progress=None):
        if self._overdensity and catalog.visibility is None:
            raise ValueError(
                "cannot compute density contrast: no visibility in catalog"
            )
        mapper = self.mapper_or_error
        *col, wcol = self.columns_or_error
        acc = _Accumulator(mapper, spin=self.spin)

        ngal = 0
        wmean = w2mean = 0.0
        async for page in aiter_pages(catalog, progress):
            if page.size:
                lon, lat = page.get(*col)
                w = page.get(wcol) if wcol is not None else np.ones(page.size)
                acc.add(lon, lat, w)
                ngal += page.size
                wmean += (w - wmean).sum() / ngal
                w2mean += (w**2 - w2mean).sum() / ngal
                del page, lon, lat, w

        pos = acc.result()
        fsky = catalog.fsky if catalog.fsky is not None else 1.0
        npix = 4 * np.pi / mapper.area
        nbar = ngal * wmean / fsky / npix
        if (nbar_given := self._nbar) is not None:
            sigma_nbar = (nbar_given / fsky / npix) ** 0.5
            if abs(nbar - nbar_given) > 3 * sigma_nbar:
                warnings.warn(
                    f"The provided mean density ({nbar_given:g}) differs from "
                    f"the estimated mean density ({nbar:g}) by more than 3 sigma.",
                )
            nbar = nbar_given

        pos /= nbar
        if self._overdensity:
            vis = catalog.visibility
            if vis is not None and vis.size != pos.size:
                warnings.warn("positions and visibility have different size")
                vis = mapper.resample(vis)
            pos -= vis
            del vis

        musq = 1.0
        dens = (nbar / mapper.area) ** 2 / (ngal / (4 * np.pi * fsky)) / w2mean
        update_metadata(pos, catalog, nbar=nbar, musq=musq, dens=dens, fsky=fsky)
        return pos


class ScalarField(Field, spin=0):
    """Weighted scalar values (e.g. magnification, convergence)."""

    uses = "longitude", "latitude", "value", "[weight]"

    async def __call__(self, catalog, *, progress=None):
        mapper = self.mapper_or_error
        *col, wcol = self.columns_or_error
        acc = _Accumulator(mapper, spin=self.spin)

        ngal = 0
        wmean = w2mean = var = 0.0
        async for page in aiter_pages(catalog, progress):
            if wcol is not None:
                page.delete(page[wcol] == 0)
            if page.size:
                lon, lat, v = page.get(*col)
                w = page.get(wcol) if wcol is not None else np.ones(page.size)
                wv = v * w
                acc.add(lon, lat, wv)
                ngal += page.size
                wmean += (w - wmean).sum() / ngal
                w2mean += (w**2 - w2mean).sum() / ngal
                var += (wv**2 - var).sum() / ngal
                del lon, lat, v, w, wv
            del page

        val = acc.result()
        fsky = catalog.fsky if catalog.fsky is not None else 1.0
        wbar = ngal / (4 * np.pi * fsky) * wmean * mapper.area
        val /= wbar
        musq = var / w2mean
        deff = w2mean / wmean**2
        dens = ngal / (4 * np.pi * fsky) / deff
        update_metadata(val, catalog, wbar=wbar, musq=musq, dens=dens, fsky=fsky)
        return val


class ComplexField(Field, spin=0):
    """Two-component (complex) values; spin set by subclasses."""

    uses = "longitude", "latitude", "real", "imag", "[weight]"

    async def __call__(self, catalog, *, progress=None):
        mapper = self.mapper_or_error
        *col, wcol = self.columns_or_error
        acc = _Accumulator(mapper, 2, spin=self.spin)

        ngal = 0
        wmean = w2mean = var = 0.0
        async for page in aiter_pages(catalog, progress):
            if wcol is not None:
                page.delete(page[wcol] == 0)
            if page.size:
                lon, lat, re, im = page.get(*col)
                w = page.get(wcol) if wcol is not None else np.ones(page.size)
                re, im = w * re, w * im
                acc.add(lon, lat, np.stack([re, im]))
                ngal += page.size
                wmean += (w - wmean).sum() / ngal
                w2mean += (w**2 - w2mean).sum() / ngal
                var += (re**2 + im**2 - var).sum() / ngal
                del lon, lat, re, im, w
            del page

        val = acc.result()
        fsky = catalog.fsky if catalog.fsky is not None else 1.0
        wbar = ngal / (4 * np.pi * fsky) * wmean * mapper.area
        val /= wbar
        musq = var / w2mean
        deff = w2mean / wmean**2
        dens = ngal / (4 * np.pi * fsky) / deff
        update_metadata(val, catalog, wbar=wbar, musq=musq, dens=dens, fsky=fsky)
        return val


class Visibility(Field, spin=0):
    """Copy (or resample) the catalogue's visibility map."""

    async def __call__(self, catalog, *, progress=None):
        mapper = self.mapper_or_error
        visibility = catalog.visibility
        if visibility is None:
            raise ValueError("no visibility in catalog")
        out = mapper.create(spin=self.spin)
        if visibility.size != out.size:
            warnings.warn("changing size of visibility map")
            out[:] = mapper.resample(visibility)
        else:
            out[:] = visibility
        update_metadata(out, catalog)
        return out


class Weights(Field, spin=0):
    """Map of the weights themselves."""

    uses = "longitude", "latitude", "[weight]"

    async def __call__(self, catalog, *, progress=None):
        mapper = self.mapper_or_error
        *col, wcol = self.columns_or_error
        acc = _Accumulator(mapper, spin=self.spin)

        ngal = 0
        wmean = w2mean = 0.0
        async for page in aiter_pages(catalog, progress):
            if wcol is not None:
                page.delete(page[wcol] == 0)
            if page.size:
                lon, lat = page.get(*col)
                w = page.get(wcol) if wcol is not None else np.ones(page.size)
                acc.add(lon, lat, w)
                ngal += page.size
                wmean += (w - wmean).sum() / ngal
                w2mean += (w**2 - w2mean).sum() / ngal
                del lon, lat, w
            del page

        wht = acc.result()
        fsky = catalog.fsky if catalog.fsky is not None else 1.0
        wbar = ngal / (4 * np.pi * fsky) * wmean * mapper.area
        wht /= wbar
        musq = 1.0
        deff = w2mean / wmean**2
        dens = ngal / (4 * np.pi * fsky) / deff
        update_metadata(wht, catalog, wbar=wbar, musq=musq, dens=dens, fsky=fsky)
        return wht


class Spin2Field(ComplexField, spin=2):
    """Spin-2 complex field (cosmic shear, ellipticities)."""


Shears = Spin2Field
Ellipticities = Spin2Field


def get_masks(fields, *, comb=None, include=None, exclude=None, append_eb=False):
    """Mask names (or n-combinations) for a set of fields.

    ``include``/``exclude`` filter by *field* keys; with ``append_eb``,
    spin-weighted field keys are expanded to their ``_E``/``_B`` variants
    before filtering (reference fields.py:570-621).
    """
    matches = partial(toc_match, include=include, exclude=exclude)

    def eb_keys(key):
        if append_eb and fields[key].spin != 0:
            return (f"{key}_E", f"{key}_B")
        return (key,)

    if comb is None:
        out = []
        for key, field in fields.items():
            if field.mask is None:
                continue
            if not any(map(matches, eb_keys(key))):
                continue
            out.append(field.mask)
        return out

    out = []
    for keys in combinations_with_replacement(fields, comb):
        masks = tuple(fields[key].mask for key in keys)
        if any(mask is None for mask in masks):
            continue
        if not any(map(matches, product(*map(eb_keys, keys)))):
            continue
        out.append(masks)
    return out
