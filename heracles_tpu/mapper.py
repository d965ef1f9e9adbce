"""Backend-neutral mapper protocol.

Mirrors the reference protocol (``/root/reference/heracles/mapper.py:34-74``):
a mapper turns catalogue points into a map-like product (``create`` +
``map_values``), provides the harmonic ``transform`` and ``resample``.

The TPU build adds an optional *device accumulation interface*
(``begin``/``add``/``finish``) that the mapping pipeline uses when present:
the map lives on the accelerator across catalogue pages and points are
scatter-added under jit, instead of the reference's per-page numba
scatter into host memory (reference healpy.py:58-65).
"""

from __future__ import annotations

from typing import Any, Protocol, runtime_checkable

__all__ = ["Mapper"]


@runtime_checkable
class Mapper(Protocol):
    """Protocol for mappers."""

    @property
    def area(self) -> float:
        """Effective area in steradians of one "pixel" of this mapper."""

    def create(self, *dims: int, spin: int = 0) -> Any:
        """Create a new map for this mapper."""

    def map_values(self, lon, lat, data, values, spin: int = 0) -> None:
        """Add values at positions (lon, lat) to data, in place."""

    def transform(self, data, spin: int = 0) -> Any:
        """The spherical harmonic transform for this mapper."""

    def resample(self, data) -> Any:
        """Change resolution of data, which must be in this mapper's format."""
