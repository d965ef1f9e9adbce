"""Device-resident maps with numpy-style dtype metadata.

The reference pipeline's maps are numpy arrays whose dtype carries the
scientific metadata (reference core.py:102-122); every stage hands them
around on the host.  On this TPU build the maps are produced *on the
device* (the scatter accumulators of :mod:`~heracles_tpu.fields`) and
consumed *on the device* (the SHT in :func:`~heracles_tpu.mapping.transform`)
— materialising them on the host in between costs two full transfers per
map across the host<->device boundary (at nside=4096 a single map is
~0.8 GB, and a tomographic pipeline moves dozens).

:class:`DeviceMap` keeps the pixel data on the device while quacking
like the numpy maps everywhere the pipeline touches them:

* ``dtype`` is a real ``np.dtype`` carrying the metadata, and it is
  *settable*, so :func:`heracles_tpu.core.update_metadata` works on it
  unchanged;
* in-place arithmetic (``/= nbar``, ``-= visibility``, ``*= mask``)
  rebinds the underlying (immutable) jax array to the device result;
* ``np.asarray(m)`` materialises the pixels on the host on demand
  (e.g. when writing maps to FITS).

Opt in per mapper: ``HealpixMapper(nside, lmax, device_maps=True)``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["DeviceMap"]


class DeviceMap:
    """A device-resident map array + numpy dtype metadata."""

    __slots__ = ("_array", "_dtype")

    def __init__(self, array, metadata=None, dtype=None):
        self._array = array
        if dtype is not None:
            self._dtype = np.dtype(dtype)
        else:
            base = np.dtype(array.dtype)
            self._dtype = np.dtype(
                base.str, metadata=dict(metadata) if metadata else None
            )

    # -- numpy-protocol surface -------------------------------------------

    @property
    def array(self):
        """The underlying jax array (device-resident)."""
        return self._array

    @property
    def dtype(self):
        return self._dtype

    @dtype.setter
    def dtype(self, dt):
        dt = np.dtype(dt)
        if dt.itemsize != self._dtype.itemsize or dt.kind != self._dtype.kind:
            raise ValueError(
                f"cannot set dtype {dt!r} on a {self._dtype!r} DeviceMap"
            )
        self._dtype = dt

    @property
    def metadata(self):
        return dict(self._dtype.metadata or {})

    @property
    def shape(self):
        return tuple(self._array.shape)

    @property
    def ndim(self):
        return self._array.ndim

    @property
    def size(self):
        return int(np.prod(self._array.shape)) if self._array.shape else 1

    def __len__(self):
        return self._array.shape[0]

    def __array__(self, dtype=None, copy=None):
        if np.issubdtype(self._dtype.base, np.complexfloating):
            # complex arrays cannot cross the device transfer boundary
            # on some TPU transports: move the real/imag planes
            out = np.asarray(self._array.real).astype(self._dtype.base)
            out.imag = np.asarray(self._array.imag)
        else:
            out = np.asarray(self._array)
        if dtype is not None:
            return out.astype(dtype)
        # re-attach the metadata-tagged dtype on the host copy
        out = np.array(out)
        try:
            out.dtype = self._dtype
        except (ValueError, TypeError):  # pragma: no cover - defensive
            pass
        return out

    def __repr__(self):
        return (
            f"DeviceMap(shape={self.shape}, dtype={self._dtype.str}, "
            f"metadata={self.metadata})"
        )

    # -- arithmetic (device-side; in-place rebinds the jax array) ---------

    def _coerce(self, other):
        import jax.numpy as jnp

        if isinstance(other, DeviceMap):
            return other._array
        if isinstance(other, np.ndarray):
            return jnp.asarray(other, self._array.dtype)
        return other

    def _rebind(self, array):
        self._array = array
        return self

    def __itruediv__(self, other):
        return self._rebind(self._array / self._coerce(other))

    def __imul__(self, other):
        return self._rebind(self._array * self._coerce(other))

    def __isub__(self, other):
        return self._rebind(self._array - self._coerce(other))

    def __iadd__(self, other):
        return self._rebind(self._array + self._coerce(other))

    def _new(self, array):
        return DeviceMap(array, dtype=self._dtype)

    def __truediv__(self, other):
        return self._new(self._array / self._coerce(other))

    def __mul__(self, other):
        return self._new(self._array * self._coerce(other))

    __rmul__ = __mul__

    def __sub__(self, other):
        return self._new(self._array - self._coerce(other))

    def __add__(self, other):
        return self._new(self._array + self._coerce(other))

    __radd__ = __add__

    def __getitem__(self, idx):
        return self._new(self._array[idx])

    def __deepcopy__(self, memo):
        # jax arrays are immutable and in-place ops rebind, so sharing
        # the buffer is safe
        return DeviceMap(self._array, dtype=self._dtype)

    def __copy__(self):
        return DeviceMap(self._array, dtype=self._dtype)

    def block_until_ready(self):
        self._array.block_until_ready()
        return self
