"""HEALPix and discrete (pixel-free) mappers, TPU-native.

Capability parity with the reference's two mapper backends:

* :class:`HealpixMapper` — the role of the healpy-backed mapper
  (``/root/reference/heracles/healpy.py:68-209``): pixel scatter-add of
  catalogue points, spin-0/2 map2alm with quadrature weights, optional
  pixel-window deconvolution, ud_grade resampling.  Here the SHT is the
  JAX ring-FFT + Wigner-scan engine (:mod:`heracles_tpu.ops.sht`) and the
  scatter is a jitted device scatter-add instead of a numba loop.
* :class:`DiscreteMapper` — the role of the ducc0-backed pixel-free mapper
  (``/root/reference/heracles/ducc.py:40-162``): accumulates alms directly
  from point positions via adjoint synthesis at arbitrary locations,
  identity ``transform``, triangle re-truncation ``resample``.

Both expose the device accumulation interface (``begin``/``add``/
``finish``) used by the mapping pipeline to keep accumulators on the
accelerator across catalogue pages.
"""

from __future__ import annotations

import functools
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from .core import update_metadata
from .healpix import ang2pix_ring, nside2npix, nside2pixarea, ud_grade
from .ops import sht

__all__ = ["HealpixMapper", "DiscreteMapper"]


@functools.lru_cache(maxsize=32)
def _scatter_fn(nside):
    """Jitted scatter-add of page values into a device-resident map."""

    @functools.partial(jax.jit, donate_argnums=0)
    def scatter(state, lon, lat, values):
        ipix = ang2pix_ring(nside, lon, lat, lonlat=True, xp=jnp)
        return state.at[..., ipix].add(values)

    return scatter


class HealpixMapper:
    """Mapper for HEALPix maps (TPU-native SHT backend).

    Parameters mirror the reference mapper: ``lmax`` defaults to
    ``3*nside//2`` and ``deconvolve`` (pixel-window deconvolution of the
    alms) defaults to True (reference healpy.py:87-89).
    """

    # kept for CLI compatibility with the reference (--healpix-datapath);
    # unused: quadrature weights are computed, not read from data files
    DATAPATH: str | None = None

    # transform() accepts leading batch axes (mapping.transform groups
    # same-shape maps into stacked SHT dispatches)
    batched_transform = True

    def __init__(self, nside, lmax=None, *, deconvolve=None, dtype=np.float64,
                 device_maps=False, dd=None, iterations=0):
        self._nside = int(nside)
        self._lmax = sht.resolve_lmax(nside, lmax)
        self._deconv = True if deconvolve is None else bool(deconvolve)
        self._dtype = np.dtype(dtype)
        # device_maps=True: finish() keeps the accumulated map on the
        # device as a DeviceMap — the pipeline's maps->alms hand-off then
        # never crosses the host<->device boundary (~1.6 GB round trip
        # per nside=4096 map otherwise)
        self._device_maps = bool(device_maps)
        # accuracy knobs, threaded into every analysis this mapper runs:
        # dd — True: double-single f32 recurrence (f64-class accuracy on
        # TPU, ~2-4x the SHT cost); "comp": x-truncation-corrected
        # recurrence (~1.5x, removes the dominant systematic top-band
        # error; see ops/sht._use_dd); default: HERACLES_TPU_SHT_DD;
        # iterations — Jacobi refinement steps (healpy's iter= analog)
        self._dd = dd
        self._iterations = int(iterations)

    @property
    def nside(self):
        return self._nside

    @property
    def lmax(self):
        return self._lmax

    @property
    def deconvolve(self):
        return self._deconv

    @cached_property
    def area(self):
        return nside2pixarea(self._nside)

    def _metadata(self, spin):
        return dict(
            geometry="healpix",
            kernel="healpix",
            nside=self._nside,
            lmax=self._lmax,
            deconv=self._deconv,
            spin=spin,
        )

    def create(self, *dims, spin=0):
        m = np.zeros((*dims, nside2npix(self._nside)), dtype=self._dtype)
        update_metadata(m, **self._metadata(spin))
        return m

    # -- protocol scatter path (host in-place semantics) ------------------

    def map_values(self, lon, lat, data, values, spin=0):
        """Add values at (lon, lat) [degrees] into ``data`` in place."""
        ipix = np.asarray(ang2pix_ring(self._nside, lon, lat, lonlat=True))
        if data.ndim == 1:
            data += np.bincount(ipix, weights=values, minlength=data.shape[-1])
        else:
            for i in np.ndindex(*data.shape[:-1]):
                data[i] += np.bincount(
                    ipix, weights=values[i], minlength=data.shape[-1]
                )

    # -- device accumulation interface ------------------------------------

    def begin(self, *dims, spin=0):
        """Device-resident zero accumulator for the mapping pipeline."""
        dt = jnp.float64 if self._dtype == np.float64 else jnp.float32
        return jnp.zeros((*dims, nside2npix(self._nside)), dtype=dt)

    def add(self, state, lon, lat, values):
        """Scatter-add one (padded) page of points into the accumulator."""
        return _scatter_fn(self._nside)(state, lon, lat, values)

    def finish(self, state, spin=0):
        if self._device_maps:
            from .devicemap import DeviceMap

            return DeviceMap(state, metadata=self._metadata(spin))
        # np.array (not asarray): jax buffers are read-only, fields mutate
        m = np.array(state, dtype=self._dtype)
        update_metadata(m, **self._metadata(spin))
        return m

    # -- harmonic transform ------------------------------------------------

    def _fl_packed(self, spin):
        """Packed (nlm,) pixel-window deconvolution filter, host f64."""
        s = abs(spin)
        # spin-2 maps deconvolve with the polarization window, like
        # the reference's hp.pixwin(pol=True)[1] (healpy.py:173-178)
        pw = sht.pixel_window(self._nside, self._lmax, pol=(s == 2))
        if s == 2:
            pw = pw[1]
        fl = np.ones(self._lmax + 1)
        fl[s:] /= pw[s:]
        ls, _ = sht._pack_index(self._lmax, self._lmax)
        return fl[ls]

    def _fl_packed_dev(self, spin, dtype):
        """Device-cached deconvolution filter (uploaded once per spin)."""
        cache = getattr(self, "_fl_dev_cache", None)
        if cache is None:
            cache = self._fl_dev_cache = {}
        key = (abs(spin), np.dtype(dtype).str)
        if key not in cache:
            cache[key] = jax.device_put(
                jnp.asarray(self._fl_packed(spin), dtype)
            )
        return cache[key]

    def _finish_alm(self, alm, md, spin):
        """Shared post-processing: pixel-window deconvolution + metadata."""
        if isinstance(alm, jax.Array):
            # device-resident output: deconvolve on the device and keep
            # the alms in HBM (DeviceMap wrapper carries the metadata)
            from .devicemap import DeviceMap

            if self._deconv:
                alm = alm * self._fl_packed_dev(spin, alm.real.dtype)
            return DeviceMap(
                alm, metadata={**md, "deconv": self._deconv}
            )
        if self._deconv:
            alm = alm * self._fl_packed(spin)
        alm = np.ascontiguousarray(alm)
        update_metadata(alm, **{**md, "deconv": self._deconv})
        return alm

    def transform(self, data, spin=0, *, metadata=None):
        """Spin-0/2 spherical harmonic analysis with quadrature weights.

        Spin-0 input may carry leading batch axes; spin-2 input is
        (..., 2, npix) [Q, U] and returns (..., 2, nlm) (E, B), matching
        the reference's dropped-T-row convention (healpy.py:175-199).

        ``data`` may be a device-resident ``jax.Array`` (it is fed to the
        SHT without a host round-trip); scientific metadata then comes
        from ``metadata`` since jax arrays carry no dtype metadata.
        """
        from .devicemap import DeviceMap

        if isinstance(data, DeviceMap):
            md = {**data.metadata, **(metadata or {})}
            arr = data.array
        elif isinstance(data, jax.Array):
            md = dict(metadata or {})
            arr = data
        else:
            md = dict(getattr(data.dtype, "metadata", None) or {})
            md.update(metadata or {})
            arr = np.asarray(data)
        if self._device_maps and isinstance(arr, jax.Array):
            # keep the alms on the device end to end
            chirps = sht._host_chirps(
                arr.shape[-1], self._lmax, None, arr.dtype, from_npix=True
            )
            synth_chirps = (
                sht._host_chirps(arr.shape[-1], self._lmax, None, arr.dtype,
                                 from_npix=True, kind="synthesis")
                if self._iterations else None
            )
            alm = sht.map2alm_jit(
                arr, lmax=self._lmax, spin=spin, weights="ring",
                fft_chirps=chirps, fft_chirps_synth=synth_chirps,
                dd=self._dd, iterations=self._iterations,
            )
        else:
            alm = sht.map2alm_host(arr, lmax=self._lmax, spin=spin,
                                   weights="ring", dd=self._dd,
                                   iterations=self._iterations)
        return self._finish_alm(alm, md, spin)

    def transform_resident(self, data, spin=0, *, metadata=None):
        """Analysis with device-resident output, regardless of the
        mapper's ``device_maps`` setting.

        Returns a :class:`DeviceMap` of packed alms that never crosses
        the host boundary (the DICES device cache keeps all region alms
        in HBM and assembles delete-k samples on the device).
        """
        from .devicemap import DeviceMap

        if isinstance(data, DeviceMap):
            md = {**data.metadata, **(metadata or {})}
            arr = data.array
        elif isinstance(data, jax.Array):
            md = dict(metadata or {})
            arr = data
        else:
            md = dict(getattr(data.dtype, "metadata", None) or {})
            md.update(metadata or {})
            arr = jnp.asarray(np.asarray(data))
        chirps = sht._host_chirps(
            arr.shape[-1], self._lmax, None, arr.dtype, from_npix=True
        )
        synth_chirps = (
            sht._host_chirps(arr.shape[-1], self._lmax, None, arr.dtype,
                             from_npix=True, kind="synthesis")
            if self._iterations else None
        )
        alm = sht.map2alm_jit(
            arr, lmax=self._lmax, spin=spin, weights="ring",
            fft_chirps=chirps, fft_chirps_synth=synth_chirps,
            dd=self._dd, iterations=self._iterations,
        )
        if self._deconv:
            alm = alm * self._fl_packed_dev(spin, alm.real.dtype)
        return DeviceMap(alm, metadata={**md, "deconv": self._deconv})

    def transform_async(self, data, spin=0, *, metadata=None):
        """Dispatch the analysis and start an async alm readback.

        Returns a zero-argument callable delivering the same host alms
        as :meth:`transform` (host path).  DICES uses this to overlap
        batch k's tunnel readback with batch k+1's SHT dispatch.
        """
        from .devicemap import DeviceMap

        if isinstance(data, DeviceMap):
            md = {**data.metadata, **(metadata or {})}
            arr = data.array
        elif isinstance(data, jax.Array):
            md = dict(metadata or {})
            arr = data
        else:
            md = dict(getattr(data.dtype, "metadata", None) or {})
            md.update(metadata or {})
            arr = np.asarray(data)
        handle = sht.map2alm_async(
            arr, lmax=self._lmax, spin=spin, weights="ring",
            dd=self._dd, iterations=self._iterations,
        )
        return lambda: self._finish_alm(handle(), md, spin)

    def transform_sharded(self, mesh, data, spin=0):
        """Batched analysis sharded over a device mesh (public mesh path).

        ``data``: (B, npix) spin-0 or (B, 2, npix) [Q, U] stacked maps;
        the batch shards over the mesh's "batch" axis and each
        transform's harmonic orders over its "m" axis (SURVEY section
        2.3's two first-class axes).  Returns packed alms (B[, 2], nlm)
        identical to :meth:`transform` of the same stack.
        """
        from . import parallel

        md = dict(getattr(data.dtype, "metadata", None) or {})
        arr = np.asarray(data)
        nb = mesh.shape["batch"]
        B = arr.shape[0]
        pad = (-B) % nb
        if pad:
            arr = np.concatenate(
                [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)]
            )
        spec = parallel.P(*(("batch",) + (None,) * (arr.ndim - 1)))
        dev = jax.device_put(
            jnp.asarray(arr), parallel.NamedSharding(mesh, spec)
        )
        rect = parallel.map2alm_sharded(
            mesh, dev, self._lmax, spin=spin, weights="ring", dd=self._dd
        )
        re, im = jax.device_get((jnp.real(rect), jnp.imag(rect)))
        rect_np = (re + 1j * im)[..., : self._lmax + 1]
        alm = sht.pack_alm(rect_np, self._lmax, self._lmax)[:B]
        return self._finish_alm(alm, md, spin)

    def synthesize(self, alm, spin=0):
        """Inverse transform (alm -> map); the TPU build's alm2map."""
        out = sht.alm2map_host(alm, self._nside, lmax=self._lmax,
                               spin=spin)
        m = out.astype(self._dtype)
        update_metadata(m, **self._metadata(spin))
        return m

    def synthesize_sharded(self, mesh, alm, spin=0):
        """Batched synthesis sharded over a device mesh.

        Inverse of :meth:`transform_sharded`: ``alm`` is a (B, nlm)
        (spin 0) or (B, 2, nlm) [E, B] packed stack; bins shard over
        "batch" and each synthesis' harmonic orders over "m".  Returns
        (B, npix) / (B, 2, npix) maps identical to :meth:`synthesize`
        of the same stack.
        """
        from . import parallel

        alm = np.asarray(alm)
        rect = sht.unpack_alm(alm, self._lmax, self._lmax)
        nb = mesh.shape["batch"]
        B = rect.shape[0]
        pad = (-B) % nb
        if pad:
            rect = np.concatenate(
                [rect, np.zeros((pad,) + rect.shape[1:], rect.dtype)]
            )
        # complex arrays cannot cross some TPU transports: ship the
        # re/im planes and combine on device
        fdt = np.float32 if rect.dtype == np.complex64 else None
        re = jnp.asarray(np.ascontiguousarray(rect.real, dtype=fdt))
        im = jnp.asarray(np.ascontiguousarray(rect.imag, dtype=fdt))
        rect_dev = jax.jit(jax.lax.complex)(re, im)
        maps = parallel.alm2map_sharded(
            mesh, rect_dev, self._nside, lmax=self._lmax,
            spin=spin, dd=self._dd,
        )
        out = np.asarray(jax.device_get(maps))[:B].astype(self._dtype)
        update_metadata(out, **self._metadata(spin))
        return out

    def resample(self, data):
        """Change resolution of a HEALPix map (mean-of-children degrade)."""
        md = dict(getattr(data.dtype, "metadata", None) or {})
        out = np.asarray(ud_grade(np.asarray(data), self._nside)).astype(self._dtype)
        md["nside"] = self._nside
        update_metadata(out, **md)
        return out


class DiscreteMapper:
    """Pixel-free mapper accumulating alms directly from point positions.

    The adjoint spherical-harmonic synthesis at arbitrary locations
    (reference ducc.py:92-133 via ``ducc0.sht.adjoint_synthesis_general``)
    is computed with the same Wigner scan engine as the gridded SHT, with
    points taking the place of rings:

        a_lm += sum_p v_p * conj(sYlm(theta_p, phi_p))

    Two paths, selected by ``method``:

    * ``"exact"`` — the per-point Wigner scan, O(N * lmax^2): exact to
      working precision, best at small-to-moderate N;
    * ``"gridded"`` — NUFFT-style kernel spreading + torus reduction
      (:mod:`heracles_tpu.ops.nufft`), O(N * w^2) per point: the large-N
      path, accurate to ``epsilon`` like the reference's
      ``ducc0.sht.adjoint_synthesis_general`` (ducc.py:108-128);
    * ``"auto"`` (default) — gridded once N * lmax^2 passes the measured
      crossover, exact below it.

    ``epsilon`` defaults per the reference's dtype rule (ducc.py:108-115):
    1e-12 for float64 values, 1e-5 for float32.
    """

    def __init__(self, lmax, *, dtype=np.complex128, nthreads=0,
                 point_block=1 << 16, epsilon=None, method="auto"):
        self._lmax = int(lmax)
        self._dtype = np.dtype(dtype)
        self._point_block = int(point_block)
        self._epsilon = epsilon
        if method not in ("auto", "exact", "gridded"):
            raise ValueError(f"unknown method: {method!r}")
        self._method = method

    @property
    def lmax(self):
        return self._lmax

    @property
    def area(self):
        return 1.0

    def create(self, *dims, spin=0):
        lmax = self._lmax
        m = np.zeros((*dims, (lmax + 1) * (lmax + 2) // 2), dtype=self._dtype)
        update_metadata(
            m, geometry="discrete", kernel="none", lmax=lmax, spin=spin
        )
        return m

    def map_values(self, lon, lat, data, values, spin=0):
        values = np.asarray(values)
        flatten = values.ndim == 1
        if flatten:
            values = values.reshape(1, -1)
        # reference dtype rule (ducc.py:108-115)
        epsilon = self._epsilon
        if epsilon is None:
            epsilon = 1e-5 if values.dtype == np.float32 else 1e-12
        theta = np.radians(90.0 - np.asarray(lat, dtype=np.float64))
        phi = np.radians(np.asarray(lon, dtype=np.float64) % 360.0)
        method = self._method
        if method == "auto":
            # the exact path scans npts pseudo-rings at O(lmax^2) each;
            # the gridded path scans the 2(lmax+1)-row coarse grid plus
            # an O(npts w^2) spread.  Measured on CPU the break-even is
            # a few hundred points at any production lmax (gridded
            # 0.27 s vs exact 12.9 s at 2e3 points, lmax=200), so exact
            # only wins for point sets smaller than ~4 coarse rings.
            method = (
                "gridded"
                if theta.size > 4 * (self._lmax + 1)
                else "exact"
            )
        if method == "gridded":
            alm = self._adjoint_gridded(theta, phi, values, spin, epsilon)
        else:
            alm = self._adjoint_synthesis(theta, phi, values, spin)
        data += alm[0] if flatten else alm

    def _adjoint_gridded(self, theta, phi, values, spin, epsilon):
        from .ops import nufft

        f32 = self._dtype == np.complex64
        alm = nufft.adjoint_gridded(
            theta, phi, values, self._lmax, spin=spin, epsilon=epsilon,
            f32=f32,
        )
        if spin:
            alm = alm.reshape(values.shape[0], -1)
        return alm.astype(self._dtype)

    # -- paged accumulation (mapping pipeline) ---------------------------
    #
    # The gridded path's fixed reduce cost is paid ONCE per catalogue by
    # accumulating the spread torus grid across pages (the exact path
    # accumulates alms per page, same result).  Mirrors the reference's
    # per-page ducc calls (ducc.py:92-133) but with O(N * w^2) spreading.

    def begin(self, *dims, spin=0):
        epsilon = self._epsilon
        if epsilon is None:
            epsilon = 1e-5 if self._dtype == np.complex64 else 1e-12
        method = self._method
        if method == "auto":
            # paged catalogues are large by construction: the gridded
            # accumulator (one padded scratch across pages) beats the
            # per-page exact scan at any production lmax
            method = "gridded"
        state = {"spin": spin, "dims": dims, "epsilon": epsilon,
                 "method": method}
        if method == "exact":
            state["alm"] = self.create(*dims, spin=spin)
        else:
            from .ops import nufft

            nrows = 1 if spin else max(1, int(np.prod(dims, dtype=int)))
            state["w"] = nufft.kernel_width(epsilon)
            if nufft._native_spread() is not None:
                # padded scratch kept across pages; folded once in
                # finish() (per-page folding costs O(grid) per page)
                state["pad"] = nufft.alloc_padded(
                    nrows, self._lmax, state["w"], bool(spin)
                )
            else:
                ntheta, nphi = nufft.grid_shape(self._lmax)
                state["grid"] = np.zeros(
                    (nrows, ntheta, nphi),
                    np.complex128 if spin else np.float64,
                )
        return state

    def add(self, state, lon, lat, values):
        if state["method"] == "exact":
            self.map_values(lon, lat, state["alm"], values,
                            spin=state["spin"])
            return state
        values = np.asarray(values)
        if values.ndim == 1:
            values = values.reshape(1, -1)
        from .ops import nufft

        theta = np.radians(90.0 - np.asarray(lat, dtype=np.float64))
        phi = np.radians(np.asarray(lon, dtype=np.float64) % 360.0)
        if state["spin"]:
            vals = (values[0] + 1j * values[1]).reshape(1, -1)
        else:
            vals = values.astype(np.float64, copy=False)
        if "pad" in state:
            nufft.spread_padded(theta, phi, vals, self._lmax, state["w"],
                                state["pad"])
        else:
            nufft.spread_torus(theta, phi, vals, self._lmax, state["w"],
                               grid=state["grid"])
        return state

    def finish(self, state, spin=0):
        # the authoritative spin is the one recorded by begin(): a
        # default-argument finish(state) on a spin-2 state must not take
        # the real-grid spin-0 reduction branch on a complex grid
        spin = state["spin"]
        if state["method"] == "exact":
            return state["alm"]
        from .ops import nufft

        if "pad" in state:
            state["grid"] = nufft.fold_padded(
                state.pop("pad"), self._lmax, state["w"], bool(spin)
            )
        alm = nufft.adjoint_gridded(
            None, None,
            np.empty((state["grid"].shape[0], 0),
                     state["grid"].dtype),
            self._lmax, spin=spin, epsilon=state["epsilon"],
            f32=self._dtype == np.complex64, grid=state["grid"],
        )
        if spin:
            alm = alm.reshape(2, -1)
        out = alm.astype(self._dtype).reshape(
            tuple(state["dims"]) + alm.shape[-1:]
        )
        out = np.ascontiguousarray(out)
        update_metadata(
            out, geometry="discrete", kernel="none", lmax=self._lmax,
            spin=spin,
        )
        return out

    def _adjoint_synthesis(self, theta, phi, values, spin):
        lmax = self._lmax
        use64 = self._dtype == np.complex128
        fdt = np.float64 if use64 else np.float32
        out = np.zeros(
            (values.shape[0], (lmax + 1) * (lmax + 2) // 2),
            dtype=np.complex128 if use64 else np.complex64,
        )
        B = self._point_block
        for start in range(0, theta.size, B):
            th = theta[start : start + B]
            ph = phi[start : start + B]
            npts = th.size
            if npts < B and theta.size > B:
                th = np.pad(th, (0, B - npts), constant_values=np.pi / 2)
                ph = np.pad(ph, (0, B - npts))
            pad = th.size - npts
            # point geometry in host f64: the seed exponents multiply the
            # log terms by m, so device-f32 trig error (absolute floors on
            # the TPU VPU) would be amplified to O(m * eps) in the alms.
            # The pole clamp matches the ring engine's padding convention
            # (orders m > 0 underflow to exactly zero there).
            geom = _point_geometry(th, fdt)
            if spin == 0:
                v = values[:, start : start + B].astype(fdt)
                if pad:
                    v = np.pad(v, ((0, 0), (0, pad)))
                planes = np.asarray(
                    _adjoint_spin0(*geom, jnp.asarray(ph.astype(fdt)),
                                   jnp.asarray(v), lmax)
                )
                out += planes[0] + 1j * planes[1]
            else:
                # values rows are (2, npts): combine to complex
                u = (values[0, start : start + B]
                     + 1j * values[1, start : start + B]).astype(
                    np.complex128 if use64 else np.complex64
                )[None]
                if pad:
                    u = np.pad(u, ((0, 0), (0, pad)))
                planes = np.asarray(
                    _adjoint_spin(*geom, jnp.asarray(ph.astype(fdt)),
                                  jnp.asarray(np.ascontiguousarray(u.real)),
                                  jnp.asarray(np.ascontiguousarray(u.imag)),
                                  lmax, spin)
                )
                eb = planes[0] + 1j * planes[1]
                out += eb.reshape(out.shape)
        return out.astype(self._dtype)

    def adjoint_synthesis_sharded(self, mesh, theta, phi, values, spin=0):
        """Point adjoint with the point axis sharded over a device mesh.

        The exact point adjoint is embarrassingly parallel over points:
        every device runs the same point-block kernels on its shard and
        a single ``psum`` over all mesh axes combines the partial alms
        (the per-point contributions sum linearly).  Zero-valued padding
        points at theta = pi/2 contribute exactly nothing, matching the
        host block path's convention.  Returns packed alms like
        :meth:`_adjoint_synthesis`.
        """
        from functools import partial as _partial

        from jax.sharding import NamedSharding, PartitionSpec as P

        lmax = self._lmax
        use64 = self._dtype == np.complex128
        fdt = np.float64 if use64 else np.float32
        axes = tuple(mesh.axis_names)
        ndev = int(np.prod([mesh.shape[a] for a in axes]))
        theta = np.asarray(theta, np.float64)
        phi = np.asarray(phi, np.float64)
        values = np.atleast_2d(np.asarray(values))
        npts = theta.size
        npad = -(-npts // ndev) * ndev
        pad = npad - npts
        th = np.pad(theta, (0, pad), constant_values=np.pi / 2)
        ph = np.pad(phi, (0, pad)).astype(fdt)
        v = np.pad(values, ((0, 0),) * (values.ndim - 1) + ((0, pad),))
        geom = _point_geometry(th, fdt)
        shard = NamedSharding(mesh, P(axes))
        geom_dev = tuple(jax.device_put(jnp.asarray(g), shard) for g in geom)
        ph_dev = jax.device_put(jnp.asarray(ph), shard)
        vspec = P(*((None,) * (v.ndim - 1) + (axes,)))
        if spin == 0:
            v_dev = jax.device_put(
                jnp.asarray(v.astype(fdt)), NamedSharding(mesh, vspec)
            )

            @_partial(jax.shard_map, mesh=mesh,
                      in_specs=(P(axes),) * 6 + (vspec,),
                      out_specs=P(), check_vma=False)
            def local(x, lc, ls, lcl, lsl, p, vl):
                planes = _adjoint_spin0(x, lc, ls, lcl, lsl, p, vl, lmax)
                return jax.lax.psum(planes, axes)

            planes = np.asarray(local(*geom_dev, ph_dev, v_dev))
            out = planes[0] + 1j * planes[1]
        else:
            u = (v[0] + 1j * v[1]).astype(
                np.complex128 if use64 else np.complex64
            )[None]
            u_re = jax.device_put(
                jnp.asarray(np.ascontiguousarray(u.real)),
                NamedSharding(mesh, P(None, axes)),
            )
            u_im = jax.device_put(
                jnp.asarray(np.ascontiguousarray(u.imag)),
                NamedSharding(mesh, P(None, axes)),
            )

            @_partial(jax.shard_map, mesh=mesh,
                      in_specs=(P(axes),) * 6 + (P(None, axes),) * 2,
                      out_specs=P(), check_vma=False)
            def local(x, lc, ls, lcl, lsl, p, ur, ui):
                planes = _adjoint_spin(x, lc, ls, lcl, lsl, p, ur, ui,
                                       lmax, spin)
                return jax.lax.psum(planes, axes)

            planes = np.asarray(local(*geom_dev, ph_dev, u_re, u_im))
            eb = planes[0] + 1j * planes[1]
            out = eb.reshape((2, -1))
        return out.astype(self._dtype)

    def transform(self, data, spin=0):
        """Identity: the data already are alms (reference ducc.py:135-143)."""
        return data

    def resample(self, data):
        """Re-truncate/pad packed alms to this mapper's lmax triangle."""
        *dims, n = data.shape
        lmax_in = (int((8 * n + 1) ** 0.5 + 0.01) - 3) // 2
        lmax_out = self._lmax
        lmax = min(lmax_in, lmax_out)
        out = np.zeros(
            (*dims, (lmax_out + 1) * (lmax_out + 2) // 2), dtype=self._dtype
        )
        i = j = 0
        for m in range(lmax + 1):
            out[..., j : j + lmax - m + 1] = data[..., i : i + lmax - m + 1]
            i += lmax_in - m + 1
            j += lmax_out - m + 1
        return out


def _point_geometry(theta, fdt):
    """(x, logch, logsh, logch_lo, logsh_lo) of point colatitudes.

    Host f64, pole-clamped; the *_lo residuals feed the Pallas kernels'
    compensated seed evaluation (the seed exponents multiply the logs by
    the harmonic order m, amplifying any f32 rounding).
    """
    th = np.asarray(theta, dtype=np.float64)
    x = np.cos(th)
    with np.errstate(divide="ignore"):
        logch = np.maximum(np.log(np.abs(np.cos(th / 2))), -1e4)
        logsh = np.maximum(np.log(np.abs(np.sin(th / 2))), -1e4)
    hi_ch = logch.astype(np.float32)
    hi_sh = logsh.astype(np.float32)
    lo_ch = (logch - hi_ch.astype(np.float64)).astype(np.float32)
    lo_sh = (logsh - hi_sh.astype(np.float64)).astype(np.float32)
    return (jnp.asarray(x.astype(fdt)), jnp.asarray(logch.astype(fdt)),
            jnp.asarray(logsh.astype(fdt)), jnp.asarray(lo_ch),
            jnp.asarray(lo_sh))


@functools.partial(jax.jit, static_argnames=("lmax",))
def _adjoint_spin0(x, logch, logsh, logch_lo, logsh_lo, phi, values, lmax):
    """a_lm = sum_p v_p conj(Ylm(p)) for real spin-0 point values.

    Point geometry (``x = cos(theta)`` and the half-angle logs) is
    precomputed on the host (see :func:`_point_geometry`).  Returns
    stacked (2, ..., nlm) real/imag planes (complex arrays cannot cross
    jit boundaries on some TPU transports).
    """
    nm = lmax + 1
    nm_pad = sht._mmax_pad(lmax, sht.DEFAULT_M_CHUNK)
    m = jnp.arange(nm_pad)
    # F[p, m] = v_p e^{-im phi_p}: the "ring FFT" of a single point
    F = values[..., :, None] * jnp.exp(-1j * m * phi.dtype.type(1.0) * phi[:, None])
    (alm,) = sht._analysis_rect_points(
        (F,), x, logch, logsh, lmax, (0,), sht.DEFAULT_M_CHUNK,
        geom_lo=(logch_lo, logsh_lo),
    )
    packed = sht.pack_alm(alm[..., :nm], lmax, lmax)
    return jnp.stack([packed.real, packed.imag])


@functools.partial(jax.jit, static_argnames=("lmax", "spin"))
def _adjoint_spin(x, logch, logsh, logch_lo, logsh_lo, phi, u_re, u_im,
                  lmax, spin):
    """(E, B) alms from complex spin-s point values u = v1 + i v2.

    Point geometry precomputed on the host (see :func:`_point_geometry`).
    Takes/returns real planes (complex arrays cannot cross jit boundaries
    on some TPU transports).
    """
    u = u_re + 1j * u_im
    nm = lmax + 1
    nm_pad = sht._mmax_pad(lmax, sht.DEFAULT_M_CHUNK)
    m = jnp.arange(nm_pad)
    phase = jnp.exp(-1j * m * phi[:, None])
    F = u[..., :, None] * phase
    Fc = jnp.conj(u)[..., :, None] * phase
    a_p, a_m = sht._analysis_rect_points(
        (F, Fc), x, logch, logsh, lmax, (spin, -spin),
        sht.DEFAULT_M_CHUNK, geom_lo=(logch_lo, logsh_lo),
    )
    alm_e = -(a_p[..., :nm] + a_m[..., :nm]) / 2
    alm_b = 1j * (a_p[..., :nm] - a_m[..., :nm]) / 2
    packed = sht.pack_alm(jnp.stack([alm_e, alm_b], axis=-3), lmax, lmax)
    return jnp.stack([packed.real, packed.imag])
