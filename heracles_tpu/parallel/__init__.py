"""Multi-chip scaling: device meshes and the sharded SHT pipeline step.

The reference has no distributed backend at all (SURVEY.md section 2.3) —
its scaling story is one process per file.  The TPU-native framework
scales with `jax.sharding` over a two-axis mesh:

* ``"batch"`` — tomographic bins / fields / jackknife regions.  Pure data
  parallelism: every map's transform is independent; no communication.
* ``"m"`` — the SHT's harmonic order axis.  Model parallelism *within* a
  single transform: each device runs the ring FFT on its (replicated)
  map block and the Wigner-d scan for its contiguous block of m-orders
  only; spectra reduce over m with a single ``psum`` on the ICI.

This mirrors the sequence-parallel pattern of FFT-based attention: local
heavy recurrences per shard, one small collective at the end.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..healpix import nside2npix, npix2nside
from ..ops import ringfft, sht, wigner

__all__ = ["make_mesh", "example_batch", "pipeline_step", "map2alm_sharded"]


def make_mesh(n_devices=None, *, m_axis=None):
    """Create a ("batch", "m") mesh over the available devices."""
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = devices.size
    if m_axis is None:
        m_axis = 2 if n % 2 == 0 and n > 1 else 1
    return Mesh(devices.reshape(n // m_axis, m_axis), ("batch", "m"))


def example_batch(mesh, *, nside=16, lmax=24, seed=0):
    """A batch of random maps sharded over the mesh's batch axis."""
    nbins = 2 * mesh.shape["batch"]
    maps = np.random.default_rng(seed).normal(
        size=(nbins, nside2npix(nside))
    ).astype(np.float32)
    sharding = NamedSharding(mesh, P("batch", None))
    return (jax.device_put(maps, sharding),)


def _m_block(lmax, n_m):
    """Static per-device m-block size (padded to the chunk size)."""
    m_chunk = sht.DEFAULT_M_CHUNK
    nm_pad = sht._mmax_pad(lmax, m_chunk)
    per = -(-nm_pad // (n_m * m_chunk)) * m_chunk
    return per


def map2alm_sharded(mesh, maps, lmax, *, weights=None):
    """Spin-0 analysis with bins sharded over "batch" and orders over "m".

    ``maps``: (nbins, npix) sharded P("batch", None).  Returns the
    rectangular alms (nbins, lmax+1, m_pad) sharded P("batch", None, "m");
    orders beyond lmax+1 are zero padding.
    """
    npix = maps.shape[-1]
    nside = npix2nside(npix)
    n_m = mesh.shape["m"]
    per = _m_block(lmax, n_m)
    fdt = "float64" if maps.dtype == jnp.float64 else "float32"
    x, logch, logsh = sht._geom_arrays(nside, fdt)
    w = sht._weights_arr(nside, weights, fdt)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P("batch", None),
        out_specs=P("batch", None, "m"),
    )
    def local(maps_local):
        m0 = jax.lax.axis_index("m") * per
        F, _ = ringfft.ring_analysis(maps_local, nside, per, m0=m0)
        Fw = F * w[:, None]
        ms = m0 + jnp.arange(per, dtype=jnp.int32)
        ns = jnp.zeros(per, jnp.int32)
        alm = wigner.lambda_analysis_scan(ms, ns, x, logch, logsh, lmax, Fw)
        # zero out orders beyond the band limit
        return alm * (ms <= lmax)

    return local(maps)


def pipeline_step(mesh, maps, lmax):
    """Full sharded pipeline step: maps -> alms -> all-pair spectra.

    The m-reduction of the spectra is the only cross-device collective
    (a psum over the "m" axis); the bin-pair grid stays sharded over
    "batch".
    """
    npix = maps.shape[-1]
    nside = npix2nside(npix)
    n_m = mesh.shape["m"]
    per = _m_block(lmax, n_m)
    fdt = "float64" if maps.dtype == jnp.float64 else "float32"
    x, logch, logsh = sht._geom_arrays(nside, fdt)
    w = sht._weights_arr(nside, None, fdt)

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P("batch", None),
        out_specs=P("batch", None, None),
    )
    def step(maps_local):
        m0 = jax.lax.axis_index("m") * per
        F, _ = ringfft.ring_analysis(maps_local, nside, per, m0=m0)
        Fw = F * w[:, None]
        ms = m0 + jnp.arange(per, dtype=jnp.int32)
        ns = jnp.zeros(per, jnp.int32)
        alm = wigner.lambda_analysis_scan(ms, ns, x, logch, logsh, lmax, Fw)
        alm = alm * (ms <= lmax)
        # all-pair spectra of the local bins against the gathered bins
        other = jax.lax.all_gather(alm, "batch", tiled=True)
        eps = jnp.where(ms == 0, 1.0, 2.0)
        prod = jnp.einsum("alm,blm->abl", alm.real * eps, other.real) + jnp.einsum(
            "alm,blm->abl", alm.imag * eps, other.imag
        )
        # reduce the partial m-sums across the m axis of the mesh
        prod = jax.lax.psum(prod, "m")
        ells = jnp.arange(lmax + 1, dtype=maps_local.dtype)
        return prod / (2 * ells + 1)

    return step(maps)
