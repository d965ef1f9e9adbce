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

The local analysis uses the same ring-pair folded Wigner scans as the
single-chip engine (N/S mirror symmetry halves the ring work), for both
spin 0 and spin-2 pairs; the spectra contraction is the shared
:func:`heracles_tpu.twopoint.rect_pair_grid`, evaluated on each device's
m block and psum-reduced.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..healpix import nside2npix, npix2nside
from ..ops import ringfft, sht, wigner
from ..twopoint import rect_pair_grid

__all__ = [
    "make_mesh",
    "example_batch",
    "pipeline_step",
    "map2alm_sharded",
    "alm2map_sharded",
]


def make_mesh(n_devices=None, *, m_axis=None):
    """Create a ("batch", "m") mesh over the available devices."""
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = devices.size
    if m_axis is None:
        m_axis = 2 if n % 2 == 0 and n > 1 else 1
    return Mesh(devices.reshape(n // m_axis, m_axis), ("batch", "m"))


def example_batch(mesh, *, nside=16, lmax=24, seed=0, spin2=False):
    """A batch of random maps sharded over the mesh's batch axis.

    ``spin2=True`` additionally returns a (nbins, 2, npix) [Q, U] batch.
    """
    nbins = 2 * mesh.shape["batch"]
    rng = np.random.default_rng(seed)
    maps = rng.normal(size=(nbins, nside2npix(nside))).astype(np.float32)
    out = (jax.device_put(maps, NamedSharding(mesh, P("batch", None))),)
    if spin2:
        qu = rng.normal(size=(nbins, 2, nside2npix(nside))).astype(np.float32)
        out += (jax.device_put(qu, NamedSharding(mesh, P("batch", None, None))),)
    return out


def _m_block(lmax, n_m):
    """Static per-device m-block size (padded to the chunk size)."""
    m_chunk = sht.DEFAULT_M_CHUNK
    nm_pad = sht._mmax_pad(lmax, m_chunk)
    per = -(-nm_pad // (n_m * m_chunk)) * m_chunk
    return per


def _local_analysis(maps_local, nside, lmax, per, w, x, logch, logsh, spin,
                    engine="jnp", seed_planes=None, geom_lo=None,
                    dd=False, x_lo=None, seed_jnp=None):
    """Folded Wigner analysis of this device's m block (inside shard_map).

    ``x``/``logch``/``logsh`` cover the northern half (incl. equator);
    ``w`` is the full per-ring quadrature weight vector.  For spin 0 the
    input is (..., npix) real and the output (..., lmax+1, per); for a
    spin pair the input is (..., 2, npix) [Q, U] and the output
    (..., 2, lmax+1, per) [E, B].  Orders beyond lmax are zeroed.

    ``engine``: "jnp" (the lax.scan path), "pallas" (the fused kernels;
    requires ``seed_planes`` — this device's block of the host-built
    seed planes, sharded over the mesh's "m" axis) or "pallas-interpret"
    (same kernels in interpret mode, for CPU-mesh tests).
    ``dd``: double-single f32 recurrence (the high-accuracy mode); pass
    the f32 residual of f64 cos(theta) in ``x_lo`` and, for the jnp
    engine, this device's block of host seed planes in ``seed_jnp``
    (shape (nspin, per, nhalf) per plane; see
    :func:`_sharded_jnp_seed_planes`).
    """
    m0 = jax.lax.axis_index("m") * per
    ms = m0 + jnp.arange(per, dtype=jnp.int32)
    msign = jnp.where(ms % 2 == 0, 1.0, -1.0).astype(w.dtype)
    use_pallas = engine in ("pallas", "pallas-interpret")
    interpret = engine == "pallas-interpret"
    lo_ch, lo_sh = geom_lo if geom_lo is not None else (None, None)
    if seed_jnp is not None:
        # (nspin, per, nhalf) blocks -> the scan's (nspin*per, nhalf) lanes
        seed_jnp = tuple(
            p.reshape((-1,) + p.shape[2:]) for p in seed_jnp
        )

    if spin == 0:
        F, _ = ringfft.ring_analysis(maps_local, nside, per, m0=m0,
                                     weight=w)
        FN, FS = sht._fold_rings(F, nside)
        if use_pallas:
            from ..ops import pallas_sht

            FSs = FS * msign
            alm = pallas_sht.analysis_spin0_folded(
                FN + FSs, FN - FSs, x, logch, logsh, lmax,
                logch_lo=lo_ch, logsh_lo=lo_sh, seed_planes=seed_planes,
                interpret=interpret, dd=dd, x_lo=x_lo,
            )
        else:
            alm = wigner.lambda_analysis_scan_folded(
                ms, jnp.zeros(per, jnp.int32), x, logch, logsh, lmax,
                FN, FS * msign, cross=False,
                seed=seed_jnp, dd=dd, x_lo=x_lo,
            )
        return alm * (ms <= lmax)

    # spin pair: a_{+s} from F with engine column ns=+s, a_{-s} from
    # conj(F_{-m}) with ns=-s; N/S folding pairs each column with its
    # partner (cross mode) — same composition as sht._map2alm_once
    u = maps_local[..., 0, :] + 1j * maps_local[..., 1, :]
    F, Fneg = ringfft.ring_analysis(u, nside, per, m0=m0, weight=w)
    fold_p = sht._fold_rings(F, nside)
    fold_m = sht._fold_rings(jnp.conj(Fneg), nside)
    if use_pallas:
        from ..ops import pallas_sht

        a_p, a_m = pallas_sht.analysis_pair_folded(
            fold_p[0], fold_p[1] * msign, fold_m[0], fold_m[1] * msign,
            x, logch, logsh, lmax, spin,
            logch_lo=lo_ch, logsh_lo=lo_sh, seed_planes=seed_planes,
            interpret=interpret, dd=dd, x_lo=x_lo,
        )
    else:
        FN = jnp.concatenate([fold_p[0], fold_m[0]], axis=-1)
        FS = jnp.concatenate([fold_m[1] * msign, fold_p[1] * msign], axis=-1)
        ms_l = jnp.concatenate([ms, ms])
        ns_l = jnp.concatenate(
            [jnp.full(per, spin, jnp.int32), jnp.full(per, -spin, jnp.int32)]
        )
        alm = wigner.lambda_analysis_scan_folded(
            ms_l, ns_l, x, logch, logsh, lmax, FN, FS, cross=True,
            seed=seed_jnp, dd=dd, x_lo=x_lo,
        )
        a_p, a_m = alm[..., :per], alm[..., per:]
    alm_e = -(a_p + a_m) / 2
    alm_b = 1j * (a_p - a_m) / 2
    return jnp.stack([alm_e, alm_b], axis=-3) * (ms <= lmax)


def _engine_arrays(maps, nside, weights):
    """Geometry + quadrature host constants for the sharded engine."""
    fdt = "float64" if maps.dtype in (jnp.float64, jnp.complex128) else "float32"
    x, logch, logsh = sht._geom_arrays(nside, fdt)
    nhalf = 2 * nside
    w = sht._weights_arr(nside, weights, fdt)
    return x[:nhalf], logch[:nhalf], logsh[:nhalf], w


def _resolve_engine(engine):
    """"auto" = the fused Pallas kernels on TPU, the jnp scans elsewhere."""
    if engine == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "jnp"
    return engine


def _sharded_seed_planes(mesh, lmax, n_m, spin):
    """Host-built seed planes for all orders, sharded over the "m" axis.

    The Pallas kernels read the lane orders from these planes, so each
    device's block carries its own (m0-offset) orders.
    """
    from ..ops import pallas_sht

    nm_tot = _m_block(lmax, n_m) * n_m
    ms = np.arange(nm_tot)
    planes = (
        pallas_sht.spin0_seed_planes(ms)
        if spin == 0
        else pallas_sht.pair_seed_planes(ms, spin)
    )
    return jax.device_put(
        jnp.asarray(planes), NamedSharding(mesh, P(None, None, "m"))
    )


def _sharded_jnp_seed_planes(mesh, nside, lmax, n_m, spin, dd):
    """Host-f64 Wigner seed planes for the sharded jnp dd scans.

    Built for all orders at once and sharded over the mesh's "m" axis;
    each plane is (nspin, nm_tot, nhalf) so a device's local block
    reshapes to the scan's (nspin*per, nhalf) lane layout (the pair
    lanes are [+spin block, -spin block], matching
    :func:`_local_analysis`).
    """
    nm_tot = _m_block(lmax, n_m) * n_m
    z = sht._geom_arrays(nside, "float64")[0][: 2 * nside]
    theta = np.arccos(z)
    ns = (0,) if spin == 0 else (spin, -spin)
    ms = np.tile(np.arange(nm_tot), len(ns))
    nsl = np.repeat(np.asarray(ns, np.int64), nm_tot)
    planes = wigner.wigner_seed_host(ms, nsl, theta, dd=dd)
    sharding = NamedSharding(mesh, P(None, "m", None))
    return tuple(
        jax.device_put(
            jnp.asarray(p.reshape(len(ns), nm_tot, -1)), sharding
        )
        for p in planes
    )


def map2alm_sharded(mesh, maps, lmax, *, weights="ring", spin=0,
                    engine="auto", dd=None):
    """Sharded analysis: bins over "batch", harmonic orders over "m".

    ``maps``: (nbins, npix) sharded P("batch", None) for spin 0, or
    (nbins, 2, npix) [Q, U] sharded P("batch", None, None) for a spin
    pair.  Returns rectangular alms (nbins[, 2], lmax+1, m_pad) sharded
    with the trailing axis over "m"; orders beyond lmax are zero padding.
    ``weights`` defaults to the band-limit-exact ring quadrature weights,
    matching the single-chip ``sht.map2alm`` default (a host-side
    per-ring constant, so sharding is unaffected).
    ``engine``: "auto" (fused Pallas kernels on TPU, jnp scans
    elsewhere), "jnp", "pallas", or "pallas-interpret" (CPU-mesh tests).
    ``dd``: double-single f32 recurrence (the same high-accuracy mode as
    ``sht.map2alm(dd=True)``; f32 maps only — default: the
    HERACLES_TPU_SHT_DD env flag).
    """
    nside = npix2nside(maps.shape[-1])
    per = _m_block(lmax, mesh.shape["m"])
    x, logch, logsh, w = _engine_arrays(maps, nside, weights)
    engine = _resolve_engine(engine)
    spin = abs(int(spin))
    dd = sht._use_dd() if dd is None else (dd if dd == "comp" else bool(dd))
    dd = dd and maps.dtype == jnp.float32
    x_lo = sht._x_lo_array(nside) if dd else None

    if spin == 0:
        in_specs, out_specs = P("batch", None), P("batch", None, "m")
    else:
        in_specs, out_specs = P("batch", None, None), P("batch", None, None, "m")

    if engine == "jnp":
        seed_jnp = (
            _sharded_jnp_seed_planes(mesh, nside, lmax, mesh.shape["m"],
                                     spin, dd)
            if dd else None
        )
        seed_specs = (
            tuple(P(None, "m", None) for _ in seed_jnp)
            if seed_jnp is not None else None
        )

        if seed_jnp is None:

            @partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs)
            def local(maps_local):
                return _local_analysis(
                    maps_local, nside, lmax, per, w, x, logch, logsh, spin
                )

            return local(maps)

        @partial(jax.shard_map, mesh=mesh, in_specs=(in_specs, seed_specs),
                 out_specs=out_specs)
        def local_dd(maps_local, seed_local):
            return _local_analysis(
                maps_local, nside, lmax, per, w, x, logch, logsh, spin,
                dd=True, x_lo=x_lo, seed_jnp=seed_local,
            )

        return local_dd(maps, seed_jnp)

    planes = _sharded_seed_planes(mesh, lmax, mesh.shape["m"], spin)
    geom_lo = sht._geom_lo_arrays(nside)

    # check_vma=False: pallas_call does not yet annotate its outputs with
    # mesh-axis variance information inside shard_map
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(in_specs, P(None, None, "m")), out_specs=out_specs,
             check_vma=False)
    def local(maps_local, planes_local):
        return _local_analysis(
            maps_local, nside, lmax, per, w, x, logch, logsh, spin,
            engine=engine, seed_planes=planes_local, geom_lo=geom_lo,
            dd=dd, x_lo=x_lo,
        )

    return local(maps, planes)


def _local_synthesis(alm_local, lmax, per, x, logch, logsh, spin,
                     engine="jnp", seed_planes=None, geom_lo=None,
                     dd=False, x_lo=None, seed_jnp=None):
    """Folded Wigner synthesis of this device's m block (inside shard_map).

    Inverse of :func:`_local_analysis`: the local rectangular alm block
    (..., lmax+1, per) [spin 0] or (..., 2, lmax+1, per) [E, B] becomes
    this device's block of the (northern, mirrored-southern) ring
    spectra.  Returns a tuple of (GN, GS) pairs, one per engine column
    (one for spin 0, two — n = +spin / -spin — for a pair).
    """
    m0 = jax.lax.axis_index("m") * per
    ms = m0 + jnp.arange(per, dtype=jnp.int32)
    use_pallas = engine in ("pallas", "pallas-interpret")
    interpret = engine == "pallas-interpret"
    lo_ch, lo_sh = geom_lo if geom_lo is not None else (None, None)
    if seed_jnp is not None:
        seed_jnp = tuple(
            p.reshape((-1,) + p.shape[2:]) for p in seed_jnp
        )

    if spin == 0:
        if use_pallas:
            from ..ops import pallas_sht

            GN, GS = pallas_sht.synthesis_spin0_folded(
                alm_local, x, logch, logsh, lmax,
                logch_lo=lo_ch, logsh_lo=lo_sh, seed_planes=seed_planes,
                interpret=interpret, dd=dd, x_lo=x_lo,
            )
        else:
            GN, GS = wigner.lambda_synthesis_scan_folded(
                ms, jnp.zeros(per, jnp.int32), x, logch, logsh, lmax,
                alm_local, cross=False, seed=seed_jnp, dd=dd, x_lo=x_lo,
            )
        return ((GN, GS),)

    # spin pair: engine columns n = +spin (from a_{+s}) and n = -spin
    # (from conj(a_{-s})) — the composition sht.alm2map uses
    alm_e = alm_local[..., 0, :, :]
    alm_b = alm_local[..., 1, :, :]
    a_p = -(alm_e + 1j * alm_b)
    a_m = jnp.conj(-(alm_e - 1j * alm_b))
    if use_pallas:
        from ..ops import pallas_sht

        GNp, GSp, GNm, GSm = pallas_sht.synthesis_pair_folded(
            a_p, a_m, x, logch, logsh, lmax, spin,
            logch_lo=lo_ch, logsh_lo=lo_sh, seed_planes=seed_planes,
            interpret=interpret, dd=dd, x_lo=x_lo,
        )
    else:
        ms_l = jnp.concatenate([ms, ms])
        ns_l = jnp.concatenate(
            [jnp.full(per, spin, jnp.int32), jnp.full(per, -spin, jnp.int32)]
        )
        alm_l = jnp.concatenate([a_p, a_m], axis=-1)
        GN, GS = wigner.lambda_synthesis_scan_folded(
            ms_l, ns_l, x, logch, logsh, lmax, alm_l, cross=True,
            seed=seed_jnp, dd=dd, x_lo=x_lo,
        )
        GNp, GSp = GN[..., :per], GS[..., :per]
        GNm, GSm = GN[..., per:], GS[..., per:]
    return ((GNp, GSp), (GNm, GSm))


def alm2map_sharded(mesh, alms, nside, *, lmax=None, spin=0, engine="auto",
                    dd=None):
    """Sharded synthesis: bins over "batch", harmonic orders over "m".

    Inverse of :func:`map2alm_sharded` — accepts its rectangular output
    layout: (nbins, lmax+1, m_pad) sharded P("batch", None, "m") for
    spin 0, or (nbins, 2, lmax+1, m_pad) [E, B] for a spin pair (host
    arrays are placed with that sharding).  Each device runs the folded
    Wigner synthesis for its m block only; the blocks are all-gathered
    over "m" (the one collective) and every device in an m-group runs
    the cheap ring FFT on the full spectra.  Returns (nbins, npix) maps
    sharded P("batch", None) (or (nbins, 2, npix) [Q, U] for a pair).
    """
    spin = abs(int(spin))
    alms = jnp.asarray(alms)
    if lmax is None:
        lmax = alms.shape[-2] - 1
    n_m = mesh.shape["m"]
    per = _m_block(lmax, n_m)
    if alms.shape[-1] != per * n_m:
        pad = per * n_m - alms.shape[-1]
        if pad < 0:
            raise ValueError(
                f"alms m axis {alms.shape[-1]} exceeds the mesh block "
                f"layout {per * n_m}"
            )
        alms = jnp.pad(alms, [(0, 0)] * (alms.ndim - 1) + [(0, pad)])
    fdt = "float64" if alms.dtype == jnp.complex128 else "float32"
    x, logch, logsh = sht._geom_arrays(nside, fdt)
    nhalf = 2 * nside
    x, logch, logsh = x[:nhalf], logch[:nhalf], logsh[:nhalf]
    engine = _resolve_engine(engine)
    dd = sht._use_dd() if dd is None else (dd if dd == "comp" else bool(dd))
    dd = dd and alms.dtype == jnp.complex64
    x_lo = jnp.asarray(sht._x_lo_array(nside)) if dd else None

    if spin == 0:
        in_spec, out_spec = P("batch", None, "m"), P("batch", None)
    else:
        in_spec = P("batch", None, None, "m")
        out_spec = P("batch", None, None)
    alms = jax.device_put(alms, NamedSharding(mesh, in_spec))

    def assemble_and_fft(pairs):
        # gather every branch's m blocks, rebuild full rings, ring FFT
        Gs = []
        for GN, GS in pairs:
            GN = jax.lax.all_gather(GN, "m", axis=-1, tiled=True)
            GS = jax.lax.all_gather(GS, "m", axis=-1, tiled=True)
            south = jnp.flip(GS[..., :-1, :], axis=-2)
            G = jnp.concatenate([GN, south], axis=-2)[..., : lmax + 1]
            Gs.append(G)
        if spin == 0:
            return ringfft.ring_synthesis(Gs[0], None, nside)
        u = ringfft.ring_synthesis(Gs[0], Gs[1], nside, real_output=False)
        return jnp.stack([u.real, u.imag], axis=-2)

    if engine == "jnp":
        seed_jnp = (
            _sharded_jnp_seed_planes(mesh, nside, lmax, n_m, spin, dd)
            if dd else None
        )
        if seed_jnp is None:

            # check_vma=False: the synthesis scan's zero-initialised
            # carries are unvarying while their updates vary over the
            # mesh axes, which the vma tracker rejects
            @partial(jax.shard_map, mesh=mesh, in_specs=in_spec,
                     out_specs=out_spec, check_vma=False)
            def local(alm_local):
                pairs = _local_synthesis(
                    alm_local, lmax, per, x, logch, logsh, spin
                )
                return assemble_and_fft(pairs)

            return local(alms)

        seed_specs = tuple(P(None, "m", None) for _ in seed_jnp)

        @partial(jax.shard_map, mesh=mesh, in_specs=(in_spec, seed_specs),
                 out_specs=out_spec, check_vma=False)
        def local_dd(alm_local, seed_local):
            pairs = _local_synthesis(
                alm_local, lmax, per, x, logch, logsh, spin,
                dd=True, x_lo=x_lo, seed_jnp=seed_local,
            )
            return assemble_and_fft(pairs)

        return local_dd(alms, seed_jnp)

    planes = _sharded_seed_planes(mesh, lmax, n_m, spin)
    geom_lo = sht._geom_lo_arrays(nside)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(in_spec, P(None, None, "m")), out_specs=out_spec,
             check_vma=False)
    def local(alm_local, planes_local):
        pairs = _local_synthesis(
            alm_local, lmax, per, x, logch, logsh, spin,
            engine=engine, seed_planes=planes_local, geom_lo=geom_lo,
            dd=dd, x_lo=x_lo,
        )
        return assemble_and_fft(pairs)

    return local(alms, planes)


def pipeline_step(mesh, maps, lmax, maps2=None, *, engine="auto", dd=None):
    """Full sharded pipeline step: maps -> alms -> all-pair spectra.

    ``maps``: (nbins, npix) spin-0 batch; ``maps2`` (optional):
    (nbins2, 2, npix) [Q, U] spin-2 batch.  All component planes
    (spin-0 bins, then E/B per spin-2 bin) enter one all-pairs grid; the
    m-reduction of the spectra is the only cross-device collective (a
    psum over the "m" axis) besides the all-gather of the plane stack
    over "batch".  The contraction is the same
    :func:`heracles_tpu.twopoint.rect_pair_grid` the host pipeline uses.
    ``dd``: double-single f32 recurrence for the analyses (Pallas
    engines only here; use :func:`map2alm_sharded` for a jnp dd path).
    """
    nside = npix2nside(maps.shape[-1])
    per = _m_block(lmax, mesh.shape["m"])
    x, logch, logsh, w = _engine_arrays(maps, nside, "ring")
    with_spin2 = maps2 is not None
    engine = _resolve_engine(engine)
    dd = sht._use_dd() if dd is None else (dd if dd == "comp" else bool(dd))
    dd = dd and maps.dtype == jnp.float32 and engine != "jnp"
    x_lo = sht._x_lo_array(nside) if dd else None
    if engine == "jnp":
        seeds0 = seeds2 = None
        geom_lo = None
    else:
        seeds0 = _sharded_seed_planes(mesh, lmax, mesh.shape["m"], 0)
        seeds2 = (
            _sharded_seed_planes(mesh, lmax, mesh.shape["m"], 2)
            if with_spin2 else None
        )
        geom_lo = sht._geom_lo_arrays(nside)

    def step(maps_local, maps2_local=None, s0_local=None, s2_local=None):
        m0 = jax.lax.axis_index("m") * per
        ms = m0 + jnp.arange(per, dtype=jnp.int32)
        planes = _local_analysis(
            maps_local, nside, lmax, per, w, x, logch, logsh, 0,
            engine=engine, seed_planes=s0_local, geom_lo=geom_lo,
            dd=dd, x_lo=x_lo,
        )
        if maps2_local is not None:
            eb = _local_analysis(
                maps2_local, nside, lmax, per, w, x, logch, logsh, 2,
                engine=engine, seed_planes=s2_local, geom_lo=geom_lo,
                dd=dd, x_lo=x_lo,
            )
            eb = eb.reshape((-1,) + eb.shape[-2:])  # (2*nbins2, lmax+1, per)
            planes = jnp.concatenate([planes, eb], axis=0)
        # all-pair spectra of the local planes against the gathered stack
        other = jax.lax.all_gather(planes, "batch", tiled=True)
        grid = rect_pair_grid(planes, other, ms)
        return jax.lax.psum(grid, "m")

    plane_spec = P(None, None, "m")
    if with_spin2:
        if engine == "jnp":
            sharded = partial(
                jax.shard_map,
                mesh=mesh,
                in_specs=(P("batch", None), P("batch", None, None)),
                out_specs=P("batch", None, None),
            )
            out = jax.jit(sharded(step))(maps, maps2)
        else:
            sharded = partial(
                jax.shard_map,
                mesh=mesh,
                in_specs=(P("batch", None), P("batch", None, None),
                          plane_spec, plane_spec),
                out_specs=P("batch", None, None),
                check_vma=False,
            )
            out = jax.jit(sharded(step))(maps, maps2, seeds0, seeds2)
        # inside the shard each device emits [its spin-0 bins, its E/B
        # planes]; permute to the global order [all spin-0 bins, then
        # E, B per spin-2 bin]
        nb = mesh.shape["batch"]
        b0, b2 = maps.shape[0] // nb, maps2.shape[0] // nb
        blocks = np.arange(nb)[:, None] * (b0 + 2 * b2)
        rows0 = (blocks + np.arange(b0)).ravel()
        rows2 = (blocks + b0 + np.arange(2 * b2)).ravel()
        perm = np.concatenate([rows0, rows2])
        return jnp.asarray(np.asarray(out)[np.ix_(perm, perm)])
    if engine == "jnp":
        sharded = partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=P("batch", None),
            out_specs=P("batch", None, None),
        )
        return jax.jit(sharded(lambda m: step(m)))(maps)
    sharded = partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("batch", None), plane_spec),
        out_specs=P("batch", None, None),
        check_vma=False,
    )
    return jax.jit(sharded(lambda m, s0: step(m, s0_local=s0)))(maps, seeds0)
