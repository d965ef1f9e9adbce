"""Decompose the north-star map2alm wall time into its stages (on TPU).

Times, each as its own jitted dispatch (min of reps, float readback):

* ``ring_analysis``  — belt reshape + Bluestein chirp-bucket FFTs;
* ``fold_weight``    — ring folding, quadrature weight multiply, m-pad;
* ``kernel``         — the fused Pallas Wigner contraction;
* ``cl``             — alm2cl of the rectangular alms;
* ``full``           — the whole map2alm + Cl as one jit (the bench op).

The stage sum exceeds ``full`` by the extra HBM round-trips between
dispatches and the ~31 ms/dispatch tunnel overhead; the interesting
quantity is each stage's share.

    python tools/profile_map2alm.py [--nside 4096] [--lmax 3000] [--spin 2]
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nside", type=int, default=4096)
    ap.add_argument("--lmax", type=int, default=3000)
    ap.add_argument("--spin", type=int, default=0)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from heracles_tpu.ops import ringfft, sht

    nside, lmax, spin = args.nside, args.lmax, args.spin
    npix = 12 * nside * nside
    mmax = lmax
    m_chunk = sht.DEFAULT_M_CHUNK
    nm_pad = sht._mmax_pad(mmax, m_chunk)

    rng = np.random.default_rng(0)
    if spin == 0:
        maps = jax.device_put(rng.normal(size=npix).astype(np.float32))
    else:
        maps = jax.device_put(
            rng.normal(size=(2, npix)).astype(np.float32))
    ch = ringfft.chirp_fft_planes(nside, mmax + 1, "float32", "analysis")

    def timeit(fn, *a):
        float(jnp.sum(jnp.abs(fn(*a))))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jnp.sum(jnp.abs(fn(*a))))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    out = {}

    # stage 1: ring FFT
    if spin == 0:
        fft_in = maps
    else:
        # combine inside jit: an eager `1j * maps[1]` dispatches a
        # complex scalar constant through the transfer path, which this
        # transport does not implement
        fft_in = jax.jit(jax.lax.complex)(maps[0], maps[1])
    nm_fft = -(-(mmax + 1) // 128) * 128  # chirp planes' rounding
    fft_fn = jax.jit(lambda mm, c: ringfft.ring_analysis(
        mm, nside, nm_fft, chirps=c)[0])
    out["ring_analysis_ms"] = timeit(fft_fn, fft_in, ch)

    # stage 2: fold + weights + pad (from a precomputed F)
    F = fft_fn(fft_in, ch)
    fdt = "float32"
    w = sht._weights_arr(nside, "ring", fdt)[:, None]

    def fold_fn(Fm):
        Fw = Fm * w
        Fp = jnp.pad(Fw, [(0, 0)] * (Fw.ndim - 1)
                     + [(0, nm_pad - Fw.shape[-1])])
        FN, FS = sht._fold_rings(Fp, nside)
        msign = jnp.where(jnp.arange(nm_pad) % 2 == 0, 1.0, -1.0)
        FS = FS * msign
        return FN + FS, FN - FS
    fold_j = jax.jit(lambda Fm: fold_fn(Fm)[0])
    out["fold_weight_ms"] = timeit(fold_j, F)

    # stage 3: the Pallas kernel (tuned blocks)
    from heracles_tpu.ops import pallas_sht

    x, logch, logsh = sht._geom_arrays(nside, fdt)
    nhalf = 2 * nside
    x, logch, logsh = map(jnp.asarray,
                          (x[:nhalf], logch[:nhalf], logsh[:nhalf]))
    Fe, Fo = jax.jit(fold_fn)(F)
    lo_ch, lo_sh = sht._geom_lo_arrays(nside)
    if spin == 0:
        kern = lambda a, b: pallas_sht.analysis_spin0_folded(  # noqa: E731
            a, b, x, logch, logsh, lmax, logch_lo=lo_ch, logsh_lo=lo_sh)
        out["kernel_ms"] = timeit(kern, Fe, Fo)
        alm = kern(Fe, Fo)
    else:
        kern = lambda a, b, c, d: pallas_sht.analysis_pair_folded(  # noqa: E731
            a, b, c, d, x, logch, logsh, lmax, spin,
            logch_lo=lo_ch, logsh_lo=lo_sh)[0]
        out["kernel_ms"] = timeit(kern, Fe, Fo, Fo, Fe)
        alm = kern(Fe, Fo, Fo, Fe)

    # stage 4: Cl of the rectangular alms
    def cl_fn(a):
        m = jnp.arange(a.shape[-1])
        eps = jnp.where(m == 0, 1.0, 2.0).astype(jnp.float32)
        ells = jnp.arange(a.shape[-2], dtype=jnp.float32)
        p = (a.real**2 + a.imag**2) * eps
        return p.sum(axis=-1) / (2 * ells + 1)
    out["cl_ms"] = timeit(jax.jit(cl_fn), alm)

    # full fused op (= the bench metric's body)
    full = jax.jit(lambda mm, c: jnp.sum(cl_fn(
        sht.map2alm(mm, lmax=lmax, spin=spin, packed=False, fft_chirps=c))))
    out["full_ms"] = timeit(full, maps, ch)

    out.update(nside=nside, lmax=lmax, spin=spin)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
