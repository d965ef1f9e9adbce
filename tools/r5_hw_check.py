"""Round-5 hardware A/B: comp kernels, pair regroup, df32 split hoist.

Chunk-checkpointed (one JSON write per phase, tools/r5_hw_check.json):
a tunnel drop mid-run keeps every completed phase.  Run ON TPU, solo
(one TPU process at a time):

    python tools/r5_hw_check.py [--phases spin0,pair,synth,gram,e2e]

Phases (all at nside=4096, lmax=3000 unless noted):

* ``spin0`` — analysis_spin0_folded plain vs comp vs dd (kernel-level
  min-of-reps ms; the comp target is <= 1.5x plain);
* ``pair``  — analysis_pair_folded plain (after the cm-folding
  regroup; round-4 record: 415-474 ms) vs comp;
* ``synth`` — synthesis spin-0 + pair, plain vs comp;
* ``gram``  — one production-size df32 Gram contraction (K=4501,
  L=3001; round-4 record: ~2.6 s) after the Dekker-split hoist;
* ``e2e``   — map2alm + alm2cl end-to-end, plain/comp/dd (the bench's
  spin0*_n4096_l3000 bodies).
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

OUT = os.path.join(HERE, "r5_hw_check.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nside", type=int, default=4096)
    ap.add_argument("--lmax", type=int, default=3000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--phases", default="spin0,pair,synth,gram,e2e")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from heracles_tpu.ops import pallas_sht, sht

    nside, lmax = args.nside, args.lmax
    nhalf = 2 * nside
    nm_pad = -(-(lmax + 1) // 128) * 128
    phases = {p.strip() for p in args.phases.split(",")}

    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))
    key = f"n{nside}_l{lmax}"
    rec = results.setdefault(key, {})

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)

    x_f, logch_f, logsh_f = sht._geom_arrays(nside, "float32")
    x, logch, logsh = (jnp.asarray(a[:nhalf])
                       for a in (x_f, logch_f, logsh_f))
    lo_ch, lo_sh = (jnp.asarray(a) for a in sht._geom_lo_arrays(nside))
    x_lo = jnp.asarray(sht._x_lo_array(nside))

    rng = np.random.default_rng(0)
    combine = jax.jit(lambda a, b: a + 1j * b)

    def crand(shape):
        re = jax.device_put(rng.normal(size=shape).astype(np.float32))
        im = jax.device_put(rng.normal(size=shape).astype(np.float32))
        return combine(re, im)

    def timeit(fn):
        float(jnp.sum(jnp.abs(fn())))  # compile + warm (forces tunnel)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jnp.sum(jnp.abs(fn())))
            best = min(best, time.perf_counter() - t0)
        return round(best * 1e3, 1)

    acc_kw = dict(logch_lo=lo_ch, logsh_lo=lo_sh)
    modes = (("plain", dict()),
             ("comp", dict(dd="comp", x_lo=x_lo)),
             ("dd", dict(dd=True, x_lo=x_lo)))

    if "spin0" in phases and ("spin0" not in rec or args.force):
        F = [crand((nhalf, nm_pad)) for _ in range(2)]
        out = {}
        for name, kw in modes:
            out[name] = timeit(lambda: pallas_sht.analysis_spin0_folded(
                F[0], F[1], x, logch, logsh, lmax, **acc_kw, **kw))
            print(f"spin0 {name}: {out[name]} ms", flush=True)
        rec["spin0"] = out
        save()

    if "pair" in phases and ("pair" not in rec or args.force):
        F = [crand((nhalf, nm_pad)) for _ in range(4)]
        out = {}
        for name, kw in modes:
            out[name] = timeit(lambda: pallas_sht.analysis_pair_folded(
                F[0], F[1], F[2], F[3], x, logch, logsh, lmax, 2,
                **acc_kw, **kw)[0])
            print(f"pair {name}: {out[name]} ms", flush=True)
        rec["pair"] = out
        save()

    if "synth" in phases and ("synth" not in rec or args.force):
        A = [crand((lmax + 1, nm_pad)) for _ in range(2)]
        out = {}
        for name, kw in modes:
            out[f"spin0_{name}"] = timeit(
                lambda: pallas_sht.synthesis_spin0_folded(
                    A[0], x, logch, logsh, lmax, **acc_kw, **kw)[0])
            print(f"synth spin0 {name}: {out[f'spin0_{name}']} ms",
                  flush=True)
        for name, kw in modes:
            out[f"pair_{name}"] = timeit(
                lambda: pallas_sht.synthesis_pair_folded(
                    A[0], A[1], x, logch, logsh, lmax, 2,
                    **acc_kw, **kw)[0])
            print(f"synth pair {name}: {out[f'pair_{name}']} ms",
                  flush=True)
        rec["synth"] = out
        save()

    if "gram" in phases and ("gram" not in rec or args.force):
        from heracles_tpu.ops import df32

        K, L = 4501, lmax + 1
        A64 = rng.normal(size=(K, L))
        B64 = rng.normal(size=(K, L))
        u64 = rng.normal(size=K)
        Ah, Al = (jax.device_put(z) for z in df32.split_f64(A64))
        Bh, Bl = (jax.device_put(z) for z in df32.split_f64(B64))
        u = df32.split_f64(u64)

        def gram():
            hi, lo = df32.gram_df32((Ah, Al), (Bh, Bl), u, block=False)
            return hi

        rec["gram"] = {"contraction_ms": timeit(gram),
                       "K": K, "L": L}
        print(f"gram: {rec['gram']['contraction_ms']} ms", flush=True)
        save()

    if "e2e" in phases and ("e2e" not in rec or args.force):
        maps = jax.device_put(
            rng.normal(size=12 * nside * nside).astype(np.float32))
        from heracles_tpu.ops import ringfft

        ch = ringfft.chirp_fft_planes(nside, lmax + 1, "float32",
                                      "analysis")

        def cl_power(alm_rect):
            m = jnp.arange(alm_rect.shape[-1])
            eps = jnp.where(m == 0, 1.0, 2.0).astype(jnp.float32)
            ells = jnp.arange(alm_rect.shape[-2], dtype=jnp.float32)
            p = (alm_rect.real**2 + alm_rect.imag**2) * eps
            return p.sum(axis=-1) / (2 * ells + 1)

        out = {}
        for name, dd in (("plain", False), ("comp", "comp"), ("dd", True)):
            fn = jax.jit(lambda mm, cc, dd=dd: jnp.sum(cl_power(
                sht.map2alm(mm, lmax=lmax, packed=False, fft_chirps=cc,
                            dd=dd))))

            def run():
                return fn(maps, ch)

            out[name] = timeit(run)
            print(f"e2e spin0 {name}: {out[name]} ms", flush=True)
        rec["e2e"] = out
        save()

    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
