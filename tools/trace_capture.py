"""Capture and summarise a jax.profiler device trace of a pipeline op.

The axon TPU backend supports ``jax.profiler.trace`` (verified round 4);
this tool wraps it for the two hot transforms and prints a per-op
device-time table from the captured ``*.trace.json.gz`` — the reliable
way to attribute time on this machine, where the ~31 ms tunnel dispatch
and its noise swamp stage micro-benchmarks.

    python tools/trace_capture.py [--op spin0|spin2|synthesis]
                                  [--nside 4096] [--lmax 3000]
                                  [--outdir /tmp/jaxtrace] [--top 25]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def build_op(op, nside, lmax):
    import jax
    import jax.numpy as jnp

    from heracles_tpu.ops import ringfft, sht

    rng = np.random.default_rng(0)
    npix = 12 * nside * nside
    if op in ("spin0", "spin2"):
        spin = 0 if op == "spin0" else 2
        shape = (npix,) if spin == 0 else (2, npix)
        maps = jax.device_put(rng.normal(size=shape).astype(np.float32))
        ch = ringfft.chirp_fft_planes(nside, lmax + 1, "float32",
                                      "analysis")
        fn = jax.jit(lambda m, c: jnp.sum(jnp.abs(sht.map2alm(
            m, lmax=lmax, spin=spin, packed=False, fft_chirps=c))))
        return lambda: float(fn(maps, ch))
    if op == "synthesis":
        nlm = sht.alm_size(lmax)
        re = jax.device_put(rng.normal(size=nlm).astype(np.float32))
        im = jax.device_put(rng.normal(size=nlm).astype(np.float32))
        ch = ringfft.chirp_fft_planes(nside, lmax + 1, "float32",
                                      "synthesis")
        fn = jax.jit(lambda r, i, c: jnp.sum(
            sht.alm2map(r + 1j * i, nside, lmax=lmax, fft_chirps=c) ** 2))
        return lambda: float(fn(re, im, ch))
    raise SystemExit(f"unknown --op {op}")


def summarise(outdir, top, reps):
    paths = sorted(glob.glob(
        os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise SystemExit(f"no trace files under {outdir}")
    data = json.load(gzip.open(paths[-1], "rt"))
    events = data.get("traceEvents", [])
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
    durs = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pnames.get(e.get("pid"), ""):
            continue
        key = re.sub(r"[.\d]+$", "", e.get("name", "?"))
        durs[key] += e["dur"]
    print(f"# {paths[-1]}")
    print(f"# device-lane op totals over {reps} reps (ms per rep):")
    for name, us in durs.most_common(top):
        print(f"{us / 1000 / reps:9.2f} ms  {name[:100]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="spin0",
                    choices=("spin0", "spin2", "synthesis"))
    ap.add_argument("--nside", type=int, default=4096)
    ap.add_argument("--lmax", type=int, default=3000)
    ap.add_argument("--outdir", default="/tmp/jaxtrace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax

    fn = build_op(args.op, args.nside, args.lmax)
    fn()  # compile + warm
    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        for _ in range(args.reps):
            fn()
    summarise(args.outdir, args.top, args.reps)


if __name__ == "__main__":
    main()
