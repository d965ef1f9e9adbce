"""Block-size tuning for the four Pallas SHT kernels at north-star size.

Times each kernel directly (synthetic ring spectra / alms, geometry from
the real nside=4096 ring layout) over a {ring_block, m_chunk} grid on
the attached TPU, and writes tools/kernel_tune.json with the best
configuration per kernel.  Compile failures (VMEM) are recorded as
"fail".  Run on TPU hardware:

    python tools/kernel_tune.py [--nside 4096] [--lmax 3000]

Each timing is min-of-3 after a warm-up call, with a float readback to
force execution through the tunnel (block_until_ready does not sync on
the axon backend).
"""

import argparse
import itertools
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--contract", default="tree",
                    help="comma list of ring-contraction variants "
                         "(tree, fma); non-tree variants tag entries "
                         "rb{rb}_mc{mc}_{variant}")
    ap.add_argument("--only", default=None,
                    help="comma list of kernel names to tune")
    ap.add_argument("--rbs", default=None,
                    help="comma list overriding the ring_block grid")
    ap.add_argument("--mcs", default=None,
                    help="comma list overriding the m_chunk grid")
    ap.add_argument("--force", action="store_true",
                    help="re-time configs already recorded in the json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from heracles_tpu.ops import pallas_sht, sht

    nside, lmax = args.nside, args.lmax
    nhalf = 2 * nside
    nm_pad = -(-(lmax + 1) // 128) * 128

    x, logch, logsh = sht._geom_arrays(nside, "float32")
    x, logch, logsh = x[:nhalf], logch[:nhalf], logsh[:nhalf]
    x, logch, logsh = map(jnp.asarray, (x, logch, logsh))

    rng = np.random.default_rng(0)

    # complex arrays cannot cross the tunnel's transfer boundary: upload
    # real/imag planes and combine on device
    combine = jax.jit(lambda a, b: a + 1j * b)

    def crand(shape):
        re = jax.device_put(rng.normal(size=shape).astype(np.float32))
        im = jax.device_put(rng.normal(size=shape).astype(np.float32))
        return combine(re, im)

    F = [crand((nhalf, nm_pad)) for _ in range(4)]
    A = [crand((lmax + 1, nm_pad)) for _ in range(2)]

    def timeit(fn):
        float(jnp.sum(jnp.abs(fn())))  # compile + warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jnp.sum(jnp.abs(fn())))
            best = min(best, time.perf_counter() - t0)
        return best

    grids = {
        "analysis_spin0": (
            lambda rb, mc, ct: pallas_sht.analysis_spin0_folded(
                F[0], F[1], x, logch, logsh, lmax,
                ring_block=rb, m_chunk=mc, contract=ct,
            ),
            [128, 256, 512, 1024, 2048],
            [64, 128, 256],
        ),
        "analysis_pair": (
            lambda rb, mc, ct: pallas_sht.analysis_pair_folded(
                F[0], F[1], F[2], F[3], x, logch, logsh, lmax, 2,
                ring_block=rb, m_chunk=mc, contract=ct,
            )[0],
            [64, 128, 256, 512],
            [64, 128, 256],
        ),
        "synthesis_spin0": (
            lambda rb, mc, ct: pallas_sht.synthesis_spin0_folded(
                A[0], x, logch, logsh, lmax, ring_block=rb, m_chunk=mc,
                contract=ct,
            )[0],
            [256, 512, 1024, 2048],
            [64, 128, 256],
        ),
        "synthesis_pair": (
            lambda rb, mc, ct: pallas_sht.synthesis_pair_folded(
                A[0], A[1], x, logch, logsh, lmax, 2,
                ring_block=rb, m_chunk=mc, contract=ct,
            )[0],
            [64, 128, 256, 512],
            [64, 128, 256],
        ),
    }

    out_path = os.path.join(HERE, "kernel_tune.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    key = f"n{nside}_l{lmax}"
    results.setdefault(key, {})

    contracts = [c.strip() for c in args.contract.split(",") if c.strip()]
    only = (None if args.only is None
            else {n.strip() for n in args.only.split(",")})
    rbs_cli = (None if args.rbs is None
               else [int(v) for v in args.rbs.split(",")])
    mcs_cli = (None if args.mcs is None
               else [int(v) for v in args.mcs.split(",")])

    for name, (build, rbs, mcs) in grids.items():
        if only is not None and name not in only:
            continue
        results[key].setdefault(name, {})
        rbs = rbs_cli or rbs
        mcs = mcs_cli or mcs
        for ct, rb, mc in itertools.product(contracts, rbs, mcs):
            tag = f"rb{rb}_mc{mc}" + ("" if ct == "tree" else f"_{ct}")
            if tag in results[key][name] and not args.force:
                continue
            try:
                dt = timeit(lambda: build(rb, mc, ct))
                results[key][name][tag] = round(dt * 1e3, 2)
                print(f"{name} {tag}: {dt * 1e3:.1f} ms", flush=True)
            except Exception as e:  # noqa: BLE001 - record and move on
                msg = f"fail: {type(e).__name__}: {str(e)[:120]}"
                results[key][name][tag] = msg
                print(f"{name} {tag}: FAIL {msg}", flush=True)
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1, sort_keys=True)

    for name in grids:
        timed = {
            k: v for k, v in results[key][name].items()
            if isinstance(v, (int, float))
        }
        if timed:
            best = min(timed, key=timed.get)
            print(f"BEST {name}: {best} = {timed[best]} ms", flush=True)


if __name__ == "__main__":
    main()
