"""On-TPU correctness + timing check of the four Pallas SHT kernels.

Correctness: at a small size (default nside=128) map2alm / alm2map for
spin 0 and spin 2 are evaluated twice on the device — once through the
Pallas kernels and once through the pure-jnp folded Wigner scans
(``HERACLES_TPU_NO_PALLAS=1``), which are the oracle-validated
reference path.  The two share all inputs, so agreement is at f32
recurrence roundoff.

Timing: each kernel at the north-star size with its tuned blocks
(min of reps, float readback to force the tunnel).

    python tools/kernel_check.py [--nside 4096] [--lmax 3000]
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
    ap.add_argument("--check-nside", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-time", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from heracles_tpu.ops import pallas_sht, sht

    rng = np.random.default_rng(0)
    combine = jax.jit(lambda a, b: a + 1j * b)

    def crand(shape):
        re = jax.device_put(rng.normal(size=shape).astype(np.float32))
        im = jax.device_put(rng.normal(size=shape).astype(np.float32))
        return combine(re, im)

    def rel(a, b):
        return float(np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-30))

    # ---- correctness at small size: kernels vs jnp scans on device -----
    ns_c, lm_c = args.check_nside, 3 * args.check_nside // 2
    npix = 12 * ns_c * ns_c
    m0 = jax.device_put(rng.normal(size=npix).astype(np.float32))
    m2 = jax.device_put(rng.normal(size=(2, npix)).astype(np.float32))

    status = {}

    def run_once(fn, *args):
        # a FRESH jit per call: the pallas-vs-jnp dispatch reads the env
        # at trace time, and eager (unjitted) calls break on this
        # transport (complex constants dispatch through the unimplemented
        # complex-transfer path).  Inputs ride as jit ARGUMENTS — a
        # closed-over complex array would become a jaxpr constant and
        # hit the same transfer path at execution.
        wrapped = jax.jit(
            lambda *a: (lambda r: jnp.stack([r.real, r.imag]))(
                jnp.asarray(fn(*a))
            )
        )
        return np.asarray(wrapped(*args))

    def both(fn, *args):
        os.environ.pop("HERACLES_TPU_NO_PALLAS", None)
        got = run_once(fn, *args)
        os.environ["HERACLES_TPU_NO_PALLAS"] = "1"
        want = run_once(fn, *args)
        os.environ.pop("HERACLES_TPU_NO_PALLAS", None)
        return rel(got, want)

    status["map2alm_spin0_rel"] = both(
        lambda m: sht.map2alm(m, lmax=lm_c, packed=False), m0)
    status["map2alm_spin2_rel"] = both(
        lambda m: sht.map2alm(m, lmax=lm_c, spin=2, packed=False), m2)

    nlm = sht.alm_size(lm_c)
    a0 = crand((nlm,))
    a2 = crand((2, nlm))
    status["alm2map_spin0_rel"] = both(
        lambda a: sht.alm2map(a, ns_c, lmax=lm_c), a0)
    status["alm2map_spin2_rel"] = both(
        lambda a: sht.alm2map(a, ns_c, lmax=lm_c, spin=2), a2)

    tol = 2e-4  # f32 recurrence noise at the map/alm scale
    ok = all(v < tol for k, v in status.items() if k.endswith("_rel"))
    status["check_ok"] = ok
    print(json.dumps(status, indent=1), flush=True)

    # ---- timing at north-star size with tuned blocks -------------------
    if not args.no_time:
        nside, lmax = args.nside, args.lmax
        x, logch, logsh = sht._geom_arrays(nside, "float32")
        nhalf = 2 * nside
        x, logch, logsh = map(
            jnp.asarray, (x[:nhalf], logch[:nhalf], logsh[:nhalf]))
        nm_pad = -(-(lmax + 1) // 128) * 128
        F = [crand((nhalf, nm_pad)) for _ in range(4)]
        A = [crand((lmax + 1, nm_pad)) for _ in range(2)]

        def timeit(fn):
            float(jnp.sum(jnp.abs(fn())))
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                float(jnp.sum(jnp.abs(fn())))
                best = min(best, time.perf_counter() - t0)
            return round(best * 1e3, 1)

        status["analysis_spin0_ms"] = timeit(
            lambda: pallas_sht.analysis_spin0_folded(
                F[0], F[1], x, logch, logsh, lmax, ring_block=256))
        status["analysis_pair_ms"] = timeit(
            lambda: pallas_sht.analysis_pair_folded(
                F[0], F[1], F[2], F[3], x, logch, logsh, lmax, 2,
                ring_block=128)[0])
        status["synthesis_spin0_ms"] = timeit(
            lambda: pallas_sht.synthesis_spin0_folded(
                A[0], x, logch, logsh, lmax, ring_block=1024)[0])
        status["synthesis_pair_ms"] = timeit(
            lambda: pallas_sht.synthesis_pair_folded(
                A[0], A[1], x, logch, logsh, lmax, 2, ring_block=128)[0])
        print(json.dumps(status, indent=1), flush=True)

    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
