"""Headline benchmark: spin-0 map2alm + alm2cl wall time on one chip.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.

The baseline is the reference pipeline's hot kernel, healpy/ducc
``map2alm`` on CPU (reference heracles/healpy.py:183-189).  The reference
repo publishes no numbers (BASELINE.md), so ``vs_baseline`` is measured
against a ducc-class CPU estimate for the same transform size recorded in
BASELINE_ESTIMATE below.
"""

import json
import os
import time

import numpy as np

# Benchmark configuration #1 scaled up: spin-0 catalogue->Cl hot path.
NSIDE = int(os.environ.get("BENCH_NSIDE", "1024"))
LMAX = int(os.environ.get("BENCH_LMAX", str(3 * NSIDE // 2)))

# ducc0-on-CPU wall-time estimate for one spin-0 map2alm at (nside, lmax),
# from the libsharp/ducc scaling ~ C * nring * lmax^2 with C calibrated on
# published ducc benchmarks (~5e9 lane-updates/s on a multicore desktop).
def _baseline_seconds(nside, lmax):
    return (4 * nside) * lmax * lmax / 5e9


def main():
    import jax

    from heracles_tpu.ops import sht

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", False)

    rng = np.random.default_rng(0)
    npix = 12 * NSIDE * NSIDE
    # keep the map device-resident, as the pipeline does (the reference's
    # map2alm operates on in-memory maps too)
    maps = jax.device_put(rng.normal(size=npix).astype(np.float32))
    maps.block_until_ready()

    import jax.numpy as jnp

    # a fused scalar reduction forces real execution on every call (some
    # remote-execution transports make block_until_ready a no-op)
    fn = jax.jit(lambda m: jnp.sum(jnp.abs(sht.map2alm(m, lmax=LMAX))))

    # compile + warm up
    float(fn(maps))

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        checksum = float(fn(maps))
    dt = (time.perf_counter() - t0) / reps

    baseline = _baseline_seconds(NSIDE, LMAX)
    print(
        json.dumps(
            {
                "metric": f"map2alm_nside{NSIDE}_lmax{LMAX}_wall",
                "value": round(dt * 1e3, 3),
                "unit": "ms",
                "vs_baseline": round(baseline / dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
