"""Calibrate the achievable VPU f32 throughput with a Pallas kernel.

The SHT speed-of-light analysis (BASELINE.md, STATUS.md) needs the real
per-chip f32 elementwise op rate, not a datasheet guess: this kernel
runs ``steps`` chained FMAs over a VMEM-resident (rows, 128) block and
reports sustained op/s.  Two variants bracket the SHT kernels' mix:

* ``fma``  — pure dependent-chain FMAs (4 independent chains, like the
  kernels' ``_dot_rows`` contraction);
* ``rec3`` — the 3-op recurrence step shape (mul + mul + FMA with a
  2-deep dependency), the bulk Wigner step's exact dataflow.

Usage: ``python tools/vpu_peak.py [--rows 256] [--steps 4096]``
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


_UNROLL = 64


def _fma_kernel(a_ref, b_ref, o_ref, *, steps, nchain):
    a = a_ref[...]
    b = b_ref[...]
    accs = [a * (0.5 + 0.125 * c) for c in range(nchain)]

    # fori_loop keeps the compile small; _UNROLL statements per
    # iteration keep the loop bookkeeping off the measurement.  The
    # cross-coupled update (acc*b, then +a) keeps one dependent FMA per
    # step on the critical path and leaves nothing loop-invariant.
    def body(i, accs):
        for _ in range(_UNROLL):
            accs = [acc * b + a for acc in accs]
        return accs

    accs = jax.lax.fori_loop(0, steps // _UNROLL, body, accs)
    o_ref[...] = functools.reduce(lambda u, v: u + v, accs)


def _rec3_kernel(a_ref, b_ref, o_ref, *, steps, nchain):
    a = a_ref[...]
    x = b_ref[...]
    prevs = [a * (0.25 * (c + 1)) for c in range(nchain)]
    currs = [a * (0.125 * (c + 1)) for c in range(nchain)]

    def body(i, carry):
        prevs, currs = carry
        for _ in range(_UNROLL):
            news = [
                1.0001 * (x * currs[c]) - 0.9999 * prevs[c]
                for c in range(nchain)
            ]
            prevs, currs = currs, news
        return prevs, currs

    prevs, currs = jax.lax.fori_loop(0, steps // _UNROLL, body,
                                     (prevs, currs))
    o_ref[...] = functools.reduce(lambda u, v: u + v, currs)


def run(kind, rows, steps, nchain, reps=3):
    kern = {"fma": _fma_kernel, "rec3": _rec3_kernel}[kind]
    ops_per_step = {"fma": 2, "rec3": 3}[kind]
    # the kernels execute (steps // _UNROLL) * _UNROLL steps; count ops
    # from the executed step count, not the requested one
    steps = (steps // _UNROLL) * _UNROLL
    if steps == 0:
        raise ValueError(f"--steps must be >= {_UNROLL}")
    a = jnp.full((rows, 128), 1.0 + 2.0**-20, jnp.float32)
    b = jnp.full((rows, 128), 1.0 - 2.0**-20, jnp.float32)
    fn = jax.jit(
        lambda a, b: pl.pallas_call(
            functools.partial(kern, steps=steps, nchain=nchain),
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        )(a, b)
    )
    out = fn(a, b)
    float(jnp.sum(out))  # force
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(a, b)))
        best = min(best, time.perf_counter() - t0)
    # the jnp.sum + tunnel dispatch ride inside `best`; subtract the
    # measured dispatch floor separately if needed (31 ms here)
    n_ops = rows * 128 * steps * nchain * ops_per_step
    return best, n_ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8192)
    ap.add_argument("--nchain", type=int, default=4)
    args = ap.parse_args()
    for kind in ("fma", "rec3"):
        dt, n_ops = run(kind, args.rows, args.steps, args.nchain)
        print(
            f"{kind}: {dt * 1e3:.2f} ms for {n_ops / 1e9:.2f} Gop "
            f"-> {n_ops / dt / 1e12:.3f} Top/s "
            f"({n_ops / max(dt - 0.031, 1e-9) / 1e12:.3f} Top/s "
            f"net of 31 ms dispatch)"
        )


if __name__ == "__main__":
    main()
