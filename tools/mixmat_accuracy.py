"""f32 mixing-matrix accuracy at production degree (VERDICT round-2 weak #6).

Builds the E/B mixing matrices at l1 = l2 = l3 = LMAX from a random
positive mask spectrum in CPU f64 (the truth: the GL quadrature is exact
in exact arithmetic, so f64 is a ~1e-13 oracle) and in f32 with
``jax.lax.Precision.HIGHEST`` einsums — the same arithmetic the TPU path
runs (heracles_tpu/twopoint.py:_mixmat_gl pins HIGHEST so the MXU's
bf16 passes are compensated).  Reports

* max |M32 - M64| relative to the max |M64| of each row (matrix-level
  error), and
* the error of the *applied* operator, max_l |(M32 - M64) @ C| / |M64 @ C|
  for a smooth test spectrum C -- the quantity that actually enters
  debiased Cls (reference anchor: heracles/twopoint.py:404-481 runs the
  same convolution in f64 via convolvecl).

Writes tools/mixmat_accuracy.json and prints one line per matrix.
Runs in its own process per dtype (the jax x64 flag is process-global).
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _run_one(dtype, lmax, path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    if dtype == "f64":
        jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, REPO)
    import numpy as np

    from heracles_tpu import twopoint

    rng = np.random.default_rng(42)
    # a realistic mask spectrum: steep power law + white floor, l3 to 2*lmax
    l3 = np.arange(2 * lmax + 1)
    cl = (1.0 / (1.0 + l3) ** 3 + 1e-9 / (2 * l3 + 1)) * (
        1.0 + 0.1 * rng.standard_normal(l3.size) ** 2
    )
    fdt = np.float64 if dtype == "f64" else np.float32
    cl = cl.astype(fdt)
    t0 = time.time()
    mm = np.asarray(
        twopoint.mixmat_eb(cl, l1max=lmax, l2max=lmax, spin=(2, 2))
    )
    m00 = np.asarray(twopoint.mixmat(cl, l1max=lmax, l2max=lmax, spin=(0, 0)))
    dt = time.time() - t0
    np.savez(path, mm=mm.astype(np.float64), m00=m00.astype(np.float64), dt=dt)


def main():
    lmax = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    paths = {}
    for dtype in ("f64", "f32"):
        path = os.path.join(HERE, f"_mixmat_{dtype}_{lmax}.npz")
        paths[dtype] = path
        if not os.path.exists(path):
            code = (
                "import sys; sys.path.insert(0, %r); "
                "from tools.mixmat_accuracy import _run_one; "
                "_run_one(%r, %d, %r)" % (REPO, dtype, lmax, path)
            )
            subprocess.run([sys.executable, "-c", code], check=True)
            print(f"built {dtype} matrices", file=sys.stderr)

    import numpy as np

    d64 = np.load(paths["f64"])
    d32 = np.load(paths["f32"])
    report = {"lmax": lmax}
    # smooth positive test spectrum for the applied-operator error
    l2 = np.arange(lmax + 1)
    test_cl = 1.0 / (1.0 + l2) ** 2

    for name in ("mm", "m00"):
        M64, M32 = d64[name], d32[name]
        M64 = M64.reshape((-1,) + M64.shape[-2:])
        M32 = M32.reshape((-1,) + M32.shape[-2:])
        mat_err = float(
            np.max(
                np.abs(M32 - M64)
                / np.maximum(np.abs(M64).max(axis=-1, keepdims=True), 1e-300)
            )
        )
        y64 = M64 @ test_cl
        dy = (M32 - M64) @ test_cl
        app_err = float(np.max(np.abs(dy) / np.maximum(np.abs(y64), 1e-300)))
        report[name] = {
            "matrix_rowrel_max": mat_err,
            "applied_rel_max": app_err,
        }
        print(
            json.dumps(
                {
                    "matrix": name,
                    "lmax": lmax,
                    "matrix_rowrel_max": mat_err,
                    "applied_rel_max": app_err,
                }
            )
        )
    report["f64_build_seconds"] = float(d64["dt"])
    report["f32_build_seconds"] = float(d32["dt"])
    out = os.path.join(HERE, "mixmat_accuracy.json")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    existing[str(lmax)] = report
    with open(out, "w") as f:
        json.dump(existing, f, indent=1, sort_keys=True)
    for p in paths.values():
        os.remove(p)


if __name__ == "__main__":
    main()
