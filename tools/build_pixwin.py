"""Build + package an exact pixel window table (TPU queue entry).

Runs :func:`heracles_tpu.ops.pixwin.pixel_window_exact` (chunk-
checkpointed, crash-resumable) and installs the resulting table into
``heracles_tpu/data/`` so ``pixel_window(nside, lmax, pol=True)``
resolves "exact" with no cap fallback — the reference deconvolves with
healpy's exact tables at every nside (heracles/healpy.py:170-196).

    python tools/build_pixwin.py NSIDE LMAX [--factor 16] [--cap-samples 1]

Intended to run from the serial TPU queue (one TPU process at a time).
"""

import argparse
import logging
import os
import shutil
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("nside", type=int)
    ap.add_argument("lmax", type=int)
    ap.add_argument("--factor", type=int, default=16)
    ap.add_argument("--cap-samples", type=int, default=1)
    ap.add_argument("--no-install", action="store_true")
    args = ap.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(message)s",
    )

    from heracles_tpu.ops import pixwin

    w = pixwin.pixel_window_exact(
        args.nside, args.lmax, pol=True,
        factor=args.factor, cap_samples=args.cap_samples,
    )
    print("window shape", w.shape, "w0[:4]", w[0, :4], "wP[:4]", w[1, :4],
          flush=True)

    name = (f"pixwin_{args.nside}_{args.lmax}_1_{args.factor}"
            f"_{args.cap_samples}.npy")
    src = os.path.join(pixwin._cache_dir(), name)
    if not os.path.exists(src):
        raise SystemExit(f"expected cache file missing: {src}")
    if not args.no_install:
        dst = os.path.join(REPO, "heracles_tpu", "data", name)
        shutil.copy(src, dst)
        print("installed", dst, flush=True)


if __name__ == "__main__":
    main()
