"""Generate self-contained synthetic inputs for the CLI example config.

The reference ships notebook helpers that *download* survey data
(reference examples/helpers.py:14-60); this image has no network, so the
demo inputs are synthesised instead: a position+shear catalogue with
tomographic bin labels and a smooth partial-sky visibility map, with the
column names used by ``examples/heracles.cfg``.

Usage (from the repo root)::

    python examples/make_example_data.py --demo demo/
    cd demo/
    JAX_PLATFORMS=cpu python -m heracles_tpu maps    -c heracles.cfg maps.fits
    JAX_PLATFORMS=cpu python -m heracles_tpu alms    -c heracles.cfg alms.fits maps.fits
    JAX_PLATFORMS=cpu python -m heracles_tpu spectra -c heracles.cfg cls.fits alms.fits
    JAX_PLATFORMS=cpu python -m heracles_tpu mixmats -c heracles.cfg mms.fits alms.fits

``--demo`` writes a CPU-sized config next to the data; without it, only
``catalog.fits`` + ``vmap.fits`` are written (sized for the production
``examples/heracles.cfg``, which expects nside=1024).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEMO_CFG = """\
# CPU-sized demo configuration (written by make_example_data.py)
[defaults]
nside = {nside}
lmax = {lmax}

[fields:POS]
type = positions
columns = RIGHT_ASCENSION
    DECLINATION
mask = VIS

[fields:SHE]
type = shears
columns = RIGHT_ASCENSION
    DECLINATION
    SHE_E1_CAL
    -SHE_E2_CAL
    SHE_WEIGHT
mask = WHT

[fields:VIS]
type = visibility

[fields:WHT]
type = weights
columns = RIGHT_ASCENSION
    DECLINATION
    SHE_WEIGHT

[catalogs:survey]
source = catalog.fits
visibility = vmap.fits
selections = 0 = TOM_BIN_ID == 0
    1 = TOM_BIN_ID == 1
    2 = TOM_BIN_ID == 2

[spectra:full]
lmax = {lmax}
l2max = {lmax}
l3max = {lmax}
debias = true
bins = {nbins} log 2l+1
lmin = 2
"""


def make_visibility(nside, rng):
    """Smooth partial-sky visibility: a broad band plus soft holes."""
    from heracles_tpu import healpix as hpx

    npix = hpx.nside2npix(nside)
    theta, phi = hpx.pix2ang_ring(nside, np.arange(npix))
    # galactic-plane-style cut with soft edges + large-scale modulation
    lat = np.pi / 2 - theta
    band = 1.0 / (1.0 + np.exp(-(np.abs(lat) - 0.35) * 12.0))
    ripple = 0.9 + 0.1 * np.cos(3 * phi) * np.cos(2 * theta)
    vis = np.clip(band * ripple, 0.0, 1.0)
    vis[vis < 0.05] = 0.0
    return vis


def sample_catalog(nrows, nbins_tomo, vis, nside, rng):
    """Positions drawn from the visibility, with Gaussian shear columns."""
    from heracles_tpu import healpix as hpx

    npix = hpx.nside2npix(nside)
    # rejection-sample pixels by visibility, then jitter inside the pixel
    probs = vis / vis.sum()
    pix = rng.choice(npix, size=nrows, p=probs)
    theta, phi = hpx.pix2ang_ring(nside, pix)
    # jitter of roughly a pixel radius
    scale = np.sqrt(4 * np.pi / npix)
    theta = np.clip(theta + rng.normal(0, scale / 2, nrows), 1e-4,
                    np.pi - 1e-4)
    phi = (phi + rng.normal(0, scale / 2, nrows)) % (2 * np.pi)
    return {
        "RIGHT_ASCENSION": np.degrees(phi),
        "DECLINATION": 90.0 - np.degrees(theta),
        "SHE_E1_CAL": rng.normal(0.0, 0.26, nrows),
        "SHE_E2_CAL": rng.normal(0.0, 0.26, nrows),
        "SHE_WEIGHT": rng.uniform(0.5, 1.5, nrows),
        "TOM_BIN_ID": rng.integers(0, nbins_tomo, nrows).astype(np.int32),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("outdir", nargs="?", default=".",
                    help="directory for catalog.fits / vmap.fits")
    ap.add_argument("--nside", type=int, default=None,
                    help="visibility map resolution "
                         "(default: 64 with --demo, 1024 without)")
    ap.add_argument("--nrows", type=int, default=None,
                    help="catalogue rows (default: 50000 with --demo, "
                         "2000000 without)")
    ap.add_argument("--demo", action="store_true",
                    help="also write a CPU-sized heracles.cfg")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    nside = args.nside or (64 if args.demo else 1024)
    nrows = args.nrows or (50_000 if args.demo else 2_000_000)
    lmax = 3 * nside // 2

    from heracles_tpu.fits import FitsFile
    from heracles_tpu.io import _write_map

    os.makedirs(args.outdir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    vis = make_visibility(nside, rng)
    vmap_path = os.path.join(args.outdir, "vmap.fits")
    with FitsFile(vmap_path, mode="rw", clobber=True) as f:
        _write_map(f, "VMAP", vis)
    print(f"wrote {vmap_path} (nside={nside}, "
          f"fsky={vis.mean():.2f})")

    cat_path = os.path.join(args.outdir, "catalog.fits")
    table = sample_catalog(nrows, 3, vis, nside, rng)
    with FitsFile(cat_path, mode="rw", clobber=True) as f:
        f.write_table(table, extname="CATALOG")
    print(f"wrote {cat_path} ({nrows} rows)")

    if args.demo:
        cfg_path = os.path.join(args.outdir, "heracles.cfg")
        with open(cfg_path, "w") as f:
            f.write(DEMO_CFG.format(nside=nside, lmax=lmax,
                                    nbins=max(2, min(16, lmax // 8))))
        print(f"wrote {cfg_path} (nside={nside}, lmax={lmax})")


if __name__ == "__main__":
    main()
