"""Deconvolving the mask — NaturalSpice tutorial script.

Mirrors the reference's ``examples/unmixing.ipynb``: account for a sky
mask in real space by dividing the measured correlation function by the
mask correlation function (with a logistic cutoff where the mask
correlation vanishes), instead of inverting the harmonic-space mixing
matrix.

Run on CPU:  JAX_PLATFORMS=cpu python examples/unmixing.py
Run on TPU:  python examples/unmixing.py
(from the repo root, with PYTHONPATH including the repo)
"""

import os
import sys

# runnable from anywhere: put the repo root (the package home) on the path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    # some patched jax builds pin the platform before env vars apply
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if os.environ["JAX_PLATFORMS"] == "cpu":
        jax.config.update("jax_enable_x64", True)

import numpy as np

import heracles_tpu as h
from heracles_tpu import healpix as hpx

# -- basic parameters ---------------------------------------------------
nside = 64
lmax = 96
ngal = 400_000

npix = hpx.nside2npix(nside)
rng = np.random.default_rng(11)

# -- a masked survey ------------------------------------------------------
# a 60% azimuthal band mask; the measured ("pseudo") spectra are coupled
# by this mask, and naturalspice undoes the coupling in real space
theta, _ = hpx.pix2ang_ring(nside, np.arange(npix))
mask = ((theta > 0.2 * np.pi) & (theta < 0.8 * np.pi)).astype(float)

arr_full = np.rec.fromarrays(
    [
        rng.uniform(0, 360, ngal),
        np.degrees(np.arcsin(rng.uniform(-1, 1, ngal))),
        rng.normal(0, 0.1, ngal),
        rng.normal(0, 0.1, ngal),
    ],
    names=["RA", "DEC", "E1", "E2"],
)
ipix = np.asarray(
    hpx.ang2pix_ring(nside, arr_full["RA"], arr_full["DEC"], lonlat=True)
)
arr = arr_full[mask[ipix] > 0]

catalog = h.ArrayCatalog(arr)
catalog.visibility = mask

# -- fields, maps, spectra ---------------------------------------------------
mapper = h.HealpixMapper(nside, lmax)
fields = {
    "POS": h.Positions(mapper, "RA", "DEC", mask="VIS"),
    "SHE": h.Shears(mapper, "RA", "DEC", "E1", "E2", mask="VIS"),
    "VIS": h.Visibility(mapper),
}
maps = h.map_catalogs(fields, {0: catalog})
alms = h.transform(fields, maps)
cls = h.angular_power_spectra(alms)
mask_cls = {k: v for k, v in cls.items() if k[:2] == ("VIS", "VIS")}
data_cls = {k: v for k, v in cls.items() if "VIS" not in k[:2]}
print("data spectra:", sorted(data_cls))
print("mask spectra:", sorted(mask_cls))

# -- the harmonic-space alternative: mixing matrices ------------------------
# (shown for contrast; see the reference's twopoint.py:316-524)
mms = h.mixing_matrices(fields, mask_cls, l1max=lmax, l2max=lmax)
print("mixing matrices:", sorted(mms))

# -- NaturalSpice ------------------------------------------------------------
# transform data & mask spectra to correlation functions on GL nodes,
# divide with a logistic cutoff in log10|xi_mask| (x0 set by theta_max,
# in degrees), transform back
nu = h.naturalspice(data_cls, mask_cls, fields, theta_max=60)
print("unmixed spectra:", sorted(nu))

key = ("POS", "POS", 0, 0)
ell = np.arange(lmax + 1)
fsky = float(mask.sum() / npix)
print("fsky:", round(fsky, 3))
print("pseudo-Cl  at l=20:", float(np.asarray(data_cls[key])[20]))
print("unmixed Cl at l=20:", float(np.asarray(nu[key].array)[20]))
# the crude fsky scaling should land between the two
print("pseudo/fsky at l=20:", float(np.asarray(data_cls[key])[20]) / fsky)
