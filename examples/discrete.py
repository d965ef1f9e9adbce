"""Discrete (map-free) angular power spectra — tutorial script.

Mirrors the reference's ``examples/discrete.ipynb``: compute angular
power spectra directly from a catalogue, without intermediary HEALPix
maps, using the pixel-free :class:`~heracles_tpu.DiscreteMapper` (the
role of ``heracles.ducc.DiscreteMapper`` in the reference).

Run on CPU:  JAX_PLATFORMS=cpu python examples/discrete.py
Run on TPU:  python examples/discrete.py
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
# when working with discrete spectra the only resolution parameter is lmax
lmax = 200
nbins = 2
ngal = 100_000

# -- synthetic catalogue ------------------------------------------------
# stands in for the notebook's Zenodo example data (no downloads here)
rng = np.random.default_rng(42)
arr = np.rec.fromarrays(
    [
        rng.uniform(0, 360, ngal),
        np.degrees(np.arcsin(rng.uniform(-1, 1, ngal))),
        rng.normal(0, 0.1, ngal),
        rng.normal(0, 0.1, ngal),
        rng.uniform(0.5, 1.5, ngal),
        rng.integers(1, nbins + 1, ngal).astype("i4"),
    ],
    names=["RA", "DEC", "E1", "E2", "W", "BIN"],
)

# -- visibility in harmonic space ----------------------------------------
# the discrete workflow carries the visibility as alms, not a map; the
# catalogue interface detects harmonic-space visibility automatically
# (the notebook uses read_vmap("vmap.fits.gz", transform=True, lmax=lmax))
vis_nside = 64
vis_map = np.ones(hpx.nside2npix(vis_nside))
h.update_metadata(vis_map, nside=vis_nside, spin=0)
vis_mapper = h.HealpixMapper(vis_nside, lmax, deconvolve=False)
valm = vis_mapper.transform(vis_map)
print("harmonic-space visibility:", valm.dtype, valm.shape)

catalog = h.ArrayCatalog(arr)
catalog.visibility = valm
print("fsky from harmonic visibility:", catalog.fsky)

# tomographic bins as catalogue views
catalogs = {}
for i in range(1, nbins + 1):
    catalogs[i] = catalog.where(arr["BIN"] == i)
    catalogs[i].visibility = valm

# -- two-point statistics -------------------------------------------------
# the DiscreteMapper produces alms directly; method="auto" switches to the
# gridded (NUFFT) adjoint at large point counts, honouring epsilon like
# the reference's ducc0.sht.adjoint_synthesis_general
mapper = h.DiscreteMapper(lmax)
fields = {
    "POS": h.Positions(mapper, "RA", "DEC", mask="VIS"),
    "SHE": h.Shears(mapper, "RA", "DEC", "E1", "E2", "W", mask="VIS"),
}

data = h.map_catalogs(fields, catalogs, parallel=True)
print("mapping result dtype (alms, not maps):", data["POS", 1].dtype)

# the mapped data already are alms: no transform() necessary
cls = h.angular_power_spectra(data)
print("spectra keys:", sorted(cls.keys())[:4], "...")

ell = np.arange(lmax + 1)
key = ("POS", "POS", 1, 1)
print(f"C_l{key} at l=10,100: {cls[key][10]:.3e}, {cls[key][100]:.3e}")

# -- binned spectra -------------------------------------------------------
ledges = np.unique(np.geomspace(10, lmax, 11).astype(int))
cqs = h.binned(cls, ledges, weight="2l+1")
print("binned bands:", cqs[key].array.shape, "ell:", np.round(cqs[key].ell, 1))
