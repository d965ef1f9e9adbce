"""End-to-end heracles-tpu walkthrough on a synthetic catalogue.

Run on CPU:  JAX_PLATFORMS=cpu python examples/example.py
Run on TPU:  python examples/example.py   (float32)

Covers the full library surface: catalogue -> fields -> maps -> alms ->
angular power spectra -> mask spectra -> mixing matrices -> unmixing ->
jackknife covariance with shrinkage.
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
import heracles_tpu.dices as dices
from heracles_tpu import healpix as hpx

NSIDE = 32
LMAX = 48
NGAL = 200_000

# -- synthetic catalogue ----------------------------------------------------
rng = np.random.default_rng(42)
arr = np.rec.fromarrays(
    [
        rng.uniform(0, 360, NGAL),
        np.degrees(np.arcsin(rng.uniform(-1, 1, NGAL))),
        rng.uniform(0.5, 1.5, NGAL),
        rng.normal(0, 0.1, NGAL),
        rng.normal(0, 0.1, NGAL),
        rng.integers(0, 2, NGAL).astype("i4"),
    ],
    names=["RA", "DEC", "W", "G1", "G2", "ZBIN"],
)
catalog = h.ArrayCatalog(arr)
catalog.visibility = np.ones(hpx.nside2npix(NSIDE))
catalogs = {b: catalog.where(arr["ZBIN"] == b) for b in (0, 1)}
for view in catalogs.values():
    view.visibility = catalog.visibility

# -- fields and maps ----------------------------------------------------------
mapper = h.HealpixMapper(NSIDE, LMAX)
fields = {
    "POS": h.Positions(mapper, "RA", "DEC", mask="VIS"),
    "SHE": h.Shears(mapper, "RA", "DEC", "G1", "-G2", "W", mask="WHT"),
    "VIS": h.Visibility(mapper),
    "WHT": h.Weights(mapper, "RA", "DEC", "W"),
}
maps = h.map_catalogs(fields, catalogs)
print("maps:", sorted(maps.keys()))

# -- alms and spectra ---------------------------------------------------------
alms = h.transform(fields, maps)
cls = h.angular_power_spectra(
    alms, lmax=LMAX, include=[("POS", ...), ("SHE", ...), (..., "POS"), (..., "SHE")]
)
print("spectra:", len(cls))

# -- binning ------------------------------------------------------------------
edges = np.unique(np.geomspace(2, LMAX + 1, 8).astype(int))
cls_binned = h.binned(cls, edges, "2l+1")
print("binned shape:", cls_binned["POS", "POS", 0, 0].shape)

# -- mixing matrices from mask spectra ---------------------------------------
mask_cls = h.angular_power_spectra(
    alms, include=[("VIS", ...), ("WHT", ...), (..., "VIS"), (..., "WHT")]
)
mms = h.mixing_matrices(fields, mask_cls, l1max=LMAX, l2max=LMAX, l3max=LMAX)
print("mixing matrices:", sorted(mms.keys())[:3], "...")

# unmix one spectrum with the pseudo-inverse
inv = h.invert_mixing_matrix({k: mms[k] for k in [("POS", "POS", 0, 0)]})
unmixed = h.apply_mixing_matrix(
    {("POS", "POS", 0, 0): cls["POS", "POS", 0, 0]}, inv
)
print("unmixed cl[2:6]:", np.asarray(unmixed["POS", "POS", 0, 0])[2:6])

# -- jackknife covariance (DICES) ---------------------------------------------
import tempfile

npix = hpx.nside2npix(NSIDE)
jk = np.ceil(np.arange(1, npix + 1) / (npix / 4.0))  # 4 regions
data_maps = {("POS", 0): maps["POS", 0]}
vis_maps = {("VIS", 0): maps["VIS", 0]}
with tempfile.TemporaryDirectory() as tmp:
    cls0 = dices.jackknife_cls(data_maps, vis_maps, jk, fields, nd=0, dir=tmp)[()]
    cls1 = dices.jackknife_cls(data_maps, vis_maps, jk, fields, nd=1, dir=tmp)
    cov = dices.jackknife_covariance(cls1, nd=1)
    target = dices.gaussian_covariance(cls0)
    lam = dices.shrinkage_factor(cls1, target)
    shrunk = dices.shrink(cov, target, np.clip(lam, 0, 1))
key = ("POS", "POS", "POS", "POS", 0, 0, 0, 0)
print("covariance diag[2:6]:", np.diag(np.asarray(shrunk[key]))[2:6])
print("done")
