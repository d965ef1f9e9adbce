"""DICES jackknife covariance — tutorial script.

Mirrors the reference's ``examples/jackknife-covariance.ipynb``: estimate
the covariance of the full tomographic spectrum grid with the DICES
method — a delete-1 jackknife over sky regions, debiased with the
delete-2 ensemble, shrunk towards a Gaussian target, and finished by
imposing the shrunk correlation structure.

Run on CPU:  JAX_PLATFORMS=cpu python examples/jackknife_covariance.py
Run on TPU:  python examples/jackknife_covariance.py
(from the repo root, with PYTHONPATH including the repo)
"""

import os
import sys

# runnable from anywhere: put the repo root (the package home) on the path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile

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

# -- basic parameters ---------------------------------------------------
nside = 32
lmax = 48
nbins = 2
njk = 8  # jackknife regions (the notebook uses 30 via skysegmentor)

npix = hpx.nside2npix(nside)
rng = np.random.default_rng(7)

# -- prepare maps ----------------------------------------------------------
# stands in for the notebook's example-data_maps.fits: random position and
# shear maps with the metadata the DICES pipeline needs (fsky + the
# noise-bias ingredients musq/dens used by correct_bias)
mapper = h.HealpixMapper(nside, lmax, deconvolve=False)
fields = {
    "POS": h.Positions(mapper, "RA", "DEC", mask="VIS"),
    "SHE": h.Shears(mapper, "RA", "DEC", "E1", "E2", mask="VIS"),
    "VIS": h.Visibility(mapper),
}

data_maps = {}
vis_maps = {}
for i in range(nbins):
    pos = mapper.create(spin=0)
    pos[:] = rng.normal(size=npix)
    h.update_metadata(pos, fsky=1.0, musq=1.0, dens=100.0)
    she = mapper.create(2, spin=2)
    she[:] = rng.normal(size=(2, npix))
    h.update_metadata(she, fsky=1.0, musq=1.0, dens=100.0)
    data_maps["POS", i] = pos
    data_maps["SHE", i] = she
vis = mapper.create(spin=0)
vis[:] = 1.0
h.update_metadata(vis, fsky=1.0)
vis_maps["VIS", 0] = vis

# -- jackknife regions -----------------------------------------------------
# equal-pixel-count segmentation (the notebook uses skysegmentor); regions
# are labelled 1..njk, 0 = outside the footprint
jk_map = np.zeros(npix)
edges = np.linspace(0, npix, njk + 1).astype(int)
for k in range(njk):
    jk_map[edges[k] : edges[k + 1]] = k + 1

# per-region alm/cls caches go to a scratch dir (the default ``./dices``
# writes into the current directory, like the reference)
workdir = tempfile.mkdtemp(prefix="dices_example_")

# -- two-point statistics ----------------------------------------------------
# nd=0: the full-footprint spectra (one "sample" with no deletions)
cls0 = dices.jackknife_cls(data_maps, vis_maps, jk_map, fields, nd=0, dir=workdir)[()]
print("cls0 keys:", len(cls0))

# -- ensemble computation -----------------------------------------------------
# nd=1: the delete-one ensemble — per-region alms are computed once (one
# batched SHT pass), cached, and each sample is full - region by alm
# linearity
cls1 = dices.jackknife_cls(data_maps, vis_maps, jk_map, fields, nd=1, dir=workdir)
print("delete-1 samples:", len(cls1))

# bin for numerical stability
ledges = np.unique(np.geomspace(4, lmax, 7).astype(int))
cqs0 = h.binned(cls0, ledges)
cqs1 = {k: h.binned(v, ledges) for k, v in cls1.items()}

# -- jackknife covariance ------------------------------------------------------
cov_jk = dices.jackknife_covariance(cqs1)
key = ("POS", "POS", "POS", "POS", 0, 0, 0, 0)
print("delete-1 cov diag:", np.diag(cov_jk[key])[:3])

# -- debiasing -------------------------------------------------------------
# jackknife errors are biased high; the delete-2 ensemble measures the bias
cls2 = dices.jackknife_cls(data_maps, vis_maps, jk_map, fields, nd=2, dir=workdir)
cqs2 = {k: h.binned(v, ledges) for k, v in cls2.items()}
debiased_cov_jk = dices.debias_covariance(cov_jk, cqs0, cqs1, cqs2)
print("debiased cov diag:", np.diag(debiased_cov_jk[key])[:3])

# -- shrinkage ----------------------------------------------------------------
# shrink towards the Knox-formula Gaussian target
gauss_cov = dices.gaussian_covariance(cqs0)
lam = dices.shrinkage_factor(cqs1, gauss_cov)
print("shrinkage factor:", round(float(lam), 4))
shrunk_cov_jk = dices.shrink(cov_jk, gauss_cov, lam)

# -- DICES --------------------------------------------------------------------
# impose the shrunk correlation structure on the debiased covariance
dices_cov = dices.impose_correlation(debiased_cov_jk, shrunk_cov_jk)
print("DICES cov diag:", np.diag(dices_cov[key])[:3])

# flatten the block covariance dict to one matrix for plotting/sampling
flat = dices.flatten(dices_cov)
print("flattened covariance:", flat.shape)
