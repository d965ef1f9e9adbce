"""Sharded dd (double-single) paths + the DICES jackknife mesh test.

Third chunk of the sharded-path tests (see test_parallel_sharded.py) —
8-virtual-device shard_map compiles dominate, so the files are split to
fit ~10-minute CI chunks.
"""

import numpy as np
import pytest

from heracles_tpu.ops import sht

NSIDE, LMAX = 8, 12


@pytest.fixture(scope="module")
def mesh():
    from heracles_tpu import parallel

    m = parallel.make_mesh(8)
    assert m.devices.size == 8 and m.shape["m"] == 2
    return m


def test_jackknife_cls_with_mesh_matches_single_device(tmp_path):
    import numpy as np

    from heracles_tpu import HealpixMapper
    from heracles_tpu.core import update_metadata
    from heracles_tpu.dices import jackknife_cls
    from heracles_tpu.fields import Positions
    from heracles_tpu.parallel import make_mesh

    nside, lmax, njk = 8, 12, 4
    npix = 12 * nside * nside
    rng = np.random.default_rng(66)
    mapper = HealpixMapper(nside, lmax=lmax, deconvolve=False)
    fields = {"POS": Positions(mapper, "RA", "DEC", overdensity=False)}

    m = rng.normal(size=npix) + 1.0
    update_metadata(m, spin=0, fsky=1.0)
    v = np.ones(npix)
    update_metadata(v, spin=0, fsky=1.0)
    data_maps = {("POS", 0): m}
    vis_maps = {("POS", 0): v}
    jk_map = (np.arange(npix) * njk // npix + 1).astype(float)

    want = jackknife_cls(
        data_maps, vis_maps, jk_map, fields, dir=str(tmp_path / "a")
    )
    got = jackknife_cls(
        data_maps, vis_maps, jk_map, fields, dir=str(tmp_path / "b"),
        mesh=make_mesh(),
    )
    assert set(got.keys()) == set(want.keys())
    for k in want:
        for key in want[k]:
            np.testing.assert_allclose(
                np.asarray(got[k][key].array), np.asarray(want[k][key].array),
                rtol=1e-9, atol=1e-11,
            )




# dd + sharding composition is covered by the jnp engine here; the dd
# PALLAS kernels themselves are covered by test_pallas (interpret) and
# hardware-verified (tools/accuracy_sweep.json) — interpret-mode dd is
# far too slow on CPU to repeat through the sharded path
@pytest.mark.parametrize("spin,engine", [(0, "jnp"), (2, "jnp")])
def test_map2alm_sharded_dd_matches_f64(mesh, spin, engine):
    """Sharded dd analysis on f32 maps reaches ~f64 accuracy, beats plain."""
    from heracles_tpu import parallel

    nside, lmax = NSIDE, LMAX
    if spin == 0:
        (maps,) = parallel.example_batch(mesh, nside=nside, lmax=lmax, seed=11)
    else:
        _, maps = parallel.example_batch(mesh, nside=nside, lmax=lmax,
                                         seed=11, spin2=True)
    want = np.asarray(
        sht.map2alm(np.asarray(maps).astype(np.float64), lmax=lmax,
                    spin=spin, packed=False)
    )
    a_dd = np.asarray(
        parallel.map2alm_sharded(mesh, maps, lmax, spin=spin, engine=engine,
                                 dd=True)
    )[..., : lmax + 1]
    a_pl = np.asarray(
        parallel.map2alm_sharded(mesh, maps, lmax, spin=spin, engine=engine,
                                 dd=False)
    )[..., : lmax + 1]
    scale = np.abs(want).max()
    err_dd = np.abs(a_dd - want).max() / scale
    err_pl = np.abs(a_pl - want).max() / scale
    # the dd recurrence removes the f32 recurrence error; what remains is
    # the f32 input/FFT quantisation (~1e-7 at this toy scale)
    assert err_dd < 5e-7, (err_dd, err_pl)
    assert err_dd <= err_pl, (err_dd, err_pl)



