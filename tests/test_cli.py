"""CLI config factories (INI fragments -> objects)."""

import io

import numpy as np
import pytest

from heracles_tpu.cli import (
    ConfigParser,
    bins_from_config,
    fields_from_config,
    getdict,
    getfilter,
    getlist,
    mapper_from_config,
    spectra_from_config,
)


def make_config(text):
    config = ConfigParser()
    config.read_file(io.StringIO(text))
    return config


def test_converters():
    assert getlist("a\nb\n\nc") == ["a", "b", "c"]
    assert getdict("x = 1\ny = 2") == {"x": "1", "y": "2"}
    with pytest.raises(ValueError):
        getdict("novalue")
    filt = getfilter("POS, ..., 0\nSHE_E")
    assert filt == [("POS", ..., 0), ("SHE_E",)]


def test_mapper_from_config():
    from heracles_tpu.mappers import DiscreteMapper, HealpixMapper

    config = make_config(
        "[a]\nnside = 8\nlmax = 10\n"
        "[b]\nmapper = discrete\nlmax = 20\n"
        "[c]\nmapper = none\n"
    )
    m = mapper_from_config(config, "a")
    assert isinstance(m, HealpixMapper)
    assert m.nside == 8 and m.lmax == 10
    d = mapper_from_config(config, "b")
    assert isinstance(d, DiscreteMapper)
    assert d.lmax == 20
    assert mapper_from_config(config, "c") is None


def test_mapper_from_config_accuracy_knobs():
    config = make_config(
        "[a]\nnside = 8\nlmax = 10\ndd = true\niterations = 3\n"
        "[b]\nnside = 8\n"
    )
    m = mapper_from_config(config, "a")
    assert m._dd is True and m._iterations == 3
    m = mapper_from_config(config, "b")
    assert m._dd is None and m._iterations == 0
    config = make_config("[c]\nnside = 8\ndd = comp\n")
    assert mapper_from_config(config, "c")._dd == "comp"


def test_fields_from_config():
    from heracles_tpu.fields import Positions, Shears, Visibility

    config = make_config(
        "[defaults]\nnside = 8\n"
        "[fields:POS]\ntype = positions\ncolumns = RA\n\tDEC\nmask = VIS\n"
        "[fields:SHE]\ntype = shears\n"
        "columns = RA\n\tDEC\n\tG1\n\t-G2\n\tWEIGHT\nmask = WHT\n"
        "[fields:VIS]\ntype = visibility\n"
    )
    fields = fields_from_config(config)
    assert isinstance(fields["POS"], Positions)
    assert fields["POS"].mask == "VIS"
    assert fields["POS"].columns == ("RA", "DEC", None)
    assert isinstance(fields["SHE"], Shears)
    assert fields["SHE"].columns == ("RA", "DEC", "G1", "-G2", "WEIGHT")
    assert isinstance(fields["VIS"], Visibility)


def test_bins_from_config():
    config = make_config("[s]\nbins = 4 log\nlmin = 2\nlmax = 100\n")
    edges, w = bins_from_config(config, "s")
    assert w is None
    assert len(edges) == 5
    assert edges[0] == 2 and edges[-1] == 101
    config = make_config("[s]\nbins = 3 linear 2l+1\nlmax = 30\n")
    edges, w = bins_from_config(config, "s")
    assert w == "2l+1"
    np.testing.assert_allclose(np.diff(edges), np.diff(edges)[0])
    config = make_config("[s]\nlmax = 10\n")
    assert bins_from_config(config, "s") == (None, None)
    with pytest.raises(ValueError):
        bins_from_config(make_config("[s]\nbins = 1 log\nlmax = 9\n"), "s")
    with pytest.raises(ValueError):
        bins_from_config(make_config("[s]\nbins = 4 bad\nlmax = 9\n"), "s")


def test_spectra_from_config():
    config = make_config(
        "[spectra:full]\nlmax = 20\nl2max = 30\nl3max = 40\ndebias = false\n"
        "include = POS, ..., 0\n"
    )
    [(label, info)] = spectra_from_config(config)
    assert label == "full"
    assert info["lmax"] == 20 and info["l2max"] == 30 and info["l3max"] == 40
    assert info["debias"] is False
    assert info["include"] == [("POS", ..., 0)]
    # no sections -> single default entry
    assert spectra_from_config(make_config("[x]\na = 1\n")) == [(None, {})]


def test_defaults_section_applies():
    config = make_config(
        "[defaults]\nnside = 16\n[fields:POS]\ntype = positions\n"
        "columns = RA\n\tDEC\n"
    )
    fields = fields_from_config(config)
    assert fields["POS"].mapper.nside == 16


def test_cli_pipeline_end_to_end(tmp_path):
    """All four CLI stages over a synthetic catalogue (in-process)."""
    import logging
    import os

    import heracles_tpu.cli as cli
    from heracles_tpu import healpix as hpx
    from heracles_tpu.fits import FitsFile
    from heracles_tpu.io import _write_map, read, read_alms, read_maps

    rng = np.random.default_rng(0)
    n = 5000
    cat = str(tmp_path / "catalog.fits")
    f = FitsFile(cat, mode="rw", clobber=True)
    f.write_table(
        {
            "RA": rng.uniform(0, 360, n),
            "DEC": np.degrees(np.arcsin(rng.uniform(-1, 1, n))),
            "W": rng.uniform(0.5, 1.5, n),
            "G1": rng.normal(0, 0.1, n),
            "G2": rng.normal(0, 0.1, n),
            "ZBIN": rng.integers(0, 2, n).astype(np.int32),
        },
        extname="CATALOG",
    )
    vmap = str(tmp_path / "vmap.fits")
    vf = FitsFile(vmap, mode="rw", clobber=True)
    _write_map(vf, "VMAP", np.ones(hpx.nside2npix(8)))

    cfg = str(tmp_path / "heracles.cfg")
    with open(cfg, "w") as fp:
        fp.write(
            "[defaults]\nnside = 8\nlmax = 12\n"
            "[fields:POS]\ntype = positions\ncolumns = RA\n\tDEC\nmask = VIS\n"
            "[fields:SHE]\ntype = shears\n"
            "columns = RA\n\tDEC\n\tG1\n\t-G2\n\tW\nmask = WHT\n"
            "[fields:VIS]\ntype = visibility\n"
            "[fields:WHT]\ntype = weights\ncolumns = RA\n\tDEC\n\tW\n"
            f"[catalogs:cat]\nsource = {cat}\nvisibility = {vmap}\n"
            "selections = 0 = ZBIN == 0\n\t1 = ZBIN == 1\n"
            "[spectra:full]\nlmax = 12\nl2max = 12\nl3max = 12\n"
            "bins = 3 log\nlmin = 2\n"
        )

    logger = logging.getLogger("test_cli")
    maps_fits = str(tmp_path / "maps.fits")
    alms_fits = str(tmp_path / "alms.fits")
    cls_fits = str(tmp_path / "cls.fits")
    mms_fits = str(tmp_path / "mms.fits")

    cli.maps(maps_fits, files=[cfg], logger=logger, progress=False)
    assert len(read_maps(maps_fits)) == 8  # 4 fields x 2 selections

    cli.alms(alms_fits, files=[cfg], maps=[maps_fits], logger=logger,
             progress=False)
    alms = read_alms(alms_fits)
    assert len(alms) == 8
    assert alms["SHE", 0].shape[0] == 2  # E/B

    cli.spectra(cls_fits, files=[cfg], alms=[alms_fits], logger=logger,
                progress=False)
    cls = read(cls_fits)
    assert ("POS", "SHE", 0, 1) in cls
    assert cls["POS", "POS", 0, 0].shape == (3,)  # binned

    cli.mixmats(mms_fits, files=[cfg], alms=[alms_fits], logger=logger,
                progress=False)
    mms = read(mms_fits)
    assert ("SHE", "SHE", 0, 0) in mms
    assert mms["SHE", "SHE", 0, 0].shape == (3, 3, 13)  # EB blocks, binned


def test_make_example_data_cli_smoke(tmp_path):
    """examples/make_example_data.py output drives the CLI stages."""
    import importlib.util
    import logging
    import os

    import heracles_tpu.cli as cli
    from heracles_tpu.io import read, read_maps

    spec = importlib.util.spec_from_file_location(
        "make_example_data",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "make_example_data.py"),
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)

    out = str(tmp_path)
    gen.main([out, "--demo", "--nside", "8", "--nrows", "2000"])
    for name in ("catalog.fits", "vmap.fits", "heracles.cfg"):
        assert os.path.exists(os.path.join(out, name))

    cwd = os.getcwd()
    os.chdir(out)  # the demo config uses relative paths
    try:
        logger = logging.getLogger("test_example_data")
        cli.maps("maps.fits", files=["heracles.cfg"], logger=logger,
                 progress=False)
        assert len(read_maps("maps.fits")) == 12  # 4 fields x 3 selections
        cli.alms("alms.fits", files=["heracles.cfg"], maps=["maps.fits"],
                 logger=logger, progress=False)
        cli.spectra("cls.fits", files=["heracles.cfg"], alms=["alms.fits"],
                    logger=logger, progress=False)
        cls = read("cls.fits")
        assert ("POS", "POS", 0, 0) in cls
    finally:
        os.chdir(cwd)
