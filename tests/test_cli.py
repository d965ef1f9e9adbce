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
