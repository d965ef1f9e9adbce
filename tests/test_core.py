"""Core utilities: tuple-key matching, TocDict, metadata plumbing."""

import numpy as np
import pytest

from heracles_tpu.core import TocDict, toc_filter, toc_match, update_metadata


def test_toc_match():
    assert toc_match(("a", 1))
    assert toc_match(("a", 1), include=[("a", 1)])
    assert toc_match(("a", 1), include=[(..., 1)])
    assert toc_match(("a", 1), include=[("a",)])
    assert not toc_match(("a", 1), include=[("b", ...)])
    assert not toc_match(("a", 1), exclude=[(..., ...)])
    assert not toc_match(("a", 1), exclude=[("a",)])
    assert toc_match(("a", 1), exclude=[("b", ...)])
    # non-tuple keys are wrapped
    assert toc_match("x", include=[("x",)])


def test_toc_filter():
    d = {("a", 1): 1, ("a", 2): 2, ("b", 1): 3}
    assert toc_filter(d, include=[("a",)]) == {("a", 1): 1, ("a", 2): 2}
    assert toc_filter(d, exclude=[(..., 1)]) == {("a", 2): 2}
    assert toc_filter([d, d], include=[("b",)]) == [{("b", 1): 3}] * 2
    with pytest.raises(TypeError):
        toc_filter(object())


def test_tocdict_wildcards():
    d = TocDict({("a", 1): 10, ("a", 2): 20, ("b", 1): 30})
    assert d["a", 1] == 10
    assert dict(d["a"]) == {("a", 1): 10, ("a", 2): 20}
    assert dict(d["a", ...]) == {("a", 1): 10, ("a", 2): 20}
    assert dict(d[..., 1]) == {("a", 1): 10, ("b", 1): 30}
    with pytest.raises(KeyError):
        d["c"]
    with pytest.raises(KeyError):
        d["a", 3]
    # copy on full wildcard
    assert dict(d[...,]) == dict(d)


def test_update_metadata():
    a = np.zeros(3)
    update_metadata(a, nside=8, spin=0)
    assert a.dtype.metadata == {"nside": 8, "spin": 0}
    update_metadata(a, lmax=12)
    assert a.dtype.metadata == {"nside": 8, "spin": 0, "lmax": 12}
    # merge from sources carrying .metadata
    class Src:
        metadata = {"catalog": "cat"}

    update_metadata(a, Src())
    assert a.dtype.metadata["catalog"] == "cat"
    # metadata survives views but not copies of the dtype itself
    b = a.view()
    assert b.dtype.metadata["nside"] == 8
