"""Figure-reproduction suite smoke (reference: the 10 notebooks are the
de-facto integration tests, SURVEY.md §4/§2.6)."""

import sys
from pathlib import Path

import pytest

NB = Path(__file__).parent.parent / "notebooks"


@pytest.fixture(autouse=True)
def _nb_path(tmp_path, monkeypatch):
    monkeypatch.syspath_prepend(str(NB))
    monkeypatch.setenv("GANSPACE_FIGURE_DIR", str(tmp_path / "figs"))
    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    yield


ARGS = ["--tiny", "--n", "128", "-c", "6"]


def _run(name, args=ARGS):
    import importlib
    mod = importlib.import_module(name)
    out = mod.main(args)
    assert out is not None and Path(out).exists()


def test_pca_illustration():
    _run("figure_pca_illustration", [])


def test_teaser():
    _run("figure_teaser")


def test_first_20_pcs():
    _run("figure_first_20_pcs")


def test_biggan_style_resampling():
    _run("figure_biggan_style_resampling")


def test_edit_zoo_roundtrip():
    _run("figure_edit_zoo")
