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


@pytest.mark.slow
def test_teaser():
    _run("figure_teaser")


@pytest.mark.slow
def test_first_20_pcs():
    _run("figure_first_20_pcs")


@pytest.mark.slow
def test_biggan_style_resampling():
    _run("figure_biggan_style_resampling")


def test_edit_zoo_roundtrip():
    _run("figure_edit_zoo")


def test_demo_notebook_committed_and_valid():
    """Ganspace_tpu.ipynb (the Ganspace_colab.ipynb equivalent) is committed
    pre-executed: parses, every code cell ran in order with no error
    outputs, and the edit-strip figures are embedded."""
    import nbformat

    path = Path(__file__).parent.parent / "notebooks" / "Ganspace_tpu.ipynb"
    nb = nbformat.read(path, as_version=4)
    nbformat.validate(nb)
    code = [c for c in nb.cells if c.cell_type == "code"]
    assert len(code) >= 5
    assert [c.execution_count for c in code] == list(range(1, len(code) + 1))
    for c in code:
        assert not [o for o in c.outputs if o.output_type == "error"]
    assert sum("image/png" in o.get("data", {})
               for c in code for o in c.outputs) >= 2

    # builder stays importable and produces the same cell structure
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "make_demo_notebook",
        Path(__file__).parent.parent / "notebooks" / "make_demo_notebook.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    built = mod.build()
    assert [c.cell_type for c in built.cells] == [c.cell_type for c in nb.cells]
    assert [c.source for c in built.cells if c.cell_type == "code"] == \
        [c.source for c in code]
