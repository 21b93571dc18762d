"""Visualizer CLI end-to-end on a tiny run (reference ``visualize.py``):
output tree, summary grids, sweep videos (stub ffmpeg), gallery pages."""

import stat

import numpy as np
import pytest


@pytest.mark.slow
def test_visualize_cli_tree_and_video(tmp_path, monkeypatch):
    stub = tmp_path / "bin" / "ffmpeg"
    stub.parent.mkdir()
    argdir = tmp_path / "ffmpeg_calls"
    argdir.mkdir()
    stub.write_text("#!/bin/sh\n"
                    f'printf \'%s\\n\' "$@" > "{argdir}/$$.txt"\n'
                    "cat > /dev/null\n")
    stub.chmod(stub.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setattr("ganspace_tpu.utils.video.shutil.which",
                        lambda name: str(stub))
    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))

    # --mesh 1: render single-device — the meshed pipeline has its own tests
    # (test_mesh_pipeline, dryrun); 88 sweep renders on the emulated 8-device
    # mesh would take most of the suite's budget.
    from ganspace_tpu.apps.visualize import main
    main(["--model", "DCGAN", "--layer", "deconv1", "--est", "ipca",
          "-c", "2", "-n", "128", "-b", "64", "--video", "--mesh", "1"])

    root = tmp_path / "out" / "DCGAN" / "deconv1" / "ipca"
    summ = sorted(p.name for p in (root / "summ").glob("*.jpg"))
    # per-mode component grids + random-dir grids + 10 random-instance grids
    assert "components_ACT.jpg" in summ and "components_Z.jpg" in summ
    assert "random_dirs_ACT.jpg" in summ
    assert sum(n.startswith("samp") for n in summ) == 20   # 10 imgs x 2 modes

    # stub ffmpeg got every sweep: 2 comps x 2 sigmas x 2 modes summary
    # videos + 10 imgs x 2 comps x 2 sigmas x 2 modes instance videos
    calls = list(argdir.glob("*.txt"))
    assert len(calls) == 8 + 80
    args0 = calls[0].read_text().splitlines()
    assert args0[args0.index("-s") + 1] == "64x64"

    # gallery pages list the written images
    page = (root / "summ" / "+lightbox.html").read_text()
    assert "components_ACT.jpg" in page
    assert (root / "comp" / "+lightbox.html").exists() is False  # videos only

    # cache reuse: re-running skips the compute (fresh estimator not refit)
    from ganspace_tpu.decomposition import component_cache_name
    from ganspace_tpu.config import Config
    cfg = Config(model="DCGAN", layer="deconv1", estimator="ipca",
                 components=2, n=128)
    cache = tmp_path / "cache" / "components" / component_cache_name(cfg)
    assert cache.exists()
    stamp = cache.stat().st_mtime_ns
    main(["--model", "DCGAN", "--layer", "deconv1", "--est", "ipca",
          "-c", "2", "-n", "128", "-b", "64", "--mesh", "1"])
    assert cache.stat().st_mtime_ns == stamp
