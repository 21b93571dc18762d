"""Headless interactive-session tests: edit math, direction export/import,
viewer frame rendering (reference ``interactive.py`` semantics)."""

import numpy as np
import pytest

from ganspace_tpu.apps.interactive import ParamCache, Session, get_edit_name
from ganspace_tpu.config import Config
from ganspace_tpu.directions import (
    direction_file_ident,
    load_direction,
    load_named_components,
)

from helpers import tiny_stylegan2


@pytest.fixture(scope="module")
def session(tmp_path_factory):
    out = tmp_path_factory.mktemp("interactive")
    import os
    os.environ["GANSPACE_OUTPUT_DIR"] = str(out)
    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="style",
                 estimator="ipca", components=6, n=1200, use_w=True,
                 batch_size=128)
    model = tiny_stylegan2(use_w=True)
    from ganspace_tpu.models.base import InstrumentedModel

    # Build session around the tiny model: patch get_instrumented_model path
    import ganspace_tpu.apps.interactive as mod
    inst = InstrumentedModel(model)
    from ganspace_tpu.models import annotate_model_shapes
    model.use_z()
    annotate_model_shapes(inst, ["style"])
    model.use_w()
    orig = mod.get_instrumented_model
    mod.get_instrumented_model = lambda *a, **k: inst
    try:
        sess = Session(cfg, n_sliders=6)
    finally:
        mod.get_instrumented_model = orig
    return sess


def test_param_cache():
    c = ParamCache()
    assert c.update(a=1, b=np.zeros(3))
    assert not c.update(a=1, b=np.zeros(3))
    assert c.update(b=np.ones(3))


def test_render_changes_with_sliders(session):
    session.zero_sliders()
    base = session.render(force=True).copy()
    session.sliders[0] = 3.0
    edited = session.render()
    assert np.abs(base - edited).max() > 1e-4
    # lazy cache: same params -> same object
    again = session.render()
    assert again is edited


def test_layer_window_edit(session):
    session.zero_sliders()
    session.sliders[1] = 2.0
    session.edit_layer_start, session.edit_layer_end = 0, session.model.get_max_latents()
    full = session.render().copy()
    session.edit_layer_start, session.edit_layer_end = 5, 7
    windowed = session.render()
    assert np.abs(full - windowed).max() > 1e-5


def test_resample_changes_latent(session):
    z0 = np.asarray(session.state.z).copy()
    session.resample_latent(seed=123)
    assert not np.array_equal(z0, np.asarray(session.state.z))
    assert session.state.base_act is not None


def test_export_import_direction(session, tmp_path):
    session.mode = "latent"
    path = session.export_direction(2, "Test Dir", sigma_range=2.0,
                                    out_dir=tmp_path)
    assert path.is_file()
    d = load_direction(path)
    assert d["name"] == "Test Dir"
    assert d["component_index"] == 2
    assert d["latent_space"] == "W"
    assert d["act_comp"].shape == (1, 512)
    assert d["decomposition"]["layer"] == "style"
    # file identity scheme
    assert direction_file_ident(d) in path.name

    found = load_named_components(tmp_path, "StyleGAN2", "ffhq", latent_space="W")
    assert len(found) == 1
    # filtered out for a different model
    assert load_named_components(tmp_path, "StyleGAN", "ffhq") == []


def test_edit_name_syntax():
    assert get_edit_name(3, 0, 5, "smile") == "E(3, 0-5): smile"
    assert get_edit_name(3, 4, 4) == "E(3, 4)"


def test_render_np_uint8(session):
    frame = session.render_np()
    assert frame.dtype == np.uint8
    assert frame.ndim == 3 and frame.shape[2] == 3


def test_warmup_preserves_state(session):
    session.sliders[:] = 0
    session.sliders[1] = 2.5
    before = session.render(force=True).copy()
    session.warmup()
    assert session.sliders[1] == 2.5
    after = session.render(force=True)
    assert np.array_equal(before, after)


def test_apply_preview_precision_rejects_unknown_dtype():
    """--dtype only accepts float32/bfloat16; anything else must exit with a
    usage message, not a raw KeyError from the handler."""
    import pytest
    from ganspace_tpu.apps.interactive import apply_preview_precision

    class Args:
        dtype = "bf16"

    with pytest.raises(SystemExit, match="float32"):
        apply_preview_precision(Args())


def test_viewer_http_endpoints(session):
    """Live server round trip: page, frame, resample, state validation
    (reference interactive UI surface; verify-skill endpoint list)."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from ganspace_tpu.apps.interactive import make_server

    server = make_server(session, port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(f"{base}/").read().decode()
        assert "ganspace-tpu" in page and "Component 0" in page
        frame = urllib.request.urlopen(f"{base}/frame.jpg").read()
        assert frame[:2] == b"\xff\xd8"                 # JPEG magic
        assert urllib.request.urlopen(f"{base}/resample?seed=7").read() == b"ok"
        assert session.state.seed == 7

        def post(payload):
            req = urllib.request.Request(
                f"{base}/state", method="POST",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            return urllib.request.urlopen(req)

        max_lat = session.model.get_max_latents()
        assert post({"sliders": [1.0], "mode": "latent",
                     "lstart": -5, "lend": 10_000}).status == 200
        assert session.edit_layer_start == 0            # clamped
        assert session.edit_layer_end == max_lat
        assert abs(session.sliders[0] - 1.0) < 1e-6
        # rendering after the clamped window must not raise
        session.render(force=True)

        for bad in ({"sliders": ["a"]}, {"mode": "nope"}, ["not", "a", "dict"],
                    {"sliders": [[1.0], [2.0]]},        # nested -> 400
                    {"sliders": [float("nan")]},        # non-finite -> 400
                    {"trunc": float("nan")}):           # NaN trunc -> 400
            req = urllib.request.Request(
                f"{base}/state", method="POST",
                data=json.dumps(bad).encode(),
                headers={"Content-Type": "application/json"})
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req)
            assert exc.value.code == 400, bad

        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(f"{base}/nope")
        assert exc.value.code == 404
        # server still healthy after the rejects
        assert urllib.request.urlopen(f"{base}/frame.jpg").read()[:2] == b"\xff\xd8"
    finally:
        server.shutdown()
        session.sliders[:] = 0.0


def test_speculative_frame_cache(session):
    """Pre-rendered neighbor frames are served from the cache: same pixels,
    no second device render for the same edit state."""
    s = session
    s.frame_cache._d.clear()
    s.sliders[:] = 0
    s.sliders[0] = np.float32(0.1)
    first = s.render(force=True).copy()
    assert len(s.frame_cache) >= 1

    # idle worker pre-renders the neighbors of the moved slider
    s._last_moved = 0
    added = s._speculate_once()
    assert added >= 2   # +-1, +-2 steps (minus any already-cached)

    # moving to the speculated position is a cache hit with identical pixels
    hits_before = s.frame_cache.hits
    s.sliders[0] = np.float32(0.2)
    frame_fast = s.render()
    assert s.frame_cache.hits == hits_before + 1
    s.frame_cache._d.clear()
    s.cache.update(coords=None)   # dirty so render recomputes
    frame_slow = s.render(force=True)
    np.testing.assert_array_equal(frame_fast, frame_slow)
    assert not np.array_equal(first, frame_fast)  # a real different frame

    # returning to the base position also hits (it was cached on render)
    s.sliders[0] = np.float32(0.1)


def test_speculation_thread_lifecycle(session):
    s = session
    s.start_speculation()
    assert s._spec_thread is not None and s._spec_thread.is_alive()
    s.sliders[0] = np.float32(0.3)
    s.render(force=True)
    import time
    deadline = time.time() + 10
    while time.time() < deadline and len(s.frame_cache) < 3:
        time.sleep(0.1)
    s.stop_speculation()
    assert s._spec_thread is None
    assert len(s.frame_cache) >= 3   # worker filled neighbors

    s.sliders[0] = 0.0
    s.render()


def test_time_frame_speculative(session):
    fast_ms = session.time_frame_speculative(iters=3)
    synth_ms, read_ms, total_ms = session.time_frame(iters=3)
    # a cache hit must be much cheaper than a full device frame
    assert fast_ms < max(1.0, 0.5 * total_ms)
