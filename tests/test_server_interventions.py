"""GanTester-style intervention state on the dissection server
(VERDICT r4 #8 — reference serverstate.py:12-60, netdissect/edit.html).

The headline test is a scripted HTTP session reproducing an edit.html
round trip: set a persistent intervention set, generate standard-id
images under it (base64, reference POST /generate shape), read edited
feature stats, save the intervention as a project recipe, and list it
back — plus decode-level tests of the reference intervention wire format
(alpha-blend combination, bitstring masks, pooling).
"""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from ganspace_tpu.dissection.dissect import ColorSegmenter, dissect
from ganspace_tpu.dissection.server import (
    DissectionSession, decode_intervention_array, mask_to_numpy, serve)
from ganspace_tpu.models.base import InstrumentedModel

from helpers import tiny_dcgan

SHAPES = {"layerX": (1, 4, 8, 8)}


def test_mask_to_numpy_bitstring():
    rec = {"bitstring": "10" * 8, "shape": [4, 8], "bitbounds": [1, 0, 3, 8]}
    m = mask_to_numpy(rec)
    assert m.shape == (4, 8)
    assert m[1, 0] == 1.0 and m[1, 1] == 0.0
    assert m[0].sum() == 0 and m[3].sum() == 0


def test_decode_intervention_alpha_blend():
    """Two interventions on the same unit combine by the reference's alpha
    blend: a2 = 1-(1-a)(1-a'), v2 = (v*a*(1-a') + v'*a')/a2."""
    iv = [{"ablations": [{"layer": "layerX", "unit": 1,
                          "alpha": 0.5, "value": 2.0}]},
          {"ablations": [{"layer": "layerX", "unit": 1,
                          "alpha": 0.5, "value": 6.0}]}]
    out = decode_intervention_array(iv, SHAPES)["layerX"]
    a = 1 - 0.5 * 0.5
    v = (2.0 * 0.5 * 0.5 + 6.0 * 0.5) / a
    assert np.allclose(out[0, 1], a)
    assert np.allclose(out[1, 1], v)
    assert out[0, 0].max() == 0          # untouched unit


def test_decode_intervention_mask_pooling():
    # row-major bitstring: the first 4 of 16 rows are fully set -> after
    # 16->8 pooling the top 2 rows of the feature map are masked in
    iv = [{"ablations": [{"layer": "layerX", "unit": 0, "alpha": 1.0}],
           "mask": {"bitstring": "1" * (4 * 16) + "0" * (12 * 16),
                    "shape": [16, 16]},
           "maskpooling": "max"}]
    out = decode_intervention_array(iv, SHAPES)["layerX"]
    assert out[0, 0, :2, :].min() == 1.0
    assert out[0, 0, 2:, :].max() == 0.0
    iv[0]["maskpooling"] = "mean"
    out = decode_intervention_array(iv, SHAPES)["layerX"]
    assert np.allclose(out[0, 0, :2, :], 1.0)
    assert np.allclose(out[0, 0, 2:, :], 0.0)


def test_unknown_layer_rejected():
    with pytest.raises(ValueError, match="unknown layer"):
        decode_intervention_array(
            [{"ablations": [{"layer": "nope", "unit": 0}]}], SHAPES)


@pytest.mark.slow
def test_gantester_edit_roundtrip(tmp_path):
    """Scripted HTTP session reproducing an edit.html round trip."""
    model = tiny_dcgan()
    inst = InstrumentedModel(model)
    report = dissect(inst, "deconv1", ColorSegmenter(), n_samples=8, batch=4)
    session = DissectionSession(inst, "deconv1", report, outdir=tmp_path)
    server = serve(session, port=0, block=False)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"

    def post(path, obj):
        req = urllib.request.Request(
            f"{base}{path}", method="POST", data=json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"})
        return json.loads(urllib.request.urlopen(req).read())

    try:
        iv = [{"ablations": [{"layer": "deconv1", "unit": 0,
                              "alpha": 1.0, "value": 5.0}]}]
        # 1. install the persistent intervention set
        r = post("/api/interventions", {"interventions": iv})
        assert r["ok"] is True
        got = json.loads(urllib.request.urlopen(
            f"{base}/api/interventions").read())
        assert got["interventions"] == iv

        # 2. standard-id generation under the persistent set (reference
        # POST /generate response: [{id, d: base64}, ...])
        r = post("/api/generate", {"ids": [0, 1]})
        assert [rec["id"] for rec in r["images"]] == [0, 1]
        assert all(rec["d"].startswith("data:image/jpeg;base64,")
                   for rec in r["images"])
        # the same ids WITHOUT the intervention give different pixels
        clean = post("/api/generate", {"ids": [0, 1], "interventions": []})
        assert clean["images"][0]["d"] != r["images"][0]["d"]
        # prefix stability: id 0 is the same z regardless of request size
        again = post("/api/generate", {"ids": [0], "interventions": []})
        assert again["images"][0]["d"] == clean["images"][0]["d"]

        # 3. feature stats at the INTERVENED layer are pre-edit — the
        # reference retains "output before edits" (nethook.py:211-217), so
        # same-layer stats must equal the clean ones while the IMAGES
        # differ (checked above); the edit takes effect downstream.
        feats = post("/api/features",
                     {"ids": [0], "units": [0], "interventions": iv})["res"]
        feats0 = post("/api/features", {"ids": [0], "units": [0]})["res"]
        assert abs(feats["deconv1"]["max"][0][0]
                   - feats0["deconv1"]["max"][0][0]) < 1e-5

        # 4. compare strip (clean row over edited row)
        strip = urllib.request.urlopen(f"{base}/api/compare?seed=0&n=2").read()
        assert strip[:2] == b"\xff\xd8"

        # 5. save the intervention as project state and list it back
        r = post("/api/recipe", {"name": "ablate_u0", "interventions": iv,
                                 "note": "unit 0 -> 5.0"})
        assert (tmp_path / "recipe" / "ablate_u0.json").is_file()
        recipes = json.loads(urllib.request.urlopen(
            f"{base}/api/recipes").read())["recipes"]
        assert recipes[0]["name"] == "ablate_u0"
        assert recipes[0]["interventions"] == iv
        assert recipes[0]["note"] == "unit 0 -> 5.0"

        # 5b. restore the recipe into a cleared session (the load half)
        post("/api/interventions", {"interventions": []})
        r = json.loads(urllib.request.urlopen(
            f"{base}/api/recipe/apply?name=ablate_u0").read())
        assert r["interventions"] == iv
        got = json.loads(urllib.request.urlopen(
            f"{base}/api/interventions").read())
        assert got["interventions"] == iv
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(f"{base}/api/recipe/apply?name=missing")
        assert exc.value.code == 400

        # 6. bad recipe names / malformed interventions -> 400
        for bad in ({"name": "../evil", "interventions": iv},
                    {"name": "x", "interventions": 3}):
            req = urllib.request.Request(
                f"{base}/api/recipe", method="POST",
                data=json.dumps(bad).encode(),
                headers={"Content-Type": "application/json"})
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req)
            assert exc.value.code == 400
    finally:
        server.shutdown()
