"""Checkpoint auto-download wiring (reference ``wrappers.py:138-161, 317-345,
484-491, 537-560`` download-on-miss behavior), with a monkeypatched transport
— no network.

Covers: HTTP miss -> download -> file in the reference layout; the
Google-Drive confirm-token dance; failure -> clean random-init fallback;
the ``GANSPACE_AUTO_DOWNLOAD=0`` gate; non-interactive manual sources; the
per-family URL/relpath selection; and one end-to-end ProGAN
miss -> download -> import -> synthesis round trip on a fabricated
checkpoint.
"""

import io

import numpy as np
import pytest
import torch

import ganspace_tpu.models.checkpoints as ckpt
import ganspace_tpu.utils.downloads as dl


class FakeResponse:
    def __init__(self, content=b"", cookies=None, status=200):
        self._content = content
        self.cookies = cookies or {}
        self._status = status

    def raise_for_status(self):
        if self._status >= 400:
            raise RuntimeError(f"HTTP {self._status}")

    def iter_content(self, chunk):
        buf = io.BytesIO(self._content)
        while True:
            block = buf.read(chunk)
            if not block:
                return
            yield block


class FakeSession:
    """Serves ``responses`` in order; records every (url, params) get."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.log = []

    def get(self, url, params=None, stream=False, timeout=None):
        self.log.append((url, dict(params or {})))
        resp = self.responses.pop(0)
        if isinstance(resp, Exception):
            raise resp
        return resp


@pytest.fixture
def ckpt_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("GANCONTROL_CHECKPOINT_DIR", str(tmp_path))
    monkeypatch.delenv("GANSPACE_AUTO_DOWNLOAD", raising=False)
    return tmp_path


def _install(monkeypatch, *responses):
    sess = FakeSession(responses)
    monkeypatch.setattr(dl, "_session", lambda: sess)
    return sess


def test_http_download_on_miss(ckpt_dir, monkeypatch):
    sess = _install(monkeypatch, FakeResponse(b"checkpoint-bytes"))
    path = ckpt.find_or_download("progan/bedroom_lsun.pth",
                                 "http://example.org/bedroom_lsun.pth")
    assert path == ckpt_dir / "progan" / "bedroom_lsun.pth"
    assert path.read_bytes() == b"checkpoint-bytes"
    assert sess.log[0][0] == "http://example.org/bedroom_lsun.pth"
    # second call: pure cache hit, no transport
    path2 = ckpt.find_or_download("progan/bedroom_lsun.pth",
                                  "http://example.org/bedroom_lsun.pth")
    assert path2 == path and len(sess.log) == 1


def test_drive_confirm_token_dance(ckpt_dir, monkeypatch):
    # First response carries the virus-scan warning cookie; the retry must
    # echo it back as the 'confirm' param (reference utils.py:44-64).
    sess = _install(monkeypatch,
                    FakeResponse(b"", cookies={"download_warning_x": "tok42"}),
                    FakeResponse(b"drive-bytes"))
    url = ("https://drive.google.com/uc?export=download"
           "&id=1FJRwzAkV-XWbxgTwxEmEACvuqF5DsBiV")
    path = ckpt.find_or_download("stylegan2/stylegan2_ffhq_1024.pt", url)
    assert path.read_bytes() == b"drive-bytes"
    assert len(sess.log) == 2
    assert sess.log[0][1]["id"] == "1FJRwzAkV-XWbxgTwxEmEACvuqF5DsBiV"
    assert sess.log[1][1]["confirm"] == "tok42"


def test_unavailable_falls_back_clean(ckpt_dir, monkeypatch):
    _install(monkeypatch, ConnectionError("no egress"))
    path = ckpt.find_or_download("progan/kitchen_lsun.pth",
                                 "http://example.org/kitchen_lsun.pth")
    assert path is None
    # no partial/truncated file may remain where a later run would find it
    assert not any((ckpt_dir / "progan").glob("*")) \
        or not (ckpt_dir / "progan" / "kitchen_lsun.pth").exists()


def test_auto_download_gate(ckpt_dir, monkeypatch):
    sess = _install(monkeypatch, FakeResponse(b"x"))
    monkeypatch.setenv("GANSPACE_AUTO_DOWNLOAD", "0")
    assert ckpt.find_or_download("progan/bedroom_lsun.pth",
                                 "http://example.org/x.pth") is None
    assert sess.log == []


def test_manual_source_noninteractive(ckpt_dir, monkeypatch):
    # mega.nz has no API: non-interactive sessions must fall back (never
    # block on input()), interactive ones get the reference's prompt loop.
    sess = _install(monkeypatch)
    assert ckpt.find_or_download(
        "stylegan/stylegan_anime_512.pkl",
        ckpt.STYLEGAN_TF_CHECKPOINT_URLS["anime"], interactive=False) is None
    assert sess.log == []


def test_locate_url_selection(ckpt_dir, monkeypatch):
    calls = []

    def record(relative, url=None, interactive=None):
        calls.append((relative, url))
        return None

    monkeypatch.setattr(ckpt, "find_or_download", record)

    found, rel = ckpt.locate_stylegan2("ffhq", 1024)
    assert found is None and rel == "stylegan2/stylegan2_ffhq_1024.pt"
    assert calls[-1] == (rel, ckpt.STYLEGAN2_CHECKPOINT_URLS["ffhq"])

    # torch-source StyleGAN1 class: .pt path + Drive URL
    found, rel = ckpt.locate_stylegan("celebahq", 1024)
    assert rel == "stylegan/stylegan_celebahq_1024.pt"
    assert calls[-1] == (rel, ckpt.STYLEGAN_TORCH_CHECKPOINT_URLS["celebahq"])

    # TF-only class: the pickle downloads NEXT TO the canonical .pt path
    found, rel = ckpt.locate_stylegan("ukiyo-e", 512)
    assert rel == "stylegan/stylegan_ukiyo-e_512.pt"
    assert calls[-1] == ("stylegan/stylegan_ukiyo-e_512.pkl",
                         ckpt.STYLEGAN_TF_CHECKPOINT_URLS["ukiyo-e"])

    found, rel = ckpt.locate_progan("bedroom")
    assert calls[-1] == ("progan/bedroom_lsun.pth",
                         "http://netdissect.csail.mit.edu/data/ganmodel/"
                         "karras/bedroom_lsun.pth")

    found, tf_found, rel = ckpt.locate_biggan(256)
    assert found is None and tf_found is None
    assert calls[-1][0] == "biggan-deep-256/pytorch_model.bin"
    assert calls[-1][1] == ckpt.BIGGAN_MODEL_URLS["biggan-deep-256"]

    found, rel = ckpt.locate_ganzoo("DCGAN")
    assert calls[-1] == ("ganzoo/DCGAN.pth",
                         ckpt.GANZOO_CHECKPOINT_URLS["DCGAN"])


def test_progan_end_to_end_miss_download_import(ckpt_dir, monkeypatch):
    """Constructor-level round trip: empty checkpoint dir -> transport serves
    a fabricated GANDissect-format checkpoint -> weights load (not random
    init) and land in the reference layout for the next run."""
    from ganspace_tpu.models.proggan import ProGAN, ProGANConfig, init_params

    cfg = ProGANConfig(sizes=(64, 32, 32, 16))
    params = init_params(cfg, seed=7)
    buf = io.BytesIO()
    torch.save({k: torch.tensor(v) for k, v in params.items()}, buf)
    sess = _install(monkeypatch, FakeResponse(buf.getvalue()))

    model = ProGAN(lsun_class="bedroom")
    assert sess.log[0][0] == ("http://netdissect.csail.mit.edu/data/"
                              "ganmodel/karras/bedroom_lsun.pth")
    assert (ckpt_dir / "progan" / "bedroom_lsun.pth").is_file()
    for k, v in params.items():
        assert np.array_equal(np.asarray(model.params[k]), v), k
    # and it synthesizes
    img = model.sample_np(model.sample_latent(1, seed=0))
    assert img.shape[-3:-1] == (model.resolution, model.resolution)

    # second construction: cache hit, no transport call
    n_calls = len(sess.log)
    ProGAN(lsun_class="bedroom")
    assert len(sess.log) == n_calls
