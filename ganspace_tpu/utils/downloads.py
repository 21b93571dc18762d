"""Checkpoint download helpers (reference ``utils.py:44-92`` +
``pytorch_pretrained_biggan/file_utils.py``).

Supports the reference's three source types:

* **Google Drive** — including the confirm-token dance for files too large
  for virus scanning (reference ``utils.py:44-64``);
* **generic HTTP(S)** — streamed to disk with an etag-keyed cache name
  (reference ``file_utils.py``'s scheme, simplified);
* **mega.nz & friends** — no API: fall back to an interactive
  "download manually, then press enter" prompt (reference ``utils.py:79-92``).

This environment is zero-egress, so every network call is wrapped: failures
raise ``DownloadUnavailable`` with the target path, and the model wrappers
catch it and fall back to seeded random init (``models/checkpoints.py``).
"""

from __future__ import annotations

import hashlib
import shutil
from pathlib import Path
from typing import Optional


class DownloadUnavailable(RuntimeError):
    def __init__(self, url: str, dest: Path, cause: Exception):
        super().__init__(
            f"cannot download {url} -> {dest} ({cause}); place the file "
            f"there manually (zero-egress environment?)")
        self.dest = dest


def _session():
    import requests
    return requests.Session()


def download_google_drive(file_id: str, dest, chunk: int = 1 << 20) -> Path:
    """Drive download incl. the 'confirm' token round trip."""
    dest = Path(dest)
    url = "https://docs.google.com/uc?export=download"
    try:
        sess = _session()
        resp = sess.get(url, params={"id": file_id}, stream=True, timeout=30)
        token = next((v for k, v in resp.cookies.items()
                      if k.startswith("download_warning")), None)
        if token:                      # big file: confirm past the virus scan
            resp = sess.get(url, params={"id": file_id, "confirm": token},
                            stream=True, timeout=30)
        resp.raise_for_status()
        _stream_to(resp, dest, chunk)
        return dest
    except Exception as e:             # noqa: BLE001 — any network failure
        raise DownloadUnavailable(f"gdrive:{file_id}", dest, e)


def download_url(url: str, dest, chunk: int = 1 << 20) -> Path:
    dest = Path(dest)
    try:
        sess = _session()
        resp = sess.get(url, stream=True, timeout=30)
        resp.raise_for_status()
        _stream_to(resp, dest, chunk)
        return dest
    except Exception as e:             # noqa: BLE001
        raise DownloadUnavailable(url, dest, e)


def _stream_to(resp, dest: Path, chunk: int) -> None:
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_suffix(dest.suffix + ".part")
    with open(tmp, "wb") as f:
        for block in resp.iter_content(chunk):
            f.write(block)
    shutil.move(tmp, dest)


def download_manual(url: str, dest, interactive: bool = True) -> Path:
    """mega.nz-style fallback: ask the user to fetch the file themselves
    (reference ``utils.py:79-92``)."""
    dest = Path(dest)
    while not dest.is_file():
        if not interactive:
            raise DownloadUnavailable(url, dest,
                                      RuntimeError("manual download required"))
        print(f"Please download\n  {url}\nto\n  {dest}\nthen press enter.")
        input()
    return dest


def download_ckpt(url: str, dest, interactive: bool = True) -> Path:
    """Dispatch by URL type (reference ``download_ckpt``); no-op when the
    file already exists."""
    dest = Path(dest)
    if dest.is_file():
        return dest
    if "drive.google" in url or "docs.google" in url:
        import re
        m = re.search(r"(?:id=|/d/)([\w-]{20,})", url)
        if not m:
            raise ValueError(f"cannot find a Drive file id in {url}")
        return download_google_drive(m.group(1), dest)
    if "mega.nz" in url:
        return download_manual(url, dest, interactive)
    return download_url(url, dest)


def url_cache_name(url: str, etag: Optional[str] = None) -> str:
    """sha256(url)[.sha256(etag)] cache filename (the BigGAN file cache's
    AllenNLP-style scheme, reference ``file_utils.py``)."""
    name = hashlib.sha256(url.encode()).hexdigest()
    if etag:
        name += "." + hashlib.sha256(etag.encode()).hexdigest()
    return name
