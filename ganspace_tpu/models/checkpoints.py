"""Checkpoint location + download-on-miss + loading glue.

The reference auto-downloads checkpoints into ``models/checkpoints/`` or
``$GANCONTROL_CHECKPOINT_DIR`` on first use (reference ``wrappers.py:154-161,
312-345, 484-491, 537-560``).  The same behavior is wired here: each model
family's source-URL table is embedded below, and ``find_or_download`` fetches
a missing file through ``ganspace_tpu.utils.downloads`` before the wrapper
falls back to seeded random initialization with a one-line notice.  In a
zero-egress environment the attempt fails fast (``DownloadUnavailable``) and
behavior is unchanged from rounds 1-3 (tests and benchmarks run random-init
by design); disable attempts entirely with ``GANSPACE_AUTO_DOWNLOAD=0``.

Expected layout (identical to the reference):
    $GANCONTROL_CHECKPOINT_DIR/
      stylegan2/stylegan2_<class>_<res>.pt      (rosinality format)
      stylegan/stylegan_<class>_<res>.pt        (lernapparat format)
      progan/<class>_lsun.pth                   (GANDissect format)
      biggan-deep-<res>/pytorch_model.bin       (HuggingFace format)

TF-era originals are also accepted and converted on the fly, without a
TensorFlow runtime (see ``tf_import.py``):
      stylegan/stylegan_<class>_<res>.pkl            (NVlabs dnnlib pickle)
      stylegan/karras2019stylegan-<class>-<res>x<res>.pkl
      progan/<class>_lsun.pkl                        (karras2018 tfutil pickle)
      biggan-deep-<res>/tf_weights.npz               (TF-Hub variable dump)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path
from typing import Optional, Tuple

# ---------------------------------------------------------------------------
# Reference checkpoint source tables
# ---------------------------------------------------------------------------

#: StyleGAN2 per-class Google-Drive sources (reference ``wrappers.py:138-151``,
#: "URLs created with https://sites.google.com/site/gdocs2direct/").
STYLEGAN2_CHECKPOINT_URLS = {
    "horse": "https://drive.google.com/uc?export=download&id=18SkqWAkgt0fIwDEf2pqeaenNi4OoCo-0",
    "ffhq": "https://drive.google.com/uc?export=download&id=1FJRwzAkV-XWbxgTwxEmEACvuqF5DsBiV",
    "church": "https://drive.google.com/uc?export=download&id=1HFM694112b_im01JT7wop0faftw9ty5g",
    "car": "https://drive.google.com/uc?export=download&id=1iRoWclWVbDBAy5iXYZrQnKYSbZUqXI6y",
    "cat": "https://drive.google.com/uc?export=download&id=15vJP8GDr0FlRYpE8gD7CdeEz2mXrQMgN",
    "places": "https://drive.google.com/uc?export=download&id=1X8-wIH3aYKjgDZt4KMOtQzN1m4AlCVhm",
    "bedrooms": "https://drive.google.com/uc?export=download&id=1nZTW7mjazs-qPhkmbsOLLA_6qws-eNQu",
    "kitchen": "https://drive.google.com/uc?export=download&id=15dCpnZ1YLAnETAPB0FGmXwdBclbwMEkZ",
}

#: StyleGAN1 classes shipped as torch checkpoints (reference
#: ``wrappers.py:327-334``): downloaded straight to the ``.pt`` path.
STYLEGAN_TORCH_CHECKPOINT_URLS = {
    "celebahq": "https://drive.google.com/uc?export=download&id=1lGcRwNoXy_uwXkD6sy43aAa-rMHRR7Ad",
    "bedrooms": "https://drive.google.com/uc?export=download&id=1r0_s83-XK2dKlyY3WjNYsfZ5-fnH8QgI",
    "ffhq": "https://drive.google.com/uc?export=download&id=1GcxTcLDPYxQqcQjeHpLUutGzwOlXXcks",
    "cars": "https://drive.google.com/uc?export=download&id=1aaUXHRHjQ9ww91x4mtPZD0w50fsIkXWt",
    "cats": "https://drive.google.com/uc?export=download&id=1JzA5iiS3qPrztVofQAjbb0N4xKdjOOyV",
    "wikiart": "https://drive.google.com/uc?export=download&id=1fN3noa7Rsl9slrDXsgZVDsYFxV0O08Vx",
}

#: StyleGAN1 classes shipped only as TF-era NVlabs pickles (reference
#: ``wrappers.py:319-325``): downloaded to the ``.pkl`` path and converted
#: by ``tf_import.import_stylegan_tf`` (the reference converts via
#: ``export_from_tf``, ``wrappers.py:337-343``).  mega.nz sources have no
#: API — ``download_ckpt`` falls back to a manual-download prompt when
#: interactive, and to random init otherwise.
STYLEGAN_TF_CHECKPOINT_URLS = {
    "vases": "https://thisvesseldoesnotexist.s3-us-west-2.amazonaws.com/public/network-snapshot-008980.pkl",
    "fireworks": "https://mega.nz/#!7uBHnACY!quIW-pjdDa7NqnZOYh1z5UemWwPOW6HkYSoJ4usCg9U",
    "abstract": "https://mega.nz/#!vCQyHQZT!zdeOg3VvT4922Z2UfxO51xgAfJD-NAK2nW7H_jMlilU",
    "anime": "https://mega.nz/#!vawjXISI!F7s13yRicxDA3QYqYDL2kjnc2K7Zk3DwCIYETREmBP4",
    "ukiyo-e": "https://drive.google.com/uc?id=1CHbJlci9NhVFifNQb3vCGu6zw4eqzvTd",
}

#: ProGAN LSUN checkpoints hosted by GANDissect (reference
#: ``wrappers.py:487-488``).
PROGAN_CHECKPOINT_URL = \
    "http://netdissect.csail.mit.edu/data/ganmodel/karras/{lsun_class}_lsun.pth"

#: pytorch_GAN_zoo hub checkpoints (the source behind the reference's
#: ``torch.hub.load('facebookresearch/pytorch_GAN_zoo:hub', model_name,
#: pretrained=True)``, ``wrappers.py:442``; the zoo's hubconf resolves the
#: pretrained DCGAN to its FashionGen snapshot on dl.fbaipublicfiles.com).
GANZOO_CHECKPOINT_URLS = {
    "DCGAN": "https://dl.fbaipublicfiles.com/gan_zoo/DCGAN_fashionGen-1d67302.pth",
}

#: BigGAN-deep HuggingFace archive maps (reference
#: ``pytorch_pretrained_biggan/model.py:32-42``).
BIGGAN_MODEL_URLS = {
    f"biggan-deep-{r}": "https://s3.amazonaws.com/models.huggingface.co/"
                        f"biggan/biggan-deep-{r}-pytorch_model.bin"
    for r in (128, 256, 512)
}
BIGGAN_CONFIG_URLS = {
    f"biggan-deep-{r}": "https://s3.amazonaws.com/models.huggingface.co/"
                        f"biggan/biggan-deep-{r}-config.json"
    for r in (128, 256, 512)
}


# ---------------------------------------------------------------------------
# Lookup + download-on-miss
# ---------------------------------------------------------------------------

def checkpoint_root() -> Path:
    return Path(os.environ.get("GANCONTROL_CHECKPOINT_DIR",
                               Path(__file__).parent / "checkpoints"))


def find_checkpoint(relative: str) -> Optional[Path]:
    path = checkpoint_root() / relative
    return path if path.is_file() else None


def auto_download_enabled() -> bool:
    return os.environ.get("GANSPACE_AUTO_DOWNLOAD", "1") == "1"


def find_or_download(relative: str, url: Optional[str] = None,
                     interactive: Optional[bool] = None) -> Optional[Path]:
    """``find_checkpoint``, with the reference's download-on-miss behavior
    when a source URL is known.

    Returns the checkpoint path, or None when the file is absent AND cannot
    be fetched (no URL / ``GANSPACE_AUTO_DOWNLOAD=0`` / network unavailable /
    manual-download source in a non-interactive session) — callers then fall
    back to seeded random init via ``note_random_init``.
    """
    found = find_checkpoint(relative)
    if found is not None or url is None or not auto_download_enabled():
        return found
    from ganspace_tpu.utils.downloads import DownloadUnavailable, download_ckpt
    dest = checkpoint_root() / relative
    if interactive is None:
        interactive = sys.stdin.isatty()
    try:
        print(f"Downloading {url}\n  -> {dest}", file=sys.stderr, flush=True)
        return download_ckpt(url, dest, interactive=interactive)
    except DownloadUnavailable as e:
        print(f"Download unavailable: {e}", file=sys.stderr, flush=True)
        return None


def note_random_init(name: str, relative: str) -> None:
    # stderr: a diagnostic, not program output — CLI stdout contracts
    # (e.g. the dissection CLI's --quiet) must stay clean.
    print(f"[{name}] no checkpoint at {checkpoint_root() / relative}; "
          f"using seeded random initialization", file=sys.stderr)


# ---------------------------------------------------------------------------
# Per-family locate helpers (each returns (path-or-None, canonical relpath);
# the wrappers dispatch on the found file's suffix)
# ---------------------------------------------------------------------------

def locate_stylegan2(outclass: str, resolution: int) -> Tuple[Optional[Path], str]:
    """Local ``.pt`` or Drive download (reference ``wrappers.py:153-161``)."""
    rel = f"stylegan2/stylegan2_{outclass}_{resolution}.pt"
    return (find_or_download(rel, STYLEGAN2_CHECKPOINT_URLS.get(outclass)),
            rel)


def locate_stylegan(outclass: str, resolution: int) -> Tuple[Optional[Path], str]:
    """Local ``.pt``, local TF pickle, torch download, or TF-pickle download
    (reference ``wrappers.py:311-345``: torch sources land at the ``.pt``
    path; TF-only classes download the pickle next to it and convert)."""
    rel = f"stylegan/stylegan_{outclass}_{resolution}.pt"
    found = find_checkpoint(rel)
    if found is None:
        for tf_rel in (f"stylegan/stylegan_{outclass}_{resolution}.pkl",
                       f"stylegan/karras2019stylegan-{outclass}-"
                       f"{resolution}x{resolution}.pkl"):
            found = find_checkpoint(tf_rel)
            if found is not None:
                break
    if found is None and outclass in STYLEGAN_TORCH_CHECKPOINT_URLS:
        found = find_or_download(rel, STYLEGAN_TORCH_CHECKPOINT_URLS[outclass])
    if found is None and outclass in STYLEGAN_TF_CHECKPOINT_URLS:
        found = find_or_download(
            f"stylegan/stylegan_{outclass}_{resolution}.pkl",
            STYLEGAN_TF_CHECKPOINT_URLS[outclass])
    return found, rel


def locate_progan(outclass: str) -> Tuple[Optional[Path], str]:
    """Local ``.pth``/``.pkl`` or GANDissect download (reference
    ``wrappers.py:484-491``)."""
    rel = f"progan/{outclass}_lsun.pth"
    found = find_checkpoint(rel)
    if found is None:
        found = find_checkpoint(f"progan/{outclass}_lsun.pkl")
    if found is None and outclass is not None:
        found = find_or_download(
            rel, PROGAN_CHECKPOINT_URL.format(lsun_class=outclass))
    return found, rel


def locate_ganzoo(model_name: str) -> Tuple[Optional[Path], str]:
    """Local ``.pth`` or torch.hub-source download for pytorch_GAN_zoo
    models (reference ``wrappers.py:438-466``)."""
    rel = f"ganzoo/{model_name}.pth"
    return find_or_download(rel, GANZOO_CHECKPOINT_URLS.get(model_name)), rel


def locate_biggan(resolution: int) -> Tuple[Optional[Path], Optional[Path], str]:
    """(torch_model, tf_dump, canonical relpath): local HF ``.bin``, local
    TF-Hub dump, or s3 download (reference ``wrappers.py:537-560``).  The
    HF config.json is fetched best-effort alongside for reference-layout
    completeness (our loaders derive the architecture from the resolution)."""
    name = f"biggan-deep-{resolution}"
    rel = f"{name}/pytorch_model.bin"
    found = find_checkpoint(rel)
    tf_found = (None if found is not None
                else find_checkpoint(f"{name}/tf_weights.npz"))
    if found is None and tf_found is None:
        found = find_or_download(rel, BIGGAN_MODEL_URLS.get(name))
        if found is not None:
            find_or_download(f"{name}/config.json",
                             BIGGAN_CONFIG_URLS.get(name))
    return found, tf_found, rel
