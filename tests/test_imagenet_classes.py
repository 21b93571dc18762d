"""Full 1000-class ImageNet name resolution (reference WordNet path,
``pytorch_pretrained_biggan/utils.py:174-216``, embedded offline)."""

import numpy as np
import pytest

from ganspace_tpu.models import imagenet_classes as ic
from ganspace_tpu.models.biggan import CLASS_ALIASES


def test_table_shape():
    assert len(ic.LABELS) == 1000
    assert len(set(ic.all_names())) > 990  # primary names are near-unique
    from ganspace_tpu.models._imagenet_wnids import WNID_OFFSETS
    assert len(WNID_OFFSETS) == 1000
    assert len(set(WNID_OFFSETS)) == 1000
    assert all(WNID_OFFSETS[i] > 0 for i in range(1000))


def test_known_anchor_classes():
    """Spot-check well-known (index, wnid, name) triples."""
    anchors = [
        (0, "n01440764", "tench"),
        (207, "n02099601", "golden retriever"),
        (250, "n02110185", "Siberian husky"),
        (281, "n02123045", "tabby"),
        (388, "n02510455", "giant panda"),
        (437, "n02814860", "beacon"),
        (497, "n03028079", "church"),
        (817, "n04285008", "sports car"),
        (933, "n07697313", "cheeseburger"),
        (980, "n09472597", "volcano"),
        (985, "n11939491", "daisy"),
        (999, "n15075141", "toilet tissue"),
    ]
    for idx, wnid, name in anchors:
        assert ic.wnid(idx) == wnid, (idx, wnid)
        assert ic.resolve(name) == idx, name
        assert ic.resolve(wnid) == idx, wnid
        assert ic.label(idx).split(",")[0].lower().startswith(
            name.split(" ")[0].lower())


def test_multiword_and_lemma_synonyms():
    assert ic.resolve("golden retriever") == 207
    assert ic.resolve("Golden_Retriever") == 207
    assert ic.resolve("grey wolf") == ic.resolve("timber wolf") == 269
    assert ic.resolve("polar bear") == ic.resolve("ice bear") == 296
    assert ic.resolve("lighthouse") == ic.resolve("beacon") == 437
    assert ic.resolve("rose hip") == ic.resolve("hip") == 989
    assert ic.resolve("hot dog") == ic.resolve("hotdog") == 934
    assert ic.resolve("cab") == ic.resolve("taxi") == 468


def test_int_classnnn_wnid_forms():
    assert ic.resolve(42) == 42
    assert ic.resolve("class107") == 107
    assert ic.resolve("n01443537") == 1
    with pytest.raises(KeyError):
        ic.resolve(1000)
    with pytest.raises(KeyError):
        ic.resolve("n99999999")


def test_rejects_unknown_and_ambiguous():
    with pytest.raises(KeyError, match="unknown"):
        ic.resolve("flying spaghetti monster")
    with pytest.raises(KeyError, match="ambiguous"):
        ic.resolve("terrier")
    # unique substring is accepted
    assert ic.resolve("cheeseburg") == 933


def test_alias_overrides_keep_pinned_choices():
    """Historically pinned aliases (reference README commands) win over the
    generic lemma search — 'husky' stays the Siberian husky cache key."""
    assert ic.resolve("husky", aliases=CLASS_ALIASES) == 250
    assert ic.resolve("husky") == 248  # bare lemma: Eskimo dog, husky
    assert ic.resolve("duck", aliases=CLASS_ALIASES) == 97


def test_biggan_resolves_any_class():
    from ganspace_tpu.models.biggan import BigGAN, BigGANConfig

    cfg = BigGANConfig(output_dim=16, z_dim=8, channel_width=4,
                       layers=((False, 16, 16), (True, 16, 8)),
                       attention_layer_position=1, n_stats=5)
    m = BigGAN(resolution=16, class_name="husky", cfg=cfg)
    for name, idx in [("golden retriever", 207), ("Pembroke", 263),
                      ("n02510455", 388), ("class12", 12), (901, 901),
                      ("steel arch bridge", 821)]:
        assert m.is_valid_class(name)
        m.set_output_class(name)
        v = np.asarray(m.v_class)
        assert v.argmax() == idx, name
    assert not m.is_valid_class("not a real class")
    with pytest.raises(RuntimeError):
        m.set_output_class("not a real class")
