import json
import os

import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.utils import data_utils as DU


def _world(n_big=30, n_small=2):
    uuid_to_type = {}
    for i in range(n_big):
        uuid_to_type[f"a{i}"] = "Painting"
    for i in range(n_big):
        uuid_to_type[f"b{i}"] = "Sculpture"
    for i in range(n_small):
        uuid_to_type[f"s{i}"] = "RareThing"
    return uuid_to_type


def test_stratified_splits_partition_and_small_to_train():
    u2t = _world()
    train, val, test = DU.stratified_splits(u2t, test_size=0.2, val_size=0.1, random_seed=42)
    all_ids = sorted(train + val + test)
    assert all_ids == sorted(u2t)
    # small class routed entirely to train
    assert all(f"s{i}" in train for i in range(2))
    # stratification: both big classes appear in test
    test_types = {u2t[u] for u in test}
    assert test_types == {"Painting", "Sculpture"}


def test_stratified_splits_deterministic():
    u2t = _world()
    s1 = DU.stratified_splits(u2t, random_seed=42)
    s2 = DU.stratified_splits(u2t, random_seed=42)
    s3 = DU.stratified_splits(u2t, random_seed=7)
    assert s1 == s2
    assert s1 != s3


def test_get_data_splits_directory_scan(tmp_path):
    images = tmp_path / "img"
    texts = tmp_path / "txt"
    images.mkdir()
    texts.mkdir()
    for i in range(12):
        (images / f"u{i}.jpg").write_bytes(b"x")
        (texts / f"u{i}.json").write_text(json.dumps({"object_type": "Painting" if i % 2 else "Vase"}))
    # one text without image, one image without text -> excluded
    (texts / "orphan.json").write_text("{}")
    (images / "lonely.png").write_bytes(b"x")
    train, val, test = DU.get_data_splits(str(images), str(texts), test_size=0.25, val_size=0.25)
    ids = set(train + val + test)
    assert "orphan" not in ids and "lonely" not in ids
    assert len(ids) == 12


def test_select_text_variant_deterministic_and_distributed():
    a = DU.select_text_variant("uuid-1", epoch=3)
    assert a == DU.select_text_variant("uuid-1", epoch=3)
    assert 0 <= a < 5
    # different epochs / uuids give a spread of variants
    picks = {DU.select_text_variant(f"u{i}", e) for i in range(10) for e in range(5)}
    assert len(picks) == 5


def test_get_text_variant_for_batch():
    out = DU.get_text_variant_for_batch(["a", "b"], epoch=1)
    assert out == [DU.select_text_variant("a", 1), DU.select_text_variant("b", 1)]


def test_splits_json_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "sub", "splits.json")
    DU.save_splits_to_json(["a", "b"], ["c"], ["d"], path)
    train, val, test = DU.load_splits_from_json(path)
    assert (train, val, test) == (["a", "b"], ["c"], ["d"])
    data = json.load(open(path))
    assert data["train_size"] == 2
