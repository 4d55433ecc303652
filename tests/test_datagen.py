import json
import os
import random

import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.datagen.captioning import CaptioningPipeline, FakeCaptioner
from knowledge_enhanced_multimodal_retrieval_tpu.datagen.texts import (
    build_hybrid_texts,
    combine_descriptions,
    random_select_content,
)


def test_combine_dedups_lead_in():
    out = combine_descriptions("This is a painting, oil on canvas", "a painting of a dog")
    assert out.startswith("A painting of a dog")
    assert "This is a painting" not in out
    assert ", oil on canvas" in out


def test_combine_plain_concatenation():
    out = combine_descriptions("Portrait of a lady", "a sculpture of a horse")
    assert out == "A sculpture of a horse. Portrait of a lady"


def test_combine_single_sides_and_empty():
    assert combine_descriptions("meta only", "") == "Meta only"
    assert combine_descriptions("", "content only") == "Content only"
    assert combine_descriptions("", "") == ""


def test_combine_church_replacement():
    out = combine_descriptions("This is a church, gothic style", "a church with a tall spire")
    assert "This is a church" not in out


def test_random_select_content_filters():
    rng = random.Random(0)
    descs = ["the church of the person x", "short", "a long valid caption one", "another valid caption two"]
    c1, c2 = random_select_content(descs, rng)
    assert c1 != c2
    assert all("the church of the person" not in c and len(c) >= 10 for c in (c1, c2))
    assert random_select_content(["bad" ], rng) == ("", "")


def test_build_hybrid_texts(tmp_path):
    meta = tmp_path / "meta"; content = tmp_path / "content"; images = tmp_path / "img"; out = tmp_path / "final"
    for d in (meta, content, images):
        d.mkdir()
    for i in range(3):
        (meta / f"u{i}.json").write_text(json.dumps({"metadata_descriptions": [f"This is a painting, from {1800+i}"]}))
        (content / f"u{i}.json").write_text(json.dumps({"content_descriptions": [f"a painting of scene {i}"]}))
        (images / f"u{i}.jpg").write_bytes(b"x")
    (meta / "no-image.json").write_text(json.dumps({"metadata_descriptions": ["m"]}))
    result = build_hybrid_texts(str(meta), str(content), str(images), str(out), seed=1)
    assert sorted(result["written"]) == ["u0", "u1", "u2"]
    data = json.load(open(out / "u1.json"))
    assert data["uuid"] == "u1"
    assert "scene 1" in data["target_text"]
    assert "This is a painting" not in data["target_text"]


def test_captioning_pipeline_resume(tmp_path):
    cap = FakeCaptioner(num_captions=5)
    pipe = CaptioningPipeline(cap, str(tmp_path / "caps"), batch_size=2)
    uuids = [f"u{i}" for i in range(5)]
    images = [object()] * 5
    r1 = pipe.run(uuids, images)
    assert sorted(r1["written"]) == sorted(uuids)
    data = json.load(open(tmp_path / "caps" / "u3.json"))
    assert len(data["content_descriptions"]) == 5
    # resume: nothing re-captioned
    calls_before = cap.calls
    r2 = pipe.run(uuids, images)
    assert r2["written"] == [] and sorted(r2["skipped"]) == sorted(uuids)
    assert cap.calls == calls_before
    # mismatched inputs
    with pytest.raises(ValueError):
        pipe.run(["a"], [])


def test_mesh_sharded_captioner(tmp_path, devices8):
    """The TPU-native farm: captioning batches shard over the 8-device mesh
    as ONE jitted program (reference content_portion_generation.py:44-283
    runs a process per GPU); results match a per-image host oracle, padding
    handles non-divisible batches, and the unchanged CaptioningPipeline
    drives it through the Captioner protocol (resume included)."""
    import jax.numpy as jnp
    import numpy as np

    from knowledge_enhanced_multimodal_retrieval_tpu.datagen.captioning import (
        MeshShardedCaptioner,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime

    rt = MeshRuntime.create()
    S, C, L = 8, 3, 4

    # a deterministic jittable "model": token ids derived from image stats
    # (stands in for a BLIP-2-style decoder; the plumbing is what's pinned)
    def caption_fn(params, images):
        feats = images.mean(axis=(1, 2, 3), keepdims=False)  # [B]
        base = (feats[:, None, None] * params["scale"]).astype(jnp.int32)
        offs = jnp.arange(C, dtype=jnp.int32)[None, :, None] * 10
        pos = jnp.arange(L, dtype=jnp.int32)[None, None, :]
        return (base + offs + pos) % 97

    params = {"scale": jnp.float32(1000.0)}
    decode = lambda ids: " ".join(str(int(i)) for i in ids)  # noqa: E731
    cap = MeshShardedCaptioner(caption_fn, params, decode, rt)

    rng = np.random.default_rng(0)
    images = [rng.random((S, S, 3)).astype(np.float32) for _ in range(11)]  # 11 % 8 != 0
    got = cap.generate(images)
    assert len(got) == 11 and all(len(row) == C for row in got)

    # host oracle: the same math per image, unsharded
    for im, row in zip(images, got):
        base = int(np.float32(im.mean() * 1000.0))
        want = [(base + c * 10 + np.arange(L)) % 97 for c in range(C)]
        assert row == [" ".join(str(int(i)) for i in w) for w in want]

    # the unchanged pipeline drives it (resume et al.)
    pipe = CaptioningPipeline(cap, str(tmp_path / "caps"), batch_size=4)
    uuids = [f"m{i}" for i in range(11)]
    r1 = pipe.run(uuids, images)
    assert sorted(r1["written"]) == sorted(uuids)
    data = json.load(open(tmp_path / "caps" / "m7.json"))
    assert data["content_descriptions"] == got[7]
    r2 = pipe.run(uuids, images)
    assert r2["written"] == [] and sorted(r2["skipped"]) == sorted(uuids)


def test_metadata_descriptions_generation():
    from knowledge_enhanced_multimodal_retrieval_tpu.datagen.metadata import (
        generate_metadata_descriptions,
    )

    meta = {
        "object_type": "Painting",
        "title": "Madonna and Child",
        "creator": "Unknown Master",
        "date": "1480",
        "material": "tempera on wood",
        "location": "Benaki Museum",
    }
    variants = generate_metadata_descriptions(meta, num_variants=5)
    assert len(variants) == 5
    assert len(set(variants)) > 1
    assert variants[0].startswith("This is a painting")
    assert any("1480" in v for v in variants)
    assert any("Benaki Museum" in v for v in variants)
    # deterministic
    assert variants == generate_metadata_descriptions(meta, num_variants=5)
    # sparse metadata degrades gracefully
    sparse = generate_metadata_descriptions({"object_type": "vase"}, num_variants=3)
    assert all(v and "None" not in v for v in sparse)


def test_build_metadata_texts(tmp_path):
    from knowledge_enhanced_multimodal_retrieval_tpu.datagen.metadata import build_metadata_texts

    records = [{"uuid": "m1", "object_type": "icon", "creator": "A"}]
    written = build_metadata_texts(records, str(tmp_path / "meta"))
    assert written == ["m1"]
    data = json.load(open(tmp_path / "meta" / "m1.json"))
    assert len(data["metadata_descriptions"]) == 5
