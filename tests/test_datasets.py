import numpy as np

from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
    DataPipeline,
    InMemoryDataset,
    make_synthetic_source,
)
from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer

MERGES = [("c", "a"), ("ca", "t</w>"), ("h", "e"), ("he", "l")]


def _pipeline(n=20, image_size=32):
    src = make_synthetic_source(n, image_size=image_size)
    tok = CLIPTokenizer(MERGES)
    return DataPipeline(src, tok, image_size=image_size, context_length=16, num_workers=2)


def test_batch_shapes_and_dtypes():
    pipe = _pipeline()
    batch = pipe.make_batch([0, 1, 2])
    assert batch.images.shape == (3, 32, 32, 3)
    assert batch.images.dtype == np.float32
    assert batch.query_ids.shape == (3, 16)
    assert batch.target_ids.dtype == np.int32
    assert batch.uuids == ["uuid-000000", "uuid-000001", "uuid-000002"]
    assert batch.decode_ok.all()


def test_epoch_determinism_and_reshuffle():
    pipe = _pipeline()
    e0a = [b.uuids for b in pipe.epoch_batches(4, epoch=0, seed=42)]
    e0b = [b.uuids for b in pipe.epoch_batches(4, epoch=0, seed=42)]
    e1 = [b.uuids for b in pipe.epoch_batches(4, epoch=1, seed=42)]
    assert e0a == e0b  # same (seed, epoch) -> same order
    assert e0a != e1  # different epoch -> reshuffled


def test_drop_last_and_counts():
    pipe = _pipeline(n=10)
    batches = list(pipe.epoch_batches(4, drop_last=True))
    assert len(batches) == 2 == pipe.num_batches(4)
    batches = list(pipe.epoch_batches(4, drop_last=False))
    assert len(batches) == 3
    assert batches[-1].images.shape[0] == 2


def test_eval_order_preserved():
    pipe = _pipeline(n=8)
    batches = list(pipe.epoch_batches(4, shuffle=False))
    uuids = [u for b in batches for u in b.uuids]
    assert uuids == [f"uuid-{i:06d}" for i in range(8)]


def test_decode_failure_zero_fallback():
    bad = InMemoryDataset(
        [{"image": b"corrupt", "query_text": "cat", "target_text": "cat", "uuid": "x"}]
    )
    pipe = DataPipeline(bad, CLIPTokenizer(MERGES), image_size=32, context_length=16)
    batch = pipe.make_batch([0])
    assert not batch.decode_ok[0]
    assert (batch.images == 0).all()


def test_word_truncation_applied():
    long_text = " ".join(["cat"] * 300)
    src = InMemoryDataset(
        [{"image": np.zeros((40, 40, 3), np.uint8), "query_text": long_text, "target_text": "cat", "uuid": "y"}]
    )
    pipe = DataPipeline(src, CLIPTokenizer(MERGES), image_size=32, context_length=16, max_text_words=150)
    batch = pipe.make_batch([0])
    # truncate=True semantics: last token forced to EOT
    assert batch.query_ids[0, -1] == pipe.tokenizer.eot_token


def test_process_sharded_batches_partition_global():
    """num_shards/shard_index (DistributedSampler parity): the shards' local
    batches exactly partition each global batch, in order."""
    pipe = _pipeline(n=24)
    global_batches = [b.uuids for b in pipe.epoch_batches(8, epoch=1, seed=7)]
    shard_batches = [
        [b.uuids for b in pipe.epoch_batches(8, epoch=1, seed=7, num_shards=2, shard_index=k)]
        for k in (0, 1)
    ]
    assert all(len(b) == 4 for batches in shard_batches for b in batches)
    recombined = [a + b for a, b in zip(*shard_batches)]
    assert recombined == global_batches

    import pytest

    with pytest.raises(ValueError):
        next(iter(pipe.epoch_batches(9, num_shards=2)))
    with pytest.raises(ValueError):
        next(iter(pipe.epoch_batches(8, num_shards=2, shard_index=2)))


def test_sharded_tail_batch_pads_equally():
    """drop_last=False + num_shards>1: the tail batch pads DistributedSampler-
    style (recycled leading indices) so every shard gets an equal, non-empty
    slice instead of ragged/empty batches."""
    pipe = _pipeline(n=26)  # 26 = 3*8 + tail of 2
    shard_batches = [
        list(pipe.epoch_batches(8, epoch=0, seed=3, drop_last=False, num_shards=2, shard_index=k))
        for k in (0, 1)
    ]
    for batches in shard_batches:
        assert len(batches) == 4
        assert all(len(b.uuids) == 4 for b in batches[:-1])
        assert len(batches[-1].uuids) == 1  # ceil(2/2) = 1 each
    # the two tail slices together cover the 2 real tail records
    tail_uuids = set(shard_batches[0][-1].uuids) | set(shard_batches[1][-1].uuids)
    assert len(tail_uuids) == 2


def test_sharded_tail_smaller_than_shards():
    """1 leftover record, 4 shards: indices recycle so no shard is empty."""
    pipe = _pipeline(n=9)
    for k in range(4):
        batches = list(pipe.epoch_batches(8, drop_last=False, num_shards=4, shard_index=k))
        assert len(batches) == 2
        assert len(batches[-1].uuids) == 1
