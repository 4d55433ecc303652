"""Datasets and host-side batching.

Replaces the reference's torch ``Dataset``/``DataLoader``/``DistributedSampler``
stack (``src/clip/datasets/clip_dataset.py:21-185``, ``trainer.py:423-461``)
with a framework-agnostic source protocol plus a host batcher that emits
dense numpy batches ready for mesh placement:

- sources yield ``{image, query_text, target_text, uuid}`` records — the
  HF dataset's schema (``clip_dataset.py:56-78``);
- the batcher word-truncates texts (``clip_dataset.py:49-54``), preprocesses
  images on a thread pool with zero-image fallback (``:66-71``), BPE-tokenizes
  both texts, and yields ``{images, query_ids, target_ids, uuids}``;
- epoch shuffling is a seeded permutation (replacing
  ``DistributedSampler.set_epoch``, ``trainer.py:154-156``) — sharding over
  devices happens at mesh placement, not in the sampler.
"""

from __future__ import annotations

import concurrent.futures as cf
import random
from dataclasses import dataclass
from typing import Any, Iterator, List, Mapping, Optional, Protocol, Sequence

import numpy as np

from .preprocess import safe_preprocess
from .tokenizer import CLIPTokenizer, truncate_words


class ExampleSource(Protocol):
    def __len__(self) -> int: ...

    def __getitem__(self, idx: int) -> Mapping[str, Any]: ...


class InMemoryDataset:
    """List-backed source for tests, synthetic corpora, and small evals."""

    def __init__(self, records: Sequence[Mapping[str, Any]]):
        self.records = list(records)

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx: int) -> Mapping[str, Any]:
        return self.records[idx]


class HFDatasetAdapter:
    """Adapter over a HuggingFace dataset split with the reference schema
    (``image`` PIL, ``query_text``, ``target_text``, ``uuid``)."""

    def __init__(self, hf_split):
        self.ds = hf_split

    def __len__(self) -> int:
        return len(self.ds)

    def __getitem__(self, idx: int) -> Mapping[str, Any]:
        s = self.ds[int(idx)]
        return {
            "image": s["image"],
            "query_text": s["query_text"],
            "target_text": s["target_text"],
            "uuid": s["uuid"],
        }


def load_hf_source(name: str, split: str) -> HFDatasetAdapter:
    """Load an HF dataset split (reference ``trainer.py:395-398``)."""
    from datasets import load_dataset

    return HFDatasetAdapter(load_dataset(name)[split])


@dataclass
class Batch:
    """One dense host batch (numpy, mesh-placement-ready)."""

    images: np.ndarray  # [B, S, S, 3] float32, CLIP-normalized
    query_ids: np.ndarray  # [B, context] int32
    target_ids: np.ndarray  # [B, context] int32
    uuids: List[str]
    decode_ok: np.ndarray  # [B] bool — False where zero-image fallback fired
    indices: Optional[np.ndarray] = None  # [B] int64 source rows (hard-negative lookup)


class DataPipeline:
    """Host batching: decode/preprocess (threaded) + tokenize + stack."""

    def __init__(
        self,
        source: ExampleSource,
        tokenizer: CLIPTokenizer,
        image_size: int = 224,
        context_length: int = 77,
        max_text_words: int = 150,
        num_workers: int = 8,
        preprocess_mode: str = "openai",
    ):
        self.source = source
        self.tokenizer = tokenizer
        self.image_size = image_size
        self.context_length = context_length
        self.max_text_words = max_text_words
        self.num_workers = max(1, num_workers)
        # "openai" = clip.load torchvision parity; "hf" = CLIPImageProcessor
        # parity for evaluating the published HF model (reference
        # ``evaluator_hf.py:115-147``). See data/preprocess.py.
        self.preprocess_mode = preprocess_mode

    def __len__(self) -> int:
        return len(self.source)

    def make_batch(self, indices: Sequence[int]) -> Batch:
        records = [self.source[i] for i in indices]
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            results = list(
                pool.map(
                    lambda r: safe_preprocess(r["image"], self.image_size, mode=self.preprocess_mode),
                    records,
                )
            )
        images = np.stack([r[0] for r in results])
        decode_ok = np.array([r[1] for r in results])
        queries = [truncate_words(r["query_text"], self.max_text_words) for r in records]
        targets = [truncate_words(r["target_text"], self.max_text_words) for r in records]
        return Batch(
            images=images,
            query_ids=self.tokenizer(queries, context_length=self.context_length),
            target_ids=self.tokenizer(targets, context_length=self.context_length),
            uuids=[r["uuid"] for r in records],
            decode_ok=decode_ok,
            indices=np.asarray(list(indices), np.int64),
        )

    def negative_target_ids(
        self, indices: np.ndarray, table: np.ndarray, k: int
    ) -> np.ndarray:
        """[B] batch rows + [N, M] mined table -> [B, k, L] tokenized target
        texts of each example's top-k mined hard negatives
        (``train/negatives.py``). Tokenizes each unique negative once per
        batch (mined tables repeat rows heavily across a batch)."""
        sel = np.asarray(table)[np.asarray(indices)][:, :k]  # [B, k]
        uniq, inv = np.unique(sel, return_inverse=True)
        texts = [
            truncate_words(self.source[int(i)]["target_text"], self.max_text_words)
            for i in uniq
        ]
        toks = self.tokenizer(texts, context_length=self.context_length)
        return np.asarray(toks)[inv].reshape(sel.shape[0], k, -1)

    def epoch_batches(
        self,
        batch_size: int,
        epoch: int = 0,
        shuffle: bool = True,
        seed: int = 42,
        drop_last: bool = True,
        num_shards: int = 1,
        shard_index: int = 0,
    ) -> Iterator[Batch]:
        """Iterate batches for one epoch.

        Deterministic per (seed, epoch) permutation — the functional
        equivalent of ``DistributedSampler.set_epoch`` (``trainer.py:154-156``).
        ``drop_last=True`` keeps batch shapes static for jit.

        ``num_shards``/``shard_index`` complete the ``DistributedSampler``
        parity for multi-process runs: ``batch_size`` stays the GLOBAL batch
        and each process loads only its contiguous ``batch_size/num_shards``
        slice of every batch (the permutation is identical on all processes,
        so the slices partition each global batch exactly).
        """
        if batch_size % num_shards:
            raise ValueError(f"batch_size={batch_size} not divisible by num_shards={num_shards}")
        if not 0 <= shard_index < num_shards:
            raise ValueError(f"shard_index {shard_index} out of range for {num_shards} shards")
        n = len(self.source)
        order = list(range(n))
        if shuffle:
            random.Random(seed * 1_000_003 + epoch).shuffle(order)
        stop = n - (n % batch_size) if drop_last else n
        for start in range(0, stop, batch_size):
            idxs = order[start : start + batch_size]
            if num_shards > 1:
                if len(idxs) % num_shards:
                    # Tail batch (drop_last=False): recycle leading indices
                    # so every shard gets an equal, non-empty slice —
                    # DistributedSampler's padding semantics. Without this
                    # the fixed-offset slice below goes ragged (some shards
                    # empty) and jit batch shapes diverge across processes.
                    target = -(-len(idxs) // num_shards) * num_shards
                    idxs = (idxs * (target // len(idxs) + 1))[:target]
                local_b = len(idxs) // num_shards
                idxs = idxs[shard_index * local_b : (shard_index + 1) * local_b]
            yield self.make_batch(idxs)

    def num_batches(self, batch_size: int, drop_last: bool = True) -> int:
        n = len(self.source)
        return n // batch_size if drop_last else -(-n // batch_size)


def make_synthetic_source(
    n: int,
    image_size: int = 32,
    seed: int = 0,
    vocab_words: Sequence[str] = ("hello", "world", "cat"),
) -> InMemoryDataset:
    """Random image-text-query triplets for tests/benchmarks (no network)."""
    rng = np.random.default_rng(seed)
    records = []
    for i in range(n):
        img = (rng.random((image_size + 8, image_size + 8, 3)) * 255).astype(np.uint8)
        words = [vocab_words[int(rng.integers(len(vocab_words)))] for _ in range(6)]
        records.append(
            {
                "image": img,
                "query_text": " ".join(words[:3]),
                "target_text": " ".join(words),
                "uuid": f"uuid-{i:06d}",
            }
        )
    return InMemoryDataset(records)
