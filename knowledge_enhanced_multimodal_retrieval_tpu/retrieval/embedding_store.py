"""Precomputed corpus embedding store.

In-repo replacement for the reference's download-code-from-HF retriever
artifact (``src/clip/clip_retrieval.py:12-37`` downloads and ``exec``s a
Python file from the hub, then reads ``data/embeddings``). Here the store is
a plain, versioned artifact: L2-normalized image/text tower embeddings +
row-aligned UUIDs, persisted as one ``.npz``, loadable straight onto the
device (optionally bf16 for HBM bandwidth) and shardable over a mesh for
corpora beyond one chip.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import DataPipeline
from ..models.clip import CLIP
from ..parallel.mesh import MeshRuntime
from ..parallel.sharding import batch_sharding


class DuplicateUUIDError(ValueError):
    """Raised when an added document's uuid is already in the store (a
    conflict with existing state, distinct from a malformed payload)."""


@dataclass
class EmbeddingStore:
    """Corpus embeddings: ``image`` and ``text`` towers + aligned UUIDs."""

    image: np.ndarray  # [N, D] float32, L2-normalized
    text: np.ndarray  # [N, D] float32, L2-normalized
    uuids: List[str]

    def __post_init__(self):
        n = len(self.uuids)
        if self.image.shape[0] != n or self.text.shape[0] != n:
            raise ValueError(
                f"row mismatch: image {self.image.shape[0]}, text {self.text.shape[0]}, uuids {n}"
            )

    def __len__(self) -> int:
        return len(self.uuids)

    @property
    def dim(self) -> int:
        return self.image.shape[1]

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        """Persist atomically: write a sibling temp file, then rename — a
        crash mid-save never corrupts the store a restart will load."""
        import os
        import tempfile

        d = os.path.dirname(os.path.abspath(path)) or "."
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez(
                    f,
                    image=np.asarray(self.image, np.float32),
                    text=np.asarray(self.text, np.float32),
                    uuids=np.array(self.uuids, dtype=object),
                )
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    @classmethod
    def load(cls, path: str, mmap: bool = False) -> "EmbeddingStore":
        """Load a saved store. ``mmap=True`` memory-maps the tower arrays
        instead of reading them into RAM — for corpora near the host-memory
        budget: the packed-corpus serving modes only ever READ the f32 rows
        (host quantization streams them once; host rerank gathers candidate
        rows), so the OS pages in what is touched. Requires an uncompressed
        ``.npz`` (``save`` writes one) and keeps the file open for the
        store's lifetime.
        """
        if mmap:
            import struct
            import zipfile

            # np.load(mmap_mode=...) ignores mmap for zip members, so map
            # each member by its absolute offset in the archive: local zip
            # header (30 bytes + name + extra) then the .npy header, then
            # the raw array bytes.
            with zipfile.ZipFile(path) as zf:

                def as_mmap(name):
                    info = zf.getinfo(name + ".npy")
                    if info.compress_type != zipfile.ZIP_STORED:
                        raise ValueError(
                            f"{path!r} member {name} is compressed; mmap needs "
                            "an uncompressed .npz (np.savez, not savez_compressed)"
                        )
                    with zf.open(name + ".npy") as f:
                        version = np.lib.format.read_magic(f)
                        # public per-version readers (no private API): the
                        # format has exactly these two header layouts
                        read_header = {
                            (1, 0): np.lib.format.read_array_header_1_0,
                            (2, 0): np.lib.format.read_array_header_2_0,
                        }.get(version)
                        if read_header is None:
                            raise ValueError(f"unsupported .npy version {version}")
                        shape, fortran, dtype = read_header(f)
                        npy_header = f.tell()  # bytes consumed by the .npy header
                    with open(path, "rb") as raw:
                        raw.seek(info.header_offset + 26)
                        name_len, extra_len = struct.unpack("<HH", raw.read(4))
                    data_off = info.header_offset + 30 + name_len + extra_len + npy_header
                    return np.memmap(
                        path, dtype=dtype, mode="r", shape=shape,
                        offset=data_off, order="F" if fortran else "C",
                    )

                image = as_mmap("image")
                text = as_mmap("text")
                with zf.open("uuids.npy") as f:
                    uuids = [str(u) for u in np.lib.format.read_array(f, allow_pickle=True)]
            return cls(image=image, text=text, uuids=uuids)
        with np.load(path, allow_pickle=True) as data:
            return cls(image=data["image"], text=data["text"], uuids=[str(u) for u in data["uuids"]])

    # -- device placement ----------------------------------------------------

    def device_arrays(
        self,
        dtype=jnp.float32,
        mesh: Optional["jax.sharding.Mesh"] = None,
        axis: str = "data",
    ):
        """Place both towers on device — corpus-sharded over ``axis`` when a
        mesh is given (pad to the shard multiple first via :func:`padded`)."""
        img = jnp.asarray(self.image, dtype)
        txt = jnp.asarray(self.text, dtype)
        if mesh is not None:
            sharding = batch_sharding(mesh, 2, axis)
            img = jax.device_put(img, sharding)
            txt = jax.device_put(txt, sharding)
        return img, txt

    # -- incremental updates ---------------------------------------------------
    # The reference's corpus is frozen at precompute time (its retriever
    # artifact reads a static ``data/embeddings`` dir); a serving deployment
    # needs to ingest/retire artifacts without a rebuild. Stores are treated
    # immutably (JAX style): updates return a NEW store, so a concurrently
    # serving retriever can keep reading the old one until it swaps.

    def with_added(
        self, image: np.ndarray, text: np.ndarray, uuids: Sequence[str]
    ) -> "EmbeddingStore":
        """New store with rows appended. ``uuids`` must be fresh; rows are
        re-L2-normalized defensively (a no-op for already-normalized input)."""
        image = np.atleast_2d(np.asarray(image, np.float32))
        text = np.atleast_2d(np.asarray(text, np.float32))
        uuids = [str(u) for u in uuids]
        if image.shape != (len(uuids), self.dim) or text.shape != (len(uuids), self.dim):
            raise ValueError(
                f"expected image/text of shape ({len(uuids)}, {self.dim}); "
                f"got {image.shape} / {text.shape}"
            )
        from collections import Counter

        counts = Counter(uuids)
        dup = (counts.keys() & set(self.uuids)) | {u for u, c in counts.items() if c > 1}
        if dup:
            raise DuplicateUUIDError(f"duplicate uuids: {sorted(dup)[:5]}")

        def norm(x):
            n = np.linalg.norm(x, axis=1, keepdims=True)
            if not np.all(n > 0):
                raise ValueError("zero-norm embedding row")
            return x / n

        return EmbeddingStore(
            image=np.concatenate([self.image, norm(image)]),
            text=np.concatenate([self.text, norm(text)]),
            uuids=self.uuids + uuids,
        )

    def with_removed(self, uuids: Sequence[str]) -> "EmbeddingStore":
        """New store without the given rows; unknown uuids raise."""
        drop = {str(u) for u in uuids}
        missing = drop - set(self.uuids)
        if missing:
            raise KeyError(f"unknown uuids: {sorted(missing)[:5]}")
        keep = [i for i, u in enumerate(self.uuids) if u not in drop]
        return EmbeddingStore(
            image=self.image[keep], text=self.text[keep],
            uuids=[self.uuids[i] for i in keep],
        )

    def padded(self, multiple: int) -> "EmbeddingStore":
        """Zero-pad rows to a multiple (padded rows score ~0 and carry a
        sentinel uuid)."""
        n = len(self)
        pad = (-n) % multiple
        if pad == 0:
            return self
        z = np.zeros((pad, self.dim), np.float32)
        return EmbeddingStore(
            image=np.concatenate([self.image, z]),
            text=np.concatenate([self.text, z]),
            uuids=self.uuids + [f"__pad_{i}" for i in range(pad)],
        )


def build_embedding_store(
    model: CLIP,
    params,
    pipeline: DataPipeline,
    rt: Optional[MeshRuntime] = None,
    batch_size: int = 256,
    use_fast: bool = False,
    quantize: Optional[str] = None,
) -> EmbeddingStore:
    """Precompute corpus embeddings with the mesh-sharded encoder.

    The ``text`` tower stores *target_text* embeddings (the corpus documents
    the serving engine scores T2T against). ``use_fast``/``quantize`` route
    through the fused / int8 towers (``models.fast_encode``)."""
    from ..eval.evaluator import encode_dataset

    rt = rt or MeshRuntime.create()
    encoded = encode_dataset(
        model, params, pipeline, rt, batch_size, use_fast=use_fast, quantize=quantize
    )
    return EmbeddingStore(image=encoded.image, text=encoded.target, uuids=encoded.uuids)
