"""Hard-negative mining for contrastive fine-tuning.

The reference trains with in-batch negatives only
(``src/clip/train/losses.py:11-63``): every negative is a random other
example, so once the model separates easy pairs the gradient signal
collapses. Standard production practice for retrieval models is to mine
the corpus for the hardest non-gold candidates under the current model and
re-train with those in the denominator. This module is that loop's offline
half:

- :func:`mine_hard_negatives` — for each anchor embedding, the top-k
  highest-scoring *other* rows of a candidate table (self excluded).
  Device-blocked matmul + ``lax.top_k`` (one jitted program per block
  shape, anchors padded to a static block), so mining 43k x 43k is a few
  MXU matmuls, not a host quadratic.
- :func:`save_negatives` / :func:`load_negatives` — the mined ``[N, M]``
  index table as one ``.npz`` artifact, fingerprinted with a digest of the
  dataset's uuid sequence so a table can never silently be applied to a
  different (or reordered) dataset.

The online half lives in ``train/losses.py`` (``neg_text_features``
denominator columns) and ``train/trainer.py`` (``TrainConfig.hard_negatives``
/ ``hard_negatives_k``): each batch example contributes its mined examples'
*target texts* as extra negatives for both joint-loss terms.
"""

from __future__ import annotations

import hashlib
import json
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "mine_hard_negatives",
    "save_negatives",
    "load_negatives",
    "uuid_digest",
]


def mine_hard_negatives(
    anchors: np.ndarray,
    candidates: np.ndarray,
    k: int,
    block: int = 2048,
) -> np.ndarray:
    """[N, D] anchors x [N, D] candidates -> [N, k] int32 hard-negative rows.

    Row i of the result is the k candidate rows (excluding i itself — the
    gold pairing) with the highest inner-product score against anchor i,
    hardest first. Rows are aligned: anchor i's gold candidate is row i
    (the (query, target) training pairing). Runs blocked on device with a
    static block shape; anchors are padded up, candidates stream as one
    resident [N, D] operand.
    """
    anchors = np.asarray(anchors, np.float32)
    candidates = np.asarray(candidates, np.float32)
    n = anchors.shape[0]
    if candidates.shape[0] != n:
        raise ValueError(
            f"anchors/candidates must be row-aligned, got {n} vs {candidates.shape[0]}"
        )
    if not 0 < k < n:
        raise ValueError(f"need 0 < k < n_examples, got k={k}, n={n}")
    block = min(block, n)
    # candidates ride as a traced operand (NEVER a jit constant: big closed-
    # over arrays serialize into the relay's remote-compile request, 413)
    cand = jax.device_put(jnp.asarray(candidates))

    @jax.jit
    def _block_topk(a_blk: jax.Array, c: jax.Array, row0: jax.Array) -> jax.Array:
        scores = a_blk @ c.T  # [block, N]
        rows = row0 + jnp.arange(a_blk.shape[0])
        # self-exclusion: the gold pairing is not a negative
        self_mask = jnp.arange(n)[None, :] == rows[:, None]
        scores = jnp.where(self_mask, -jnp.inf, scores)
        _, idx = jax.lax.top_k(scores, k)
        return idx

    out = np.empty((n, k), np.int32)
    for start in range(0, n, block):
        stop = min(start + block, n)
        a_blk = anchors[start:stop]
        pad = block - a_blk.shape[0]
        if pad:
            a_blk = np.pad(a_blk, ((0, pad), (0, 0)))
        idx = np.asarray(_block_topk(jnp.asarray(a_blk), cand, jnp.int32(start)))
        out[start:stop] = idx[: stop - start]
    return out


def uuid_digest(uuids: Sequence[str]) -> str:
    """Order-sensitive digest of the dataset's uuid sequence."""
    h = hashlib.sha256()
    for u in uuids:
        h.update(u.encode("utf-8"))
        h.update(b"\x00")
    return h.hexdigest()


def save_negatives(path: str, idx: np.ndarray, uuids: Sequence[str], meta: dict | None = None) -> None:
    """Persist a mined [N, M] table with the row-aligned uuid sequence it
    was mined on (the trainer spot-checks batches against it, so a table
    can never silently be applied to a different/reordered dataset)."""
    idx = np.asarray(idx, np.int32)
    if idx.ndim != 2 or idx.shape[0] != len(uuids):
        raise ValueError(
            f"idx must be [N, M] aligned with uuids, got {idx.shape} vs {len(uuids)}"
        )
    payload = {"digest": uuid_digest(uuids), "n": int(idx.shape[0]), **(meta or {})}
    np.savez(
        path, idx=idx, uuids=np.asarray(list(uuids), dtype=np.str_),
        __meta__=json.dumps(payload),
    )


def load_negatives(path: str) -> Tuple[np.ndarray, List[str]]:
    """Load a mined table -> ([N, M] int32 indices, row-aligned uuids)."""
    with np.load(path, allow_pickle=False) as z:
        idx = np.asarray(z["idx"], np.int32)
        uuids = [str(u) for u in z["uuids"]]
    if idx.shape[0] != len(uuids):
        raise ValueError(f"corrupt negatives file {path}: {idx.shape} vs {len(uuids)} uuids")
    return idx, uuids
