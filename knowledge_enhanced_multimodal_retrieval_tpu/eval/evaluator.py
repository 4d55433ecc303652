"""Retrieval evaluation pipelines.

Covers the reference's evaluator family (SURVEY §2.13) with one engine:

- ``encode_dataset``       — mesh-sharded encoding of a dataset into
  L2-normalized image/query/target embeddings (replacing the per-batch
  GPU->CPU round trips of ``evaluator.py:108-143``; embeddings stay on
  device until the metrics are reduced);
- ``evaluate_clip_model``  — the standard 3-task metric suite
  (``evaluator.py:54-163``);
- ``evaluate_weighted``    — the weighted T2I+T2T combined-matrix eval of
  ``evaluator_baseline.py:136-169``;
- ``fusion_sweep``         — the CLIP x Text2SPARQL sweep of
  ``evaluator.py:164-218``: (t2i, t2t) weight pairs x alpha grid, weighted
  fusion, full metrics per cell (sweep config is an argument, not hardcoded);
- ``evaluate_zeroshot``    — checkpoint-less wrapper
  (``baselines/evaluate_zeroshot.py:14-23``).

Determinism: evaluation runs in float32 with ``shuffle=False`` ordering,
reproducing the reference's CPU/GPU-consistency discipline
(``evaluator.py:91,100``) across CPU/TPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import numpy as np

from ..data.datasets import DataPipeline
from ..models.clip import CLIP
from ..parallel.mesh import MeshRuntime
from ..parallel.sharding import host_local_batch_to_global
from ..train.trainer import make_encode_step
from ..utils.logging_utils import save_metrics_to_json, setup_logger
from . import fusion as F
from . import metrics as MET

logger = setup_logger("kemr_tpu.eval")


@dataclass
class EncodedDataset:
    """Normalized embeddings for one split, row-aligned with ``uuids``."""

    image: np.ndarray  # [N, D]
    query: np.ndarray  # [N, D]
    target: np.ndarray  # [N, D]
    uuids: List[str]


def encode_dataset(
    model: CLIP,
    params,
    pipeline: DataPipeline,
    rt: MeshRuntime,
    batch_size: int = 256,
    use_fast: bool = False,
    quantize: Optional[str] = None,
) -> EncodedDataset:
    """Encode every example (order-preserving; final partial batch padded to
    keep jit shapes static, then sliced).

    ``use_fast=True`` (implied by ``quantize``) packs both towers into
    serving plans (``models.fast_encode``) and encodes through the fused /
    int8 kernels — same embeddings within kernel tolerance, much faster at
    corpus scale."""
    use_fast = use_fast or quantize is not None
    if use_fast:
        from ..models.fast_encode import make_encode_plans

        params = make_encode_plans(params, dtype=model.dtype, quantize=quantize)
    encode_step = make_encode_step(model, rt, fast=use_fast)
    imgs, qs, ts, uuids = [], [], [], []
    shard = rt.num_data
    # every device batch must divide the data axis; one static shape for jit
    eff_batch = -(-batch_size // shard) * shard
    pc, pi = jax.process_count(), jax.process_index()
    for batch in pipeline.epoch_batches(batch_size, shuffle=False, drop_last=False):
        n = batch.images.shape[0]
        pad = eff_batch - n
        images = np.pad(batch.images, ((0, pad), (0, 0), (0, 0), (0, 0)))
        query_ids = np.pad(batch.query_ids, ((0, pad), (0, 0)))
        target_ids = np.pad(batch.target_ids, ((0, pad), (0, 0)))
        if pc > 1:
            # multi-host: each process contributes its contiguous slice of
            # the identical padded global batch (gathered outputs come back
            # replicated and in global order — make_encode_step docstring)
            local = eff_batch // pc
            sl = slice(pi * local, (pi + 1) * local)
            images, query_ids, target_ids = images[sl], query_ids[sl], target_ids[sl]
        db = host_local_batch_to_global(
            {"images": images, "query_ids": query_ids, "target_ids": target_ids}, rt.mesh, rt.data_axes
        )
        img_e, q_e, t_e = encode_step(params, db["images"], db["query_ids"], db["target_ids"])
        imgs.append(np.asarray(img_e)[:n])
        qs.append(np.asarray(q_e)[:n])
        ts.append(np.asarray(t_e)[:n])
        uuids.extend(batch.uuids)
    return EncodedDataset(
        image=np.concatenate(imgs),
        query=np.concatenate(qs),
        target=np.concatenate(ts),
        uuids=uuids,
    )


def evaluate_clip_model(
    encoded: EncodedDataset,
    k_values: Sequence[int] = MET.DEFAULT_KS,
    tasks: Sequence[str] = MET.DEFAULT_TASKS,
) -> Dict[str, float]:
    """Standard 3-task metric suite (``evaluator.py:54-163``)."""
    return MET.compute_all_retrieval_metrics(
        encoded.query, encoded.target, encoded.image, k_values=k_values, tasks=tasks
    )


def evaluate_weighted(
    encoded: EncodedDataset,
    t2i_weight: float = 0.5,
    t2t_weight: float = 0.5,
    k_values: Sequence[int] = MET.DEFAULT_KS,
) -> Dict[str, float]:
    """Weighted combined-matrix eval (``evaluator_baseline.py:136-169``)."""
    return MET.compute_retrieval_metrics_final(
        encoded.query,
        encoded.target,
        encoded.image,
        k_values=k_values,
        t2i_weight=t2i_weight,
        t2t_weight=t2t_weight,
    )


def fusion_sweep(
    encoded: EncodedDataset,
    text2sparql_results: Mapping[str, Sequence[str]],
    weight_pairs: Sequence[Tuple[float, float]] = ((0.5, 0.5), (0.1, 0.9)),
    alphas: Sequence[float] = (0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1),
    k_values: Sequence[int] = MET.DEFAULT_KS,
    block: int = 1024,
) -> Dict[str, Dict[str, float]]:
    """CLIP x Text2SPARQL weighted-fusion sweep (``evaluator.py:164-218``).

    For each (t2i, t2t) blend and each alpha, fuse the blended CLIP matrix
    with KG hits and compute full metrics. Returns
    ``{"t2i{a}_t2t{b}_alpha{c}": metrics}``.

    Scale-safe: every sweep cell ranks in query stripes with the sparse
    hit bonus scatter-added per stripe — no [N, N] matrix is ever
    materialized (at the 43k corpus that would be 7.4 GB fp32 per cell x
    18 cells; peak here is O(block * N)).
    """
    results: Dict[str, Dict[str, float]] = {}
    hit_idx, hit_mask, _ = F.build_hit_indices(text2sparql_results, encoded.uuids, encoded.uuids)
    q, t, i = encoded.query, encoded.target, encoded.image
    for w_t2i, w_t2t in weight_pairs:
        for alpha in alphas:
            ranks = F.weighted_fusion_ranks_blocked(
                q, t, i, hit_idx, hit_mask,
                t2i_weight=w_t2i, t2t_weight=w_t2t,
                alpha=alpha, sparql_weight=1.0 - alpha,
                block=block,
            )
            key = f"t2i{w_t2i}_t2t{w_t2t}_alpha{alpha}"
            results[key] = MET.metrics_from_ranks(ranks, k_values)
    return results


def run_full_evaluation(
    model: CLIP,
    params,
    pipeline: DataPipeline,
    rt: Optional[MeshRuntime] = None,
    batch_size: int = 256,
    k_values: Sequence[int] = MET.DEFAULT_KS,
    t2i_weight: float = 0.5,
    t2t_weight: float = 0.5,
    text2sparql_results: Optional[Mapping[str, Sequence[str]]] = None,
    output_json: Optional[str] = None,
    encoder: str = "flax",
) -> Dict[str, object]:
    """End-to-end eval: encode -> 3-task metrics -> weighted combined ->
    optional fusion sweep -> optional JSON persistence (``evaluator.py:260-389``).

    ``encoder``: "flax" (exact), "fast" (fused bf16), or "int8" (W8A8)."""
    from ..utils.config import resolve_encoder

    use_fast, quantize = resolve_encoder(encoder)
    rt = rt or MeshRuntime.create()
    encoded = encode_dataset(
        model, params, pipeline, rt, batch_size, use_fast=use_fast, quantize=quantize
    )
    report: Dict[str, object] = {
        "num_samples": len(encoded.uuids),
        "per_task": evaluate_clip_model(encoded, k_values),
        "weighted": evaluate_weighted(encoded, t2i_weight, t2t_weight, k_values),
    }
    if text2sparql_results is not None:
        report["fusion_sweep"] = fusion_sweep(encoded, text2sparql_results, k_values=k_values)
    if output_json:
        save_metrics_to_json(report, output_json)
    return report


def evaluate_zeroshot(*args, **kwargs):
    """Zero-shot eval = full eval with pretrained params
    (``baselines/evaluate_zeroshot.py:14-23``)."""
    return run_full_evaluation(*args, **kwargs)
