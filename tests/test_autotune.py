"""Serving-config autotuner tests (eval/autotune.py + scripts/autotune.py)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.eval.autotune import (
    _parse_config,
    recommend_config,
    serve_flags,
)


@pytest.fixture
def aniso():
    rng = np.random.default_rng(11)
    d = 48
    spec = 2.0 ** (-np.arange(d) / 3.0)

    def mk(n):
        v = rng.standard_normal((n, d)) * spec
        return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)

    return mk(256), mk(256), mk(24)


def test_parse_config_round_trips():
    assert _parse_config("exact") == {
        "mode": "exact", "kwargs": {}, "bytes_per_dim": 4.0,
        "capacity_multiplier": 1.0, "reranked": False,
    }
    p = _parse_config("int4+rot+rerank4x")
    assert p["kwargs"] == {
        "quantize_corpus": "int4", "rotate": True, "rerank": True, "rerank_factor": 4,
    }
    assert p["capacity_multiplier"] == 8.0
    assert _parse_config("ivf-nprobe4/16") is None
    assert _parse_config("trunc16") is None
    pq = _parse_config("pq+rerank8x")
    assert pq["kwargs"] == {
        "quantize_corpus": "pq", "rerank": True, "rerank_factor": 8,
    }
    assert pq["capacity_multiplier"] == 32.0  # default m = D/8 codes
    assert serve_flags(p["kwargs"], rotate_seed=3) == (
        "--eval.quantize_corpus=int4 --eval.rotate=true "
        "--eval.rotate_seed=3 --eval.rerank=true --eval.rerank_factor=4"
    )


def test_recommendation_meets_target_and_maximizes_capacity(aniso):
    image, text, q = aniso
    rec = recommend_config(image, text, q, recall_target=0.95, k=10)
    assert rec["predicted_recall_at_k"] >= 0.95
    # some packed mode must beat exact here (full-fetch... rerank rows reach
    # 1.0 at factor*k < n only when the fetch covers the winners; at minimum
    # int8 meets 0.95 on this data), so the pick is never plain exact
    assert rec["config"] != "exact"
    assert rec["capacity_multiplier"] > 1.0
    # every measured row that beat the pick's capacity missed the target
    by = {r["config"]: r for r in rec["rows"]}
    for name, row in by.items():
        p = _parse_config(name)
        if p is None or (p["mode"] == "binary" and not p["reranked"]):
            continue
        if p["capacity_multiplier"] > rec["capacity_multiplier"]:
            assert row["recall_at_k"] < 0.95, (name, row)


def test_recommendation_respects_rerank_ok(aniso):
    image, text, q = aniso
    rec = recommend_config(image, text, q, recall_target=0.9, k=10, rerank_ok=False)
    assert not rec["kwargs"].get("rerank", False)
    # binary needs rerank, so without rerank the ceiling is int4/int8/exact
    assert rec["kwargs"].get("quantize_corpus") != "binary"


def test_recommendation_exact_fallback(aniso):
    """A target of 1.0 on hard data falls back to a full-recall config
    (exact, or a rerank rung that measured 1.0)."""
    image, text, q = aniso
    rec = recommend_config(image, text, q, recall_target=1.0, k=10)
    assert rec["predicted_recall_at_k"] == 1.0
    with pytest.raises(ValueError, match="recall_target"):
        recommend_config(image, text, q, recall_target=1.5)


def test_cli_synthetic_smoke():
    proc = subprocess.run(
        [sys.executable, "scripts/autotune.py", "--synthetic", "256,32",
         "--queries", "8", "--k", "5", "--recall-target", "0.9", "--cpu"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    assert payload["predicted_recall_at_k"] >= 0.9
    assert "serve_flags" in payload and "config" in payload
