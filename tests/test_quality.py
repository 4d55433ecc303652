"""Quality-sweep tests (eval/quality.py + scripts/quality_sweep.py)."""

import json
import subprocess
import sys

import numpy as np

from knowledge_enhanced_multimodal_retrieval_tpu.eval.quality import (
    format_table,
    quality_sweep,
)


def _world(rng, n=400, d=64, q=16):
    norm = lambda x: (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)  # noqa: E731
    return (
        norm(rng.standard_normal((n, d))),
        norm(rng.standard_normal((n, d))),
        norm(rng.standard_normal((q, d))),
    )


def test_sweep_rows_and_invariants(rng):
    image, text, q = _world(rng)
    rows = quality_sweep(image, text, q, k=10, alpha=0.6, rerank_factor=40, nprobes=(4,))
    by = {r["config"]: r for r in rows}
    assert by["exact"]["recall_at_k"] == 1.0 and by["exact"]["score_mae"] == 0.0
    # full-width rerank (40 * 10 = 400 = n) IS an exact rescore: recall 1.0
    assert by["int8+rerank40x"]["recall_at_k"] == 1.0
    assert by["int4+rerank40x"]["recall_at_k"] == 1.0
    assert by["pq+rerank40x"]["recall_at_k"] == 1.0
    assert by["int8+rerank40x"]["score_mae"] < 1e-5
    # pq rows present: candidate-quality recall between raw binary and int8
    assert 0.0 < by["pq"]["recall_at_k"] <= by["int8"]["recall_at_k"]
    # coarser packing -> larger score error
    assert by["int4"]["score_mae"] > by["int8"]["score_mae"] > 0.0
    # every recall is a valid fraction and int8 tracks exact closely
    for r in rows:
        assert 0.0 <= r["recall_at_k"] <= 1.0
    assert by["int8"]["recall_at_k"] >= 0.9
    # the ivf row is present and labeled with the probe width
    assert any(c.startswith("ivf-nprobe4/") for c in by)


def test_sweep_full_probe_ivf_is_exact(rng):
    image, text, q = _world(rng, n=128, q=8)
    rows = quality_sweep(image, text, q, k=5, nprobes=(128,), nlist=8)
    by = {r["config"]: r for r in rows}
    assert by["ivf-nprobe8/8"]["recall_at_k"] == 1.0  # clamped to nlist: full probe


def test_format_table(rng):
    image, text, q = _world(rng, n=64, q=4)
    out = format_table(quality_sweep(image, text, q, k=5))
    assert "config" in out and "int4+rerank4x" in out


def test_cli_synthetic_smoke():
    proc = subprocess.run(
        [sys.executable, "scripts/quality_sweep.py", "--synthetic", "256,32",
         "--queries", "8", "--k", "5", "--nprobes", "4", "--cpu"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    assert payload["k"] == 5 and len(payload["rows"]) >= 6


def test_sweep_rotation_rows(rng):
    """rotate=True adds +rot rows; on anisotropic embeddings the rotated
    packings recover recall (the CLIPRetrieval(rotate=True) decision row)."""
    d = 48
    spec = 2.0 ** (-np.arange(d) / 3.0)

    def aniso(n):
        v = rng.standard_normal((n, d)) * spec
        return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)

    image, text, q = aniso(256), aniso(256), aniso(16)
    rows = quality_sweep(image, text, q, k=10, rotate=True)
    by = {r["config"]: r for r in rows}
    for name in ("int4+rot", "int8+rot", "binary+rot", "int4+rot+rerank4x"):
        assert name in by, sorted(by)
    assert by["binary+rot"]["recall_at_k"] > by["binary"]["recall_at_k"]
    assert by["int4+rot"]["recall_at_k"] >= by["int4"]["recall_at_k"]
    # without rotate no +rot rows appear
    plain = {r["config"] for r in quality_sweep(image, text, q, k=10)}
    assert not any("+rot" in c for c in plain)
