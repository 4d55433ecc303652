"""IVF auto-nprobe calibration (retrieval/ann.py::calibrate_nprobe +
CLIPRetrieval.calibrate_nprobe + the index CLI's --calibrate flag).

TPU-native extension: the reference has no ANN at all; FAISS users hand-tune
nprobe per dataset. The calibrator sweeps doubling probe widths against the
exact f32 ranking and picks the smallest width meeting a recall target.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.ann import (
    build_ivf_index,
    calibrate_nprobe,
)
from tests.test_ann import _clustered, _normed


def _world(rng, n=600, d=16):
    img = _clustered(rng, n, d, 12)
    txt = _clustered(rng, n, d, 12)
    return img, txt


def test_calibrate_meets_target_on_clustered_data():
    rng = np.random.default_rng(0)
    img, txt = _world(rng)
    index = build_ivf_index(img, txt, nlist=16, seed=0)
    queries = img[rng.choice(600, 64, replace=False)]
    out = calibrate_nprobe(index, queries, img, txt, k=10, target_recall=0.9)
    assert out["achieved"] >= 0.9
    # report sweeps doubling widths and stops at the first success
    widths = [r["nprobe"] for r in out["report"]]
    assert widths == sorted(widths)
    assert out["nprobe"] == widths[-1]
    # a tighter target never picks a smaller width
    strict = calibrate_nprobe(index, queries, img, txt, k=10, target_recall=0.999)
    assert strict["nprobe"] >= out["nprobe"]


def test_calibrate_full_probe_is_exact():
    """target_recall=1.0 is always reachable: nprobe=nlist probes every
    cluster, i.e. an exact scan."""
    rng = np.random.default_rng(1)
    img, txt = _world(rng, n=200)
    index = build_ivf_index(img, txt, nlist=4, seed=0)
    queries = img[:16]
    out = calibrate_nprobe(index, queries, img, txt, k=5, target_recall=1.0)
    assert out["report"][-1]["nprobe"] <= 4
    assert out["nprobe"] <= 4
    full = [r for r in out["report"] if r["nprobe"] == out["nprobe"]]
    assert out["achieved"] == full[-1]["recall"] >= 1.0 or out["nprobe"] == 4


def test_calibrate_quantized_index():
    rng = np.random.default_rng(2)
    img, txt = _world(rng, n=300)
    index = build_ivf_index(img, txt, nlist=8, seed=0, quantize="int8")
    out = calibrate_nprobe(index, img[:32], img, txt, k=10, target_recall=0.85)
    assert out["achieved"] >= 0.85 or out["nprobe"] == 8


@pytest.fixture(scope="module")
def retriever_world(devices8):
    from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
        DataPipeline,
        make_synthetic_source,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.embedding_store import (
        build_embedding_store,
    )
    from tests.test_retrieval_engine import MERGES

    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(64, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    rt = MeshRuntime.create()
    store = build_embedding_store(model, params, pipe, rt, batch_size=16)
    return model, params, tok, store, rt


def test_retriever_calibrate_applies_nprobe(retriever_world):
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.clip_retrieval import (
        CLIPRetrieval,
    )

    model, params, tok, store, rt = retriever_world
    r = CLIPRetrieval(
        model, params, tok, store, top_k=10, ann="ivf", ann_nlist=8, ann_nprobe=1
    )
    out = r.calibrate_nprobe(target_recall=0.95, k=10, sample=32)
    assert r._corpus.nprobe == out["nprobe"]
    assert r.ann_nprobe == out["nprobe"]
    # serving at the calibrated width matches the exact scan closely
    exact = CLIPRetrieval(model, params, tok, store, top_k=10)
    a = [x["uuid"] for x in exact.retrieval("hello cat")]
    b = [x["uuid"] for x in r.retrieval("hello cat")]
    assert len(set(a) & set(b)) >= int(0.8 * len(a))


def test_retriever_calibrate_apply_false_keeps_width(retriever_world):
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.clip_retrieval import (
        CLIPRetrieval,
    )

    model, params, tok, store, rt = retriever_world
    r = CLIPRetrieval(
        model, params, tok, store, top_k=10, ann="ivf", ann_nlist=8, ann_nprobe=2
    )
    r.calibrate_nprobe(target_recall=0.99, k=10, sample=16, apply=False)
    assert r._corpus.nprobe == 2


def test_retriever_calibrate_text_queries(retriever_world):
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.clip_retrieval import (
        CLIPRetrieval,
    )

    model, params, tok, store, rt = retriever_world
    r = CLIPRetrieval(
        model, params, tok, store, top_k=5, ann="ivf", ann_nlist=4, ann_nprobe=1
    )
    out = r.calibrate_nprobe(queries=["hello cat", "world"], target_recall=0.5, k=5)
    assert out["report"]


def test_retriever_calibrate_requires_ivf(retriever_world):
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.clip_retrieval import (
        CLIPRetrieval,
    )

    model, params, tok, store, rt = retriever_world
    r = CLIPRetrieval(model, params, tok, store, top_k=5)
    with pytest.raises(ValueError):
        r.calibrate_nprobe()


def test_index_cli_calibrate(tmp_path, retriever_world, capfd):
    import os

    from knowledge_enhanced_multimodal_retrieval_tpu.cli.index import main as index_main

    model, params, tok, store, rt = retriever_world
    store_path = str(tmp_path / "store.npz")
    store.save(store_path)
    out = str(tmp_path / "ivf.npz")
    index_main([
        "--store", store_path, "--out", out,
        "--calibrate", "0.9", "--calibrate-k", "5", "--calibrate-sample", "16",
        "--eval.ann_nlist=4",
    ])
    assert os.path.exists(out)
    captured = capfd.readouterr()
    assert "recommended probe width" in captured.err + captured.out
