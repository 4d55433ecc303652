"""End-to-end integration: fine-tune -> evaluate -> precompute -> serve.

One scenario exercising the whole framework the way a user would, on the
8-device CPU mesh: training must measurably improve retrieval on the
training corpus (memorization at high LR), the improved model feeds the
embedding store, and the serving engine returns the store's content.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import DataPipeline, make_synthetic_source
from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
from knowledge_enhanced_multimodal_retrieval_tpu.eval.evaluator import encode_dataset, evaluate_clip_model
from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import CLIPRetrieval, RetrievalEngine, build_embedding_store
from knowledge_enhanced_multimodal_retrieval_tpu.train.trainer import CLIPTrainer
from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import TrainConfig

MERGES = [("c", "a"), ("ca", "t</w>"), ("h", "e"), ("he", "l")]


@pytest.mark.slow
def test_full_lifecycle(devices8, tmp_path):
    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(32, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    rt = MeshRuntime.create()

    # 1. baseline quality with random weights
    enc0 = encode_dataset(model, params, pipe, rt, batch_size=16)
    before = evaluate_clip_model(enc0)

    # 2. fine-tune (memorize the 32 pairs)
    cfg = TrainConfig(
        batch_size=16, epochs=8, lr=3e-3, weight_decay=0.0, grad_clip_norm=10.0,
        checkpoint_dir=os.path.join(tmp_path, "ckpt"), log_every=10, early_stop_patience=100,
    )
    trainer = CLIPTrainer(model, params, pipe, pipe, cfg, rt, out_dir=str(tmp_path))
    result = trainer.train()
    trained = trainer.state["params"]

    # 3. evaluation must improve substantially
    enc1 = encode_dataset(model, trained, pipe, rt, batch_size=16)
    after = evaluate_clip_model(enc1)
    assert after["T2T_MRR"] > before["T2T_MRR"] + 10, (before["T2T_MRR"], after["T2T_MRR"])
    assert after["T2I_MRR"] > before["T2I_MRR"], (before["T2I_MRR"], after["T2I_MRR"])

    # 4. precompute the store from the trained model and serve
    store = build_embedding_store(model, trained, pipe, rt, batch_size=16)
    store_path = os.path.join(tmp_path, "store.npz")
    store.save(store_path)
    retriever = CLIPRetrieval(model, trained, tok, store, top_k=5)
    engine = RetrievalEngine(retriever)
    results = engine.retrieve_text_noknowledge("hello cat", threshold=-10)
    assert len(results) == 5
    assert all(r["uuid"].startswith("uuid-") for r in results)

    # 5. the best checkpoint from training is loadable and matches
    from knowledge_enhanced_multimodal_retrieval_tpu.train import checkpoint as ckpt

    state, meta = ckpt.load_checkpoint(cfg.checkpoint_dir, "best", trainer.state)
    assert meta["best_epoch"] == result["best_epoch"]

    # 6. publish: export the trained weights to an OpenAI-layout .pt,
    # reimport, and serve — results must be identical (the TPU-trained
    # model is consumable by the reference stack and round-trips exactly)
    from knowledge_enhanced_multimodal_retrieval_tpu.models import convert as CV

    pt_path = os.path.join(tmp_path, "trained.pt")
    CV.save_openai_pt(jax.tree_util.tree_map(np.asarray, trained), pt_path)
    reimported = CV.torch_to_flax(CV.load_torch_state_dict(pt_path))
    retriever2 = CLIPRetrieval(model, reimported, tok, store, top_k=5)
    results2 = RetrievalEngine(retriever2).retrieve_text_noknowledge("hello cat", threshold=-10)
    assert [r["uuid"] for r in results2] == [r["uuid"] for r in results]

    # 7. the production front door: the same engine behind the HTTP daemon
    import json as json_mod
    from urllib.request import urlopen

    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import RetrievalHTTPServer

    batch_fn = lambda qs: engine.retrieve_text_noknowledge_batch(qs, threshold=-10)  # noqa: E731
    with RetrievalHTTPServer(batch_fn, port=0, max_wait_ms=5.0) as srv:
        host, port = srv.address
        body = json_mod.loads(urlopen(f"http://{host}:{port}/search?q=hello%20cat&n=5", timeout=120).read())
    assert [r["uuid"] for r in body["results"]] == [r["uuid"] for r in results]
