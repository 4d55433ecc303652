import json
import os

import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.cli import common as CC
from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import Config, apply_overrides


def _tiny_cfg(tmp, **over):
    cfg = Config()
    base = {
        "data.dataset": "synthetic:24",
        "data.image_size": "32",
        "data.context_length": "16",
        "model.name": "tiny",  # replaced below; tiny arch injected via monkeypatch
        "eval.output_dir": os.path.join(tmp, "exp"),
    }
    base.update(over)
    return apply_overrides(cfg, base)


@pytest.fixture(autouse=True)
def tiny_arch(monkeypatch):
    """Register a 'tiny' CLIP variant so CLI smoke tests stay fast."""
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M

    monkeypatch.setitem(
        M.ARCHS, "tiny", M.CLIPArch(16, 32, 1, 32, 16, 16, 600, 32, 2, 1, vision_heads=2)
    )


def test_build_pipeline_synthetic(tmp_path):
    cfg = _tiny_cfg(str(tmp_path))
    pipe = CC.build_pipeline(cfg, "train")
    assert len(pipe) == 24
    batch = pipe.make_batch([0, 1])
    assert batch.images.shape == (2, 32, 32, 3)
    assert batch.query_ids.shape == (2, 16)


def test_cli_evaluate_end_to_end(tmp_path, devices8):
    from knowledge_enhanced_multimodal_retrieval_tpu.cli.evaluate import main

    cfg_dir = str(tmp_path)
    report = main([
        "--data.dataset=synthetic:24",
        "--data.image_size=32",
        "--data.context_length=16",
        "--model.name=tiny",
        "--eval.batch_size=8",
        f"--eval.output_dir={cfg_dir}",
    ])
    assert report["num_samples"] == 24
    out = os.path.join(cfg_dir, "eval_tiny_zeroshot.json")
    assert os.path.exists(out)
    assert "T2I_MRR" in report["per_task"]


def test_cli_evaluate_with_t2s_sweep(tmp_path, devices8):
    from knowledge_enhanced_multimodal_retrieval_tpu.cli.evaluate import main

    t2s = os.path.join(tmp_path, "t2s.json")
    json.dump({"uuid-000001": ["uuid-000001"]}, open(t2s, "w"))
    report = main([
        "--data.dataset=synthetic:24",
        "--data.image_size=32",
        "--data.context_length=16",
        "--model.name=tiny",
        "--eval.batch_size=8",
        f"--eval.output_dir={tmp_path}",
        "--t2s_results", t2s,
    ])
    assert len(report["fusion_sweep"]) == 18


def test_cli_train_smoke(tmp_path, devices8):
    from knowledge_enhanced_multimodal_retrieval_tpu.cli.train import main

    result = main([
        "--data.dataset=synthetic:32",
        "--data.image_size=32",
        "--data.context_length=16",
        "--model.name=tiny",
        "--model.dtype=float32",
        "--train.batch_size=16",
        "--train.epochs=1",
        "--train.lr=1e-3",
        f"--train.checkpoint_dir={tmp_path}/ckpt",
        f"--eval.output_dir={tmp_path}/exp",
    ])
    assert result["epochs_run"] == 1
    assert os.path.isdir(os.path.join(tmp_path, "ckpt", "checkpoint_latest"))


def test_cli_train_lora_saves_best_adapters(tmp_path, devices8):
    """A LoRA run writes the adapter artifact, and it carries the BEST
    checkpoint's adapters (early stopping keeps training past the best)."""
    from knowledge_enhanced_multimodal_retrieval_tpu.cli.train import main
    from knowledge_enhanced_multimodal_retrieval_tpu.train import checkpoint as ckpt
    from knowledge_enhanced_multimodal_retrieval_tpu.train.lora import load_adapters

    result = main([
        "--data.dataset=synthetic:32",
        "--data.image_size=32",
        "--data.context_length=16",
        "--model.name=tiny",
        "--model.dtype=float32",
        "--train.batch_size=16",
        "--train.epochs=2",
        "--train.lr=1e-2",
        "--train.lora_rank=2",
        f"--train.checkpoint_dir={tmp_path}/ckpt",
        f"--eval.output_dir={tmp_path}/exp",
    ])
    path = result["adapters_path"]
    assert os.path.exists(path)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from knowledge_enhanced_multimodal_retrieval_tpu.cli.common import build_model_and_params
    from knowledge_enhanced_multimodal_retrieval_tpu.train.lora import lora_init
    from knowledge_enhanced_multimodal_retrieval_tpu.train.trainer import make_optimizer
    from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import (
        TrainConfig,
        config_from_argv,
    )

    cfg = config_from_argv([
        "--data.dataset=synthetic:32", "--model.name=tiny", "--model.dtype=float32",
        "--data.image_size=32", "--data.context_length=16",
    ])
    _, params = build_model_and_params(cfg, rng_seed=42)
    adapters, meta = load_adapters(path, params)
    assert meta["rank"] == 2 and meta["targets"] == "attn"
    # the artifact equals the BEST checkpoint's adapters, not merely the last
    tcfg = TrainConfig(lora_rank=2)
    tmpl_ad = lora_init(jax.random.PRNGKey(42), params, 2, "attn")
    template = {
        "params": tmpl_ad,
        "opt_state": make_optimizer(tcfg, 2, tmpl_ad).init(tmpl_ad),
        "step": jnp.zeros((), jnp.int32),
    }
    best_state, _ = ckpt.load_checkpoint(f"{tmp_path}/ckpt", "best", template)
    for a, b in zip(
        jax.tree_util.tree_leaves(adapters), jax.tree_util.tree_leaves(best_state["params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_precompute_and_serve_query(tmp_path, devices8, capsys, monkeypatch):
    from knowledge_enhanced_multimodal_retrieval_tpu.cli.precompute import main as precompute
    from knowledge_enhanced_multimodal_retrieval_tpu.cli.serve import main as serve

    store_path = os.path.join(tmp_path, "store.npz")
    out = precompute([
        "--data.dataset=synthetic:24",
        "--data.image_size=32",
        "--data.context_length=16",
        "--model.name=tiny",
        "--eval.batch_size=8",
        "--out", store_path,
    ])
    assert os.path.exists(out)

    # serve uses the byte-fallback tokenizer for synthetic configs; pretend
    # no CLIP vocab exists so build_tokenizer falls back cleanly
    monkeypatch.setattr(
        "knowledge_enhanced_multimodal_retrieval_tpu.cli.serve.build_tokenizer",
        lambda cfg: CC._tiny_tokenizer(),
    )
    serve([
        "--model.name=tiny",
        "--store", store_path,
        "--query", "hello cat",
    ])
    out_text = capsys.readouterr().out  # logger lines precede the JSON blob
    payload = json.loads(out_text[out_text.index("{") :])
    assert payload["query"] == "hello cat"
    assert len(payload["results"]) == 20
    scores = [r["score"] for r in payload["results"]]
    assert scores == sorted(scores, reverse=True)


def test_cli_serve_encoder_modes(tmp_path, devices8, capsys, monkeypatch):
    """serve maps eval.encoder/eval.quantize_corpus onto the retriever."""
    from knowledge_enhanced_multimodal_retrieval_tpu.cli.precompute import main as precompute
    from knowledge_enhanced_multimodal_retrieval_tpu.cli import serve as serve_mod

    store_path = os.path.join(tmp_path, "store.npz")
    precompute([
        "--data.dataset=synthetic:16",
        "--data.image_size=32",
        "--data.context_length=16",
        "--model.name=tiny",
        "--eval.batch_size=8",
        "--out", store_path,
    ])
    monkeypatch.setattr(
        "knowledge_enhanced_multimodal_retrieval_tpu.cli.serve.build_tokenizer",
        lambda cfg: CC._tiny_tokenizer(),
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import config_from_argv

    cfg = config_from_argv(["--model.name=tiny", "--eval.encoder=int8", "--eval.quantize_corpus=true"])
    eng = serve_mod.build_engine(cfg, store_path)
    r = eng.clip_retriever
    assert r.use_fused_encoder and r.quantize == "int8" and r.quantize_corpus
    res = eng.retrieve_text_noknowledge("hello cat")
    assert res and all("uuid" in x for x in res)

    cfg_bad = config_from_argv(["--model.name=tiny", "--eval.encoder=fp16"])
    with pytest.raises(ValueError):
        serve_mod.build_engine(cfg_bad, store_path)

    # sharded int8 corpus over the 8-device mesh, through the CLI config —
    # both with the flax encoder and with the fused int8 encoder (pallas
    # encode replicated outside the shard_map'd corpus top-k)
    for enc in ("flax", "int8"):
        cfg_sh = config_from_argv([
            "--model.name=tiny", f"--eval.encoder={enc}",
            "--eval.quantize_corpus=true", "--eval.shard_corpus=true",
        ])
        eng_sh = serve_mod.build_engine(cfg_sh, store_path)
        r_sh = eng_sh.clip_retriever
        assert r_sh.shard_corpus and r_sh.quantize_corpus
        assert not r_sh.corpus_img.sharding.is_fully_replicated
        res = eng_sh.retrieve_text_noknowledge("hello cat")
        assert res and all("uuid" in x for x in res)


def test_cli_serve_multihost_http_starts(tmp_path, devices8, monkeypatch):
    """--multihost --http must start and serve (r3 advisor high): daemon
    wiring may not touch blocked facade routes eagerly, mutation/filtered
    callables must be None (-> graceful 501, never a 500), and the search
    path must route through the lockstep protocol."""
    from knowledge_enhanced_multimodal_retrieval_tpu.cli import serve as serve_mod
    from knowledge_enhanced_multimodal_retrieval_tpu.cli.precompute import main as precompute
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import http_server as hs

    store_path = os.path.join(tmp_path, "store.npz")
    precompute([
        "--data.dataset=synthetic:16",
        "--data.image_size=32",
        "--data.context_length=16",
        "--model.name=tiny",
        "--eval.batch_size=8",
        "--out", store_path,
    ])
    monkeypatch.setattr(
        "knowledge_enhanced_multimodal_retrieval_tpu.cli.serve.build_tokenizer",
        lambda cfg: CC._tiny_tokenizer(),
    )

    captured = {}

    class FakeServer:
        def __init__(self, batch_fn, **kw):
            captured["batch_fn"] = batch_fn
            captured.update(kw)
            self.address = (kw.get("host", "127.0.0.1"), kw.get("port", 0))

        def serve_forever(self):
            # exercise the wired search path while the lockstep loop is live
            captured["results"] = captured["alphas_batch_fn"](
                ["hello cat", "hel he"], [None, 0.3]
            )

        def close(self):
            captured["closed"] = True

        def request_shutdown(self):  # pragma: no cover - signal path
            pass

    monkeypatch.setattr(hs, "RetrievalHTTPServer", FakeServer)
    serve_mod.main([
        "--model.name=tiny",
        "--store", store_path,
        "--multihost",
        "--http", "0",
    ])
    # corpus mutation + filtered search are single-host only -> wired as None
    for name in ("add_documents_fn", "remove_documents_fn",
                 "encode_documents_fn", "snapshot_fn", "filtered_batch_fn"):
        assert captured[name] is None, name
    assert captured["closed"]
    results = captured["results"]
    assert len(results) == 2 and all(r and "uuid" in r[0] for r in results)


def test_cli_export_roundtrip(tmp_path, devices8):
    """export CLI: npz -> OpenAI .pt relayout, and Orbax train checkpoint ->
    publishable HF directory (loadable offline via from_pretrained)."""
    import jax
    import numpy as np

    from knowledge_enhanced_multimodal_retrieval_tpu.cli.export import main as export
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.models import convert as CV
    from knowledge_enhanced_multimodal_retrieval_tpu.train.checkpoint import save_checkpoint

    model = M.build_model("tiny", dtype="float32")
    params = jax.tree_util.tree_map(
        np.asarray, M.init_params(model, jax.random.PRNGKey(0))
    )

    # npz -> openai .pt, reimport losslessly
    npz = os.path.join(tmp_path, "w.npz")
    CV.save_params_npz(params, npz)
    pt = export([f"--model.checkpoint={npz}", "--format", "openai", "--out", f"{tmp_path}/w.pt"])
    back = CV.flatten_params(CV.torch_to_flax(CV.load_torch_state_dict(pt)))
    flat = CV.flatten_params(params)
    assert flat.keys() == back.keys()
    for k in flat:
        np.testing.assert_array_equal(np.asarray(flat[k], np.float32), back[k], err_msg=k)

    # orbax train checkpoint -> HF directory
    pytest.importorskip("transformers")
    import transformers

    ckpt_dir = os.path.join(tmp_path, "ckpt")
    save_checkpoint(ckpt_dir, "best", {"params": params, "step": np.int32(1)}, {}, wait=True)
    out = export([
        "--model.name=tiny", "--train-dir", ckpt_dir, "--role", "best",
        "--format", "hf", "--out", f"{tmp_path}/hf_dir",
    ])
    hf = transformers.CLIPModel.from_pretrained(out)
    assert hf.config.projection_dim == 16


def test_pop_flag_both_spellings():
    """Entry-point flags accept --flag value AND --flag=value (config
    overrides use '=' everywhere; the flags must too)."""
    from knowledge_enhanced_multimodal_retrieval_tpu.cli.common import pop_flag

    args = ["--format=openai", "--model.name=tiny", "--out", "x.pt"]
    assert pop_flag(args, "--format", "hf") == "openai"
    assert pop_flag(args, "--out") == "x.pt"
    assert pop_flag(args, "--missing", "dflt") == "dflt"
    assert args == ["--model.name=tiny"]
    with pytest.raises(ValueError):
        pop_flag(["--out"], "--out")


def test_cli_export_equals_form(tmp_path, devices8):
    """--format=openai (the '=' spelling) must be honored, not silently
    ignored in favor of the default."""
    import jax
    import numpy as np

    from knowledge_enhanced_multimodal_retrieval_tpu.cli.export import main as export
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.models import convert as CV

    model = M.build_model("tiny", dtype="float32")
    params = jax.tree_util.tree_map(np.asarray, M.init_params(model, jax.random.PRNGKey(0)))
    npz = os.path.join(tmp_path, "w.npz")
    CV.save_params_npz(params, npz)
    pt = export([f"--model.checkpoint={npz}", "--format=openai", f"--out={tmp_path}/w.pt"])
    assert pt.endswith("w.pt") and os.path.exists(pt)


def test_cli_index_builder(tmp_path, devices8):
    """cli/index builds a fingerprinted IVF cache the serve path loads."""
    from knowledge_enhanced_multimodal_retrieval_tpu.cli.index import main as index_main
    from knowledge_enhanced_multimodal_retrieval_tpu.cli.precompute import main as precompute
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.ann import load_ivf_index
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.embedding_store import (
        EmbeddingStore,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.ann import corpus_fingerprint

    store_path = os.path.join(tmp_path, "store.npz")
    precompute([
        "--out", store_path,
        "--data.dataset=synthetic:24", "--data.image_size=32",
        "--data.context_length=16", "--model.name=tiny",
        "--model.dtype=float32", "--eval.batch_size=8",
    ])
    out = os.path.join(tmp_path, "ivf.npz")
    index_main(["--store", store_path, "--out", out, "--eval.ann_nlist=4"])
    store = EmbeddingStore.load(store_path)
    fp = corpus_fingerprint(store.image, store.text)
    index = load_ivf_index(out, expected_fingerprint=fp)
    assert index.nlist == 4


def test_cli_serve_local_kg(tmp_path, devices8, capsys, monkeypatch):
    """serve --kg: the in-process SPARQL engine replaces GraphDB, the LLM is
    a canned client, and the knowledge bonus lands on the SPARQL-hit uuid."""
    from knowledge_enhanced_multimodal_retrieval_tpu.cli.precompute import main as precompute
    from knowledge_enhanced_multimodal_retrieval_tpu.cli.serve import main as serve
    from knowledge_enhanced_multimodal_retrieval_tpu.knowledge import clients as clients_mod
    from knowledge_enhanced_multimodal_retrieval_tpu.knowledge.clients import FakeLLMClient

    store_path = os.path.join(tmp_path, "store.npz")
    precompute([
        "--data.dataset=synthetic:24",
        "--data.image_size=32",
        "--data.context_length=16",
        "--model.name=tiny",
        "--eval.batch_size=8",
        "--out", store_path,
    ])
    monkeypatch.setattr(
        "knowledge_enhanced_multimodal_retrieval_tpu.cli.serve.build_tokenizer",
        lambda cfg: CC._tiny_tokenizer(),
    )

    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    da = "https://example.org/ch/DigitalArtefact"
    p62 = "http://www.cidoc-crm.org/cidoc-crm/P62_depicts"
    boosted = "uuid-000003"
    kg_path = os.path.join(tmp_path, "kg.json")
    with open(kg_path, "w") as f:
        json.dump({
            "triples": [
                [f"https://example.org/ch/artefact/{boosted}", rdf_type, {"uri": da}],
                [f"https://example.org/ch/artefact/{boosted}", p62, "https://example.org/ch/entity/x"],
            ]
        }, f)
    llm_doc = {
        "distinct": True,
        "variables": [{"termType": "Variable", "value": "DigitalArtefact"}],
        "branches": [{
            "line": {
                "s": "DigitalArtefact", "p": p62, "o": "Entity_1",
                "sType": [da], "oType": [],
                "values": [{"label": "x", "rdfTerm": {"type": "uri", "value": "https://example.org/ch/entity/x"}}],
            },
        }],
    }
    monkeypatch.setenv("MISTRAL_API_KEY", "test")
    monkeypatch.setenv("MISTRAL_AGENT_ID", "test")
    monkeypatch.setattr(
        clients_mod, "MistralAgentClient",
        lambda: FakeLLMClient({}, default=json.dumps(llm_doc)),
    )

    def run(extra):
        serve(["--model.name=tiny", "--store", store_path, "--query", "hello cat"] + extra)
        out_text = capsys.readouterr().out
        payload = json.loads(out_text[out_text.index("{"):])
        return {r["uuid"]: r["score"] for r in payload["results"]}

    monkeypatch.delenv("SPARQL_ENDPOINT", raising=False)
    clip_only = run([])  # no KG endpoints -> CLIP-only mode, raw clip scores
    fused = run(["--kg", kg_path])
    assert boosted in fused
    assert fused[boosted] == pytest.approx(0.8 * clip_only[boosted] + 0.2, abs=1e-3)
    others = [u for u in fused if u != boosted]
    assert others and all(
        fused[u] == pytest.approx(0.8 * clip_only[u], abs=1e-3) for u in others
    )
