import os

import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.utils import config as C


def test_default_config_roundtrip(tmp_path):
    cfg = C.Config()
    path = os.path.join(tmp_path, "cfg.json")
    C.save_json(cfg, path)
    loaded = C.load_json(C.Config, path)
    assert loaded == cfg


def test_canonical_train_defaults_match_reference():
    # scripts/fine-tuning/train.sh:7-46 + trainer.py:479-492
    t = C.TrainConfig()
    assert t.batch_size == 64
    assert t.epochs == 20
    assert t.lr == 5e-6
    assert t.weight_decay == 0.02
    assert (t.beta1, t.beta2, t.eps) == (0.9, 0.98, 1e-6)
    assert t.temperature == 0.07
    assert (t.t2i_weight, t.t2t_weight) == (0.7, 0.3)
    assert t.grad_clip_norm == 1.0
    assert t.early_stop_patience == 5
    assert t.seed == 42


def test_serving_fusion_defaults_match_reference():
    # src/retrieval.py:79
    f = C.FusionConfig()
    assert (f.alpha, f.beta, f.alpha_clip, f.threshold) == (0.8, 0.2, 0.5, 0.0)


def test_overrides_dotted():
    cfg = C.Config()
    cfg2 = C.apply_overrides(cfg, {"train.lr": "1e-4", "model.name": "ViT-L/14", "eval.ks": "1,5"})
    assert cfg2.train.lr == 1e-4
    assert cfg2.model.name == "ViT-L/14"
    assert cfg2.eval.ks == (1, 5)
    # original untouched (frozen dataclasses)
    assert cfg.train.lr == 5e-6


def test_overrides_unknown_key_raises():
    with pytest.raises(KeyError):
        C.apply_overrides(C.Config(), {"train.nope": 1})


def test_parse_cli_overrides():
    ov = C.parse_cli_overrides(["--train.lr=1e-5", "--model.name", "ViT-B/16", "--train.resume"])
    assert ov == {"train.lr": "1e-5", "model.name": "ViT-B/16", "train.resume": "true"}


def test_config_from_argv(tmp_path):
    base = C.Config(train=C.TrainConfig(lr=1e-3))
    p = os.path.join(tmp_path, "base.json")
    C.save_json(base, p)
    cfg = C.config_from_argv(["--config", p, "--train.epochs=3"])
    assert cfg.train.lr == 1e-3
    assert cfg.train.epochs == 3


def test_bool_and_optional_coercion():
    cfg = C.apply_overrides(C.Config(), {"model.checkpoint": "none", "train.resume": "true"})
    assert cfg.model.checkpoint is None
    assert cfg.train.resume is True


def test_endpoints_from_env():
    env = {"SPARQL_ENDPOINT": "http://kg", "MISTRAL_API_KEY": "k"}
    e = C.Endpoints.from_env(env)
    assert e.sparql_endpoint == "http://kg"
    assert e.mistral_api_key == "k"
    assert e.cir_endpoint is None
