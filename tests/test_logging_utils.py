import json
import os

import numpy as np

from knowledge_enhanced_multimodal_retrieval_tpu.utils import logging_utils as L


def test_setup_logger_console_and_file(tmp_path):
    path = os.path.join(tmp_path, "logs", "run.log")
    logger = L.setup_logger("t1", log_file=path)
    logger.info("hello")
    for h in logger.handlers:
        h.flush()
    assert "hello" in open(path).read()


def test_jsonl_append(tmp_path):
    p = os.path.join(tmp_path, "m.jsonl")
    L.log_metrics_to_jsonl({"epoch": 1, "loss": 0.5}, p)
    L.log_metrics_to_jsonl({"epoch": 2, "loss": np.float32(0.25)}, p)
    lines = [json.loads(x) for x in open(p)]
    assert lines == [{"epoch": 1, "loss": 0.5}, {"epoch": 2, "loss": 0.25}]


def test_save_metrics_json_with_arrays(tmp_path):
    import jax.numpy as jnp

    p = os.path.join(tmp_path, "final.json")
    L.save_metrics_to_json({"r_at_k": jnp.array([1.0, 2.0]), "mrr": jnp.float32(3.5)}, p)
    data = json.load(open(p))
    assert data == {"r_at_k": [1.0, 2.0], "mrr": 3.5}


def test_metrics_writer(tmp_path):
    w = L.MetricsWriter(str(tmp_path), "exp")
    w.log(0, {"loss": 1.0})
    w.log(1, {"loss": 0.5})
    w.finalize({"best": 0.5})
    lines = [json.loads(x) for x in open(w.jsonl_path)]
    assert [l["step"] for l in lines] == [0, 1]
    assert json.load(open(w.json_path)) == {"best": 0.5}


def test_timed():
    sink = {}
    with L.timed("block", sink):
        pass
    assert "block" in sink and sink["block"] >= 0
