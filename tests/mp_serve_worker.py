"""Worker process for the true multi-host sharded-serving test.

Launched by ``tests/test_multiprocess.py`` (NOT collected by pytest): two
processes form one 8-device global mesh (4 virtual CPU devices each, Gloo
collectives); the corpus stages int8-packed and CLUSTER-SHARDED ACROSS THE
PROCESS BOUNDARY (``jax.device_put`` with a cross-process NamedSharding),
and searches run through ``retrieval.multihost.MultiHostSearch`` — the
coordinator broadcasts fixed-shape work items, every process executes the
sharded scan + winner merge in lockstep, results replicate back.

The coordinator also builds a plain UNSHARDED retriever over the same
store and asserts the multi-host rankings match it — the end-to-end
correctness contract for serving a corpus no single host could hold.

Usage: ``python mp_serve_worker.py <pid> <nproc> <port> <outdir>``.
"""

import json
import os
import sys


def main() -> None:
    pid, nproc, port, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc and jax.device_count() == 4 * nproc

    import jax.numpy as jnp
    import numpy as np

    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import (
        CLIPRetrieval,
        EmbeddingStore,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.multihost import (
        MultiHostSearch,
    )

    # deterministic tiny world — IDENTICAL on every process (seeded)
    tok = CLIPTokenizer([("c", "a"), ("ca", "t</w>"), ("h", "e"), ("he", "l")])
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)

    def normed(n, d):
        x = rng.standard_normal((n, d)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    store = EmbeddingStore(normed(48, 16), normed(48, 16), [f"u{i}" for i in range(48)])
    q = normed(5, 16)

    rt = MeshRuntime.create()  # 8-device GLOBAL mesh spanning both processes
    sharded = CLIPRetrieval(
        model, params, tok, store, top_k=8,
        rt=rt, shard_corpus=True, quantize_corpus=True,
    )
    # the packed corpus genuinely crosses the process boundary
    assert not sharded._corpus.corpus_img.sharding.is_fully_replicated
    addressable = sharded._corpus.corpus_img.addressable_shards
    assert len(addressable) == 4, len(addressable)  # 4 of 8 shards live here

    mh = MultiHostSearch(sharded, batch=4)
    report = {"process_count": jax.process_count(), "pid": pid}

    if mh.is_coordinator:
        # unsharded single-host reference over the SAME store (identical
        # int8 packing — the host quantizer is shared)
        ref = CLIPRetrieval(model, params, tok, store, top_k=8, quantize_corpus=True)
        want = ref.retrieval_embeddings_batch(q, alpha=0.6)
        got = mh.search_embeddings(q, alpha=0.6)  # 5 queries -> 2 lockstep blocks
        mh.stop()
        mh.stop()  # idempotent
        report["want"] = [[r["uuid"] for r in row] for row in want]
        report["got"] = [[r["uuid"] for r in row] for row in got]
        report["want_scores"] = [[r["score"] for r in row] for row in want]
        report["got_scores"] = [[r["score"] for r in row] for row in got]
    else:
        report["served"] = mh.serve()

    # --- phase 2: the serve CLI end-to-end under --multihost -----------------
    import contextlib
    import io

    from jax.experimental import multihost_utils

    store_path = os.path.join(out, "mh_store.npz")
    if pid == 0:
        store.save(store_path)
    multihost_utils.sync_global_devices("mh_store_saved")

    import knowledge_enhanced_multimodal_retrieval_tpu.cli.serve as serve_mod

    M.ARCHS["tiny"] = arch
    serve_mod.build_tokenizer = lambda cfg: tok  # synthetic vocab

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        serve_mod.main([
            "--store", store_path,
            "--model.name=tiny", "--model.dtype=float32",
            "--eval.shard_corpus=true", "--eval.quantize_corpus=int8",
            "--multihost", "--multihost-batch=4",
            "--query", "hello cat",
        ])
    if pid == 0:
        out_text = buf.getvalue()
        payload = json.loads(out_text[out_text.index("{"):])
        cli_uuids = [r["uuid"] for r in payload["results"]]
        ref2 = CLIPRetrieval(model, params, tok, store, quantize_corpus=True)
        want2 = [r["uuid"] for r in ref2.retrieval("hello cat", alpha=0.5)]
        report["cli_got"] = cli_uuids
        report["cli_want"] = want2[: len(cli_uuids)]

    with open(os.path.join(out, f"serve_p{pid}.json"), "w") as f:
        json.dump(report, f)


if __name__ == "__main__":
    main()
