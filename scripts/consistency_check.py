"""CPU/TPU evaluation-consistency check.

The reference enforced CPU/GPU numerical consistency by disabling mixed
precision in eval (``evaluator.py:91``, SURVEY §7 hard part f). This script
verifies the equivalent property here: the float32 evaluation path produces
the same embeddings (cosine > 0.9999) and identical retrieval metrics
whether it runs on the TPU chip or on the host CPU backend.

Run on a machine with both backends:  python scripts/consistency_check.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import DataPipeline, make_synthetic_source
from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
from knowledge_enhanced_multimodal_retrieval_tpu.eval.evaluator import encode_dataset, evaluate_clip_model
from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.parallel.mesh import MeshRuntime
from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import MeshConfig


def run_eval(device):
    tok = CLIPTokenizer([("c", "a"), ("ca", "t</w>"), ("h", "e"), ("he", "l")])
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)  # eval runs f32 (reference discipline)
    with jax.default_device(device):
        params = M.init_params(model, jax.random.PRNGKey(0))
        pipe = DataPipeline(make_synthetic_source(32, image_size=32), tok, image_size=32, context_length=16)
        rt = MeshRuntime.create(MeshConfig(data_parallel=1), [device])
        enc = encode_dataset(model, params, pipe, rt, batch_size=16)
        return enc, evaluate_clip_model(enc)


def main() -> int:
    backends = {}
    for name in ("tpu", "cpu"):
        try:
            backends[name] = jax.devices(name)[0]
        except RuntimeError:
            pass
    if len(backends) < 2:
        print(f"only one backend available ({list(backends)}); nothing to compare")
        return 0

    results = {name: run_eval(dev) for name, dev in backends.items()}
    (enc_a, m_a), (enc_b, m_b) = results.values()
    names = list(results)

    cos = np.sum(enc_a.image * enc_b.image, axis=1)
    print(f"image-embedding cosine {names[0]} vs {names[1]}: min={cos.min():.6f}")
    ok = cos.min() > 0.9999
    # recall metrics are quantized to 100/N per sample; allow one boundary
    # rank flip from cross-backend float differences
    n = enc_a.image.shape[0]
    tol = 110.0 / n
    for key in m_a:
        diff = abs(m_a[key] - m_b[key])
        limit = tol * (10 if "Mean_Rank" in key else 1) if "R@" in key or "Rank" in key else tol
        status = "OK" if diff <= limit else "MISMATCH"
        if diff > limit:
            ok = False
        print(f"  {key}: {m_a[key]:.4f} vs {m_b[key]:.4f} [{status}]")
    print("CONSISTENT" if ok else "INCONSISTENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
