import random
import string

import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
from knowledge_enhanced_multimodal_retrieval_tpu.native.build import native_available

TINY_MERGES = [
    ("l", "o</w>"),
    ("h", "e"),
    ("he", "l"),
    ("hel", "lo</w>"),
    ("c", "a"),
    ("ca", "t</w>"),
]

needs_native = pytest.mark.skipif(not native_available("bpe"), reason="no g++ toolchain")


@needs_native
def test_native_matches_python_on_known_words():
    py = CLIPTokenizer(TINY_MERGES, use_native=False)
    nat = CLIPTokenizer(TINY_MERGES, use_native=True)
    for word in ["hello", "cat", "xyz", "h", "hellocat", "hhee"]:
        assert nat.bpe(word) == py.bpe(word), word


@needs_native
def test_native_matches_python_fuzz():
    rng = random.Random(0)
    alphabet = "helocat"
    merges = []
    seen = set()
    # random merge table over the small alphabet (dedup products to keep the
    # canonical vocab collision-free)
    products = set()
    for _ in range(60):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 2)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 2)))
        if rng.random() < 0.3:
            b += "</w>"
        if (a, b) in seen or a + b in products:
            continue
        seen.add((a, b))
        products.add(a + b)
        merges.append((a, b))
    py = CLIPTokenizer(merges, use_native=False)
    nat = CLIPTokenizer(merges, use_native=True)
    for _ in range(300):
        word = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        assert nat.bpe(word) == py.bpe(word), word


@needs_native
def test_native_full_encode_parity_unicode():
    py = CLIPTokenizer(TINY_MERGES, use_native=False)
    nat = CLIPTokenizer(TINY_MERGES, use_native=True)
    for text in ["Hello cat!", "café ☕ hello", "42 cats, obviously"]:
        assert nat.encode(text) == py.encode(text), text


@needs_native
def test_native_faster_than_python_on_cache_misses():
    """Throughput sanity: the C++ merge loop should beat Python on fresh words."""
    import time

    rng = random.Random(1)
    words = ["".join(rng.choice(string.ascii_lowercase) for _ in range(12)) for _ in range(3000)]
    merges = [(a, b) for a in string.ascii_lowercase[:10] for b in string.ascii_lowercase[:10]]

    def run(tok):
        t0 = time.perf_counter()
        for w in words:
            tok.bpe(w)
        return time.perf_counter() - t0

    t_py = run(CLIPTokenizer(merges, use_native=False))
    t_nat = run(CLIPTokenizer(merges, use_native=True))
    assert t_nat < t_py, f"native {t_nat:.4f}s vs python {t_py:.4f}s"


def test_use_native_false_always_works():
    tok = CLIPTokenizer(TINY_MERGES, use_native=False)
    assert tok.bpe("hello") == "hello</w>"
