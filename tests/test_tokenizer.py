import json
import os

import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import (
    CLIPTokenizer,
    EOT,
    SOT,
    bytes_to_unicode,
    truncate_words,
    whitespace_clean,
)

# A tiny merge table exercising multi-step merges on common words.
TINY_MERGES = [
    ("l", "o</w>"),
    ("h", "e"),
    ("he", "l"),
    ("hel", "lo</w>"),
    ("l", "d</w>"),
    ("w", "o"),
    ("r", "ld</w>"),
    ("wo", "rld</w>"),
    ("c", "a"),
    ("ca", "t</w>"),
]


@pytest.fixture(scope="module")
def tok():
    return CLIPTokenizer(TINY_MERGES)


def test_bytes_to_unicode_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_vocab_layout(tok):
    # 256 chars + 256 char</w> + merges + 2 specials
    assert tok.vocab_size == 512 + len(TINY_MERGES) + 2
    assert tok.encoder[SOT] == tok.vocab_size - 2
    assert tok.encoder[EOT] == tok.vocab_size - 1


def test_bpe_merging(tok):
    assert tok.bpe("hello") == "hello</w>"
    assert tok.bpe("world") == "world</w>"
    assert tok.bpe("cat") == "cat</w>"
    # un-merged word falls back to chars with trailing </w>
    assert tok.bpe("xyz") == "x y z</w>"


def test_encode_decode_roundtrip(tok):
    ids = tok.encode("Hello world!  A CAT.")
    assert tok.decode(ids) == "hello world ! a cat ."


def test_tokenize_shape_and_padding(tok):
    out = tok(["hello world", "cat"], context_length=16)
    assert out.shape == (2, 16)
    assert out.dtype == np.int32
    assert out[0, 0] == tok.sot_token
    # row 1: sot, cat, eot, then zero padding
    assert out[1, 0] == tok.sot_token
    assert out[1, 2] == tok.eot_token
    assert (out[1, 3:] == 0).all()


def test_tokenize_truncation(tok):
    long_text = "hello " * 50
    out = tok(long_text, context_length=8, truncate=True)
    assert out.shape == (1, 8)
    assert out[0, -1] == tok.eot_token
    with pytest.raises(RuntimeError):
        tok(long_text, context_length=8, truncate=False)


def test_lowercasing_and_whitespace(tok):
    assert (tok("HELLO   WORLD") == tok("hello world")).all()
    assert whitespace_clean("a \n\t b") == "a b"


def test_hf_parity_tiny_vocab(tok, tmp_path):
    """Golden parity vs transformers.CLIPTokenizer on the same tiny vocab."""
    transformers = pytest.importorskip("transformers")
    vocab_file = os.path.join(tmp_path, "vocab.json")
    merges_file = os.path.join(tmp_path, "merges.txt")
    with open(vocab_file, "w") as f:
        json.dump(tok.encoder, f)
    with open(merges_file, "w") as f:
        f.write("#version: 0.2\n")
        f.writelines(f"{a} {b}\n" for a, b in TINY_MERGES)
    hf = transformers.CLIPTokenizer(
        vocab_file, merges_file, bos_token=SOT, eos_token=EOT, pad_token=None
    )
    for text in ["hello world", "a cat!", "HELLO, world... cat", "don't worry", "42 cats"]:
        ours = tok.encode(text)
        theirs = hf(text, add_special_tokens=False)["input_ids"]
        assert ours == theirs, f"mismatch on {text!r}: {ours} vs {theirs}"


def test_hf_files_loader(tok, tmp_path):
    vocab_file = os.path.join(tmp_path, "vocab.json")
    merges_file = os.path.join(tmp_path, "merges.txt")
    with open(vocab_file, "w") as f:
        json.dump(tok.encoder, f)
    with open(merges_file, "w") as f:
        f.write("#version: 0.2\n")
        f.writelines(f"{a} {b}\n" for a, b in TINY_MERGES)
    tok2 = CLIPTokenizer.from_hf_files(vocab_file, merges_file)
    assert tok2.encode("hello world cat") == tok.encode("hello world cat")


def test_openai_vocab_loader(tmp_path):
    path = os.path.join(tmp_path, "bpe.txt")
    with open(path, "w") as f:
        f.write("bpe version header\n")
        f.writelines(f"{a} {b}\n" for a, b in TINY_MERGES)
    tok2 = CLIPTokenizer.from_openai_vocab(path)
    assert tok2.bpe("hello") == "hello</w>"


def test_truncate_words():
    text = " ".join(str(i) for i in range(200))
    out = truncate_words(text, 150)
    assert len(out.split()) == 150
    assert truncate_words("a b c", 150) == "a b c"


def test_unicode_bytes(tok):
    # non-ASCII text must round-trip through the byte encoder without KeyError
    ids = tok.encode("café ☕")
    assert tok.decode(ids) == "café ☕"


def test_trim_to_bucket(tok):
    import numpy as np

    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import trim_to_bucket

    ids = tok(["hello cat", "cat"], context_length=77)
    out = trim_to_bucket(ids, buckets=(32, 64, 77))
    assert out.shape == (2, 32)
    # content preserved
    np.testing.assert_array_equal(out, ids[:, :32])
    # 62 used tokens -> bucket 64; 77 used tokens -> full context
    long = tok("hello " * 60, context_length=77)
    assert trim_to_bucket(long, buckets=(32, 64, 77)).shape == (1, 64)
    longest = tok("hello " * 90, context_length=77)
    assert trim_to_bucket(longest, buckets=(32, 64, 77)).shape == (1, 77)
    # id 0 ('!') mid-sequence must not confuse the trim
    ids2 = ids.copy()
    ids2[0, 2] = 0
    assert trim_to_bucket(ids2, buckets=(32, 64, 77)).shape[1] == 32


def test_trimmed_encoding_is_exact(tok):
    """Encoding trimmed ids == encoding full-width ids (causal + EOT pooling)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import trim_to_bucket
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M

    arch = M.CLIPArch(16, 32, 1, 32, 16, 64, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    ids = tok(["hello cat", "cat hello world"], context_length=64)
    trimmed = trim_to_bucket(ids, buckets=(16, 32, 64))
    assert trimmed.shape[1] == 16
    full = model.apply({"params": params}, jnp.asarray(ids), method=M.CLIP.encode_text)
    short = model.apply({"params": params}, jnp.asarray(trimmed), method=M.CLIP.encode_text)
    np.testing.assert_allclose(np.asarray(full), np.asarray(short), atol=1e-5)


def test_default_buckets_include_16(tok):
    """Short queries (<= 14 tokens + specials) ride the 16 bucket at half
    the 32-bucket encode cost; exact math (causal mask + EOT pooling)."""
    import numpy as np

    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import (
        DEFAULT_BUCKETS,
        trim_to_bucket,
    )

    assert DEFAULT_BUCKETS[0] == 16 and DEFAULT_BUCKETS[0] % 16 == 0
    ids = np.zeros((3, 77), np.int64)
    ids[:, 0] = 5
    ids[:, 10] = 7  # last nonzero at col 10 -> used 11 -> bucket 16
    assert trim_to_bucket(ids).shape == (3, 16)
