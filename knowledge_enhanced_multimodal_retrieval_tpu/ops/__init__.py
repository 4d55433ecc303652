from .attention import mha, mha_xla  # noqa: F401
from .flash_attention import flash_attention  # noqa: F401
from .fused_block import (  # noqa: F401
    attention_block_q8_reference,
    attention_block_reference,
    fused_attention_block,
    fused_attention_block_q8,
    fused_layer_q8,
    fused_mlp_block,
    fused_mlp_block_q8,
    mlp_block_q8_reference,
    mlp_block_reference,
    quantize_weight,
)
from .image_ops import CLIP_MEAN, CLIP_STD, preprocess_batch, preprocess_image  # noqa: F401
from .short_attention import short_attention  # noqa: F401
from .similarity import (  # noqa: F401
    dequantize_corpus,
    dequantize_corpus_q4,
    fused_similarity_topk,
    fused_similarity_topk_q4,
    fused_similarity_topk_q8,
    masked_similarity_topk,
    masked_similarity_topk_q4,
    masked_similarity_topk_q8,
    normalize_mask,
    quantize_corpus,
    quantize_corpus_host_q4,
    sharded_masked_similarity_topk,
    sharded_similarity_topk,
    sharded_similarity_topk_q4,
    sharded_similarity_topk_q8,
    similarity_topk_segmented,
    similarity_topk_xla,
    similarity_topk_xla_q4,
)
