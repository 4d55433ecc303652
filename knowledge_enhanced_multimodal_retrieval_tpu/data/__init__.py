from .datasets import Batch, DataPipeline, HFDatasetAdapter, InMemoryDataset, load_hf_source, make_synthetic_source  # noqa: F401
from .preprocess import preprocess_pil, safe_preprocess  # noqa: F401
from .tokenizer import CLIPTokenizer, trim_to_bucket, truncate_words  # noqa: F401
