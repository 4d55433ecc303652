from .ann import IVFIndex, build_ivf_index, ivf_search  # noqa: F401
from .clip_retrieval import CLIPRetrieval  # noqa: F401
from .embedding_store import EmbeddingStore, build_embedding_store  # noqa: F401
from .engine import RetrievalEngine  # noqa: F401
from .http_server import RetrievalHTTPServer  # noqa: F401
from .multihost import MultiHostRetrieval, MultiHostSearch  # noqa: F401
from .server import MicroBatcher, Overloaded  # noqa: F401
