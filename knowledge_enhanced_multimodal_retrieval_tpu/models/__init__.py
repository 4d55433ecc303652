from .clip import ARCHS, CLIP, CLIPArch, build_model, count_params, encode_image, encode_text, init_params, l2_normalize  # noqa: F401
from .convert import (  # noqa: F401
    export_hf_checkpoint,
    flax_to_hf,
    flax_to_openai,
    load_clip_params,
    load_params_npz,
    save_openai_pt,
    save_params_npz,
    torch_to_flax,
)
from .fusion_heads import FUSION_TYPES, FusionModel  # noqa: F401
