from .clip import ARCHS, CLIP, CLIPArch, build_model, count_params, encode_image, encode_text, init_params, l2_normalize  # noqa: F401
from .convert import load_clip_params, load_params_npz, save_params_npz, torch_to_flax  # noqa: F401
from .fusion_heads import FUSION_TYPES, FusionModel  # noqa: F401
