"""L0: CLIP encoders, tokenizer, preprocessing, safety/aesthetic heads."""

from .configs import CLIPConfig, get_config, list_configs  # noqa: F401
from .clip import (  # noqa: F401
    init_clip,
    encode_image,
    encode_text,
    clip_forward,
    l2_normalize,
    normalize_images,
)
from .tokenizer import CLIPTokenizer  # noqa: F401
