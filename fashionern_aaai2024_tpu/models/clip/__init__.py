from fashionern_aaai2024_tpu.models.clip.config import (
    CLIPConfig,
    RN50X4,
    VIT_B_16,
    get_clip_config,
)
from fashionern_aaai2024_tpu.models.clip.model import CLIP
from fashionern_aaai2024_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize
