from fashionern_aaai2024_tpu.data.transforms import (
    CLIP_MEAN,
    CLIP_STD,
    preprocess_image,
    squarepad_transform,
    targetpad_transform,
)
from fashionern_aaai2024_tpu.data.captions import (
    caption_post_process,
    generate_randomized_fiq_caption,
    generate_shoes_caption,
    get_different_word,
    join_fiq_captions,
)
from fashionern_aaai2024_tpu.data.patch_store import PatchFeatureStore
from fashionern_aaai2024_tpu.data.loader import Loader
from fashionern_aaai2024_tpu.data.fashioniq import FashionIQDataset
from fashionern_aaai2024_tpu.data.cirr import CIRRDataset
from fashionern_aaai2024_tpu.data.shoes import ShoesDataset
from fashionern_aaai2024_tpu.data.fashion200k import (
    Fashion200kDataset,
    Fashion200kTestDataset,
    Fashion200kTestQueryDataset,
)
