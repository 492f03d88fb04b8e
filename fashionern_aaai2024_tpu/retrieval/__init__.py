from fashionern_aaai2024_tpu.retrieval.engine import (
    RetrievalIndex,
    embed_gallery,
    names_to_ids,
)
from fashionern_aaai2024_tpu.retrieval.metrics import (
    cirr_metrics,
    fashion200k_metrics,
    recall_at_k,
    subset_recall,
)
