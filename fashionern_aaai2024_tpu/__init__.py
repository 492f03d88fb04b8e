"""FashionERN-TPU: a TPU-native composed-image-retrieval (CIR) stack.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of the
FashionERN reference (ChenAnno/FashionERN_AAAI2024, AAAI 2024):
composed fashion image retrieval — reference image + modifier text →
target image — on FashionIQ / Shoes / Fashion200k / CIRR.

Layering (bottom-up):
  parallel/   mesh & sharding helpers (DP mesh over ICI, gallery sharding)
  ops/        Pallas TPU kernels + pure-XLA fallbacks (attention, LN,
              combiner gate, batch-based classification loss)
  models/     CLIP towers (ViT-B-16, RN50x4) + ERN fusion stack
  data/       dataset families, transforms, patch-feature store
  train/      pjit train step, optimizer, checkpointing
  retrieval/  sharded gallery embedding + cosine top-k + recall metrics
  cli/        train/eval/tool entry points mirroring the reference CLIs
"""

__version__ = "0.1.0"
