"""End-to-end learning demo: the composed model must align its query
tower (DVR fusion) with its index tower (SR+Combiner) over a 64-item
universe (target == reference image, fixed captions) — in-batch
contrastive training with per-shard negatives on an 8-device mesh.

Recorded result (single-core CPU host, 40 epochs, ~2 min train):
    recall@1 before training: 1.6%  (chance = 1.6%)
    recall@1 after  40 epochs: 100.0%

Run: PYTHONPATH=. python benchmarks/learning_demo.py"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8 --xla_backend_optimization_level=0"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from fashionern_aaai2024_tpu.models.composed import ComposedCIRModel
from fashionern_aaai2024_tpu.models.clip.config import CLIPConfig, VisionConfig, TextConfig
from fashionern_aaai2024_tpu.parallel.mesh import create_mesh
from fashionern_aaai2024_tpu.train.trainer import DatasetPlugin, TrainConfig, Trainer, _fiq_captions
from fashionern_aaai2024_tpu.retrieval import evaluate as E
from fashionern_aaai2024_tpu.data.loader import Loader

cfg_clip = CLIPConfig(
    name="vit-demo",
    vision=VisionConfig(kind="vit", image_size=32, embed_dim=24, width=64, layers=2, heads=4, patch_size=16),
    text=TextConfig(vocab_size=100, context_length=16, width=32, heads=4, layers=2, embed_dim=24),
)
N = 64
g = np.random.default_rng(0)
IMAGES = g.random((N, 32, 32, 3), dtype=np.float32)
PATCHES = g.standard_normal((N, 13, 24)).astype(np.float32)
NAMES = [f"img{i}" for i in range(N)]

class AlignDataset:
    def __len__(self): return N
    def __getitem__(self, i):
        return {
            "ref_name": NAMES[i], "tar_name": NAMES[i],
            "captions": ["same item", "keep it"],
            "ref_image": IMAGES[i], "tar_image": IMAGES[i],
            "ref_patch": PATCHES[i], "tar_patch": PATCHES[i],
        }

def tok(texts, L=16):
    out = np.zeros((len(texts), L), np.int32)
    for i, t in enumerate(texts):
        h = [hash(w) % 97 + 1 for w in t.split()][:L]
        out[i, :len(h)] = h
    return out

gallery_items = [{"name": NAMES[i], "image": IMAGES[i], "patch": PATCHES[i]} for i in range(N)]
rel_items = [{"ref_name": NAMES[i], "tar_name": NAMES[i],
              "captions": ["same item", "keep it"], "ref_patch": PATCHES[i]} for i in range(N)]

def recall_at1(api):
    from fashionern_aaai2024_tpu.retrieval import metrics as M
    gal = E.embed_gallery(api.gallery_encode_fn(), Loader(gallery_items, 16, num_workers=0), api.batch_size)
    preds, meta = E.generate_predictions(api, Loader(rel_items, 16, num_workers=0),
                                         E.fiq_caption_fn, gal, collect=("tar_name",))
    refined = api.refine_gallery(gal.features, gal.local_features)
    from fashionern_aaai2024_tpu.retrieval.engine import RetrievalIndex
    idx = RetrievalIndex(gal.names, refined)
    _, top = idx.search(preds, k=5)
    tgt = M.names_to_id_array(meta["tar_name"], idx.vocab)
    return M.recall_at_k(idx.topk_ids(top), tgt, (1,))[1]

cfg = TrainConfig(dataset="fashioniq", batch_size=8, num_epochs=40, lr=2e-3,
                  num_workers=0, ckpt_dir="/tmp/align_ckpt", eval_batch_size=16,
                  print_frequency=10_000, validation_frequency=10_000)
plugin = DatasetPlugin("align", lambda c: AlignDataset(), _fiq_captions)
tr = Trainer(cfg, mesh=create_mesh(8), model=ComposedCIRModel(cfg_clip, patch_num=13),
             train_dataset=AlignDataset(), validator=None, plugin=plugin, tokenizer=tok)

api0 = E.InferenceAPI(tr.model, tr.state.variables(), batch_size=16, context_length=16, tokenizer=tok)
r0 = recall_at1(api0)
tr.train()
api1 = E.InferenceAPI(tr.model, tr.state.variables(), batch_size=16, context_length=16, tokenizer=tok)
r1 = recall_at1(api1)
print(f"recall@1 before training: {r0:.1f}%  (chance = {100/N:.1f}%)")
print(f"recall@1 after  40 epochs: {r1:.1f}%")
