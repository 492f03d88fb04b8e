"""Gallery embedding + retrieval index.

Replaces the reference's `extract_index_features`
(`utils/utils.py:44-99`): instead of per-batch `torch.vstack` quadratic
copies and a python dict of name→tensor (`validate_fiq.py:69,91-93`),
batches are jit-compiled at a fixed padded size (one XLA program, no
recompiles), accumulated into preallocated numpy, and name lookup is an
int-id array.

The similarity search is the blocked MXU matmul + running top-k of
`ops.similarity`; `shard_gallery` places gallery rows across the mesh
`data` axis so the matmul and per-shard top-k ride ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fashionern_aaai2024_tpu.ops.similarity import blocked_top_k_similarity, merge_top_k


def names_to_ids(names: Sequence[str]) -> tuple[np.ndarray, dict[str, int]]:
    """Dense int ids for gallery names. Duplicate names (Fashion200k
    caption-id galleries) share an id — which is exactly the
    multi-positive semantics."""
    vocab: dict[str, int] = {}
    ids = np.empty(len(names), np.int32)
    for i, n in enumerate(names):
        ids[i] = vocab.setdefault(n, len(vocab))
    return ids, vocab


def _pad_rows(arr: np.ndarray, size: int) -> np.ndarray:
    if arr.shape[0] == size:
        return arr
    pad = np.zeros((size - arr.shape[0],) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad])


def run_padded_batches(
    fn: Callable,
    loader,
    array_key: str,
    batch_size: int,
) -> tuple[list[str], list[np.ndarray]]:
    """Apply a jitted `fn` over loader batches, padding the final batch
    to keep one compiled program. Returns (names, per-batch outputs with
    padding stripped)."""
    names: list[str] = []
    outputs: list = []
    for batch in loader:
        arr = batch[array_key]
        n = arr.shape[0]
        out = fn(_pad_rows(arr, batch_size))
        out = jax.tree_util.tree_map(lambda x: np.asarray(x[:n]), out)
        outputs.append(out)
        names.extend(batch.get("name", batch.get("ref_name", [])))
    return names, outputs


@dataclasses.dataclass
class GalleryFeatures:
    names: list[str]
    features: np.ndarray          # [N, d] global
    local_features: np.ndarray | None = None  # [N, 13, d] patch feats
    token_features: np.ndarray | None = None  # [N, S, d] ViT tokens


def embed_gallery(
    encode_image_fn: Callable,
    loader,
    batch_size: int,
    keep_tokens: bool = False,
    prefetch: int = 2,
) -> GalleryFeatures:
    """Gallery pass (reference `extract_index_features`). `loader` yields
    classic-mode batches with "name", "image" and optionally "patch".

    Three-deep pipeline (BASELINE.md r4 overlap ledger):
      1. a background thread decodes the NEXT batches and `device_put`s
         them `prefetch` ahead (`data.prefetch.prefetch_iter`) — host
         decode and H2D transfer overlap device compute;
      2. the main thread dispatches the jitted encode on the committed
         device array (dispatch carries no transfer);
      3. readback runs one batch behind dispatch (JAX dispatch is
         async; `np.asarray` is the sync point).
    Throughput ceiling becomes min(decode, H2D, compute) instead of
    their sum. `encode_image_fn` may expose a `.place` attribute
    (pad + mesh-sharded `device_put`, see `InferenceAPI._place`) used
    by the prefetch stage; otherwise the default places on the jit
    default device. `prefetch=0` restores the serial feed."""
    from fashionern_aaai2024_tpu.data.prefetch import prefetch_iter

    names: list[str] = []
    feats: list[np.ndarray] = []
    tokens: list[np.ndarray] = []
    locals_: list[np.ndarray] = []
    pending: tuple | None = None  # (g_dev, tok_dev, n)

    place = getattr(encode_image_fn, "place", None) or (
        lambda a: jax.device_put(_pad_rows(a, batch_size)))

    def drain(entry):
        g, tok, n = entry
        feats.append(np.asarray(g[:n]))
        if keep_tokens:
            tokens.append(np.asarray(tok[:n]))

    def stage(_, batch):
        img = batch["image"]
        return batch, place(img), img.shape[0]

    for batch, img_dev, n in prefetch_iter(loader, stage, depth=prefetch):
        g, tok = encode_image_fn(img_dev)
        names.extend(batch["name"])
        if "patch" in batch:
            locals_.append(np.asarray(batch["patch"]))
        if pending is not None:
            drain(pending)
        pending = (g, tok, n)
    if pending is not None:
        drain(pending)
    return GalleryFeatures(
        names=names,
        features=np.concatenate(feats) if feats else np.zeros((0, 0), np.float32),
        local_features=np.concatenate(locals_) if locals_ else None,
        token_features=np.concatenate(tokens) if tokens else None,
    )


class RetrievalIndex:
    """Refined gallery embeddings + top-k search + member-score gather.

    `quantize=True` stores the gallery int8 with per-row scales (4× less
    HBM; serving option, `ops.quant`) — search rescales to fp32 before
    the running top-k. The fp32 features are kept on host for
    `scores_for` (CIRR subset recall needs exact per-member scores)."""

    def __init__(self, names: Sequence[str], features: np.ndarray,
                 quantize: bool = False,
                 approx_recall: float | None = None):
        self.names = list(names)
        self.ids, self.vocab = names_to_ids(self.names)
        self.quantized = quantize
        # None = exact top-k (default, parity tier); a float switches
        # search() to the TPU approx_max_k selector at that recall
        # target (serving/scale tier — ops/similarity.py ladder)
        self.approx_recall = approx_recall
        if quantize:
            from fashionern_aaai2024_tpu.ops.quant import quantize_rows

            self._host_features = np.asarray(features, np.float32)
            self.features_q, self.scales = quantize_rows(jnp.asarray(features))
            self.features = None
        else:
            self.features = jnp.asarray(features)

    def calibrate_approx(self, k: int = 51, n_queries: int = 256,
                         min_margin: float = 0.05,
                         strict: bool = False) -> float | None:
        """Measure approx-top-k recall ON THIS GALLERY and fail-safe.

        `approx_max_k`'s recall_target is calibrated for uniform score
        distributions; clustered/anisotropic embeddings (real CLIP
        features) can undershoot it. Returns the measured recall (None
        when the index is exact). Warns when measured < requested;
        raises when it undershoots by more than `min_margin` and
        `strict`, so a serving deployment cannot silently ship a recall
        contract the gallery does not honor. (VERDICT r3 item 4.)"""
        if self.approx_recall is None:
            return None
        import sys

        from fashionern_aaai2024_tpu.ops.similarity import (
            measured_approx_recall,
        )

        feats = (self._host_features if self.quantized
                 else np.asarray(self.features))
        measured = measured_approx_recall(
            feats, k=k, recall_target=self.approx_recall,
            n_queries=n_queries)
        if measured < self.approx_recall:
            msg = (f"--topk-recall {self.approx_recall}: measured recall "
                   f"on this gallery is {measured:.4f} "
                   f"({len(self.names)} rows, k={k})")
            if strict and measured < self.approx_recall - min_margin:
                raise RuntimeError(
                    msg + " — below the requested target by more than "
                    f"{min_margin}; use a higher --topk-recall or the "
                    "exact tier")
            print(f"WARNING: {msg}", file=sys.stderr)
        return measured

    def search(self, query_features: np.ndarray, k: int = 51, chunk: int | None = None):
        """→ (scores [Q,k], gallery row indices [Q,k])."""
        if self.quantized:
            from fashionern_aaai2024_tpu.ops.quant import blocked_top_k_similarity_int8

            scores, idx = blocked_top_k_similarity_int8(
                jnp.asarray(query_features), self.features_q, self.scales,
                k=k, chunk=chunk, approx_recall=self.approx_recall,
            )
            return np.asarray(scores), np.asarray(idx)
        scores, idx = blocked_top_k_similarity(
            jnp.asarray(query_features), self.features, k=k, chunk=chunk,
            approx_recall=self.approx_recall,
        )
        return np.asarray(scores), np.asarray(idx)

    def topk_ids(self, indices: np.ndarray) -> np.ndarray:
        """Gallery row indices → name ids (for recall metrics)."""
        return self.ids[indices]

    def scores_for(self, query_features: np.ndarray, member_rows: np.ndarray):
        """Similarity of each query to a small per-query member set
        (CIRR subset recall). member_rows: [Q, G] row indices."""
        gal = self._host_features if self.quantized else np.asarray(self.features)
        members = gal[member_rows]                      # [Q, G, d]
        return np.einsum("qd,qgd->qg", np.asarray(query_features), members)

    def row_of(self, name: str) -> int:
        if not hasattr(self, "_name_to_row"):
            # first occurrence wins (list.index semantics) for the
            # Fashion200k duplicate-name case
            m: dict[str, int] = {}
            for i, n in enumerate(self.names):
                m.setdefault(n, i)
            self._name_to_row = m
        return self._name_to_row[name]


def sharded_search(
    mesh,
    query_features: jnp.ndarray,
    gallery_features: jnp.ndarray,
    k: int = 51,
    chunk: int | None = None,
    approx_recall: float | None = None,
):
    """Top-k over a mesh-sharded gallery: each shard computes a local
    top-k via the blocked scan, then shard results are merged. Queries
    are replicated; gallery rows live on the `data` axis, so the only
    cross-chip traffic is the [Q, k] candidate sets (all-gather over ICI),
    never the full similarity matrix. `approx_recall` switches the
    per-shard selector to the TPU approx tier (ops/similarity.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = gallery_features.shape[0]
    n_dev = mesh.shape["data"]
    per = -(-n // n_dev)
    gal = jnp.pad(gallery_features, ((0, per * n_dev - n), (0, 0)))
    gal = jax.device_put(gal, NamedSharding(mesh, P("data", None)))
    q = jax.device_put(query_features, NamedSharding(mesh, P()))

    def local_topk(q_rep, gal_shard):
        shard_id = jax.lax.axis_index("data")
        # n_valid masks the global pad tail BEFORE the local top-k:
        # zero pad rows score 0 and would otherwise evict real
        # negative-scoring rows from the last shard's candidate set
        n_valid = jnp.clip(n - shard_id * per, 0, per)
        s, i = blocked_top_k_similarity(q_rep, gal_shard, k=min(k, per),
                                        chunk=chunk, n_valid=n_valid,
                                        approx_recall=approx_recall)
        gi = i + shard_id * per
        valid = s > -jnp.inf
        gi = jnp.where(valid, gi, jnp.iinfo(jnp.int32).max)
        s_all = jax.lax.all_gather(s, "data", axis=1, tiled=True)
        i_all = jax.lax.all_gather(gi, "data", axis=1, tiled=True)
        return merge_top_k(s_all, i_all, k)

    fn = jax.jit(
        jax.shard_map(
            local_topk,
            mesh=mesh,
            in_specs=(P(), P("data", None)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    scores, idx = fn(q, gal)
    return np.asarray(scores), np.asarray(idx)
