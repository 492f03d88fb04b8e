"""Int8 gallery quantization for large-scale retrieval serving.

Beyond-reference, TPU-native serving feature (opt-in): gallery
embeddings are stored as int8 with one fp scale per row — 4× less HBM
than fp32 (a 1M × 640 gallery drops 2.4 GB → 0.6 GB) — and the
similarity matmul runs int8×int8 on the MXU with int32 accumulation,
rescaled to fp32 before the running top-k.

Ranking fidelity: embeddings are L2-normalized, so per-row symmetric
quantization to [-127, 127] bounds the elementwise error at ~0.4% of
the max coordinate; rank agreement on random unit vectors is ≥99% at
k=50 (tested). The exact fp32 path stays the default; quantization is
`RetrievalIndex(..., quantize=True)` / `--quantize-gallery`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8 quantization.

    x: [N, d] float → (values int8 [N, d], scales fp32 [N]) with
    x ≈ values * scales[:, None]."""
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(x / scales[:, None]), -127, 127).astype(jnp.int8)
    return q, scales


def dequantize_rows(q: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    return q.astype(jnp.float32) * scales[:, None]


def quantize_rows_np(x) -> tuple:
    """Host (numpy) twin of `quantize_rows` — same absmax/127 recipe on
    the last axis, for code paths that quantize before device_put
    (sharded serving pads + shards on host). Keep the two numerically
    identical: sharded↔single-device exactness tests depend on it."""
    import numpy as np

    x = np.asarray(x, np.float32)
    absmax = np.abs(x).max(axis=-1)
    scales = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(x / scales[..., None]), -127, 127).astype(np.int8)
    return q, scales


@functools.partial(jax.jit, static_argnames=("k", "chunk", "approx_recall"))
def blocked_top_k_similarity_int8(
    queries: jnp.ndarray,
    gallery_q: jnp.ndarray,
    gallery_scales: jnp.ndarray,
    k: int = 51,
    chunk: int | None = None,
    approx_recall: float | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k cosine similarity against an int8-quantized gallery.

    Queries are quantized per-row on the fly; the chunk matmul is
    int8×int8 → int32 on the MXU, rescaled by (q_scale · g_scale).
    `approx_recall`: same selector knob as the fp32 path
    (ops/similarity.py) — None = exact `lax.top_k`, a float switches to
    `lax.approx_max_k` at that recall target."""
    from fashionern_aaai2024_tpu.ops.similarity import (
        _auto_chunk, _select_top_k, merge_top_k,
    )

    q_vals, q_scales = quantize_rows(queries.astype(jnp.float32))
    qn, d = q_vals.shape
    n = gallery_q.shape[0]
    k = min(k, n)
    chunk = _auto_chunk(qn, n) if chunk is None else min(chunk, n)
    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)

    if n_chunks == 1:
        # single-chunk fast path (same rationale as the fp32 twin in
        # ops/similarity.py: skips the pad/reshape copy + final merge)
        acc = jax.lax.dot_general(
            q_vals, gallery_q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s = acc.astype(jnp.float32) * q_scales[:, None] * gallery_scales[None, :]
        return _select_top_k(s, k, approx_recall)

    n_pad = n_chunks * chunk
    gal = jnp.pad(gallery_q, ((0, n_pad - n), (0, 0))).reshape(n_chunks, chunk, d)
    gsc = jnp.pad(gallery_scales, ((0, n_pad - n),)).reshape(n_chunks, chunk)

    def scan_body(carry, inputs):
        best_s, best_i = carry
        gal_chunk, sc_chunk, chunk_idx = inputs
        acc = jax.lax.dot_general(
            q_vals, gal_chunk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                                   # [Q, chunk] int32
        s = acc.astype(jnp.float32) * q_scales[:, None] * sc_chunk[None, :]
        col = chunk_idx * chunk + jnp.arange(chunk, dtype=jnp.int32)
        s = jnp.where(col[None, :] < n, s, -jnp.inf)
        cs, ci = _select_top_k(s, min(k, chunk), approx_recall)
        cand_s = jnp.concatenate([best_s, cs], axis=1)
        cand_i = jnp.concatenate([best_i, col[ci]], axis=1)
        return merge_top_k(cand_s, cand_i, k), None

    init = (
        jnp.full((qn, k), -jnp.inf, jnp.float32),
        jnp.full((qn, k), jnp.iinfo(jnp.int32).max, jnp.int32),
    )
    (scores, idx), _ = jax.lax.scan(
        scan_body, init, (gal, gsc, jnp.arange(n_chunks, dtype=jnp.int32))
    )
    return scores, idx
