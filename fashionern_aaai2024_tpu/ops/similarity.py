"""Retrieval similarity + top-k.

The reference materializes the full Q×N distance matrix and argsorts it
(`run/valid/validate_fiq.py:34-35`) — O(Q·N) HBM and an O(N log N) sort
per query. All its metrics need at most the top 51 rows (R@50 plus
CIRR's drop-the-reference trick, `validate_cirr.py:41-50`).

Here: gallery is scanned in fixed-size chunks; each chunk contributes a
[Q, k] candidate set via `lax.top_k` that is merged with the running
top-k. Peak memory is O(Q·chunk), the matmul stays on the MXU, and the
result is bit-identical to a full sort for distinct scores. For a
mesh-sharded gallery, each shard computes its local top-k and the
shards' candidates are merged the same way (see retrieval.engine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


_CHUNK_BUDGET_BYTES = 1 << 30  # ~1 GB of fp32 score matrix per scan step


def _auto_chunk(q: int, n: int) -> int:
    """Largest chunk whose [Q, chunk] fp32 score tile fits the budget —
    measured on v5e: fewer, larger `lax.top_k` calls dominate search
    throughput (chunk 8192 → full-row was 6.2k → 23.6k q/s at
    N=200k, Q=1024); chunking only exists to bound peak HBM."""
    return max(8192, min(n, _CHUNK_BUDGET_BYTES // (4 * max(q, 1))))


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def blocked_top_k_similarity(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    k: int = 51,
    chunk: int | None = None,
    n_valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k cosine similarity of `queries` [Q,d] against `gallery` [N,d].

    Inputs are assumed L2-normalized (the callers normalize — the
    reference computes `1 - pred @ indexᵀ` on normalized features,
    `validate_fiq.py:30-34`; top-k on similarity == bottom-k on that
    distance). Returns (scores [Q,k] desc, indices [Q,k] int32).
    Ties broken by lower index first (matches stable argsort).
    `chunk=None` picks the largest memory-safe chunk (see _auto_chunk).

    `n_valid` (traced scalar): rows >= n_valid are EXTERNAL padding —
    masked to -inf before any top-k so a zero pad row (which scores 0,
    above real negative-scoring rows) can never evict a real candidate.
    Used by the mesh-sharded callers whose per-shard galleries carry the
    global pad tail; invalid output slots have score -inf / index
    int32-max.
    """
    q, d = queries.shape
    n = gallery.shape[0]
    k = min(k, n)
    nv = n if n_valid is None else n_valid
    chunk = _auto_chunk(q, n) if chunk is None else min(chunk, n)
    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk
    gal = jnp.pad(gallery, ((0, n_pad - n), (0, 0))).reshape(n_chunks, chunk, d)
    qf = queries.astype(jnp.float32)

    def scan_body(carry, gal_chunk_with_idx):
        best_s, best_i = carry
        gal_chunk, chunk_idx = gal_chunk_with_idx
        s = jnp.dot(qf, gal_chunk.astype(jnp.float32).T)  # [Q, chunk]
        col = chunk_idx * chunk + jnp.arange(chunk, dtype=jnp.int32)
        s = jnp.where(col[None, :] < nv, s, -jnp.inf)
        cs, ci = jax.lax.top_k(s, min(k, chunk))
        cand_s = jnp.concatenate([best_s, cs], axis=1)
        cand_i = jnp.concatenate([best_i, col[ci]], axis=1)
        best_s, best_i = merge_top_k(cand_s, cand_i, k)
        return (best_s, best_i), None

    init = (
        jnp.full((q, k), -jnp.inf, jnp.float32),
        jnp.full((q, k), jnp.iinfo(jnp.int32).max, jnp.int32),
    )
    (scores, idx), _ = jax.lax.scan(
        scan_body, init, (gal, jnp.arange(n_chunks, dtype=jnp.int32))
    )
    return scores, idx


def merge_top_k(
    scores: jnp.ndarray, indices: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Select top-k from candidate (scores, indices) along axis 1.

    Deterministic tie-break: higher score first, then smaller gallery
    index (encoded by keying on (score, -index) lexicographically via a
    stable sort over indices first).
    """
    order = jnp.argsort(indices, axis=1)  # stable pre-sort by index
    s = jnp.take_along_axis(scores, order, axis=1)
    i = jnp.take_along_axis(indices, order, axis=1)
    top_s, pos = jax.lax.top_k(s, k)  # top_k is stable w.r.t. position
    top_i = jnp.take_along_axis(i, pos, axis=1)
    return top_s, top_i
