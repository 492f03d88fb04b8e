"""Retrieval similarity + top-k.

The reference materializes the full Q×N distance matrix and argsorts it
(`run/valid/validate_fiq.py:34-35`) — O(Q·N) HBM and an O(N log N) sort
per query. All its metrics need at most the top 51 rows (R@50 plus
CIRR's drop-the-reference trick, `validate_cirr.py:41-50`).

Here: gallery is scanned in fixed-size chunks; each chunk contributes a
[Q, k] candidate set that is merged with the running top-k. Peak memory
is O(Q·chunk), the matmul stays on the MXU. Two selection tiers:

* exact (`lax.top_k`, the default): bit-identical to a full sort for
  distinct scores; the eval/parity tier.
* approx (`lax.approx_max_k`, the TPU PartialReduce hardware op): the
  serving/scale tier. Measured on v5e (2026-08-18,
  `benchmarks/topk_probe.py`, N=200k Q=1024 k=51 d=640): the exact path
  spends ~37 of its 41.5 ms inside the top-k sort while approx
  selection is near-free — 4.6 ms total (221k q/s, **9.0×**) at
  measured per-query recall 0.984 (recall_target=0.95) / 0.996 (0.99).
  At N=1M: 32 vs 207 ms (**6.4×**) at recall 0.994 — per-chunk top-51
  of a 250k chunk over-covers, so chunking *raises* recall. On CPU
  `approx_max_k` lowers to the exact sort with identical tie-breaking,
  so CPU tests pin approx == exact bit-for-bit.

  Exactness-verified hybrids were measured and DECLINED: a batch
  certificate (count(s > τ_k) ≤ k−1) fails for any realistic batch
  (one missed candidate anywhere breaks it), and host-side per-query
  fallback re-runs cost more than they save (180 ms vs the 41.5 ms
  exact path). Exact stays the default; approx is opt-in
  (`--topk-mode approx`).

For a mesh-sharded gallery, each shard computes its local top-k and the
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


def _select_top_k(s: jnp.ndarray, k: int, approx_recall: float | None):
    """Per-chunk selection: exact sort or the TPU approx hardware op."""
    if approx_recall is None:
        return jax.lax.top_k(s, k)
    return jax.lax.approx_max_k(s, k, recall_target=approx_recall)


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "approx_recall")
)
def blocked_top_k_similarity(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    k: int = 51,
    chunk: int | None = None,
    n_valid: jnp.ndarray | None = None,
    approx_recall: float | None = None,
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

    `approx_recall`: None = exact (default); a float in (0,1] switches
    the per-chunk selector to `lax.approx_max_k` at that recall target
    (see module docstring for the measured ladder).
    """
    q, d = queries.shape
    n = gallery.shape[0]
    k = min(k, n)
    nv = n if n_valid is None else n_valid
    chunk = _auto_chunk(q, n) if chunk is None else min(chunk, n)
    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    qf = queries.astype(jnp.float32)

    if n_chunks == 1:
        # single-chunk fast path: skip the pad+reshape gallery copy and
        # the final merge — `top_k`/`approx_max_k` already break ties by
        # lower index, matching the merge contract (measured: the copy +
        # merge cost ~2.5 ms at N=200k Q=1024, 35% of the approx tier)
        s = jnp.dot(qf, gallery.astype(jnp.float32).T)
        col = jnp.arange(n, dtype=jnp.int32)
        s = jnp.where(col[None, :] < nv, s, -jnp.inf)
        return _select_top_k(s, k, approx_recall)

    n_pad = n_chunks * chunk
    gal = jnp.pad(gallery, ((0, n_pad - n), (0, 0))).reshape(n_chunks, chunk, d)

    def scan_body(carry, gal_chunk_with_idx):
        best_s, best_i = carry
        gal_chunk, chunk_idx = gal_chunk_with_idx
        s = jnp.dot(qf, gal_chunk.astype(jnp.float32).T)  # [Q, chunk]
        col = chunk_idx * chunk + jnp.arange(chunk, dtype=jnp.int32)
        s = jnp.where(col[None, :] < nv, s, -jnp.inf)
        cs, ci = _select_top_k(s, min(k, chunk), approx_recall)
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


def measured_approx_recall(
    gallery: jnp.ndarray,
    k: int = 51,
    recall_target: float = 0.95,
    n_queries: int = 256,
    seed: int = 0,
) -> float:
    """Empirical recall of the approx tier ON THIS GALLERY.

    `lax.approx_max_k`'s recall_target is calibrated for uniform random
    score distributions; real CLIP embeddings are clustered and
    anisotropic, where the score tail near the top-k boundary is denser
    and the hardware PartialReduce can drop more true members
    (VERDICT r3 §weak-5). This measures the actual contract: sample
    `n_queries` gallery rows as queries (slightly jittered so the
    trivial self-hit does not dominate), run exact and approx top-k,
    and return the mean per-query overlap fraction.

    Callers (RetrievalIndex.calibrate_approx / the CLI `--topk-recall`
    path) use it to WARN OR REFUSE when the requested target is not
    honored on the caller's real distribution — the fail-safe the knob
    ships with.
    """
    import numpy as np

    gal = jnp.asarray(gallery, jnp.float32)
    n = gal.shape[0]
    # blocked_top_k_similarity internally clamps k to the gallery size;
    # dividing the overlap by the REQUESTED k would cap measured recall
    # at n/k on galleries smaller than k even when approx == exact —
    # and the server's strict startup calibration would then refuse a
    # perfectly healthy small gallery. Measure against the effective k.
    k = min(k, n)
    g = np.random.default_rng(seed)
    rows = g.choice(n, size=min(n_queries, n), replace=False)
    q = np.asarray(gal[rows])
    # small jitter: queries near, not on, gallery points (composed-query
    # predictions land near their targets, not exactly on them)
    q = q + 0.05 * g.standard_normal(q.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True) + 1e-12
    qj = jnp.asarray(q)
    _, exact_idx = blocked_top_k_similarity(qj, gal, k=k)
    _, approx_idx = blocked_top_k_similarity(
        qj, gal, k=k, approx_recall=recall_target)
    exact_idx = np.asarray(exact_idx)
    approx_idx = np.asarray(approx_idx)
    overlap = [
        len(set(exact_idx[i].tolist()) & set(approx_idx[i].tolist()))
        / exact_idx.shape[1]
        for i in range(exact_idx.shape[0])
    ]
    return float(np.mean(overlap))
