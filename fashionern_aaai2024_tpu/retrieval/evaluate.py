"""Dataset evaluators: the reference's `run/valid/*.py` + `run/test/*.py`
engines on top of the jit inference API.

Pipeline per dataset (reference `compute_*_val_metrics`):
  1. gallery pass — encode every index image (global [N,d]) and collect
     its 13-patch local features;
  2. query pass — tokenize captions, CLIP text (global + seq), look up
     the *raw* reference-image global by name (`validate_fiq.py:69,91-93`
     builds name→feat **before** normalization; duplicate names resolve
     to the last row, dict semantics), run the DVR query tower;
  3. refine the gallery: L2-normalize then the SR+Combiner index tower
     (`validate_fiq.py:30-31`);
  4. cosine top-k (blocked MXU matmul, `ops.similarity`) + recall
     metrics (`retrieval.metrics`).

Every jitted function runs at one padded batch size — no recompiles
across the dataset sweep.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import numpy as np

from fashionern_aaai2024_tpu.models.clip.tokenizer import tokenize
from fashionern_aaai2024_tpu.data.captions import join_fiq_captions
from fashionern_aaai2024_tpu.ops.similarity import _select_top_k
from fashionern_aaai2024_tpu.retrieval import metrics as M
from fashionern_aaai2024_tpu.retrieval.engine import (
    GalleryFeatures,
    RetrievalIndex,
    _pad_rows,
    embed_gallery,
)


class InferenceAPI:
    """Jitted padded-batch forwards over a trained model's variables."""

    def __init__(self, model, variables: dict, batch_size: int = 32,
                 context_length: int = 77, tokenizer=None, mesh=None,
                 quantize_gallery: bool = False,
                 quantize_refs: bool = False,
                 approx_recall: float | None = None):
        """`tokenizer`: callable (captions, context_length) → int32 [B, L];
        defaults to the vendored CLIP BPE (`models.clip.tokenizer`).

        `quantize_gallery`: store refined gallery embeddings int8 for
        the top-k search (4× less HBM; `ops.quant` serving option).

        `quantize_refs`: store the serve program's REFERENCE rows
        (raw features + 13-patch locals) int8 with per-row scales,
        dequantized in-program before DVR. The ref-patch array is the
        serving-memory heavyweight (13×d×4 B/item ≈ 13× the feature
        row), so this is ~4× on the dominant term — 1M items × d=640
        drop ≈ 36 → ~10 GB — and shrinks the export consts sidecar the
        same way. Numerics: one more ~0.4% quant step on the DVR
        inputs (same trade family as --quantize-towers; top-k overlap
        pinned by test).

        `approx_recall`: None = exact top-k everywhere (default,
        parity tier); a float switches every gallery-wide top-k this
        API builds (eval search, serve programs, mesh serve) to the TPU
        `approx_max_k` selector at that recall target — the measured
        serving/scale tier (ops/similarity.py ladder: 9.0× search q/s
        at N=200k, recall 0.984 at 0.95).

        `mesh`: optional DP mesh — batches are sharded over its `data`
        axis so gallery/query embedding runs on every chip (the
        "gallery embedding over ICI" scaling axis, SURVEY §5);
        `batch_size` must divide by the mesh size."""
        self.mesh = mesh
        self.quantize_gallery = quantize_gallery
        self.quantize_refs = quantize_refs
        self.approx_recall = approx_recall
        if mesh is not None:
            from fashionern_aaai2024_tpu.parallel.mesh import DATA_AXIS

            if batch_size % mesh.shape[DATA_AXIS]:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by mesh size "
                    f"{mesh.shape[DATA_AXIS]}"
                )
        self.model = model
        # device-resident leaves: converted checkpoints arrive as numpy,
        # and numpy params closed over by jit can't be indexed by tracers
        # (the text tower's embedding gather)
        self.variables = jax.tree_util.tree_map(jax.numpy.asarray, variables)
        variables = self.variables
        self.batch_size = batch_size
        self.context_length = context_length
        self._tokenizer = tokenizer if tokenizer is not None else tokenize

        # NB: variables are passed as jit ARGUMENTS, never closure
        # captures — closed-over weights get baked into the HLO as
        # constants, which at full model size blew the remote-compile
        # request limit (HTTP 413) when the TPU dress rehearsal first
        # drove this path
        def _index_fn(v, tf, tl):
            # eps matches torch F.normalize (1e-12); also keeps zero pad rows finite
            tf = tf / (jax.numpy.linalg.norm(tf, axis=-1, keepdims=True) + 1e-12)
            return model.apply(v, tf, tl, method=model.index)

        # TME models (TextConfig.tme) condition text encoding on the
        # reference patches (the fork surface, `validate_fiq.py:86-88`);
        # the query pipeline threads them through encode_text
        clip_cfg = getattr(model, "clip_config", None)
        self._tme = bool(clip_cfg is not None
                         and getattr(clip_cfg.text, "tme", False))

        fns = {
            "_encode_image_v": lambda v, imgs: model.apply(
                v, imgs, method=model.encode_image),
            "_encode_text_v": lambda v, ids: model.apply(
                v, ids, method=model.encode_text),
            "_query_v": lambda v, rf, rp, tg, ts: model.apply(
                v, rf, rp, tg, ts, method=model.query),
            "_index_v": _index_fn,
        }
        if self._tme:
            fns["_encode_text_tme_v"] = lambda v, ids, ve: model.apply(
                v, ids, visual_emb=ve, method=model.encode_text)
        if mesh is None:
            for name, fn in fns.items():
                setattr(self, name, jax.jit(fn))
        else:
            # Mesh path: shard_map over the data axis, not plain GSPMD —
            # the towers are purely batch-parallel (no collectives), and
            # GSPMD has no partitioning rule for the Pallas attention
            # kernels so it would REPLICATE them (each chip redoing the
            # full batch; verified on the CPU mesh). Under shard_map
            # every chip runs its batch shard through the full program,
            # kernels included.
            from jax.sharding import PartitionSpec as P

            def data_spec(tree_example_ndim):
                return P("data", *([None] * (tree_example_ndim - 1)))

            def wrap(fn, arg_ndims, out_ndims):
                in_specs = (P(),) + tuple(data_spec(n) for n in arg_ndims)
                out_specs = (tuple(data_spec(n) for n in out_ndims)
                             if isinstance(out_ndims, tuple)
                             else data_spec(out_ndims))
                return jax.jit(jax.shard_map(
                    fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                    check_vma=False,
                ))

            self._encode_image_v = wrap(fns["_encode_image_v"], (4,), (2, 3))
            self._encode_text_v = wrap(fns["_encode_text_v"], (2,), (2, 3))
            self._query_v = wrap(fns["_query_v"], (2, 3, 2, 3), 2)
            self._index_v = wrap(fns["_index_v"], (2, 3), 2)
            if self._tme:
                self._encode_text_tme_v = wrap(
                    fns["_encode_text_tme_v"], (2, 3), (2, 3))

    def _encode_image(self, imgs):
        return self._encode_image_v(self.variables, imgs)

    def _encode_text(self, ids):
        return self._encode_text_v(self.variables, ids)

    def _query(self, rf, rp, tg, ts):
        return self._query_v(self.variables, rf, rp, tg, ts)

    def _index(self, tf, tl):
        return self._index_v(self.variables, tf, tl)

    def _place(self, arr):
        """Pad to the fixed batch and (if a mesh is set) shard the batch
        axis over `data` so the jitted fn runs on all chips. Idempotent:
        an already-padded committed jax.Array (placed ahead of time by
        `embed_gallery`'s prefetch stage) passes straight through —
        `np.asarray` on it would be a D2H round-trip."""
        if isinstance(arr, jax.Array) and arr.shape[0] == self.batch_size:
            return arr
        arr = _pad_rows(np.asarray(arr), self.batch_size)
        if self.mesh is None:
            return arr
        from fashionern_aaai2024_tpu.parallel.mesh import data_sharding

        return jax.device_put(arr, data_sharding(self.mesh, arr.ndim))

    # --- padded-batch wrappers (host arrays in/out) -----------------------
    def encode_image(self, images: np.ndarray):
        n = images.shape[0]
        g, tok = self._encode_image(self._place(images))
        return np.asarray(g[:n]), np.asarray(tok[:n])

    def encode_text(self, token_ids: np.ndarray, visual_emb=None):
        """`visual_emb` (the reference patch features) is REQUIRED for
        TME models and ignored for vanilla ones — callers with patches
        at hand (the query pipeline) pass them unconditionally."""
        n = token_ids.shape[0]
        if self._tme:
            if visual_emb is None:
                raise ValueError(
                    "TME model: encode_text needs visual_emb "
                    "(the reference patch features)")
            g, seq = self._encode_text_tme_v(
                self.variables, self._place(token_ids),
                self._place(np.asarray(visual_emb, np.float32)))
        else:
            g, seq = self._encode_text(self._place(token_ids))
        return np.asarray(g[:n]), np.asarray(seq[:n])

    def query(self, ref_feats, ref_patch, text_g, text_seq) -> np.ndarray:
        n = ref_feats.shape[0]
        b = self.batch_size
        out = self._query(
            self._place(np.asarray(ref_feats, np.float32)),
            self._place(np.asarray(ref_patch, np.float32)),
            self._place(np.asarray(text_g, np.float32)),
            self._place(np.asarray(text_seq, np.float32)),
        )
        return np.asarray(out[:n])

    def refine_gallery(self, features: np.ndarray, local_features: np.ndarray,
                       chunk: int = 4096) -> np.ndarray:
        """Index-tower pass over the whole gallery, fixed-chunk jit;
        chunks shard over the mesh when one is set. Device work runs one
        chunk ahead of the host readback."""
        if self.mesh is not None:
            from fashionern_aaai2024_tpu.parallel.mesh import DATA_AXIS

            n_dev = self.mesh.shape[DATA_AXIS]
            chunk = -(-chunk // n_dev) * n_dev
        n = features.shape[0]
        out = np.empty((n,) + features.shape[1:], dtype=np.float32)
        pending = None  # (device result, start, rows)
        for i in range(0, n, chunk):
            f = _pad_rows(features[i : i + chunk], chunk).astype(np.float32)
            l = _pad_rows(local_features[i : i + chunk], chunk).astype(np.float32)
            if self.mesh is not None:
                from fashionern_aaai2024_tpu.parallel.mesh import data_sharding

                f = jax.device_put(f, data_sharding(self.mesh, f.ndim))
                l = jax.device_put(l, data_sharding(self.mesh, l.ndim))
            r = self._index(f, l)
            if pending is not None:
                pr, ps, pn = pending
                out[ps : ps + pn] = np.asarray(pr)[:pn]
            pending = (r, i, min(chunk, n - i))
        if pending is not None:
            pr, ps, pn = pending
            out[ps : ps + pn] = np.asarray(pr)[:pn]
        return out

    def tokenize(self, captions: Sequence[str]) -> np.ndarray:
        return self._tokenizer(captions, self.context_length)

    def build_serve_fn(self, gallery_features: np.ndarray, k_max: int = 50,
                       buckets: Sequence[int] = (1, 8, 32),
                       patch_num: int = 13,
                       ref_features: np.ndarray | None = None,
                       ref_patches: np.ndarray | None = None,
                       mesh=None, capacity: int | None = None):
        """One-dispatch serving program: text encode → DVR query →
        gallery matmul → top-k, in a single jitted call per request.

        `capacity` (> current rows, by-rows form, single-device only):
        LIVE-GROWABLE gallery. Arrays are padded to `capacity` rows and
        the program takes the valid-row count as a dynamic scalar, so
        `serve.update_rows(start, refined, ref_f, ref_p)` can append or
        overwrite items on a RUNNING service with zero recompiles —
        scores for rows ≥ n_valid are masked to -inf BEFORE the top-k
        (the same pad-eviction trap the sharded path guards). Mutable
        programs are not exportable; export a compacted
        (capacity=None) build instead.

        The r2 serve path paid ~5 device dispatches + host readbacks per
        query (tokenize→encode_text→query→search), each a round trip
        through the driver — ~2000× the amortized per-query chip cost at
        b=1. Fusing them leaves one round trip; padding goes to the
        smallest compile BUCKET ≥ n instead of the fixed eval batch, so a
        b=1 request does 1-row work, not 32. Returns
        `serve(token_ids, ref_feats, ref_patch, k) → (scores, rows)`;
        With `ref_features`/`ref_patches` given (the service's gallery
        arrays), the reference-row GATHER happens on-device too: the
        request uploads token ids + int32 row indices only — two small
        host→device transfers per query instead of four (measured 58.7 →
        see BASELINE r3 serve ledger; per-transfer cost dominates at b=1
        through the tunnel, and is pure overhead on any host).
        `serve(token_ids, rows_or_feats, patch_or_none, k)`; call
        `warmup()` on it at startup to pre-compile every bucket.

        `mesh` (or the API's own mesh): GALLERY-SHARDED serving — the
        gallery matrix and its raw ref feature/patch arrays live
        row-sharded over the mesh's `data` axis, so serving HBM scales
        with mesh size (the gallery, not the model, is the serving
        memory axis: 1M items × d=640 fp32 + 13 patches ≈ 36 GB —
        far past one chip). Per query each chip runs the tiny
        text+DVR program on the replicated batch, scores its gallery
        shard, and only [b, k] candidate sets cross ICI (all_gather +
        merge, same pattern as `engine.sharded_search`); the ref-row
        gather is a masked local lookup + psum. Still one dispatch.
        Requires `ref_features` (the by-rows form)."""
        import jax.numpy as jnp

        if mesh is None:
            mesh = self.mesh
        n_rows = int(gallery_features.shape[0])
        k_max = min(k_max, n_rows if capacity is None else capacity)
        model = self.model
        buckets = tuple(sorted(buckets))
        by_rows = ref_features is not None
        tme = self._tme

        def enc_text(v, ids, rp):
            # TME: condition on the request's reference patches (already
            # gathered on-device in the by-rows forms)
            if tme:
                return model.apply(v, ids, visual_emb=rp.astype(jnp.float32),
                                   method=model.encode_text)
            return model.apply(v, ids, method=model.encode_text)

        if mesh is not None:
            if not by_rows:
                raise ValueError(
                    "mesh-sharded serving needs the by-rows form "
                    "(pass ref_features/ref_patches)")
            if capacity is not None:
                raise ValueError(
                    "capacity (live adds) is single-device serving only; "
                    "mesh-sharded galleries are static — re-shard via a "
                    "service restart or export refresh")
            return self._build_sharded_serve_fn(
                mesh, gallery_features, ref_features, ref_patches, k_max,
                buckets, n_rows)

        feat_dim = int(gallery_features.shape[1])
        growable = capacity is not None
        if growable:
            if not by_rows:
                raise ValueError("capacity needs the by-rows form "
                                 "(pass ref_features/ref_patches)")
            if capacity < n_rows:
                raise ValueError(
                    f"capacity {capacity} < current gallery {n_rows}")

            def pad_cap(x):
                x = np.asarray(x)
                return np.pad(x, ((0, capacity - n_rows),)
                              + ((0, 0),) * (x.ndim - 1))

            gallery_features = pad_cap(gallery_features)
            ref_features = pad_cap(ref_features)
            ref_patches = pad_cap(ref_patches)
        quantized = self.quantize_gallery
        approx_recall = self.approx_recall
        if quantized:
            # honor --quantize-gallery on the FAST path too: score via
            # int8 x int8 MXU dot with per-row rescale — the same math
            # as RetrievalIndex.search's quantized tier, so small-k
            # (fused) and large-k (fallback) answers agree, and the
            # fp32 score-matrix copy never lands on the device.
            # Quantize on HOST (numerically identical to the device
            # twin, pinned by TestQuantizeRowsNp) so only int8 bytes
            # cross H2D — quantizing on device staged the full fp32
            # array first, a 4x bigger upload AND a transient HBM spike
            # that OOMed a 200k-item build on the scale drive
            from fashionern_aaai2024_tpu.ops.quant import quantize_rows_np

            qv, qs = quantize_rows_np(np.asarray(gallery_features, np.float32))
            gal = (jnp.asarray(qv), jnp.asarray(qs))
        else:
            gal = jnp.asarray(gallery_features, jnp.float32)

        quantize_refs = self.quantize_refs
        if by_rows:
            if quantize_refs:
                from fashionern_aaai2024_tpu.ops.quant import quantize_rows_np

                n, pn = int(ref_patches.shape[0]), int(ref_patches.shape[1])
                fv, fs = quantize_rows_np(np.asarray(ref_features, np.float32))
                ref_f = (jnp.asarray(fv), jnp.asarray(fs))
                pq, ps = quantize_rows_np(
                    np.asarray(ref_patches, np.float32).reshape(-1, feat_dim))
                ref_p = (jnp.asarray(pq.reshape(n, pn, feat_dim)),
                         jnp.asarray(ps.reshape(n, pn)))
            else:
                ref_f = jnp.asarray(ref_features, jnp.float32)
                ref_p = jnp.asarray(ref_patches, jnp.float32)

        def gather_refs(gf, gp, rows):
            """Reference-row gather; int8 rows dequantize after the
            gather (only the b requested rows, not the gallery)."""
            if not quantize_refs:
                return gf[rows], gp[rows]
            rf = gf[0][rows].astype(jnp.float32) * gf[1][rows][:, None]
            rp = gp[0][rows].astype(jnp.float32) * gp[1][rows][:, :, None]
            return rf, rp

        def score_rows(pred, g):
            if not quantized:
                return pred @ g.T
            from fashionern_aaai2024_tpu.ops.quant import quantize_rows

            gq, gs = g
            qv, qs = quantize_rows(pred)
            acc = jax.lax.dot_general(
                qv, gq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * qs[:, None] * gs[None, :]

        def body(v, g, ids, rf, rp):
            tg, ts = enc_text(v, ids, rp)
            pred = model.apply(
                v, rf.astype(jnp.float32), rp.astype(jnp.float32),
                tg.astype(jnp.float32), ts.astype(jnp.float32),
                method=model.query)
            return _select_top_k(score_rows(pred, g), k_max, approx_recall)

        if growable:
            # dynamic valid-row count: rows ≥ n_valid are zero padding
            # (or retired rows) and must lose to every real row
            def fn(v, g, gf, gp, ids, rows, n_valid):
                rf, rp = gather_refs(gf, gp, rows)
                tg, ts = enc_text(v, ids, rp)
                pred = model.apply(
                    v, rf.astype(jnp.float32), rp.astype(jnp.float32),
                    tg.astype(jnp.float32), ts.astype(jnp.float32),
                    method=model.query)
                scores = score_rows(pred, g)
                valid = jnp.arange(scores.shape[1]) < n_valid
                scores = jnp.where(valid[None, :], scores, -jnp.inf)
                return _select_top_k(scores, k_max, approx_recall)

            jfn = jax.jit(fn)
        elif by_rows:
            def fn(v, g, gf, gp, ids, rows):
                rf, rp = gather_refs(gf, gp, rows)
                return body(v, g, ids, rf, rp)

            jfn = jax.jit(fn)
        else:
            jfn = jax.jit(body)

        # Single home for the device arrays: serve() reads ONLY this
        # dict, so update_rows' rebinds release the superseded buffers
        # (a closure over the gal/ref_f/ref_p names would pin the
        # initial capacity-sized copies forever — 2× gallery HBM after
        # the first add).
        state = {"gal": gal, "ref_f": ref_f if by_rows else None,
                 "ref_p": ref_p if by_rows else None, "n_valid": n_rows}
        del gal
        if by_rows:
            del ref_f, ref_p

        def serve(token_ids, ref, ref_patch=None, k: int = 10):
            n = token_ids.shape[0]
            b = next((x for x in buckets if x >= n), None)
            if b is None:
                # fail fast: an uncompiled size class would trigger a
                # full serve-program compile at REQUEST time under the
                # service lock, stalling all traffic for its duration
                raise ValueError(
                    f"batch {n} exceeds the largest compile bucket "
                    f"{buckets[-1]}; split the request")
            ids = _pad_rows(np.asarray(token_ids), b)
            if by_rows:
                rows = np.zeros((b,), np.int32)
                rows[:n] = np.asarray(ref, np.int32)
                if growable:
                    s, i = jfn(self.variables, state["gal"], state["ref_f"],
                               state["ref_p"], ids, rows,
                               np.int32(state["n_valid"]))
                else:
                    s, i = jfn(self.variables, state["gal"], state["ref_f"],
                               state["ref_p"], ids, rows)
            else:
                s, i = jfn(self.variables, state["gal"], ids,
                           _pad_rows(np.asarray(ref, np.float32), b),
                           _pad_rows(np.asarray(ref_patch, np.float32), b))
            # never emit masked padding rows: their scores are -inf and
            # their indices point at invalid slots
            k = min(k, k_max, state["n_valid"])
            return np.asarray(s[:n, :k]), np.asarray(i[:n, :k])

        def update_rows(start: int, refined: np.ndarray,
                        ref_feat_rows: np.ndarray,
                        ref_patch_rows: np.ndarray) -> int:
            """Write m items at [start, start+m) in the capacity-padded
            arrays (append when start == n_valid, overwrite otherwise);
            returns the new valid-row count. Zero recompiles: shapes are
            static, only buffer contents and the n_valid scalar change.
            All three buffers are prepared before any is committed, so a
            bad input cannot leave the served state torn."""
            if not growable:
                raise ValueError("serve fn built without capacity=")
            m = int(refined.shape[0])
            if start + m > capacity:
                raise ValueError(
                    f"update [{start}, {start + m}) exceeds capacity "
                    f"{capacity}; rebuild the service with more headroom")
            g32 = jnp.asarray(refined, jnp.float32)
            rf32 = jnp.asarray(ref_feat_rows, jnp.float32)
            rp32 = jnp.asarray(ref_patch_rows, jnp.float32)
            if (g32.shape != (m, feat_dim) or rf32.shape != (m, feat_dim)
                    or rp32.shape[0] != m or rp32.ndim != 3
                    or rp32.shape[2] != feat_dim):
                raise ValueError(
                    f"update_rows shapes: refined {g32.shape}, ref_feats "
                    f"{rf32.shape}, ref_patches {rp32.shape} don't agree "
                    f"with m={m}, d={feat_dim}")
            sl = slice(start, start + m)
            if quantized:
                from fashionern_aaai2024_tpu.ops.quant import quantize_rows

                qv, qs = quantize_rows(g32)
                gq, gs = state["gal"]
                new_gal = (gq.at[sl].set(qv), gs.at[sl].set(qs))
            else:
                new_gal = state["gal"].at[sl].set(g32)
            if quantize_refs:
                from fashionern_aaai2024_tpu.ops.quant import quantize_rows

                fq, fs = quantize_rows(rf32)
                pq2, ps2 = quantize_rows(rp32.reshape(-1, feat_dim))
                pn = rp32.shape[1]
                rfq, rfs = state["ref_f"]
                rpq, rps = state["ref_p"]
                new_rf = (rfq.at[sl].set(fq), rfs.at[sl].set(fs))
                new_rp = (rpq.at[sl].set(pq2.reshape(m, pn, feat_dim)),
                          rps.at[sl].set(ps2.reshape(m, pn)))
            else:
                new_rf = state["ref_f"].at[sl].set(rf32)
                new_rp = state["ref_p"].at[sl].set(rp32)
            # commit all-or-nothing
            state["gal"], state["ref_f"], state["ref_p"] = \
                new_gal, new_rf, new_rp
            state["n_valid"] = max(state["n_valid"], start + m)
            return state["n_valid"]

        def warmup():
            for b in buckets:
                ids = np.zeros((b, self.context_length), np.int32)
                if by_rows:
                    serve(ids, np.zeros((b,), np.int32), k=1)
                else:
                    serve(ids, np.zeros((b, feat_dim), np.float32),
                          np.zeros((b, patch_num, feat_dim), np.float32),
                          k=1)

        serve.warmup = warmup
        serve.k_max = k_max
        serve.buckets = buckets
        serve.by_rows = by_rows
        serve.mesh = None
        serve.growable = growable
        serve.capacity = capacity
        serve.update_rows = update_rows
        serve.n_valid = lambda: state["n_valid"]
        # export surface (retrieval/artifact.py): the underlying jitted
        # program and its bound operands, so the AOT exporter can bake
        # weights+gallery as StableHLO constants. Growable programs are
        # mutable (live n_valid + buffer updates) and refuse export —
        # an artifact is an immutable snapshot; export a compacted
        # capacity=None build. (consts=None for growable also avoids
        # pinning the initial buffers after update_rows rebinds them.)
        serve.jfn = jfn
        if growable:
            serve.consts = None
        elif by_rows:
            serve.consts = (self.variables, state["gal"], state["ref_f"],
                            state["ref_p"])
        else:
            serve.consts = (self.variables, state["gal"])
        serve.context_length = self.context_length
        return serve

    def _build_sharded_serve_fn(self, mesh, gal, ref_features, ref_patches,
                                k_max: int, buckets, n_rows: int):
        """Gallery-sharded one-dispatch serve program (see build_serve_fn).

        Layout: gallery scores matrix + raw ref feature/patch rows are
        padded to a multiple of the mesh size and row-sharded over
        `data`; weights and the query batch are replicated. shard_map —
        not plain GSPMD — for the same reason as the eval towers: the
        Pallas kernels inside the text encoder have no GSPMD
        partitioning rule. ICI traffic per query: one psum of the [b,d]
        + [b,p,d] gathered ref rows and one [b, k_local] all_gather of
        shard-top-k candidates; the [b, per-shard] score matrix never
        leaves its chip."""
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fashionern_aaai2024_tpu.ops.similarity import merge_top_k
        from fashionern_aaai2024_tpu.parallel.mesh import DATA_AXIS

        model = self.model
        tme = self._tme
        n_dev = mesh.shape[DATA_AXIS]
        per = -(-n_rows // n_dev)
        k_local = min(k_max, per)
        quantized = self.quantize_gallery
        approx_recall = self.approx_recall

        def shard_rows(x):
            # pad on HOST (numpy) and device_put straight to the sharded
            # layout — jnp.pad would materialize the full array on one
            # device first, defeating the HBM-scaling purpose
            x = np.asarray(x)
            if x.dtype != np.int8:
                x = x.astype(np.float32)
            x = np.pad(x, ((0, per * n_dev - n_rows),)
                       + ((0, 0),) * (x.ndim - 1))
            return jax.device_put(
                x, NamedSharding(mesh, P(DATA_AXIS,
                                         *([None] * (x.ndim - 1)))))

        if quantized:
            # per-row int8 (host-side numpy — row scales shard trivially
            # along the same axis); pad scales with 0 so pad rows score 0
            # before the pre-top-k mask removes them anyway
            from fashionern_aaai2024_tpu.ops.quant import quantize_rows_np

            gq, scales = quantize_rows_np(gal)
            gal_sh = (shard_rows(gq),
                      jax.device_put(
                          np.pad(scales, (0, per * n_dev - n_rows)),
                          NamedSharding(mesh, P(DATA_AXIS))))
        else:
            gal_sh = shard_rows(gal)
        quantize_refs = self.quantize_refs
        if quantize_refs:
            # int8 ref rows: the patch array dominates serving HBM
            # (13×d×4 B/item); quantize on host per row, shard values +
            # scales along the same axis
            from fashionern_aaai2024_tpu.ops.quant import quantize_rows_np

            rq, rs = quantize_rows_np(ref_features)
            pq, ps = quantize_rows_np(ref_patches)
            ref_f = (shard_rows(rq), shard_rows(rs))
            ref_p = (shard_rows(pq), shard_rows(ps))
        else:
            ref_f = shard_rows(ref_features)
            ref_p = shard_rows(ref_patches)

        def local_body(v, g, gf, gp, ids, rows):
            shard = jax.lax.axis_index(DATA_AXIS)
            start = shard * per
            # masked local gather + psum == distributed row lookup;
            # int8 rows dequantize locally (b rows only) before the psum
            local = rows - start
            hit = (local >= 0) & (local < per)
            safe = jnp.where(hit, local, 0)
            if quantize_refs:
                gf = gf[0][safe].astype(jnp.float32) * gf[1][safe][:, None]
                gp = gp[0][safe].astype(jnp.float32) * gp[1][safe][:, :, None]
            else:
                gf, gp = gf[safe], gp[safe]
            rf = jax.lax.psum(
                gf * hit[:, None].astype(gf.dtype), DATA_AXIS)
            rp = jax.lax.psum(
                gp * hit[:, None, None].astype(gp.dtype), DATA_AXIS)
            # replicated text + DVR work: b<=32 rows — duplicating it
            # beats broadcasting activations at serving batch sizes
            if tme:  # TME: condition on the psum-gathered ref patches
                tg, ts = model.apply(v, ids, visual_emb=rp,
                                     method=model.encode_text)
            else:
                tg, ts = model.apply(v, ids, method=model.encode_text)
            pred = model.apply(
                v, rf, rp, tg.astype(jnp.float32), ts.astype(jnp.float32),
                method=model.query)
            if quantized:  # same int8 math as the single-device path
                from fashionern_aaai2024_tpu.ops.quant import quantize_rows

                gq, gs = g
                qv, qs = quantize_rows(pred)
                acc = jax.lax.dot_general(
                    qv, gq, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                scores = acc.astype(jnp.float32) * qs[:, None] * gs[None, :]
            else:
                scores = pred @ g.T
            # mask pad rows BEFORE the local top-k: they score exactly 0
            # (pred @ zero-rows) and would evict real negative-scoring
            # rows from the last shard's candidate set
            col_valid = start + jnp.arange(scores.shape[1]) < n_rows
            scores = jnp.where(col_valid[None, :], scores, -jnp.inf)
            s, i = _select_top_k(scores, k_local, approx_recall)
            gi = i + start
            valid = s > -jnp.inf
            gi = jnp.where(valid, gi, jnp.iinfo(jnp.int32).max)
            s_all = jax.lax.all_gather(s, DATA_AXIS, axis=1, tiled=True)
            i_all = jax.lax.all_gather(gi, DATA_AXIS, axis=1, tiled=True)
            return merge_top_k(s_all, i_all, k_max)

        gal_spec = ((P(DATA_AXIS, None), P(DATA_AXIS)) if quantized
                    else P(DATA_AXIS, None))
        rf_spec = ((P(DATA_AXIS, None), P(DATA_AXIS)) if quantize_refs
                   else P(DATA_AXIS, None))
        rp_spec = ((P(DATA_AXIS, None, None), P(DATA_AXIS, None))
                   if quantize_refs else P(DATA_AXIS, None, None))
        jfn = jax.jit(jax.shard_map(
            local_body, mesh=mesh,
            in_specs=(P(), gal_spec, rf_spec, rp_spec, P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        ))

        def serve(token_ids, ref, ref_patch=None, k: int = 10):
            n = token_ids.shape[0]
            b = next((x for x in buckets if x >= n), None)
            if b is None:  # same fail-fast as the single-device serve
                raise ValueError(
                    f"batch {n} exceeds the largest compile bucket "
                    f"{buckets[-1]}; split the request")
            ids = _pad_rows(np.asarray(token_ids), b)
            rows = np.zeros((b,), np.int32)
            rows[:n] = np.asarray(ref, np.int32)
            s, i = jfn(self.variables, gal_sh, ref_f, ref_p, ids, rows)
            k = min(k, k_max)
            return np.asarray(s[:n, :k]), np.asarray(i[:n, :k])

        def warmup():
            for b in buckets:
                serve(np.zeros((b, self.context_length), np.int32),
                      np.zeros((b,), np.int32), k=1)

        serve.warmup = warmup
        serve.k_max = k_max
        serve.buckets = buckets
        serve.by_rows = True
        serve.mesh = mesh  # export_serve_artifact refuses mesh programs
        serve.jfn = jfn
        serve.consts = (self.variables, gal_sh, ref_f, ref_p)
        serve.context_length = self.context_length
        return serve

    def gallery_encode_fn(self) -> Callable:
        """encode_image closure for `engine.embed_gallery` — padded and
        mesh-sharded placement, device outputs (readback pipelined by
        the engine). Exposes `.place` so the engine's prefetch thread
        can pad + transfer batches ahead of dispatch."""
        fn = lambda imgs: self._encode_image(self._place(imgs))  # noqa: E731
        fn.place = self._place
        return fn


def last_wins_rows(names: Sequence[str]) -> dict[str, int]:
    """name → gallery row, duplicates resolved to the LAST occurrence —
    the reference's `dict(zip(index_names, index_features))` semantics
    (`test_200k.py:85`), load-bearing for Fashion200k caption-id lookups."""
    return {n: i for i, n in enumerate(names)}


def generate_predictions(
    api: InferenceAPI,
    relative_loader,
    caption_fn: Callable[[dict], list[str]],
    gallery: GalleryFeatures,
    collect: Sequence[str] = (),
    ref_key: str = "ref_name",
):
    """Query pass (reference `generate_*_val_predictions`). Returns
    (pred [Q,d], {key: list} for every `collect` key)."""
    rows = last_wins_rows(gallery.names)
    preds: list[np.ndarray] = []
    meta: dict[str, list] = {k: [] for k in collect}
    for batch in relative_loader:
        caps = caption_fn(batch)
        ids = api.tokenize(caps)
        n = len(caps)
        tg, tseq = api.encode_text(ids, visual_emb=batch["ref_patch"])
        ref_rows = np.asarray([rows[r] for r in batch[ref_key]])
        ref_feats = gallery.features[ref_rows]
        preds.append(api.query(ref_feats, batch["ref_patch"], tg, tseq)[:n])
        for k in collect:
            meta[k].extend(batch[k])
    return np.concatenate(preds), meta


def _search_ids(api, gallery: GalleryFeatures, preds: np.ndarray, k: int):
    refined = api.refine_gallery(gallery.features, gallery.local_features)
    index = RetrievalIndex(gallery.names, refined,
                           quantize=getattr(api, "quantize_gallery", False),
                           approx_recall=getattr(api, "approx_recall", None))
    k = min(k, len(gallery.names))
    # approx tier only: measure the recall contract on this gallery's
    # real distribution once per index and warn on undershoot
    index.calibrate_approx(k=k)
    scores, idx = index.search(preds, k=k)
    return index, index.topk_ids(idx)


# --------------------------------------------------------------------------
# Dataset evaluators
# --------------------------------------------------------------------------

def fiq_caption_fn(batch: dict) -> list[str]:
    return [join_fiq_captions(c[0], c[1]) for c in batch["captions"]]


def plain_caption_fn(batch: dict) -> list[str]:
    return list(batch["caption"])


def evaluate_fiq_split(api, classic_loader, relative_loader,
                       ks: tuple[int, ...] = (10, 50)) -> dict:
    """One dress type (reference `compute_fiq_val_metrics`,
    `validate_fiq.py:11-47`); also serves the VAL protocol with its
    extended K list (`test_val.py:58-67`)."""
    gallery = embed_gallery(api.gallery_encode_fn(), classic_loader, api.batch_size)
    preds, meta = generate_predictions(
        api, relative_loader, fiq_caption_fn, gallery, collect=("tar_name",)
    )
    index, topk_ids = _search_ids(api, gallery, preds, max(ks))
    target_ids = M.names_to_id_array(meta["tar_name"], index.vocab)
    r = M.recall_at_k(topk_ids, target_ids, ks)
    out = {f"recall_at{k}": r[k] for k in ks}
    out["avg"] = float(np.mean(list(r.values())))
    return out


def evaluate_shoes(api, classic_loader, relative_loader) -> dict:
    gallery = embed_gallery(api.gallery_encode_fn(), classic_loader, api.batch_size)
    preds, meta = generate_predictions(
        api, relative_loader, plain_caption_fn, gallery, collect=("tar_name",)
    )
    index, topk_ids = _search_ids(api, gallery, preds, 50)
    target_ids = M.names_to_id_array(meta["tar_name"], index.vocab)
    return M.fiq_metrics(topk_ids, target_ids)


def evaluate_fashion200k(api, classic_loader, relative_loader) -> dict:
    """Gallery names are caption ids → duplicate ids encode the
    multi-positive semantics (`test_200k.py:53-60`)."""
    gallery = embed_gallery(api.gallery_encode_fn(), classic_loader, api.batch_size)
    preds, meta = generate_predictions(
        api, relative_loader, plain_caption_fn, gallery,
        collect=("tar_id",), ref_key="ref_id",
    )
    index, topk_ids = _search_ids(api, gallery, preds, 50)
    target_ids = M.names_to_id_array(meta["tar_id"], index.vocab)
    return M.fashion200k_metrics(topk_ids, target_ids)


def evaluate_cirr(api, classic_loader, relative_loader) -> dict:
    """Full CIRR suite on the val split: R@K with the reference image
    dropped from the ranking + subset recall among the 6 group members
    (`validate_cirr.py:11-126`)."""
    gallery = embed_gallery(api.gallery_encode_fn(), classic_loader, api.batch_size)
    preds, meta = generate_predictions(
        api, relative_loader, plain_caption_fn, gallery,
        collect=("tar_name", "ref_name", "group_members"),
    )
    refined = api.refine_gallery(gallery.features, gallery.local_features)
    index = RetrievalIndex(gallery.names, refined,
                           quantize=getattr(api, "quantize_gallery", False),
                           approx_recall=getattr(api, "approx_recall", None))
    k = min(51, len(gallery.names))
    index.calibrate_approx(k=k)
    _, idx = index.search(preds, k=k)
    topk_ids = index.topk_ids(idx)

    target_ids = M.names_to_id_array(meta["tar_name"], index.vocab)
    reference_ids = M.names_to_id_array(meta["ref_name"], index.vocab)
    rows = last_wins_rows(gallery.names)
    member_rows = np.asarray([[rows[m] for m in g] for g in meta["group_members"]])
    member_scores = index.scores_for(preds, member_rows)
    member_ids = index.ids[member_rows]
    return M.cirr_metrics(topk_ids, reference_ids, target_ids, member_scores, member_ids)


def generate_cirr_submission(api, classic_loader, relative_loader) -> dict:
    """CIRR test1 split: targets are unpublished, so produce the
    official submission payloads — per pair_id, the top-50 gallery names
    (reference image removed) and the top-3 among the group members.
    The reference repo stops at the val split (`run/test/test_cirr.py`);
    its test1 dataloader branch (`dataloader/cirr.py:75-77`) feeds this.
    """
    gallery = embed_gallery(api.gallery_encode_fn(), classic_loader, api.batch_size)
    preds, meta = generate_predictions(
        api, relative_loader, plain_caption_fn, gallery,
        collect=("pair_id", "ref_name", "group_members"),
    )
    refined = api.refine_gallery(gallery.features, gallery.local_features)
    index = RetrievalIndex(gallery.names, refined)
    k = min(51, len(gallery.names))
    _, idx = index.search(preds, k=k)

    rows = last_wins_rows(gallery.names)
    ranking: dict[str, list[str]] = {}
    subset: dict[str, list[str]] = {}
    for qi, pair_id in enumerate(meta["pair_id"]):
        names_row = [gallery.names[j] for j in idx[qi]
                     if gallery.names[j] != meta["ref_name"][qi]][:50]
        ranking[str(pair_id)] = names_row
        members = meta["group_members"][qi]
        member_rows = np.asarray([rows[m] for m in members])
        scores = index.scores_for(preds[qi : qi + 1], member_rows[None])[0]
        order = np.argsort(-scores)
        subset[str(pair_id)] = [
            members[j] for j in order if members[j] != meta["ref_name"][qi]
        ][:3]
    return {
        "recall_submission": {"version": "rc2", "metric": "recall", **ranking},
        "recall_subset_submission": {
            "version": "rc2", "metric": "recall_subset", **subset,
        },
    }


def evaluate_fiq(api, loaders_by_type: dict[str, tuple]) -> dict:
    """All dress types; returns per-type recalls + the reference's
    selection metric, mean (R@10+R@50)/2 (`train_fiq.py:158-169`)."""
    out: dict = {}
    r10, r50 = [], []
    for dt, (classic, relative) in loaders_by_type.items():
        r = evaluate_fiq_split(api, classic, relative)
        out[dt] = r
        r10.append(r["recall_at10"])
        r50.append(r["recall_at50"])
    out["mean_recall_at10"] = float(np.mean(r10))
    out["mean_recall_at50"] = float(np.mean(r50))
    out["avg"] = (out["mean_recall_at10"] + out["mean_recall_at50"]) / 2
    return out
