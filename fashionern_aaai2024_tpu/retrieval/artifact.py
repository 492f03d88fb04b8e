"""AOT serving artifacts: `jax.export` the one-dispatch serve program.

The reference deploys by shipping the whole training repo to the
serving host and re-tracing the model in Python
(`/root/reference/run/test/test_fiq.py` imports the full model stack to
answer queries). The TPU-native answer is ahead-of-time export: the
serve program (text encode → DVR query → gallery matmul → top-k, one
dispatch — `evaluate.InferenceAPI.build_serve_fn`) is serialized to
StableHLO; the trained weights AND the embedded gallery ship alongside
in ONE consts sidecar that every program takes as arguments (NOT baked
constants — that keeps the blob swappable for a retrained checkpoint
via `refresh_consts`, and avoids N buckets × full-blob duplication).
A serving host needs jax + this artifact directory — none of the model
code, checkpoints, dataset classes, or gallery images.

Layout of an artifact directory:

    manifest.json        shapes/buckets/platform/provenance
    serve_b{B}.jaxexport serialized Exported, one per compile bucket
    consts.npz           weights + gallery, stored ONCE and fed to every
                         program as arguments (bf16 as uint16 views —
                         .npy predates bfloat16); swappable for a
                         retrained checkpoint with the same tree
    names.json           gallery row → name map the top-k indices index

Tokenization happens client-side (the vendored BPE tokenizer is pure
Python with no jax dependency — `models/clip/tokenizer.py`).

Platform note: the artifact records the platform it was exported for
(`jax.default_backend()` at export time). Export on the deploy platform
— a TPU-host export bakes the Pallas/Mosaic kernels, a CPU export bakes
the XLA fallback path; `load_serve_artifact` refuses a platform
mismatch unless `allow_platform_mismatch=True`.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

ARTIFACT_VERSION = 1


def _np_storable(x: np.ndarray) -> np.ndarray:
    """npz-safe view: the .npy format predates bfloat16, so bf16 leaves
    travel as uint16 bit patterns (dtype recorded in the manifest)."""
    return x.view(np.uint16) if x.dtype.name == "bfloat16" else x


def _np_restore(x: np.ndarray, dtype_name: str) -> np.ndarray:
    if dtype_name == "bfloat16":
        import ml_dtypes

        return x.view(ml_dtypes.bfloat16)
    return x


def export_serve_artifact(serve_fn, out_dir: str, *,
                          model_name: str = "",
                          gallery_names: Sequence[str] | None = None,
                          extra_meta: dict | None = None) -> dict:
    """Export a `build_serve_fn` result (by-rows form) to `out_dir`.

    One serialized program per compile bucket; weights + gallery become
    StableHLO constants. Returns the manifest dict.
    """
    import jax
    from jax import export as jexport

    if not getattr(serve_fn, "by_rows", False):
        raise ValueError(
            "export_serve_artifact needs the by-rows serve fn (build the "
            "service with gallery ref_features/ref_patches — the "
            "RetrievalService default)")
    if getattr(serve_fn, "growable", False):
        raise ValueError(
            "growable (capacity=) serve programs are mutable and not "
            "exportable; build a compacted capacity=None serve fn over "
            "the current gallery and export that snapshot")
    if getattr(serve_fn, "mesh", None) is not None:
        raise ValueError(
            "mesh-sharded serve programs are not exportable: the "
            "serialized StableHLO would pin this mesh's device count. "
            "Export from a single-device service, or serve the mesh "
            "live (`serve --data-parallel`).")
    os.makedirs(out_dir, exist_ok=True)
    variables, gal, ref_f, ref_p = serve_fn.consts
    ctx = serve_fn.context_length
    jfn = serve_fn.jfn

    # Weights + gallery ship ONCE as a sidecar blob and enter each
    # program as ARGUMENTS (not baked constants): N buckets would
    # otherwise each embed the full ~weights+gallery (measured 262 MB
    # per program for ViT-B-16), and the blob can be swapped for a
    # retrained checkpoint with the same tree without re-exporting.
    leaves, treedef = jax.tree_util.tree_flatten(
        (variables, gal, ref_f, ref_p))
    consts = {f"c{i}": np.asarray(x) for i, x in enumerate(leaves)}
    dtypes = [str(x.dtype) for x in consts.values()]
    np.savez(os.path.join(out_dir, "consts.npz"),
             **{k: _np_storable(v) for k, v in consts.items()})
    consts_specs = [jax.ShapeDtypeStruct(x.shape, x.dtype)
                    for x in consts.values()]

    def fn(flat, ids, rows):
        variables, gal, ref_f, ref_p = jax.tree_util.tree_unflatten(
            treedef, flat)
        return jfn(variables, gal, ref_f, ref_p, ids, rows)

    files = {}
    for b in serve_fn.buckets:
        ids_spec = jax.ShapeDtypeStruct((b, ctx), np.int32)
        rows_spec = jax.ShapeDtypeStruct((b,), np.int32)
        exp = jexport.export(jax.jit(fn))(consts_specs, ids_spec, rows_spec)
        name = f"serve_b{b}.jaxexport"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        files[str(b)] = name

    manifest = {
        "artifact_version": ARTIFACT_VERSION,
        "kind": "fashionern-serve",
        "model_name": model_name,
        "platform": jax.default_backend(),
        "buckets": list(serve_fn.buckets),
        "k_max": int(serve_fn.k_max),
        "context_length": int(ctx),
        # quantize_gallery services carry (int8 values, fp32 row scales)
        "gallery_size": int((gal[0] if isinstance(gal, tuple)
                             else gal).shape[0]),
        "feature_dim": int((gal[0] if isinstance(gal, tuple)
                            else gal).shape[1]),
        "files": files,
        "consts_file": "consts.npz",
        "consts_dtypes": dtypes,
        "consts_shapes": [list(x.shape) for x in consts.values()],
    }
    if gallery_names is not None:
        # row -> name map: the program's top-k indices refer to THIS
        # order; shipping it makes the artifact self-contained
        with open(os.path.join(out_dir, "names.json"), "w") as f:
            json.dump([str(n) for n in gallery_names], f)
        manifest["names_file"] = "names.json"
    if extra_meta:
        manifest.update(extra_meta)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def refresh_consts(out_dir: str, serve_fn) -> dict:
    """Swap an artifact's weights+gallery blob for a retrained service's
    WITHOUT re-exporting the programs.

    The serialized programs take the consts as *arguments*, so any
    checkpoint with the same tree (shapes + dtypes) slots in. Validates
    the new leaves against the manifest before touching the file and
    raises on any mismatch — a shape change means the programs really
    do need a re-export.
    """
    import jax

    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest.get("kind") != "fashionern-serve":
        raise ValueError(f"{out_dir} is not a fashionern serve artifact")
    variables, gal, ref_f, ref_p = serve_fn.consts
    leaves, _ = jax.tree_util.tree_flatten((variables, gal, ref_f, ref_p))
    consts = {f"c{i}": np.asarray(x) for i, x in enumerate(leaves)}
    shapes = manifest["consts_shapes"]
    if len(shapes) != len(consts):
        raise ValueError(
            f"new consts tree has {len(consts)} leaves, artifact expects "
            f"{len(shapes)} — model/gallery structure changed; re-export")
    for (k, v), dt, shp in zip(consts.items(), manifest["consts_dtypes"],
                               shapes):
        if str(v.dtype) != dt or list(v.shape) != shp:
            raise ValueError(
                f"const {k}: got {v.dtype}{list(v.shape)}, artifact "
                f"expects {dt}{shp} — re-export")
    # atomic republish: a kill mid-savez must not leave a truncated
    # blob that bricks the daemon's next /reload (or any future load)
    dest = os.path.join(out_dir, manifest["consts_file"])
    tmp = dest + ".tmp.npz"  # .npz suffix so savez doesn't append one
    try:
        np.savez(tmp, **{k: _np_storable(v) for k, v in consts.items()})
        os.replace(tmp, dest)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return manifest


class ServeArtifact:
    """Loaded AOT serving artifact: `query(token_ids, rows, k)`.

    Mirrors the live serve fn's contract (pad to the smallest bucket
    ≥ n, top-k over the shipped gallery) without importing any model
    code — `Exported.call` re-stages the serialized StableHLO.
    """

    def __init__(self, out_dir: str, manifest: dict, programs: dict):
        self.dir = out_dir
        self.manifest = manifest
        self.buckets = sorted(int(b) for b in programs)
        self._programs = programs  # bucket -> Exported
        self._calls: dict = {}  # bucket -> jitted Exported.call
        self.names = None
        if manifest.get("names_file"):
            with open(os.path.join(out_dir, manifest["names_file"])) as f:
                self.names = json.load(f)
        self._consts = None
        if manifest.get("consts_file"):
            import jax

            z = np.load(os.path.join(out_dir, manifest["consts_file"]))
            # device-resident once at load — queries upload token ids +
            # rows only, never the weights/gallery blob
            self._consts = jax.device_put([
                _np_restore(z[f"c{i}"], d)
                for i, d in enumerate(manifest["consts_dtypes"])])

    def reload_consts(self) -> None:
        """Re-read the consts sidecar (weights + gallery) from disk and
        swap it in — the live half of `refresh_consts`: after an
        operator re-points the blob at a retrained checkpoint, a
        running daemon picks it up WITHOUT restart or recompile (the
        programs take the consts as arguments, so the jitted calls are
        untouched). The swap is a single attribute assignment; in-flight
        queries finish against the old blob. names.json is re-read too
        in case the gallery row→name map was republished."""
        import jax

        z = np.load(os.path.join(self.dir, self.manifest["consts_file"]))
        dtypes = self.manifest["consts_dtypes"]
        shapes = self.manifest["consts_shapes"]
        if len(z.files) != len(dtypes):
            raise ValueError(
                f"republished blob has {len(z.files)} leaves, programs "
                f"expect {len(dtypes)} — wrong artifact's consts?")
        host = []
        for i, (d, shp) in enumerate(zip(dtypes, shapes)):
            x = _np_restore(z[f"c{i}"], d)
            if list(x.shape) != shp:
                raise ValueError(
                    f"republished const c{i} has shape {list(x.shape)}, "
                    f"programs expect {shp} — re-export instead")
            host.append(x)
        consts = jax.device_put(host)
        if self.manifest.get("names_file"):
            with open(os.path.join(self.dir,
                                   self.manifest["names_file"])) as f:
                names = json.load(f)
            if self.names is not None and len(names) != len(self.names):
                raise ValueError(
                    f"republished names.json has {len(names)} rows, "
                    f"programs expect {len(self.names)} — re-export")
            self.names = names
            if hasattr(self, "_row_map"):
                del self._row_map
        self._consts = consts

    @property
    def k_max(self) -> int:
        return self.manifest["k_max"]

    @property
    def gallery_size(self) -> int:
        return self.manifest["gallery_size"]

    def row_for(self, name: str) -> int:
        """name → gallery row, last-wins on duplicates (the same
        semantics as `evaluate.last_wins_rows` in the live service)."""
        if self.names is None:
            raise ValueError("artifact was exported without gallery_names")
        if not hasattr(self, "_row_map"):
            self._row_map = {n: i for i, n in enumerate(self.names)}
        return self._row_map[name]

    def query(self, token_ids: np.ndarray, rows: Sequence[int],
              k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        token_ids = np.asarray(token_ids, np.int32)
        n = token_ids.shape[0]
        b = next((x for x in self.buckets if x >= n), None)
        if b is None:
            raise ValueError(
                f"batch {n} exceeds the largest exported bucket "
                f"{self.buckets[-1]}; split the request")
        ids = np.zeros((b, token_ids.shape[1]), np.int32)
        ids[:n] = token_ids
        r = np.zeros((b,), np.int32)
        r[:n] = np.asarray(rows, np.int32)
        if b not in self._calls:
            # jit the deserialized program: repeated calls then take the
            # C++ dispatch fast path instead of re-staging Exported.call
            # per query (measured −5-10 ms at b=1 on the v5e tunnel)
            import jax

            self._calls[b] = jax.jit(self._programs[b].call)
        scores, idx = self._calls[b](self._consts, ids, r)
        k = min(k, self.k_max)
        return np.asarray(scores)[:n, :k], np.asarray(idx)[:n, :k]


def load_serve_artifact(out_dir: str, *,
                        allow_platform_mismatch: bool = False
                        ) -> ServeArtifact:
    import jax
    from jax import export as jexport

    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest.get("kind") != "fashionern-serve":
        raise ValueError(f"{out_dir} is not a fashionern serve artifact")
    if (manifest["platform"] != jax.default_backend()
            and not allow_platform_mismatch):
        raise ValueError(
            f"artifact exported for {manifest['platform']!r} but this "
            f"host runs {jax.default_backend()!r}; re-export on the "
            "deploy platform (or pass allow_platform_mismatch=True)")
    programs = {}
    for b, name in manifest["files"].items():
        with open(os.path.join(out_dir, name), "rb") as f:
            programs[int(b)] = jexport.deserialize(f.read())
    return ServeArtifact(out_dir, manifest, programs)
