"""Full-size (real ViT-B-16 / RN50x4 shape) checkpoint-conversion parity.

Round-1 gap: golden conversion was only exercised at D=24 2-layer
configs, so a key-mapping or accumulation-order surprise at real scale
was invisible. Here:

* a committed key+shape manifest of the open_clip state_dict for both
  backbones (`tests/fixtures/clip_state_dict_manifest_*.json`) is pinned
  against the torch oracle built at the real configs;
* the converter must consume EVERY manifest key (strict mode) and its
  output tree must match the flax model's init tree shape-for-shape;
* (slow) full forward e2e parity: random full-size weights, converted,
  torch vs JAX image/text features allclose + identical retrieval
  ordering — the `saved_state_dict["CLIP"]` load path of
  `/root/reference/run/test/test_fiq.py:142-149` at real scale.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from fashionern_aaai2024_tpu.models.clip import config as clip_config
from fashionern_aaai2024_tpu.models.clip.convert import clip_variables_from_torch
from fashionern_aaai2024_tpu.models.clip.model import CLIP
from tests.torch_clip_reference import (
    CLIPTorch, ModifiedResNetTorch, VisionTransformerTorch,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def build_fullsize_torch(name: str) -> CLIPTorch:
    cfg = clip_config.get_clip_config(name)
    v, t = cfg.vision, cfg.text
    torch.manual_seed(0)
    if v.kind == "vit":
        vision = VisionTransformerTorch(
            v.image_size, v.patch_size, v.width, v.layers, v.heads,
            v.embed_dim, torch.nn.GELU(),
        )
    else:
        vision = ModifiedResNetTorch(
            list(v.layers), v.embed_dim, v.heads, v.image_size, v.width,
        )
    return CLIPTorch(
        vision,
        dict(vocab=t.vocab_size, ctx=t.context_length, width=t.width,
             heads=t.heads, layers=t.layers, embed_dim=t.embed_dim,
             act=torch.nn.GELU()),
    ).eval()


def _manifest_path(name: str) -> str:
    return os.path.join(
        FIXTURES, f"clip_state_dict_manifest_{name.lower().replace('-', '')}.json"
    )


@pytest.mark.parametrize("name", ["ViT-B-16", "RN50x4"])
class TestFullSizeConverter:
    def test_manifest_pins_state_dict(self, name):
        """The committed manifest IS the open_clip key/shape contract;
        the oracle at real config must match it exactly."""
        with open(_manifest_path(name)) as f:
            manifest = json.load(f)
        sd = build_fullsize_torch(name).state_dict()
        got = {k: list(v.shape) for k, v in sd.items()}
        assert got == manifest

    def test_converter_consumes_manifest_completely(self, name):
        """strict conversion of the full-size state_dict: no unconsumed
        keys, and the output tree matches the flax init tree
        shape-for-shape (via jax.eval_shape — no FLOPs)."""
        cfg = clip_config.get_clip_config(name)
        sd = build_fullsize_torch(name).state_dict()
        variables = clip_variables_from_torch(sd, cfg)  # strict=True

        model = CLIP(cfg)
        v = cfg.vision
        init_shapes = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, v.image_size, v.image_size, 3), jnp.float32),
                jnp.zeros((1, cfg.text.context_length), jnp.int32),
            )
        )
        want = jax.tree_util.tree_map_with_path(
            lambda p, x: (jax.tree_util.keystr(p), tuple(x.shape)), init_shapes
        )
        got = jax.tree_util.tree_map_with_path(
            lambda p, x: (jax.tree_util.keystr(p), tuple(np.shape(x))), variables
        )
        want_flat = sorted(jax.tree_util.tree_leaves(want, is_leaf=lambda x: isinstance(x, tuple) and isinstance(x[0], str)))
        got_flat = sorted(jax.tree_util.tree_leaves(got, is_leaf=lambda x: isinstance(x, tuple) and isinstance(x[0], str)))
        assert got_flat == want_flat

    def test_strict_rejects_unknown_keys(self, name):
        cfg = clip_config.get_clip_config(name)
        sd = dict(build_fullsize_torch(name).state_dict())
        sd["new_text_projection"] = torch.zeros(4, 4)  # TME-fork leftover
        with pytest.raises(ValueError, match="not consumed"):
            clip_variables_from_torch(sd, cfg)
        # and the escape hatch only warns
        with pytest.warns(UserWarning, match="not consumed"):
            clip_variables_from_torch(sd, cfg, strict=False)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["ViT-B-16", "RN50x4"])
class TestFullSizeForwardParity:
    def test_e2e_forward_and_ranking(self, name):
        cfg = clip_config.get_clip_config(name)
        tclip = build_fullsize_torch(name)
        variables = clip_variables_from_torch(tclip.state_dict(), cfg)
        model = CLIP(cfg)

        g = np.random.default_rng(11)
        n_gallery, n_q = 6, 3
        v = cfg.vision
        images = g.random((n_gallery, v.image_size, v.image_size, 3),
                          dtype=np.float32)
        ids = g.integers(1, cfg.text.vocab_size - 1,
                         (n_q, cfg.text.context_length))
        ids[:, -1] = cfg.text.vocab_size - 1  # max id -> argmax = EOT slot
        ids = ids.astype(np.int32)

        with torch.no_grad():
            timg = torch.tensor(images.transpose(0, 3, 1, 2))
            if v.kind == "vit":
                want_img, _ = tclip.visual(timg)
            else:
                want_img = tclip.visual(timg)
            want_txt, want_seq = tclip.encode_text(
                torch.tensor(ids.astype(np.int64)))
        want_img, want_txt = np.asarray(want_img), np.asarray(want_txt)

        got_img = model.apply(variables, jnp.asarray(images),
                              method=model.encode_image)[0]
        got_txt, got_seq = model.apply(variables, jnp.asarray(ids),
                                       method=model.encode_text)
        got_img, got_txt = np.asarray(got_img), np.asarray(got_txt)

        # feature-level agreement at real depth/width (fp32 towers,
        # highest matmul precision per conftest)
        np.testing.assert_allclose(got_img, want_img, atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(got_txt, want_txt, atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(got_seq), np.asarray(want_seq), atol=2e-3, rtol=1e-3
        )

        # rank-level agreement on the retrieval matmul
        def norm(x):
            return x / np.linalg.norm(x, axis=-1, keepdims=True)

        want_order = np.argsort(-norm(want_txt) @ norm(want_img).T, axis=-1)
        got_order = np.argsort(-norm(got_txt) @ norm(got_img).T, axis=-1)
        np.testing.assert_array_equal(got_order, want_order)
