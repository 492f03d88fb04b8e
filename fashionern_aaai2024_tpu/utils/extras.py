"""Remaining reference utilities (`utils/utils.py`, SURVEY §2.7).

Ports of the helpers no run script uses but the toolbox ships:
  * `concat_global_local_feats` (`utils.py:32-41`)
  * `element_wise_sum` — baseline fusion (`utils.py:133-140`)
  * `cutout` — CutoutPIL augmentation (`utils.py:201-220`), numpy RNG
    instead of global `np.random` for deterministic pipelines
  * `EmaState` — functional ModelEma (`utils.py:223-248`); the
    reference class is broken (touches `model.text_clip/.combiner/
    .visual_attn` which don't exist on ERN) — here it's a plain
    exponential moving average over any param pytree
  * `setup_seed` equivalent is PRNGKey discipline; a convenience
    seeding helper is provided for host-side RNG only.
"""

from __future__ import annotations

import random as _random
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


def concat_global_local_feats(global_feats, local_feats):
    """[B, d] + [B, P, d] → [B, P+1, d], global first."""
    return jnp.concatenate([global_feats[:, None, :], local_feats], axis=1)


def element_wise_sum(image_features, text_features):
    """Normalized element-wise sum — the no-parameter fusion baseline."""
    s = image_features + text_features
    return s / jnp.maximum(jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-12)


def cutout(image, cutout_factor: float = 0.5, rng: np.random.Generator | None = None):
    """CutoutPIL: paint a random rectangle with a random color. `image`
    is a PIL image, modified in place and returned (reference semantics,
    incl. the w/h swap quirk of using `size[0]` as "h")."""
    from PIL import ImageDraw

    g = rng if rng is not None else np.random.default_rng()
    draw = ImageDraw.Draw(image)
    h, w = image.size[0], image.size[1]
    h_cut = int(cutout_factor * h + 0.5)
    w_cut = int(cutout_factor * w + 0.5)
    y_c = int(g.integers(h))
    x_c = int(g.integers(w))
    y1, y2 = np.clip(y_c - h_cut // 2, 0, h), np.clip(y_c + h_cut // 2, 0, h)
    x1, x2 = np.clip(x_c - w_cut // 2, 0, w), np.clip(x_c + w_cut // 2, 0, w)
    fill = tuple(int(v) for v in g.integers(0, 256, 3))
    draw.rectangle([int(x1), int(y1), int(x2), int(y2)], fill=fill)
    return image


class EmaState(flax.struct.PyTreeNode):
    """Functional parameter EMA: `ema ← decay·ema + (1-decay)·params`."""

    params: Any
    decay: float = flax.struct.field(pytree_node=False, default=0.9997)

    @classmethod
    def create(cls, params: Any, decay: float = 0.9997) -> "EmaState":
        return cls(params=jax.tree_util.tree_map(jnp.asarray, params), decay=decay)

    def update(self, params: Any) -> "EmaState":
        new = jax.tree_util.tree_map(
            lambda e, p: self.decay * e + (1.0 - self.decay) * p, self.params, params
        )
        return self.replace(params=new)

    def set(self, params: Any) -> "EmaState":
        return self.replace(params=jax.tree_util.tree_map(jnp.asarray, params))


def setup_host_seed(seed: int = 42) -> np.random.Generator:
    """Seeds the host-side RNGs the data pipeline may touch (reference
    `setup_seed`, `utils/utils.py:15-19`). Device randomness stays under
    explicit `jax.random.PRNGKey`s."""
    _random.seed(seed)
    np.random.seed(seed)
    return np.random.default_rng(seed)
