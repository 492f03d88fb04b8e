"""open_clip/OpenAI CLIP checkpoint → flax variables.

Handles the state_dict layout the reference loads at eval time
(`run/test/test_fiq.py:142-146`: `saved_state_dict["CLIP"]`), i.e.
open_clip `CLIP` module names, for both the ViT-B-16 and RN50x4 towers.

torch Conv2d weights [O, I, kH, kW] → flax HWIO [kH, kW, I, O];
torch Linear [O, I] → flax [I, O]; BatchNorm running stats go to the
`batch_stats` collection.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from fashionern_aaai2024_tpu.models.clip.config import CLIPConfig


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).T, "bias": _np(sd[f"{prefix}.bias"])}


def _conv(sd, key):
    return {"kernel": _np(sd[key]).transpose(2, 3, 1, 0)}


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _bn(sd, prefix):
    params = {"bn": {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}}
    stats = {"bn": {"mean": _np(sd[f"{prefix}.running_mean"]), "var": _np(sd[f"{prefix}.running_var"])}}
    return params, stats


def _resblock(sd, prefix):
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "in_proj_weight": _np(sd[f"{prefix}.attn.in_proj_weight"]),
        "in_proj_bias": _np(sd[f"{prefix}.attn.in_proj_bias"]),
        "out_proj": _linear(sd, f"{prefix}.attn.out_proj"),
        "c_fc": _linear(sd, f"{prefix}.mlp.c_fc"),
        "c_proj": _linear(sd, f"{prefix}.mlp.c_proj"),
    }


def _transformer(sd, prefix, layers):
    return {f"resblock_{i}": _resblock(sd, f"{prefix}.resblocks.{i}") for i in range(layers)}


def _vit_tower(sd, cfg: CLIPConfig):
    v = cfg.vision
    return {
        "conv1": _conv(sd, "visual.conv1.weight"),
        "class_embedding": _np(sd["visual.class_embedding"]),
        "positional_embedding": _np(sd["visual.positional_embedding"]),
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "transformer": _transformer(sd, "visual.transformer", v.layers),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": _np(sd["visual.proj"]),
    }


def _resnet_tower(sd, cfg: CLIPConfig):
    v = cfg.vision
    params: dict = {}
    stats: dict = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = _conv(sd, f"visual.conv{i}.weight")
        params[f"bn{i}"], stats[f"bn{i}"] = _bn(sd, f"visual.bn{i}")
    for stage_idx, blocks in enumerate(v.layers):
        for j in range(blocks):
            tp = f"visual.layer{stage_idx + 1}.{j}"
            name = f"layer{stage_idx + 1}_{j}"
            bp: dict = {}
            bs: dict = {}
            for i in (1, 2, 3):
                bp[f"conv{i}"] = _conv(sd, f"{tp}.conv{i}.weight")
                bp[f"bn{i}"], bs[f"bn{i}"] = _bn(sd, f"{tp}.bn{i}")
            if f"{tp}.downsample.0.weight" in sd:
                bp["downsample_conv"] = _conv(sd, f"{tp}.downsample.0.weight")
                bp["downsample_bn"], bs["downsample_bn"] = _bn(sd, f"{tp}.downsample.1")
            params[name] = bp
            stats[name] = bs
    params["attnpool"] = {
        "positional_embedding": _np(sd["visual.attnpool.positional_embedding"]),
        "q_proj": _linear(sd, "visual.attnpool.q_proj"),
        "k_proj": _linear(sd, "visual.attnpool.k_proj"),
        "v_proj": _linear(sd, "visual.attnpool.v_proj"),
        "c_proj": _linear(sd, "visual.attnpool.c_proj"),
    }
    return params, stats


def _text_tower(sd, cfg: CLIPConfig):
    t = cfg.text
    return {
        "token_embedding": _np(sd["token_embedding.weight"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "transformer": _transformer(sd, "transformer", t.layers),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _np(sd["text_projection"]),
    }


# state_dict entries that are buffers/metadata, not convertible weights:
# BN step counters, causal-mask buffers, and the size ints OpenAI's jit
# checkpoints carry.
_IGNORABLE_SUFFIXES = (".num_batches_tracked",)
_IGNORABLE_KEYS = frozenset(
    {"attn_mask", "context_length", "vocab_size", "input_resolution",
     "visual.attn_mask", "transformer.attn_mask"}
)


def _is_ignorable(key: str) -> bool:
    return key.endswith(_IGNORABLE_SUFFIXES) or key in _IGNORABLE_KEYS


class _TrackingDict:
    """Records which state_dict keys the converter consumed, so unknown
    leftovers (a key-mapping gap) fail loudly instead of silently
    shipping a partially-random model."""

    def __init__(self, sd: Mapping[str, Any]):
        self._sd = sd
        self.used: set[str] = set()

    def __getitem__(self, key: str) -> Any:
        self.used.add(key)
        return self._sd[key]

    def __contains__(self, key: str) -> bool:
        return key in self._sd

    def unconsumed(self) -> list[str]:
        return sorted(
            k for k in self._sd
            if k not in self.used and not _is_ignorable(k)
        )


def clip_variables_from_torch(
    sd: Mapping[str, Any], cfg: CLIPConfig, strict: bool = True
) -> dict:
    """Full open_clip state_dict → `{"params": ..., "batch_stats": ...}`.

    strict=True (default) raises on state_dict keys the converter does
    not consume (ignoring BN counters / mask buffers), the failure mode
    the reference would hit as a `load_state_dict` error
    (`run/test/test_fiq.py:142-146`). Missing keys raise KeyError."""
    sd = _TrackingDict({k.removeprefix("module."): v for k, v in sd.items()})
    variables: dict = {"params": {}, "batch_stats": {}}
    if cfg.vision.kind == "vit":
        variables["params"]["visual"] = _vit_tower(sd, cfg)
    else:
        vp, vs = _resnet_tower(sd, cfg)
        variables["params"]["visual"] = vp
        variables["batch_stats"]["visual"] = vs
    variables["params"]["text"] = _text_tower(sd, cfg)
    variables["params"]["logit_scale"] = _np(sd["logit_scale"]).reshape(())
    if not variables["batch_stats"]:
        variables.pop("batch_stats")
    leftovers = sd.unconsumed()
    if leftovers:
        msg = (
            f"{len(leftovers)} state_dict key(s) not consumed converting "
            f"{cfg.name}: {leftovers[:20]}"
            + (" ..." if len(leftovers) > 20 else "")
        )
        if strict:
            raise ValueError(
                msg + " — pass strict=False to ignore (NOT recommended: "
                "these weights would be silently dropped)"
            )
        import warnings

        warnings.warn(msg, stacklevel=2)
    return variables
