"""PyTorch-checkpoint → flax-variables conversion for the ERN fusion stack.

Maps the reference's `state_dict()` names (see `models/model.py` /
`models/fusion_model.py`; checkpoints saved at `run/train/train_fiq.py:174-175`)
onto this package's flax module tree. Used both by the golden-parity
tests and by the `fashionern convert` CLI for loading published
reference checkpoints.

Torch `nn.Linear` stores W as [out, in]; flax `Dense` kernels are
[in, out] → transposed here.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(sd: Mapping[str, Any], prefix: str) -> dict:
    return {"kernel": _np(sd[f"{prefix}.weight"]).T, "bias": _np(sd[f"{prefix}.bias"])}


def _ln(sd: Mapping[str, Any], prefix: str) -> tuple[np.ndarray, np.ndarray]:
    return _np(sd[f"{prefix}.weight"]), _np(sd[f"{prefix}.bias"])


def combiner_from_torch(sd: Mapping[str, Any], prefix: str) -> dict:
    """CombinerSimple (`fusion_model.py:58-94`)."""
    return {
        "text_projection": _linear(sd, f"{prefix}.text_projection_layer.0"),
        "image_projection": _linear(sd, f"{prefix}.image_projection_layer.0"),
        "scalar_hidden": _linear(sd, f"{prefix}.dynamic_scalar.0"),
        "scalar_out": _linear(sd, f"{prefix}.dynamic_scalar.3"),
    }


def visual_sr_from_torch(sd: Mapping[str, Any], prefix: str) -> tuple[dict, dict]:
    """VisualSR (`fusion_model.py:97-154`) → (params, batch_stats)."""
    params = {
        "local_dense": _linear(sd, f"{prefix}.embedding_local.0"),
        "global_dense": _linear(sd, f"{prefix}.embedding_global.0"),
        "common_dense": _linear(sd, f"{prefix}.embedding_common"),
        "local_bn": {"bn": {
            "scale": _np(sd[f"{prefix}.embedding_local.1.weight"]),
            "bias": _np(sd[f"{prefix}.embedding_local.1.bias"]),
        }},
        "global_bn": {"bn": {
            "scale": _np(sd[f"{prefix}.embedding_global.1.weight"]),
            "bias": _np(sd[f"{prefix}.embedding_global.1.bias"]),
        }},
    }
    stats = {
        "local_bn": {"bn": {
            "mean": _np(sd[f"{prefix}.embedding_local.1.running_mean"]),
            "var": _np(sd[f"{prefix}.embedding_local.1.running_var"]),
        }},
        "global_bn": {"bn": {
            "mean": _np(sd[f"{prefix}.embedding_global.1.running_mean"]),
            "var": _np(sd[f"{prefix}.embedding_global.1.running_var"]),
        }},
    }
    return params, stats


def mha_from_torch(sd: Mapping[str, Any], prefix: str) -> dict:
    """torch nn.MultiheadAttention (`fusion_model.py:18-20`)."""
    return {
        "in_proj_weight": _np(sd[f"{prefix}.in_proj_weight"]),
        "in_proj_bias": _np(sd[f"{prefix}.in_proj_bias"]),
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }


def bert_from_torch(sd: Mapping[str, Any], prefix: str, layers: int) -> dict:
    """HF BertModel inside EncoderModel (`fusion_model.py:157-177`)."""
    emb_scale, emb_bias = _ln(sd, f"{prefix}.embeddings.LayerNorm")
    out = {
        "position_embeddings": _np(sd[f"{prefix}.embeddings.position_embeddings.weight"]),
        "token_type_embeddings": _np(sd[f"{prefix}.embeddings.token_type_embeddings.weight"]),
        "emb_ln_scale": emb_scale,
        "emb_ln_bias": emb_bias,
        "pooler": _linear(sd, f"{prefix}.pooler.dense"),
    }
    for i in range(layers):
        lp = f"{prefix}.encoder.layer.{i}"
        attn_scale, attn_bias = _ln(sd, f"{lp}.attention.output.LayerNorm")
        out_scale, out_bias = _ln(sd, f"{lp}.output.LayerNorm")
        out[f"layer_{i}"] = {
            "query": _linear(sd, f"{lp}.attention.self.query"),
            "key": _linear(sd, f"{lp}.attention.self.key"),
            "value": _linear(sd, f"{lp}.attention.self.value"),
            "attn_output": _linear(sd, f"{lp}.attention.output.dense"),
            "intermediate": _linear(sd, f"{lp}.intermediate.dense"),
            "output": _linear(sd, f"{lp}.output.dense"),
            "attn_ln_scale": attn_scale,
            "attn_ln_bias": attn_bias,
            "output_ln_scale": out_scale,
            "output_ln_bias": out_bias,
        }
    return out


def plus_model_from_torch(sd: Mapping[str, Any], prefix: str, layers: int = 2) -> dict:
    feature_dim = _np(sd[f"{prefix}.bert_encoder.bert_model.pooler.dense.bias"]).shape[0]
    cls_key = f"{prefix}.cls_token"
    # `nn.Parameter(...).to(device)` (`fusion_model.py:185`) silently
    # de-registers cls_token on CUDA — absent from such checkpoints.
    cls = _np(sd[cls_key]) if cls_key in sd else np.zeros((1, 1, feature_dim), np.float32)
    return {
        "cls_token": cls,
        "bert": bert_from_torch(sd, f"{prefix}.bert_encoder.bert_model", layers),
    }


def dvr_from_torch(sd: Mapping[str, Any], prefix: str) -> tuple[dict, dict]:
    sr_params, sr_stats = visual_sr_from_torch(sd, f"{prefix}.SR_module")
    params = {
        "transformer_layer": plus_model_from_torch(sd, f"{prefix}.transformer_layer", layers=2),
        "mr": mha_from_torch(sd, f"{prefix}.MR_component"),
        "sr": sr_params,
        "combiner_global": combiner_from_torch(sd, f"{prefix}.combiner_global"),
        "combiner_local": combiner_from_torch(sd, f"{prefix}.combiner_local"),
        "combiner": combiner_from_torch(sd, f"{prefix}.combiner"),
    }
    stats = {"sr": sr_stats}
    return params, stats


def ern_variables_from_torch(sd: Mapping[str, Any]) -> dict:
    """Full reference-ERN state_dict → flax variables for `ERN`.

    Skips the frozen CLIP wrappers (`image_clip.*` / `text_clip.*`),
    which are converted separately by models.clip.convert.
    """
    dvr_params, dvr_stats = dvr_from_torch(sd, "DVR")
    tgt_sr_params, tgt_sr_stats = visual_sr_from_torch(sd, "SR_module")
    params = {
        "DVR": dvr_params,
        "SR_module": tgt_sr_params,
        "Combiner_module": combiner_from_torch(sd, "Combiner_module"),
    }
    stats = {"DVR": dvr_stats, "SR_module": tgt_sr_stats}
    return {"params": params, "batch_stats": stats}
