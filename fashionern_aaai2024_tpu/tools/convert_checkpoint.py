"""Convert reference PyTorch checkpoints into Orbax parameter trees.

Reference checkpoint format (`run/test/test_fiq.py:142-149`): eval loads
TWO files — a fine-tuned CLIP under `saved_state_dict["CLIP"]` and a
fusion (ERN) `state_dict`. This tool converts either into the JAX
variable layout via the key-mapped converters
(`models/clip/convert.py`, `models/ern/convert.py`) and saves with
Orbax, so eval never needs torch at run time.
"""

from __future__ import annotations

from typing import Any


def load_torch_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "CLIP" in sd:
        sd = sd["CLIP"]
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return sd


def convert_clip(path: str, clip_model_name: str, out: str) -> dict:
    from fashionern_aaai2024_tpu.models.clip.config import get_clip_config
    from fashionern_aaai2024_tpu.models.clip.convert import clip_variables_from_torch
    from fashionern_aaai2024_tpu.train.checkpoint import save_params

    variables = clip_variables_from_torch(
        load_torch_state_dict(path), get_clip_config(clip_model_name)
    )
    save_params(out, variables)
    return variables


def convert_ern(path: str, out: str) -> dict:
    from fashionern_aaai2024_tpu.models.ern.convert import ern_variables_from_torch
    from fashionern_aaai2024_tpu.train.checkpoint import save_params

    variables = ern_variables_from_torch(load_torch_state_dict(path))
    save_params(out, variables)
    return variables


def convert(path: str, out: str, *, kind: str, clip_model_name: str = "RN50x4") -> Any:
    if kind == "clip":
        return convert_clip(path, clip_model_name, out)
    if kind == "ern":
        return convert_ern(path, out)
    raise ValueError(f"kind must be 'clip' or 'ern', got {kind!r}")
