"""Comparison-model zoo (reference `models/others/`, SURVEY §2.8).

Fusion modules from competing CIR papers kept for ablation — none is on
the reference's main path (no run script imports them). Each flax
module ships a `*_from_torch` state-dict converter for golden parity.

Registry: `get_zoo_model(name, **kw)`.
"""

from fashionern_aaai2024_tpu.models.zoo.combiner import (
    AttentionPooling,
    Clip4CirCombiner,
    VTFModule,
    attention_pooling_from_torch,
    combiner_from_torch,
    vtf_from_torch,
)
from fashionern_aaai2024_tpu.models.zoo.cala import (
    TwinAttentionCompositor,
    cala_from_torch,
)
from fashionern_aaai2024_tpu.models.zoo.artemis import Artemis, artemis_from_torch
from fashionern_aaai2024_tpu.models.zoo.dqu_cir import DQUCIRHead, dqu_cir_from_torch
from fashionern_aaai2024_tpu.models.zoo.amc import (
    AMCEnsemble,
    AMCInteractionModule,
    amc_interaction_from_torch,
)
from fashionern_aaai2024_tpu.models.zoo.compodiff import (
    CompoDiffNetwork,
    CrossTransformer,
)

_ZOO = {
    "clip4cir_combiner": Clip4CirCombiner,
    "vtf": VTFModule,
    "attention_pooling": AttentionPooling,
    "cala": TwinAttentionCompositor,
    "artemis": Artemis,
    "dqu_cir": DQUCIRHead,
    "amc": AMCInteractionModule,
    "amc_ensemble": AMCEnsemble,
    "compodiff": CompoDiffNetwork,
}


def get_zoo_model(name: str, **kwargs):
    if name not in _ZOO:
        raise ValueError(f"unknown zoo model {name!r}; available: {sorted(_ZOO)}")
    return _ZOO[name](**kwargs)
