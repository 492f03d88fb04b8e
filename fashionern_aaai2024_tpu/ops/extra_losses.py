"""The reference's ablation-loss toolbox (`losses/others/`), as pure
jnp functions behind a registry.

None of these is imported by any reference run script (verified in
SURVEY §2.2) — BBC (`ops.losses`) is the only load-bearing loss. They
are kept for ablation/comparison parity:

  * ce            — plain cross-entropy (`losses/others/ce_loss.py:5-14`)
  * rank          — NLL with a confidence-band ignore mask
                    (`losses/others/rank_loss.py:6-29`)
  * cyclip        — CLIP contrastive + in-modal/cross-modal cyclic
                    consistency (`losses/others/cyclip_loss.py:5-39`)
  * text_relevance— contrastive + FIFO memory bank of detached
                    query/doc features
                    (`losses/others/text_relevance_loss.py:6-59`)

Deviation (documented): the reference's memory-bank enqueue rotates
rows with a self-copying pattern whose only load-bearing property is
*newest batch at rows [0, B)* (its labels are `arange(B)` against the
bank). Here the bank is `concat(new, old)[:K]` — same property, pure
functional update (`TextRelevanceBank` is carried in the train state).

`text_generation` (caption reconstruction via an external generation
model, `losses/others/generation_loss.py:5-27`) takes the external LM
as a callable; no LM is bundled.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import flax.struct
import jax
import jax.numpy as jnp

LOGIT_SCALE_INIT = float(jnp.log(1.0 / 0.07))


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """`nn.CrossEntropyLoss()` over int labels."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray, topk=(1,)) -> list:
    """Top-k accuracy (%), reference `accuracy` util
    (`losses/others/ce_loss.py:17-30`)."""
    maxk = max(topk)
    _, pred = jax.lax.top_k(logits, maxk)          # [B, maxk]
    correct = pred == labels[:, None]
    return [100.0 * jnp.mean(jnp.any(correct[:, :k], axis=1).astype(jnp.float32))
            for k in topk]


def rank_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    margin_pos: float = 1.0,
    margin_neg: float = 0.0,
    weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """NLL over log-softmax with rows ignored when the class-1
    probability leaves the (margin_neg, margin_pos) confidence band
    (`rank_loss.py:16-29`, the active — uncommented — mask)."""
    logp = jax.nn.log_softmax(inputs.astype(jnp.float32), axis=-1)
    prob1 = jax.lax.stop_gradient(jnp.exp(logp))[:, 1]
    ignore = ((prob1 > margin_pos) | (prob1 < margin_neg)).astype(jnp.float32)
    masked_logp = (1.0 - ignore)[:, None] * logp
    picked = jnp.take_along_axis(masked_logp, targets[:, None], axis=-1)[:, 0]
    if weight is not None:
        w = weight[targets]
        return -jnp.sum(w * picked) / jnp.sum(w)
    return -jnp.mean(picked)


def cyclip_loss(
    image_emb: jnp.ndarray,
    text_emb: jnp.ndarray,
    logit_scale: jnp.ndarray,
    cylambda1: float = 0.25,
    cylambda2: float = 0.25,
) -> jnp.ndarray:
    """CLIP contrastive + cyclic consistency (`cyclip_loss.py:16-39`).
    `logit_scale` is the learnable log-temperature (init log(1/0.07))."""
    b = image_emb.shape[0]
    labels = jnp.arange(b)
    s = logit_scale
    l_it = s * image_emb @ text_emb.T
    l_ti = s * text_emb @ image_emb.T
    l_ii = s * image_emb @ image_emb.T
    l_tt = s * text_emb @ text_emb.T
    contrastive = (cross_entropy_loss(l_it, labels) + cross_entropy_loss(l_ti, labels)) / 2
    crossmodal = jnp.mean((l_ti - l_it) ** 2) / (s * s) * b
    inmodal = jnp.mean((l_ii - l_tt) ** 2) / (s * s) * b
    return contrastive + cylambda1 * inmodal + cylambda2 * crossmodal


class TextRelevanceBank(flax.struct.PyTreeNode):
    """FIFO feature bank, newest rows first. `size` counts valid rows."""

    query: jnp.ndarray   # [K, d]
    doc: jnp.ndarray     # [K, d]
    size: jnp.ndarray    # scalar int32

    @classmethod
    def create(cls, capacity: int, dim: int) -> "TextRelevanceBank":
        return cls(
            query=jnp.zeros((capacity, dim), jnp.float32),
            doc=jnp.zeros((capacity, dim), jnp.float32),
            size=jnp.zeros((), jnp.int32),
        )


def text_relevance_loss(
    bank: TextRelevanceBank,
    image_emb: jnp.ndarray,
    text_emb: jnp.ndarray,
    logit_scale: jnp.ndarray,
) -> tuple[jnp.ndarray, TextRelevanceBank]:
    """Contrastive + memory-bank loss (`text_relevance_loss.py:44-59`).
    Returns (loss, updated bank). Invalid (not-yet-filled) bank rows are
    masked out of the logits."""
    b, d = image_emb.shape
    k = bank.query.shape[0]
    labels = jnp.arange(b)
    s = logit_scale

    l_it = s * image_emb @ text_emb.T
    l_ti = s * text_emb @ image_emb.T
    loss_img = cross_entropy_loss(l_it, labels)
    loss_txt = cross_entropy_loss(l_ti, labels)

    new_query = jnp.concatenate([jax.lax.stop_gradient(image_emb), bank.query])[:k]
    new_doc = jnp.concatenate([jax.lax.stop_gradient(text_emb), bank.doc])[:k]
    new_size = jnp.minimum(bank.size + b, k)
    new_bank = TextRelevanceBank(query=new_query, doc=new_doc, size=new_size)

    valid = jnp.arange(k) < new_size                # newest b rows always valid
    neg_mask = jnp.where(valid, 0.0, -1e30)[None, :]
    l1 = s * image_emb @ new_doc.T + neg_mask
    l2 = s * text_emb @ new_query.T + neg_mask
    loss_1 = cross_entropy_loss(l1, labels)
    loss_2 = cross_entropy_loss(l2, labels)
    return (loss_img + loss_txt + loss_1 + loss_2) / 4.0, new_bank


def text_generation_loss(
    generation_model: Callable,
    text_input: dict,
    fusion_emb: jnp.ndarray,
) -> jnp.ndarray:
    """Caption-reconstruction loss through an externally supplied
    encoder-conditioned LM (`generation_loss.py:12-27`): the model is
    called with the tokenized caption as both input and labels, and the
    fusion embedding as a single encoder hidden state."""
    return generation_model(
        input_ids=text_input["input_ids"],
        token_type_ids=text_input.get("token_type_ids"),
        attention_mask=text_input.get("attention_mask"),
        encoder_hidden_states=fusion_emb[:, None, :],
        labels=text_input["input_ids"],
    )


@dataclasses.dataclass(frozen=True)
class LossSpec:
    name: str
    fn: Callable
    stateful: bool = False
    notes: str = ""


def _bbc(*args, **kwargs):
    from fashionern_aaai2024_tpu.ops.losses import batch_based_classification_loss

    return batch_based_classification_loss(*args, **kwargs)


LOSS_REGISTRY: dict[str, LossSpec] = {
    "bbc": LossSpec("bbc", _bbc, notes="main-path loss (losses/loss.py:6-14)"),
    "ce": LossSpec("ce", cross_entropy_loss),
    "rank": LossSpec("rank", rank_loss),
    "cyclip": LossSpec("cyclip", cyclip_loss),
    "text_relevance": LossSpec("text_relevance", text_relevance_loss, stateful=True),
    "text_generation": LossSpec(
        "text_generation", text_generation_loss,
        notes="requires an external generation model",
    ),
}


def get_loss(name: str) -> LossSpec:
    if name not in LOSS_REGISTRY:
        raise ValueError(f"unknown loss {name!r}; available: {sorted(LOSS_REGISTRY)}")
    return LOSS_REGISTRY[name]
