"""The ERN fusion stack (trainable part of the model).

Re-design of reference `models/fusion_model.py` for TPU: flax modules
whose attention / layernorm sites lower to the fused Pallas kernels in
`ops/`, with exact eval-time numerical parity to the PyTorch modules
(verified in tests/test_ern_parity.py against the reference code run
under torch).

Components (reference lines):
  CombinerSimple  — gated residual mix            (`fusion_model.py:58-94`)
  VisualSR        — patch attention pooling       (`fusion_model.py:97-154`)
  BertEncoder     — HF-BertModel-semantics mini transformer
                                                  (`fusion_model.py:157-177`)
  PlusModel       — [CLS] + 13 img + 77 text fused sequence
                                                  (`fusion_model.py:180-216`)
  DVRModule       — dual-view refinement fusion   (`fusion_model.py:8-55`)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from fashionern_aaai2024_tpu.models.ern.layers import (
    TorchBatchNorm,
    TorchMultiheadAttention,
    sr_l2norm,
    torch_normalize,
    xavier_uniform,
)
from fashionern_aaai2024_tpu.models.clip.transformer import (
    # nn.Dense-compatible param holder (kernel [in,out] lecun + zeros
    # bias — identical checkpoint tree, raw kernels accessible for
    # packed-QKV fusion); shared with the CLIP towers
    _DenseParams as _BertDense,
)
from fashionern_aaai2024_tpu.ops.attention import (
    fused_qkv_self_attention, multi_head_attention,
)
from fashionern_aaai2024_tpu.ops.layernorm import layer_norm

# HF BertConfig defaults that the reference inherits implicitly by only
# overriding hidden_size/heads/layers (`fusion_model.py:162-170`):
# intermediate_size stays 3072 regardless of hidden size.
BERT_INTERMEDIATE = 3072
BERT_LN_EPS = 1e-12
BERT_DROPOUT = 0.1


class CombinerSimple(nn.Module):
    """σ-gated residual mix of an image and a text feature.

    out = σ·text + (1−σ)·image, L2-normalized;
    σ = MLP(concat(proj_text, proj_image)) with ReLU+Dropout(0.5) projections.
    """

    feature_dim: int

    @nn.compact
    def __call__(self, image_features, text_features, *, deterministic: bool = True):
        proj_dim = self.feature_dim * 4
        hidden_dim = self.feature_dim * 8

        def project(x, name):
            x = nn.Dense(proj_dim, name=name)(x)
            x = nn.relu(x)
            return nn.Dropout(0.5, deterministic=deterministic)(x)

        text_p = project(text_features, "text_projection")
        image_p = project(image_features, "image_projection")
        cat = jnp.concatenate([text_p, image_p], axis=-1)
        h = nn.relu(nn.Dense(hidden_dim, name="scalar_hidden")(cat))
        h = nn.Dropout(0.5, deterministic=deterministic)(h)
        sigma = nn.sigmoid(nn.Dense(1, name="scalar_out")(h))
        out = sigma * text_features + (1.0 - sigma) * image_features
        return torch_normalize(out, axis=-1)


class VisualSR(nn.Module):
    """Self-attention pooling of patch embeddings → one global embedding.

    Quirk preserved deliberately: the local branch's BatchNorm normalizes
    over the *patch* axis (num_features = num_region = 13), not the
    feature axis — `fusion_model.py:108-110`.
    """

    embed_dim: int
    num_region: int = 13
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, local_feature, *, deterministic: bool = True):
        raw_global = jnp.mean(local_feature, axis=1)  # [B, d]

        l_emb = nn.Dense(self.embed_dim, kernel_init=xavier_uniform, name="local_dense")(
            local_feature
        )
        l_emb = TorchBatchNorm(self.num_region, feature_axis=1, name="local_bn")(
            l_emb, use_running_average=deterministic
        )
        l_emb = jnp.tanh(l_emb)
        l_emb = nn.Dropout(self.dropout_rate, deterministic=deterministic)(l_emb)

        g_emb = nn.Dense(self.embed_dim, kernel_init=xavier_uniform, name="global_dense")(
            raw_global
        )
        g_emb = TorchBatchNorm(self.embed_dim, feature_axis=-1, name="global_bn")(
            g_emb, use_running_average=deterministic
        )
        g_emb = jnp.tanh(g_emb)
        g_emb = nn.Dropout(self.dropout_rate, deterministic=deterministic)(g_emb)

        common = l_emb * g_emb[:, None, :]
        logits = nn.Dense(1, kernel_init=xavier_uniform, name="common_dense")(common)[..., 0]
        weights = jax.nn.softmax(logits, axis=1)  # over patches
        new_global = jnp.sum(weights[..., None] * local_feature, axis=1)
        return sr_l2norm(new_global)




class BertLayer(nn.Module):
    hidden: int
    heads: int

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        d, h = self.hidden, self.heads
        head_dim = d // h
        b, s, _ = x.shape

        # separate q/k/v param trees (HF BertSelfAttention layout) whose
        # kernels concatenate into one packed projection at eval
        wq, bq = _BertDense(d, d, name="query")()
        wk, bk = _BertDense(d, d, name="key")()
        wv, bv = _BertDense(d, d, name="value")()
        if deterministic:
            # dropout off → the packed-QKV tier applies: one projection
            # matmul, heads sliced in VMEM (fp32-exact Pallas kernel at
            # dh=64 on TPU, identical XLA formula elsewhere) — the
            # [B,H,S,Dh] operand layout never materializes
            w_qkv = jnp.concatenate([wq, wk, wv], axis=1)
            b_qkv = jnp.concatenate([bq, bk, bv])
            ctx = fused_qkv_self_attention(x, w_qkv, b_qkv, h)
        else:
            def split_heads(t):
                return t.reshape(b, s, h, head_dim).transpose(0, 2, 1, 3)

            q = split_heads(x @ wq + bq)
            k = split_heads(x @ wk + bk)
            v = split_heads(x @ wv + bv)
            ctx = multi_head_attention(
                q, k, v,
                dropout_rate=BERT_DROPOUT,
                dropout_rng=self.make_rng("dropout"),
            )
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, d)
        attn_out = nn.Dense(d, name="attn_output")(ctx)
        attn_out = nn.Dropout(BERT_DROPOUT, deterministic=deterministic)(attn_out)
        x = self._ln(x + attn_out, "attn_ln")

        inter = jax.nn.gelu(nn.Dense(BERT_INTERMEDIATE, name="intermediate")(x), approximate=False)
        out = nn.Dense(d, name="output")(inter)
        out = nn.Dropout(BERT_DROPOUT, deterministic=deterministic)(out)
        return self._ln(x + out, "output_ln")

    def _ln(self, x, name):
        scale = self.param(f"{name}_scale", nn.initializers.ones, (self.hidden,))
        bias = self.param(f"{name}_bias", nn.initializers.zeros, (self.hidden,))
        return layer_norm(x, scale, bias, eps=BERT_LN_EPS)


class BertEncoder(nn.Module):
    """HF `BertModel(inputs_embeds=...)` semantics with the word-embedding
    table removed (`fusion_model.py:171-172`): learned absolute position
    + token-type embeddings, post-LN encoder stack, tanh pooler.
    """

    hidden: int
    heads: int = 8
    layers: int = 3
    max_positions: int = 512

    @nn.compact
    def __call__(self, inputs_embeds, token_type_ids, *, deterministic: bool = True):
        b, s, d = inputs_embeds.shape
        pos_emb = self.param(
            "position_embeddings", nn.initializers.normal(0.02), (self.max_positions, d)
        )
        type_emb = self.param(
            "token_type_embeddings", nn.initializers.normal(0.02), (2, d)
        )
        x = inputs_embeds + pos_emb[None, :s, :] + type_emb[token_type_ids]
        emb_scale = self.param("emb_ln_scale", nn.initializers.ones, (d,))
        emb_bias = self.param("emb_ln_bias", nn.initializers.zeros, (d,))
        x = layer_norm(x, emb_scale, emb_bias, eps=BERT_LN_EPS)
        x = nn.Dropout(BERT_DROPOUT, deterministic=deterministic)(x)

        for i in range(self.layers):
            x = BertLayer(self.hidden, self.heads, name=f"layer_{i}")(
                x, deterministic=deterministic
            )

        pooled = jnp.tanh(nn.Dense(d, name="pooler")(x[:, 0]))
        return x, pooled


class PlusModel(nn.Module):
    """[CLS] ⊕ 13 patch embeds ⊕ 77 text embeds → mini-BERT.

    Returns (L2-normalized pooler, last_hidden_state, pooler) like
    `fusion_model.py:187-216`. Attention mask is all-ones there, so no
    mask is materialized here.
    """

    feature_dim: int
    layers: int = 2

    @nn.compact
    def __call__(self, reference_features, text_features, *, deterministic: bool = True):
        b, patch_num, d = reference_features.shape
        seq_num = text_features.shape[1]
        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, d))
        cls = jnp.broadcast_to(cls_token, (b, 1, d))
        inputs = jnp.concatenate([cls, reference_features, text_features], axis=1)
        token_type_ids = jnp.concatenate(
            [
                jnp.zeros((b, patch_num + 1), jnp.int32),
                jnp.ones((b, seq_num), jnp.int32),
            ],
            axis=1,
        )
        last_hidden, pooled = BertEncoder(
            hidden=self.feature_dim, heads=8, layers=self.layers, name="bert"
        )(inputs, token_type_ids, deterministic=deterministic)
        return torch_normalize(pooled, axis=-1), last_hidden, pooled


class DVRModule(nn.Module):
    """Dual-view refinement: query-side fusion of reference image + text.

    Pipeline (`fusion_model.py:26-55`): fused-sequence mini-BERT → split
    image/text streams → L2-norm → 8-head cross-attention (text queries
    image) → SR-pool vision / mean-pool text → three σ-gated combiners.
    """

    feature_dim: int

    @nn.compact
    def __call__(
        self,
        ref_patch_features,   # [B, 13, d]
        text_seq_features,    # [B, 77, d]
        ref_global_feats,     # [B, d]
        text_global_feats,    # [B, d]
        *,
        deterministic: bool = True,
    ):
        _, last_hidden, _ = PlusModel(
            feature_dim=self.feature_dim, layers=2, name="transformer_layer"
        )(ref_patch_features, text_seq_features, deterministic=deterministic)
        patch_num = ref_patch_features.shape[1]

        image_feats = last_hidden[:, 1 : patch_num + 1, :]
        text_feats = last_hidden[:, patch_num + 1 :, :]
        image_norm = torch_normalize(image_feats, axis=2)
        text_norm = torch_normalize(text_feats, axis=2)

        cross = TorchMultiheadAttention(
            self.feature_dim, num_heads=8, dropout=0.1, name="mr"
        )(text_norm, image_norm, image_norm, deterministic=deterministic)
        # Reference keeps only the first `patch_num` of the 77 text-query
        # outputs (`fusion_model.py:47`) — preserved for parity.
        cross = cross[:, :patch_num, :]
        patch_vision_mean = VisualSR(self.feature_dim, name="sr")(
            cross, deterministic=deterministic
        )
        seq_text_mean = jnp.mean(text_norm, axis=1)

        global_feats = CombinerSimple(self.feature_dim, name="combiner_global")(
            ref_global_feats, text_global_feats, deterministic=deterministic
        )
        local_feats = CombinerSimple(self.feature_dim, name="combiner_local")(
            patch_vision_mean, seq_text_mean, deterministic=deterministic
        )
        return CombinerSimple(self.feature_dim, name="combiner")(
            global_feats, local_feats, deterministic=deterministic
        )
