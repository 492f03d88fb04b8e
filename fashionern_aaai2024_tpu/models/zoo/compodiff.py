"""CompoDiff diffusion-prior network
(`models/others/CompoDiff_Model.py:13-498`).

A cross-attention transformer that denoises a CLIP image embedding
conditioned on text tokens, reference-image tokens and a 64×64 spatial
mask, with classifier-free guidance (`forward_with_cond_scale`).

Faithful quirks (all from the reference):
  * self-attention is multi-query: K/V are single-head
    (`to_kv = Linear(dim, dim_head*2)`, `CompoDiff_Model.py:316`);
  * cosine-sim attention (scale 16) — the pre-scaling `q * scale`
    before l2norm is a no-op and is therefore omitted;
  * a learned null K/V slot is prepended for CFG;
  * DALLE2-style scale-only LayerNorm (biased variance, no bias
    param), with the `stable` amax-division variant on the output norm;
  * T5 relative position bias over (n, n+1) incl. the null slot;
  * rotary embeddings on the first min(32, dim_head) dims of q/k
    (adjacent-pair rotation, as rotary_embedding_torch does).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


class DalleLayerNorm(nn.Module):
    dim: int
    stable: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (self.dim,))
        if self.stable:
            x = x / jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
        var = jnp.var(x, axis=-1, keepdims=True)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * g


class SinusoidalPosEmb(nn.Module):
    dim: int

    def __call__(self, x):  # [B] float
        half = self.dim // 2
        emb = math.log(10000) / (half - 1)
        freqs = jnp.exp(jnp.arange(half) * -emb)
        ang = x[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class MLP(nn.Module):
    dim_in: int
    dim_out: int
    expansion_factor: float = 2.0
    depth: int = 2

    @nn.compact
    def __call__(self, x):
        hidden = int(self.expansion_factor * self.dim_out)
        x = nn.silu(nn.Dense(hidden, name="in")(x.astype(jnp.float32)))
        for i in range(self.depth - 1):
            x = nn.silu(nn.Dense(hidden, name=f"mid_{i}")(x))
        return nn.Dense(self.dim_out, name="out")(x)


def _rel_pos_bucket(rel_pos, num_buckets=32, max_distance=128):
    n = jnp.maximum(-rel_pos, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return jnp.where(is_small, n, val_large)


class RelPosBias(nn.Module):
    heads: int = 8
    num_buckets: int = 32
    max_distance: int = 128

    @nn.compact
    def __call__(self, i: int, j: int):
        table = self.param(
            "relative_attention_bias", nn.initializers.normal(1.0),
            (self.num_buckets, self.heads),
        )
        rel = jnp.arange(j)[None, :] - jnp.arange(i)[:, None]
        bucket = _rel_pos_bucket(rel, self.num_buckets, self.max_distance)
        return table[bucket].transpose(2, 0, 1)  # [h, i, j]


def rotate_queries_or_keys(t, rot_dim):
    """rotary_embedding_torch semantics: rotate the first `rot_dim` dims
    with theta=10000 frequencies and adjacent-pair rotation; positions
    are the sequence index. t: [..., n, d]."""
    n, d = t.shape[-2], t.shape[-1]
    freqs = 1.0 / (10000 ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim))
    pos = jnp.arange(n, dtype=jnp.float32)
    ang = pos[:, None] * freqs[None, :]                    # [n, rot/2]
    ang = jnp.repeat(ang, 2, axis=-1)                      # [n, rot]
    head, rest = t[..., :rot_dim], t[..., rot_dim:]
    x1 = head[..., 0::2]
    x2 = head[..., 1::2]
    rot_half = jnp.stack([-x2, x1], axis=-1).reshape(head.shape)
    rotated = head * jnp.cos(ang) + rot_half * jnp.sin(ang)
    return jnp.concatenate([rotated, rest], axis=-1)


def _l2(t):
    return t / jnp.linalg.norm(t, axis=-1, keepdims=True).clip(1e-12)


class CompoDiffSelfAttention(nn.Module):
    """Multi-query cosine-sim self-attention with null K/V
    (`CompoDiff_Model.py:295-389`)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    causal: bool = False
    cosine_sim: bool = True
    cosine_sim_scale: float = 16.0
    use_rotary: bool = True

    @nn.compact
    def __call__(self, x, attn_bias=None, mask=None):
        b, n, _ = x.shape
        inner = self.dim_head * self.heads
        scale = self.cosine_sim_scale if self.cosine_sim else self.dim_head ** -0.5
        x = DalleLayerNorm(self.dim, name="norm")(x)
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        kv = nn.Dense(2 * self.dim_head, use_bias=False, name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)                   # [b, n, dh] single head
        q = q.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        if self.use_rotary:
            rot = min(32, self.dim_head)
            q = rotate_queries_or_keys(q, rot)
            k = rotate_queries_or_keys(k, rot)

        null_kv = self.param("null_kv", nn.initializers.normal(1.0), (2, self.dim_head))
        nk = jnp.broadcast_to(null_kv[0], (b, 1, self.dim_head))
        nv = jnp.broadcast_to(null_kv[1], (b, 1, self.dim_head))
        k = jnp.concatenate([nk, k], axis=1)
        v = jnp.concatenate([nv, v], axis=1)

        if self.cosine_sim:
            q, k = _l2(q), _l2(k)
        q = q * math.sqrt(scale)
        k = k * math.sqrt(scale)
        sim = jnp.einsum("bhid,bjd->bhij", q, k)
        if attn_bias is not None:
            sim = sim + attn_bias
        neg = jnp.finfo(sim.dtype).min
        if mask is not None:
            m = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)
            sim = jnp.where(m[:, None, None, :], sim, neg)
        if self.causal:
            i, j = sim.shape[-2:]
            cm = jnp.triu(jnp.ones((i, j), bool), j - i + 1)
            sim = jnp.where(cm, neg, sim)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(sim.dtype)
        out = jnp.einsum("bhij,bjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, use_bias=False, name="to_out")(out)
        return DalleLayerNorm(self.dim, name="out_norm")(out)


class CompoDiffCrossAttention(nn.Module):
    """Full multi-head cross-attention with null K/V
    (`CompoDiff_Model.py:140-209`)."""

    dim: int
    context_dim: int | None = None
    dim_head: int = 64
    heads: int = 8
    norm_context: bool = False
    cosine_sim: bool = False
    cosine_sim_scale: float = 16.0

    @nn.compact
    def __call__(self, x, context, mask=None):
        b, n, _ = x.shape
        inner = self.dim_head * self.heads
        ctx_dim = self.context_dim or self.dim
        scale = self.cosine_sim_scale if self.cosine_sim else self.dim_head ** -0.5
        x = DalleLayerNorm(self.dim, name="norm")(x)
        if self.norm_context:
            context = DalleLayerNorm(ctx_dim, name="norm_context")(context)
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        kv = nn.Dense(2 * inner, use_bias=False, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(t):
            return t.reshape(b, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        null_kv = self.param("null_kv", nn.initializers.normal(1.0), (2, self.dim_head))
        nk = jnp.broadcast_to(null_kv[0], (b, self.heads, 1, self.dim_head))
        nv = jnp.broadcast_to(null_kv[1], (b, self.heads, 1, self.dim_head))
        k = jnp.concatenate([nk, k], axis=2)
        v = jnp.concatenate([nv, v], axis=2)
        if self.cosine_sim:
            q, k = _l2(q), _l2(k)
        q = q * math.sqrt(scale)
        k = k * math.sqrt(scale)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k)
        if mask is not None:
            m = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)
            sim = jnp.where(m[:, None, None, :], sim, jnp.finfo(sim.dtype).min)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(sim.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, use_bias=False, name="to_out")(out)
        return DalleLayerNorm(self.dim, name="out_norm")(out)


class SwiGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    post_activation_norm: bool = False

    @nn.compact
    def __call__(self, x):
        inner = int(self.mult * self.dim)
        x = DalleLayerNorm(self.dim, name="norm")(x)
        x = nn.Dense(2 * inner, use_bias=False, name="proj_in")(x)
        a, gate = jnp.split(x, 2, axis=-1)
        x = a * nn.silu(gate)
        if self.post_activation_norm:
            x = DalleLayerNorm(inner, name="post_norm")(x)
        return nn.Dense(self.dim, use_bias=False, name="proj_out")(x)


class CrossTransformer(nn.Module):
    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    norm_out: bool = True
    final_proj: bool = True
    rotary_emb: bool = True
    causal: bool = False
    context_dim: int | None = None

    @nn.compact
    def __call__(self, x, context, mask=None):
        n = x.shape[1]
        bias = RelPosBias(heads=self.heads, name="rel_pos_bias")(n, n + 1)[None]
        for i in range(self.depth):
            x = CompoDiffSelfAttention(
                self.dim, dim_head=self.dim_head, heads=self.heads,
                causal=self.causal, use_rotary=self.rotary_emb,
                name=f"attn_{i}",
            )(x, attn_bias=bias) + x
            x = CompoDiffCrossAttention(
                self.dim, context_dim=self.context_dim, dim_head=self.dim_head,
                heads=self.heads, name=f"cross_{i}",
            )(x, context, mask) + x
            x = SwiGLUFeedForward(self.dim, mult=self.ff_mult, name=f"ff_{i}")(x) + x
        if self.norm_out:
            x = DalleLayerNorm(self.dim, stable=True, name="norm")(x)
        if self.final_proj:
            x = nn.Dense(self.dim, use_bias=False, name="project_out")(x)
        return x


class CompoDiffNetwork(nn.Module):
    """Denoiser: predicts the target CLIP image embedding from a noised
    embedding + (text, reference image, mask) conditioning
    (`CompoDiff_Model.py:13-103`)."""

    dim: int
    depth: int = 4
    dim_head: int = 64
    heads: int = 8
    text_cond_dim: int = 1280
    mask_hw: int = 64

    def setup(self):
        self.to_text_embeds = nn.Dense(self.dim, name="to_text_embeds")
        self.time_pos_emb = SinusoidalPosEmb(self.dim)
        self.time_mlp = MLP(self.dim, self.dim, name="time_mlp")
        self.mask_mlp = MLP(self.mask_hw * self.mask_hw, self.dim, name="mask_mlp")
        self.transformer = CrossTransformer(
            dim=self.dim, depth=self.depth, dim_head=self.dim_head,
            heads=self.heads, name="transformer",
        )

    def __call__(self, image_embed, image_cond, text_cond, input_mask,
                 diffusion_timesteps):
        """image_embed [B,N,d]; image_cond [B,M,d]; text_cond [B,77,Ct];
        input_mask [B,H,W]; timesteps [B] → predicted embed [B,1,d]."""
        b = image_embed.shape[0]
        text_cond = self.to_text_embeds(text_cond)
        t = self.time_mlp(self.time_pos_emb(diffusion_timesteps.astype(jnp.float32)))
        time_embed = t.reshape(b, 1, self.dim)
        mask_embed = self.mask_mlp(input_mask.reshape(b, -1)).reshape(b, 1, self.dim)
        tokens = jnp.concatenate([image_embed, time_embed], axis=-2)
        context = jnp.concatenate([text_cond, image_cond, mask_embed], axis=1)
        tokens = self.transformer(tokens, context)
        return tokens[..., :1, :]

    def forward_with_cond_scale(self, image_embed, image_cond, text_cond,
                                input_mask, diffusion_timesteps, text_cond_uc,
                                cond_scale=1.0):
        """Classifier-free guidance, triple-batch
        (`CompoDiff_Model.py:44-69`). `cond_scale` is (image_scale,
        text_scale) unless 1.0 (no guidance)."""
        if cond_scale == 1.0:
            return self(image_embed, image_cond, text_cond, input_mask,
                        diffusion_timesteps)
        image_embed3 = jnp.concatenate([image_embed] * 3)
        image_cond3 = jnp.concatenate(
            [image_cond, image_cond, jnp.zeros_like(image_cond)])
        text_cond3 = jnp.concatenate([text_cond, text_cond_uc, text_cond_uc])
        mask3 = jnp.concatenate([input_mask] * 3)
        t3 = jnp.concatenate([diffusion_timesteps] * 3)
        out = self(image_embed3, image_cond3, text_cond3, mask3, t3)
        logits, null_text, null_all = jnp.split(out, 3)
        return (null_all + (logits - null_text) * cond_scale[1]
                + (null_text - null_all) * cond_scale[0])
