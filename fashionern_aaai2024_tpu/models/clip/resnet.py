"""CLIP modified-ResNet image tower (RN50x4).

The "modified" ResNet of CLIP (reference uses it via open_clip,
`run/train/train_fiq.py:49,191`):
  * 3-conv stem (each conv→BN→ReLU) followed by 2×2 average pooling,
  * anti-aliased downsampling — stride-2 convs replaced by stride-1 conv
    + 2×2 average pool, both inside bottlenecks and in shortcut paths,
  * a multi-head attention-pool head instead of global average pooling.

RN50x4 dimensions: base width 80, stages (4, 6, 10, 6), image 288 →
final 9×9×2560 grid, attention pool with 40 heads → 640-d joint space.

Layout is NHWC (TPU-native); the torch→flax converter transposes.
`encode` returns (global [B, 640], tokens [B, 82, 640]): tokens are the
attention-pool value path (c_proj∘v_proj) applied per position incl. the
mean token — the joint-space per-region features used as the TME seq
analog (the reference's RN50x4 eval path itself only consumes global +
offline patch features, `utils/utils.py:44-69`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from fashionern_aaai2024_tpu.models.clip.config import VisionConfig
from fashionern_aaai2024_tpu.ops.attention import packed_kv_cross_attention


class BNRelu(nn.Module):
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)
        return nn.relu(x) if self.use_relu else x


def _avg_pool(x, k: int):
    return nn.avg_pool(x, (k, k), strides=(k, k))


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = BNRelu(name="bn1")(out, train=train)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(out)
        out = BNRelu(name="bn2")(out, train=train)
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = BNRelu(use_relu=False, name="bn3")(out, train=train)

        identity = x
        if self.stride > 1 or x.shape[-1] != self.planes * 4:
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = nn.Conv(
                self.planes * 4, (1, 1), use_bias=False, name="downsample_conv"
            )(identity)
            identity = BNRelu(use_relu=False, name="downsample_bn")(identity, train=train)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    embed_dim: int
    num_heads: int
    output_dim: int

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, hh, ww, c = x.shape
        spacial = hh * ww
        x = x.reshape(b, spacial, c)
        x = jnp.concatenate([jnp.mean(x, axis=1, keepdims=True), x], axis=1)
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(self.embed_dim ** -0.5),
            (spacial + 1, self.embed_dim),
        )
        x = x + positional_embedding[None]

        q = nn.Dense(self.embed_dim, name="q_proj")(x[:, :1])
        k = nn.Dense(self.embed_dim, name="k_proj")(x)
        v = nn.Dense(self.embed_dim, name="v_proj")(x)
        # packed cross-attention tier: k|v in one [B, S+1, 2E] tensor,
        # the 40 dh=64 heads sliced in VMEM (RN50x4: E=2560; Pallas on
        # TPU, identical XLA formula elsewhere)
        o = packed_kv_cross_attention(
            q, jnp.concatenate([k, v], axis=-1), self.num_heads)
        c_proj = nn.Dense(self.output_dim, name="c_proj")
        pooled = c_proj(o)[:, 0]
        # joint-space per-region features (value path) — see module docstring
        tokens = c_proj(v)
        return pooled, tokens


def fold_batchnorm(variables: dict) -> dict:
    """Fold frozen BatchNorm affines into the preceding conv kernels
    (inference-weight-load transform; the towers are frozen so this is
    free at serving time — VERDICT r2 item 4).

    For every conv→BN pair the per-out-channel affine
    a = γ·rsqrt(σ²+ε), b = β − μ·a moves into the conv:
    kernel ← kernel·a, and the BN is left computing exactly x + b
    (scale 1, mean 0, var 1−ε so rsqrt(σ²+ε) = 1). Numerically identical
    to the unfolded forward modulo one float rounding
    (tests/test_clip.py pins parity). Works on any tree that contains a
    ModifiedResNet subtree (pair naming: convN↔bnN, downsample_conv↔
    downsample_bn, each BNRelu wrapping an nn.BatchNorm named "bn")."""
    import flax

    eps = 1e-5
    params = flax.traverse_util.flatten_dict(variables["params"])
    stats = flax.traverse_util.flatten_dict(variables.get("batch_stats", {}))

    def bn_name(conv: str) -> str | None:
        if conv == "downsample_conv":
            return "downsample_bn"
        if conv.startswith("conv"):
            return "bn" + conv[len("conv"):]
        return None

    for path in list(params):
        if path[-1] != "kernel":
            continue
        bn = bn_name(path[-2])
        if bn is None:
            continue
        prefix = path[:-2]
        scale_p = prefix + (bn, "bn", "scale")
        if scale_p not in params:
            continue
        bias_p = prefix + (bn, "bn", "bias")
        mean_p = prefix + (bn, "bn", "mean")
        var_p = prefix + (bn, "bn", "var")
        a = params[scale_p] * jax.lax.rsqrt(stats[var_p] + eps)
        params[path] = (params[path] * a).astype(params[path].dtype)
        params[bias_p] = (params[bias_p] - stats[mean_p] * a).astype(
            params[bias_p].dtype)
        params[scale_p] = jnp.ones_like(params[scale_p])
        stats[mean_p] = jnp.zeros_like(stats[mean_p])
        stats[var_p] = jnp.full_like(stats[var_p], 1.0 - eps)

    out = dict(variables)
    out["params"] = flax.traverse_util.unflatten_dict(params)
    if stats:
        out["batch_stats"] = flax.traverse_util.unflatten_dict(stats)
    return out


class ModifiedResNet(nn.Module):
    config: VisionConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray, *, train: bool = False):
        """images: [B, H, W, 3] NHWC, CLIP-normalized."""
        cfg = self.config
        width = cfg.width
        stages = cfg.layers
        assert isinstance(stages, tuple)

        x = images
        # 3-conv stem
        x = nn.Conv(width // 2, (3, 3), strides=2, padding=1, use_bias=False, name="conv1")(x)
        x = BNRelu(name="bn1")(x, train=train)
        x = nn.Conv(width // 2, (3, 3), padding=1, use_bias=False, name="conv2")(x)
        x = BNRelu(name="bn2")(x, train=train)
        x = nn.Conv(width, (3, 3), padding=1, use_bias=False, name="conv3")(x)
        x = BNRelu(name="bn3")(x, train=train)
        x = _avg_pool(x, 2)

        for stage_idx, blocks in enumerate(stages):
            planes = width * (2 ** stage_idx)
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(blocks):
                x = Bottleneck(
                    planes,
                    stride if block_idx == 0 else 1,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x, train=train)

        return AttentionPool2d(
            embed_dim=width * 32, num_heads=cfg.heads, output_dim=cfg.embed_dim,
            name="attnpool",
        )(x)
