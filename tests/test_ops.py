"""Pallas-kernel ↔ XLA-fallback parity (kernels run in interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fashionern_aaai2024_tpu.ops import layernorm, attention, losses, similarity


def _unit(x):
    x = np.asarray(x, np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


class TestLayerNorm:
    @pytest.mark.parametrize("shape", [(4, 91, 640), (32, 512), (3, 13, 128)])
    def test_pallas_matches_ref(self, rng, shape):
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        scale = jnp.asarray(rng.normal(size=shape[-1:]), jnp.float32)
        bias = jnp.asarray(rng.normal(size=shape[-1:]), jnp.float32)
        ref = layernorm.layer_norm(x, scale, bias, force_pallas=False)
        got = layernorm.layer_norm(x, scale, bias, force_pallas=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.normal(size=(7, 640)).astype(np.float32)
        scale = rng.normal(size=(640,)).astype(np.float32)
        bias = rng.normal(size=(640,)).astype(np.float32)
        ln = torch.nn.LayerNorm(640, eps=1e-5)
        with torch.no_grad():
            ln.weight.copy_(torch.from_numpy(scale))
            ln.bias.copy_(torch.from_numpy(bias))
            want = ln(torch.from_numpy(x)).numpy()
        got = layernorm.layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestAttention:
    @pytest.mark.parametrize(
        "b,h,sq,sk,dh,causal",
        [(2, 8, 91, 91, 80, False), (2, 8, 77, 77, 64, True), (1, 8, 77, 13, 80, False)],
    )
    def test_pallas_matches_ref(self, rng, b, h, sq, sk, dh, causal):
        q = jnp.asarray(rng.normal(size=(b, h, sq, dh)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, h, sk, dh)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, h, sk, dh)), jnp.float32)
        ref = attention.multi_head_attention(q, k, v, causal=causal, force_pallas=False)
        got = attention.multi_head_attention(
            q, k, v, causal=causal, force_pallas=True, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    def test_matches_torch_sdpa(self, rng):
        torch = pytest.importorskip("torch")
        q = rng.normal(size=(2, 4, 10, 16)).astype(np.float32)
        k = rng.normal(size=(2, 4, 12, 16)).astype(np.float32)
        v = rng.normal(size=(2, 4, 12, 16)).astype(np.float32)
        want = torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
        ).numpy()
        got = attention.multi_head_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), force_pallas=False
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestBBCLoss:
    def test_matches_torch_reference_semantics(self, rng):
        torch = pytest.importorskip("torch")
        pred = rng.normal(size=(16, 64)).astype(np.float32)
        tar = rng.normal(size=(16, 64)).astype(np.float32)
        pred /= np.linalg.norm(pred, axis=1, keepdims=True)
        tar /= np.linalg.norm(tar, axis=1, keepdims=True)
        # reference semantics: CE(100 * pred @ tar.T, arange) — losses/loss.py:10-14
        logits = torch.from_numpy(100 * pred @ tar.T)
        want = torch.nn.functional.cross_entropy(logits, torch.arange(16)).item()
        got = losses.batch_based_classification_loss(jnp.asarray(pred), jnp.asarray(tar))
        assert abs(float(got) - want) < 1e-4

    def test_pallas_rowloss_matches_ref(self, rng):
        pred = jnp.asarray(rng.normal(size=(20, 48)), jnp.float32)
        tar = jnp.asarray(rng.normal(size=(20, 48)), jnp.float32)
        ref = losses._bbc_rowloss_ref(pred, tar, 100.0)
        got = losses._bbc_rowloss_pallas(pred, tar, 100.0, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4)

    def test_grad_matches_autodiff(self, rng):
        pred = jnp.asarray(rng.normal(size=(8, 32)), jnp.float32) * 0.1
        tar = jnp.asarray(rng.normal(size=(8, 32)), jnp.float32) * 0.1

        def plain(p, t):
            return jnp.mean(losses._bbc_rowloss_ref(p, t, 100.0))

        g_plain = jax.grad(plain, argnums=(0, 1))(pred, tar)
        g_custom = jax.grad(
            lambda p, t: losses.batch_based_classification_loss(p, t), argnums=(0, 1)
        )(pred, tar)
        for a, b in zip(g_plain, g_custom):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_global_negatives_shard_map(self, rng):
        from jax.sharding import Mesh, PartitionSpec as P
        from jax import shard_map

        devs = jax.devices()
        mesh = Mesh(np.array(devs), ("data",))
        b, d = 16, 32
        pred = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        tar = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)

        def local_fn(p, t):
            return losses.batch_based_classification_loss(
                p, t, negatives="global", axis_name="data"
            )[None]

        sharded = shard_map(
            local_fn, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data")
        )
        per_shard = sharded(pred, tar)
        # global-negative loss averaged over shards == full-batch CE
        want = jnp.mean(losses._bbc_rowloss_ref(pred, tar, 100.0))
        np.testing.assert_allclose(float(jnp.mean(per_shard)), float(want), atol=1e-4)


class TestBlockedTopK:
    def test_matches_full_argsort(self, rng):
        q = rng.normal(size=(7, 32)).astype(np.float32)
        g = rng.normal(size=(1000, 32)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        g /= np.linalg.norm(g, axis=1, keepdims=True)
        scores, idx = similarity.blocked_top_k_similarity(
            jnp.asarray(q), jnp.asarray(g), k=51, chunk=128
        )
        full = q @ g.T
        want_idx = np.argsort(-full, axis=1, kind="stable")[:, :51]
        np.testing.assert_array_equal(np.asarray(idx), want_idx)
        np.testing.assert_allclose(
            np.asarray(scores), np.take_along_axis(full, want_idx, axis=1), atol=1e-5
        )

    def test_gallery_smaller_than_k(self, rng):
        q = jnp.asarray(rng.normal(size=(3, 8)), jnp.float32)
        g = jnp.asarray(rng.normal(size=(5, 8)), jnp.float32)
        scores, idx = similarity.blocked_top_k_similarity(q, g, k=51)
        assert idx.shape == (3, 5)

    def test_approx_tier_exact_on_cpu(self, rng):
        """The approx selector (`lax.approx_max_k`) lowers to the exact
        sort on CPU with identical tie-breaking, so the approx tier is
        pinned bit-for-bit against the exact tier here; its TPU recall
        is the measured ladder in ops/similarity.py."""
        q = _unit(rng.normal(size=(7, 32)).astype(np.float32))
        g = _unit(rng.normal(size=(1000, 32)).astype(np.float32))
        es, ei = similarity.blocked_top_k_similarity(
            jnp.asarray(q), jnp.asarray(g), k=51, chunk=128)
        as_, ai = similarity.blocked_top_k_similarity(
            jnp.asarray(q), jnp.asarray(g), k=51, chunk=128,
            approx_recall=0.95)
        np.testing.assert_array_equal(np.asarray(ai), np.asarray(ei))
        np.testing.assert_array_equal(np.asarray(as_), np.asarray(es))

    def test_approx_tier_masks_external_padding(self, rng):
        """n_valid masking applies before the approx selector too: pad
        rows (score 0) must never evict real negative-scoring rows."""
        q = _unit(rng.normal(size=(2, 16)).astype(np.float32))
        real = _unit(-q[0:1] - q[1:2] + 0.01 * rng.normal(size=(6, 16)))
        g = np.concatenate([real.astype(np.float32),
                            np.zeros((4, 16), np.float32)])
        s, i = similarity.blocked_top_k_similarity(
            jnp.asarray(q), jnp.asarray(g), k=6, chunk=5,
            n_valid=jnp.asarray(6), approx_recall=0.95)
        assert (np.asarray(i) < 6).all()
        assert (np.asarray(s) < 0).all()


class TestAttentionBf16Path:
    def test_bf16_scores_close_to_fp32(self, rng):
        """Production bf16 path (scores stored bf16, fp32 softmax
        internals) must track the exact fp32 path closely."""
        from fashionern_aaai2024_tpu.ops.attention import multi_head_attention

        q = rng.standard_normal((2, 4, 33, 16)).astype(np.float32)
        k = rng.standard_normal((2, 4, 33, 16)).astype(np.float32)
        v = rng.standard_normal((2, 4, 33, 16)).astype(np.float32)
        exact = np.asarray(multi_head_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        approx = np.asarray(multi_head_attention(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
            jnp.asarray(v, jnp.bfloat16)).astype(jnp.float32))
        err = np.abs(exact - approx).max() / (np.abs(exact).max() + 1e-9)
        assert err < 0.03, err

    def test_bf16_causal(self, rng):
        from fashionern_aaai2024_tpu.ops.attention import multi_head_attention

        q = rng.standard_normal((1, 2, 9, 8)).astype(np.float32)
        exact = np.asarray(multi_head_attention(
            jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), causal=True))
        approx = np.asarray(multi_head_attention(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(q, jnp.bfloat16),
            jnp.asarray(q, jnp.bfloat16), causal=True).astype(jnp.float32))
        err = np.abs(exact - approx).max() / (np.abs(exact).max() + 1e-9)
        assert err < 0.03, err


class TestFusedCombiner:
    @pytest.fixture()
    def setup(self, rng):
        import jax as _jax

        from fashionern_aaai2024_tpu.models.ern.fusion import CombinerSimple

        d = 16
        m = CombinerSimple(d)
        img = rng.standard_normal((10, d)).astype(np.float32)
        txt = rng.standard_normal((10, d)).astype(np.float32)
        v = m.init(_jax.random.PRNGKey(0), img, txt)
        return m, v, img, txt

    def test_xla_path_matches_module(self, setup):
        from fashionern_aaai2024_tpu.ops.combiner import combiner_apply

        m, v, img, txt = setup
        want = np.asarray(m.apply(v, img, txt))
        got = np.asarray(combiner_apply(img, txt, v["params"], force_pallas=False))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_pallas_interpret_matches_module(self, setup):
        from fashionern_aaai2024_tpu.ops.combiner import combiner_apply

        m, v, img, txt = setup
        want = np.asarray(m.apply(v, img, txt))
        got = np.asarray(combiner_apply(img, txt, v["params"],
                                        force_pallas=True, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestBBCKernelTiling:
    @pytest.mark.parametrize("b,d", [(8, 16), (130, 24), (512, 64)])
    def test_interpret_matches_ref_across_tilings(self, rng, b, d):
        """Covers the multi-tile output layout that failed on real TPU at
        B=512 (Mosaic sublane rule) — interpret mode checks the padding
        and masking logic at 1-tile, ragged, and 4-tile batch sizes."""
        from fashionern_aaai2024_tpu.ops.losses import (
            _bbc_rowloss_pallas, _bbc_rowloss_ref,
        )

        pred = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
        tar = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
        got = np.asarray(_bbc_rowloss_pallas(pred, tar, 100.0, interpret=True))
        want = np.asarray(_bbc_rowloss_ref(pred, tar, 100.0))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestGroupedAttentionGrad:
    """The grouped Pallas kernel's custom VJP (XLA-ref backward) must
    match XLA autodiff — gradient-bearing fusion sites may dispatch to
    the kernel when dropout is off."""

    def test_grad_matches_xla(self):
        from fashionern_aaai2024_tpu.ops.attention import multi_head_attention

        g = np.random.default_rng(5)
        q = jnp.asarray(g.standard_normal((2, 4, 24, 16)), jnp.float32)
        k = jnp.asarray(g.standard_normal((2, 4, 24, 16)), jnp.float32)
        v = jnp.asarray(g.standard_normal((2, 4, 24, 16)), jnp.float32)

        def loss_pallas(q, k, v):
            o = multi_head_attention(q, k, v, force_pallas=True, interpret=True)
            return jnp.sum(o * o)

        def loss_ref(q, k, v):
            o = multi_head_attention(q, k, v, force_pallas=False)
            return jnp.sum(o * o)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)

    def test_group_picker_divides(self):
        from fashionern_aaai2024_tpu.ops.attention import _pick_group

        for bh in (1536, 1024, 96, 7, 1):
            g = _pick_group(bh, 208, 208, 128, 2)
            assert bh % g == 0 and g >= 1
        # big shapes shrink the group to fit VMEM
        g_small = _pick_group(1024, 1024, 1024, 128, 4)
        assert g_small < _pick_group(1024, 208, 208, 128, 2)


class TestPackedQKVAttention:
    """Packed self-attention (head split inside the kernel) matches the
    XLA formula bit-for-bit in fp32, including causal, and its custom
    VJP matches autodiff of the reference."""

    def _qkv(self, b=4, s=24, heads=2, dh=64, seed=7):
        g = np.random.default_rng(seed)
        return jnp.asarray(
            g.standard_normal((b, s, 3 * heads * dh)), jnp.float32)

    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_ref(self, causal):
        from fashionern_aaai2024_tpu.ops.attention import (
            _packed_ref, packed_qkv_self_attention,
        )

        qkv = self._qkv()
        got = packed_qkv_self_attention(
            qkv, 2, causal=causal, force_pallas=True, interpret=True)
        s = qkv.shape[1]
        bias = (jnp.where(jnp.tril(jnp.ones((s, s), bool)), 0.0, -1e30)
                .astype(jnp.float32) if causal
                else jnp.zeros((s, s), jnp.float32))
        want = _packed_ref(qkv, bias, (64) ** -0.5, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_grad_matches(self):
        from fashionern_aaai2024_tpu.ops.attention import (
            _packed_ref, packed_qkv_self_attention,
        )

        qkv = self._qkv(b=2, s=16)

        def lp(a):
            o = packed_qkv_self_attention(a, 2, force_pallas=True,
                                          interpret=True)
            return jnp.sum(o * o)

        def lr(a):
            s = a.shape[1]
            o = _packed_ref(a, jnp.zeros((s, s), jnp.float32), 64 ** -0.5, 2)
            return jnp.sum(o * o)

        gp = jax.grad(lp)(qkv)
        gr = jax.grad(lr)(qkv)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   atol=1e-5, rtol=1e-5)


class TestFusedQKVAttention:
    """QKV-projection-fused kernel: interpret-mode exactness vs the XLA
    formula + gradient parity for (x, W_qkv, b_qkv)."""

    def _inputs(self, b=3, s=20, heads=2, dh=64, seed=11):
        g = np.random.default_rng(seed)
        w = heads * dh
        return (jnp.asarray(g.standard_normal((b, s, w)), jnp.float32),
                jnp.asarray(g.standard_normal((w, 3 * w)) * 0.05, jnp.float32),
                jnp.asarray(g.standard_normal((3 * w,)) * 0.05, jnp.float32))

    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_ref(self, causal):
        from fashionern_aaai2024_tpu.ops.attention import (
            _qkv_fused_ref, fused_qkv_self_attention,
        )

        x, w, b = self._inputs()
        got = fused_qkv_self_attention(x, w, b, 2, causal=causal,
                                       force_pallas=True, interpret=True)
        s = x.shape[1]
        bias = (jnp.where(jnp.tril(jnp.ones((s, s), bool)), 0.0, -1e30)
                .astype(jnp.float32) if causal
                else jnp.zeros((s, s), jnp.float32))
        want = _qkv_fused_ref(x, w, b, bias, 64 ** -0.5, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_grad_matches(self):
        from fashionern_aaai2024_tpu.ops.attention import (
            _qkv_fused_ref, fused_qkv_self_attention,
        )

        x, w, b = self._inputs(b=2, s=12)

        def lp(x, w, b):
            o = fused_qkv_self_attention(x, w, b, 2, force_pallas=True,
                                         interpret=True)
            return jnp.sum(jnp.sin(o))

        def lr(x, w, b):
            s = x.shape[1]
            o = _qkv_fused_ref(x, w, b, jnp.zeros((s, s), jnp.float32),
                               64 ** -0.5, 2)
            return jnp.sum(jnp.sin(o))

        gp = jax.grad(lp, argnums=(0, 1, 2))(x, w, b)
        gr = jax.grad(lr, argnums=(0, 1, 2))(x, w, b)
        for a, c in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=1e-5, rtol=1e-5)


class TestInt8Matmul:
    def test_formula(self):
        from fashionern_aaai2024_tpu.ops.qmatmul import (
            int8_matmul, quantize_colwise, quantize_rowwise,
        )

        g = np.random.default_rng(3)
        x = jnp.asarray(g.standard_normal((5, 32)), jnp.float32)
        w = jnp.asarray(g.standard_normal((32, 16)), jnp.float32)
        b = jnp.asarray(g.standard_normal((16,)), jnp.float32)
        got = np.asarray(int8_matmul(x, w, b))
        xq, xs = quantize_rowwise(x)
        wq, ws = quantize_colwise(w)
        want = (np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)
                ).astype(np.float32) * np.asarray(xs) * np.asarray(ws) \
            + np.asarray(b)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # dynamic-range sanity: error vs exact matmul bounded by quant step
        exact = np.asarray(x) @ np.asarray(w) + np.asarray(b)
        rel = np.abs(got - exact).max() / np.abs(exact).max()
        assert rel < 0.05

    def test_quantized_tower_rank_agreement(self):
        """int8-MLP tower vs float tower on a retrieval task: same
        checkpoint, high top-k overlap (the serving accuracy contract)."""
        import dataclasses

        from fashionern_aaai2024_tpu.models.clip.config import (
            CLIPConfig, TextConfig, VisionConfig,
        )
        from fashionern_aaai2024_tpu.models.clip.model import CLIP

        cfg = CLIPConfig(
            name="t",
            vision=VisionConfig(kind="vit", image_size=32, embed_dim=24,
                                width=64, layers=2, heads=4, patch_size=16),
            text=TextConfig(vocab_size=50, context_length=8, width=32,
                            heads=4, layers=2, embed_dim=24),
        )
        m = CLIP(cfg)
        mq = CLIP(dataclasses.replace(cfg, quantize_mlp=True))
        g = np.random.default_rng(0)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   jnp.zeros((1, 8), jnp.int32))
        imgs = jnp.asarray(g.random((24, 32, 32, 3), dtype=np.float32))

        def feats(model):
            f = model.apply(v, imgs, method=model.encode_image)[0]
            f = np.asarray(f)
            return f / np.linalg.norm(f, axis=-1, keepdims=True)

        a, b = feats(m), feats(mq)
        sims_a, sims_b = a[:4] @ a.T, b[:4] @ b.T
        top_a = np.argsort(-sims_a, axis=-1)[:, :5]
        top_b = np.argsort(-sims_b, axis=-1)[:, :5]
        overlap = np.mean([
            len(set(top_a[i]) & set(top_b[i])) / 5 for i in range(4)
        ])
        assert overlap >= 0.8, f"top-5 overlap {overlap}"
        # param tree unchanged: same checkpoints serve both paths
        vq = mq.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                     jnp.zeros((1, 8), jnp.int32))
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(vq))


class TestAttentionSubblock:
    """Whole attention sub-block kernel (LN + qkv + attention + out-proj
    + residual): interpret-mode exactness + full gradient parity."""

    def _inputs(self, b=2, s=18, heads=2, dh=64, seed=13):
        g = np.random.default_rng(seed)
        w = heads * dh
        return (jnp.asarray(g.standard_normal((b, s, w)), jnp.float32),
                jnp.asarray(1 + 0.1 * g.standard_normal((w,)), jnp.float32),
                jnp.asarray(0.1 * g.standard_normal((w,)), jnp.float32),
                jnp.asarray(g.standard_normal((w, 3 * w)) * 0.05, jnp.float32),
                jnp.asarray(g.standard_normal((3 * w,)) * 0.05, jnp.float32),
                jnp.asarray(g.standard_normal((w, w)) * 0.05, jnp.float32),
                jnp.asarray(g.standard_normal((w,)) * 0.05, jnp.float32))

    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_ref(self, causal):
        from fashionern_aaai2024_tpu.ops.attention import (
            _subblock_ref, attention_subblock,
        )

        args = self._inputs()
        got = attention_subblock(*args, 2, causal=causal,
                                 force_pallas=True, interpret=True)
        s = args[0].shape[1]
        bias = (jnp.where(jnp.tril(jnp.ones((s, s), bool)), 0.0, -1e30)
                .astype(jnp.float32) if causal
                else jnp.zeros((s, s), jnp.float32))
        want = _subblock_ref(*args, bias, 64 ** -0.5, 2, 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_fallback_matches_kernel(self):
        """The two-stage fallback (force_pallas=False) computes the same
        function as the kernel path."""
        from fashionern_aaai2024_tpu.ops.attention import attention_subblock

        args = self._inputs()
        a = attention_subblock(*args, 2, force_pallas=True, interpret=True)
        b = attention_subblock(*args, 2, force_pallas=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_grad_matches(self):
        from fashionern_aaai2024_tpu.ops.attention import (
            _subblock_ref, attention_subblock,
        )

        args = self._inputs(b=2, s=10)

        def lp(*a):
            o = attention_subblock(*a, 2, force_pallas=True, interpret=True)
            return jnp.sum(jnp.tanh(o))

        def lr(*a):
            s = a[0].shape[1]
            o = _subblock_ref(*a, jnp.zeros((s, s), jnp.float32),
                              64 ** -0.5, 2, 1e-5)
            return jnp.sum(jnp.tanh(o))

        gp = jax.grad(lp, argnums=tuple(range(7)))(*args)
        gr = jax.grad(lr, argnums=tuple(range(7)))(*args)
        for a, c in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=2e-5, rtol=1e-4)


class TestMlpSubblock:
    """Whole MLP sub-block kernel (LN + c_fc + act + c_proj + residual):
    interpret-mode exactness, fallback equivalence, chunked hidden axis,
    and full gradient parity."""

    def _inputs(self, b=2, s=18, w=128, f=512, seed=7):
        g = np.random.default_rng(seed)
        return (jnp.asarray(g.standard_normal((b, s, w)), jnp.float32),
                jnp.asarray(1 + 0.1 * g.standard_normal((w,)), jnp.float32),
                jnp.asarray(0.1 * g.standard_normal((w,)), jnp.float32),
                jnp.asarray(g.standard_normal((w, f)) * 0.05, jnp.float32),
                jnp.asarray(g.standard_normal((f,)) * 0.05, jnp.float32),
                jnp.asarray(g.standard_normal((f, w)) * 0.05, jnp.float32),
                jnp.asarray(g.standard_normal((w,)) * 0.05, jnp.float32))

    @pytest.mark.parametrize("activation", ["quick_gelu", "gelu"])
    def test_matches_ref(self, activation):
        from fashionern_aaai2024_tpu.ops.mlp import _mlp_ref, mlp_subblock

        args = self._inputs()
        got = mlp_subblock(*args, activation=activation,
                           force_pallas=True, interpret=True)
        want = _mlp_ref(*args, activation, 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_chunked_hidden_matches_unchunked(self):
        """splits>1 (the production W=768/F=3072 shape) accumulates the
        same result as one chunk."""
        from fashionern_aaai2024_tpu.ops.mlp import _mlp_diff, _mlp_ref

        args = self._inputs(f=512)
        a = _mlp_diff(*args, "quick_gelu", 1e-5, 1, 1, True)
        b = _mlp_diff(*args, "quick_gelu", 1e-5, 4, 1, True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
        want = _mlp_ref(*args, "quick_gelu", 1e-5)
        np.testing.assert_allclose(np.asarray(b), np.asarray(want), atol=2e-5)
        # grouped rows (gb>1): same function
        c = _mlp_diff(*args, "quick_gelu", 1e-5, 2, 2, True)
        np.testing.assert_allclose(np.asarray(c), np.asarray(want), atol=2e-5)

    def test_fallback_matches_kernel(self):
        from fashionern_aaai2024_tpu.ops.mlp import mlp_subblock

        args = self._inputs()
        a = mlp_subblock(*args, force_pallas=True, interpret=True)
        b = mlp_subblock(*args, force_pallas=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_exact_gelu_never_dispatches_pallas(self, monkeypatch):
        """Mosaic has no erf lowering: exact-GELU configs must take the
        XLA path even on a TPU host (regression: eval --quantize-towers
        with a scratch-init exact-GELU model crashed in-kernel)."""
        import fashionern_aaai2024_tpu.ops.mlp as M
        import fashionern_aaai2024_tpu.ops.qmlp as Q

        monkeypatch.setattr(M, "use_pallas", lambda: True)
        monkeypatch.setattr(Q, "use_pallas", lambda: True)
        args = self._inputs(b=8)  # pass every other dispatch condition
        args = (args[0].astype(jnp.bfloat16),) + args[1:]
        # without the activation gate these would attempt a real (non-
        # interpret) pallas_call on CPU and fail to lower
        got = M.mlp_subblock(*args, activation="gelu")
        want = M._mlp_ref(*args, "gelu", 1e-5)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32), atol=2e-2)
        got_q = Q.int8_mlp_subblock(*args, activation="gelu")
        assert np.isfinite(np.asarray(got_q, np.float32)).all()

    def test_pick_splits(self):
        from fashionern_aaai2024_tpu.ops.mlp import _pick_splits

        assert _pick_splits(3072) == 2      # ViT-B trunk: 2×1536
        assert _pick_splits(2048) == 2      # text tower: 2×1024
        assert _pick_splits(1536) == 1
        assert _pick_splits(512) == 1

    def test_grad_matches(self):
        from fashionern_aaai2024_tpu.ops.mlp import _mlp_ref, mlp_subblock

        args = self._inputs(b=2, s=10)

        def lp(*a):
            o = mlp_subblock(*a, force_pallas=True, interpret=True)
            return jnp.sum(jnp.tanh(o))

        def lr(*a):
            return jnp.sum(jnp.tanh(_mlp_ref(*a, "quick_gelu", 1e-5)))

        gp = jax.grad(lp, argnums=tuple(range(7)))(*args)
        gr = jax.grad(lr, argnums=tuple(range(7)))(*args)
        for a, c in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=2e-5, rtol=1e-4)


class TestPackedCrossAttention:
    """Packed-KV cross-attention kernel: interpret-mode exactness vs the
    [B,H,S,Dh] reference, Sq=1 (attnpool) shape, and gradient parity."""

    def _inputs(self, b=2, sq=7, sk=13, heads=2, dh=64, seed=3):
        g = np.random.default_rng(seed)
        w = heads * dh
        q = jnp.asarray(g.standard_normal((b, sq, w)), jnp.float32)
        kv = jnp.asarray(g.standard_normal((b, sk, 2 * w)), jnp.float32)
        return q, kv

    @pytest.mark.parametrize("sq", [1, 7])
    def test_matches_ref(self, sq):
        from fashionern_aaai2024_tpu.ops.attention import (
            _packed_cross_ref, packed_kv_cross_attention,
        )

        q, kv = self._inputs(sq=sq)
        got = packed_kv_cross_attention(q, kv, 2, force_pallas=True,
                                        interpret=True)
        bias = jnp.zeros((sq, kv.shape[1]), jnp.float32)
        want = _packed_cross_ref(q, kv, bias, 64 ** -0.5, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_grad_matches(self):
        from fashionern_aaai2024_tpu.ops.attention import (
            _packed_cross_ref, packed_kv_cross_attention,
        )

        q, kv = self._inputs()
        bias = jnp.zeros((q.shape[1], kv.shape[1]), jnp.float32)

        def lp(q_, kv_):
            o = packed_kv_cross_attention(q_, kv_, 2, force_pallas=True,
                                          interpret=True)
            return jnp.sum(jnp.tanh(o))

        def lr(q_, kv_):
            return jnp.sum(jnp.tanh(
                _packed_cross_ref(q_, kv_, bias, 64 ** -0.5, 2)))

        gp = jax.grad(lp, argnums=(0, 1))(q, kv)
        gr = jax.grad(lr, argnums=(0, 1))(q, kv)
        for a, c in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=2e-5, rtol=1e-4)


class TestTransformerBlockKernel:
    """Whole-block kernel (both halves in one program): interpret-mode
    exactness vs the composed sub-block references, causal masking,
    grouped rows, and gradient parity."""

    def _inputs(self, b=4, s=10, heads=2, dh=64, f=None, seed=11):
        g = np.random.default_rng(seed)
        w = heads * dh
        f = f or 4 * w
        mk = lambda *sh: jnp.asarray(g.standard_normal(sh) * 0.05, jnp.float32)
        return (jnp.asarray(g.standard_normal((b, s, w)), jnp.float32),
                mk(w) + 1, mk(w), mk(w, 3 * w), mk(3 * w), mk(w, w), mk(w),
                mk(w) + 1, mk(w), mk(w, f), mk(f), mk(f, w), mk(w))

    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_ref(self, causal):
        from fashionern_aaai2024_tpu.ops.block import (
            _block_ref, transformer_block,
        )

        args = self._inputs()
        got = transformer_block(*args, 2, causal=causal,
                                force_pallas=True, interpret=True)
        s = args[0].shape[1]
        bias = (jnp.where(jnp.tril(jnp.ones((s, s), bool)), 0.0, -1e30)
                .astype(jnp.float32) if causal
                else jnp.zeros((s, s), jnp.float32))
        want = _block_ref(*args, bias, 64 ** -0.5, 2, 1e-5, "quick_gelu")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)

    def test_fallback_matches_kernel(self):
        from fashionern_aaai2024_tpu.ops.block import transformer_block

        args = self._inputs()
        a = transformer_block(*args, 2, force_pallas=True, interpret=True)
        b = transformer_block(*args, 2, force_pallas=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)

    def test_grouped_rows_match(self):
        from fashionern_aaai2024_tpu.ops.block import _block_diff

        args = self._inputs(b=4)
        s = args[0].shape[1]
        bias = jnp.zeros((s, s), jnp.float32)
        a = _block_diff(*args, bias, 64 ** -0.5, 2, 1e-5, "quick_gelu", 1, True)
        b = _block_diff(*args, bias, 64 ** -0.5, 2, 1e-5, "quick_gelu", 4, True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)

    def test_grad_matches(self):
        from fashionern_aaai2024_tpu.ops.block import (
            _block_ref, transformer_block,
        )

        args = self._inputs(b=2, s=6)
        s = args[0].shape[1]
        bias = jnp.zeros((s, s), jnp.float32)

        def lp(*a):
            o = transformer_block(*a, 2, force_pallas=True, interpret=True)
            return jnp.sum(jnp.tanh(o))

        def lr(*a):
            o = _block_ref(*a, bias, 64 ** -0.5, 2, 1e-5, "quick_gelu")
            return jnp.sum(jnp.tanh(o))

        gp = jax.grad(lp, argnums=tuple(range(13)))(*args)
        gr = jax.grad(lr, argnums=tuple(range(13)))(*args)
        for a, c in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=3e-5, rtol=1e-4)


class TestInt8MlpSubblock:
    """Fused int8 MLP sub-block (serving): interpret-mode parity vs the
    identical-semantics XLA int8 formula, and closeness to fp32."""

    def _inputs(self, b=2, s=9, w=128, f=256, seed=17):
        g = np.random.default_rng(seed)
        return (jnp.asarray(g.standard_normal((b, s, w)), jnp.float32),
                jnp.asarray(1 + 0.1 * g.standard_normal((w,)), jnp.float32),
                jnp.asarray(0.1 * g.standard_normal((w,)), jnp.float32),
                jnp.asarray(g.standard_normal((w, f)) * 0.05, jnp.float32),
                jnp.asarray(g.standard_normal((f,)) * 0.05, jnp.float32),
                jnp.asarray(g.standard_normal((f, w)) * 0.05, jnp.float32),
                jnp.asarray(g.standard_normal((w,)) * 0.05, jnp.float32))

    def test_kernel_matches_xla_int8(self):
        from fashionern_aaai2024_tpu.ops.qmlp import (
            _qmlp_ref, int8_mlp_subblock,
        )

        args = self._inputs()
        got = int8_mlp_subblock(*args, force_pallas=True, interpret=True)
        want = _qmlp_ref(*args, "quick_gelu", 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-3)

    def test_close_to_fp32(self):
        """int8 quantization error stays at the expected ~1% level
        relative to the exact fp32 sub-block."""
        from fashionern_aaai2024_tpu.ops.mlp import _mlp_ref
        from fashionern_aaai2024_tpu.ops.qmlp import int8_mlp_subblock

        args = self._inputs()
        q = np.asarray(int8_mlp_subblock(*args, force_pallas=True,
                                         interpret=True))
        exact = np.asarray(_mlp_ref(*args, "quick_gelu", 1e-5))
        rel = np.abs(q - exact).max() / (np.abs(exact).max() + 1e-9)
        assert rel < 0.05, rel


class TestInt8AttentionSubblock:
    """int8-projection attention sub-block (serving): interpret parity
    vs the XLA int8 formula and closeness to the exact sub-block."""

    def _inputs(self, b=2, s=9, heads=2, dh=64, seed=23):
        g = np.random.default_rng(seed)
        w = heads * dh
        return (jnp.asarray(g.standard_normal((b, s, w)), jnp.float32),
                jnp.asarray(1 + 0.1 * g.standard_normal((w,)), jnp.float32),
                jnp.asarray(0.1 * g.standard_normal((w,)), jnp.float32),
                jnp.asarray(g.standard_normal((w, 3 * w)) * 0.05, jnp.float32),
                jnp.asarray(g.standard_normal((3 * w,)) * 0.05, jnp.float32),
                jnp.asarray(g.standard_normal((w, w)) * 0.05, jnp.float32),
                jnp.asarray(g.standard_normal((w,)) * 0.05, jnp.float32))

    @pytest.mark.parametrize("causal", [False, True])
    def test_kernel_matches_xla_int8(self, causal):
        from fashionern_aaai2024_tpu.ops.qmlp import (
            _qattn_ref, int8_attention_subblock,
        )

        args = self._inputs()
        got = int8_attention_subblock(*args, 2, causal=causal,
                                      force_pallas=True, interpret=True)
        s = args[0].shape[1]
        bias = (jnp.where(jnp.tril(jnp.ones((s, s), bool)), 0.0, -1e30)
                .astype(jnp.float32) if causal
                else jnp.zeros((s, s), jnp.float32))
        want = _qattn_ref(*args, bias, 64 ** -0.5, 2, 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4, rtol=5e-3)

    def test_close_to_exact(self):
        from fashionern_aaai2024_tpu.ops.attention import _subblock_ref
        from fashionern_aaai2024_tpu.ops.qmlp import int8_attention_subblock

        args = self._inputs()
        s = args[0].shape[1]
        q = np.asarray(int8_attention_subblock(
            *args, 2, force_pallas=True, interpret=True))
        exact = np.asarray(_subblock_ref(
            *args, jnp.zeros((s, s), jnp.float32), 64 ** -0.5, 2, 1e-5))
        rel = np.abs(q - exact).max() / (np.abs(exact).max() + 1e-9)
        assert rel < 0.05, rel
