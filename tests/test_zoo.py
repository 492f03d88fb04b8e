"""Model-zoo golden tests vs the reference torch modules
(`/root/reference/models/others/`). Modules whose reference file cannot
be imported (Artemis: broken `from utils import l2norm`; DQU-CIR:
needs open_clip) are checked against the same formula in torch."""

import sys
import types

import jax
import numpy as np
import pytest
import torch
import torch.nn.functional as F

sys.path.insert(0, "/root/reference")

from fashionern_aaai2024_tpu.models.zoo import (
    AMCEnsemble,
    AMCInteractionModule,
    Artemis,
    AttentionPooling,
    Clip4CirCombiner,
    DQUCIRHead,
    TwinAttentionCompositor,
    VTFModule,
    amc_interaction_from_torch,
    artemis_from_torch,
    attention_pooling_from_torch,
    cala_from_torch,
    combiner_from_torch,
    get_zoo_model,
    vtf_from_torch,
)

D = 16  # clip feature dim (zoo heads take 2*D concatenated feats)


def _np32(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


class TestCombiner:
    def test_golden(self, rng):
        from models.others.Combiner_Model import Combiner as TorchCombiner

        torch.manual_seed(0)
        tm = TorchCombiner(D, 4 * D, 8 * D).eval()
        img = _np32(rng, 6, 2 * D)
        txt = _np32(rng, 6, 2 * D)
        with torch.no_grad():
            want = tm(torch.tensor(img), torch.tensor(txt)).numpy()
        m = Clip4CirCombiner(D, 4 * D, 8 * D)
        got = m.apply(combiner_from_torch(tm.state_dict()), img, txt)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TestVTF:
    def test_golden(self, rng):
        from models.others.VTF_Model import VTFModule as TorchVTF

        torch.manual_seed(1)
        tm = TorchVTF(D, 4 * D, 8 * D).eval()
        img = _np32(rng, 5, 2 * D)
        txt = _np32(rng, 5, 2 * D)
        with torch.no_grad():
            want = tm(torch.tensor(img), torch.tensor(txt)).numpy()
        m = VTFModule(D, 4 * D, 8 * D)
        got = m.apply(vtf_from_torch(tm.state_dict()), img, txt)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TestAttentionPooling:
    def test_golden(self, rng):
        from models.others.attention_fusion_model import (
            AttentionPooling as TorchAP,
        )

        torch.manual_seed(2)
        tm = TorchAP(D, 7).eval()
        x = _np32(rng, 4, 7, D)
        with torch.no_grad():
            want = tm(torch.tensor(x)).numpy()
        m = AttentionPooling(emb_dim=D, emb_num=7)
        got = m.apply(attention_pooling_from_torch(tm.state_dict()), x)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TestCaLa:
    def test_golden(self, rng):
        from models.others.CaLa_Model import TwinAttentionCompositorBLIP2

        torch.manual_seed(3)
        tm = TwinAttentionCompositorBLIP2(D).eval()
        ref = _np32(rng, 3, 5, D)
        tar = _np32(rng, 3, 5, D)
        with torch.no_grad():
            want = tm(torch.tensor(ref), torch.tensor(tar)).numpy()
        m = TwinAttentionCompositor(D)
        got = m.apply(cala_from_torch(tm.state_dict()), ref, tar)
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


class TestAMC:
    @pytest.fixture()
    def opt(self):
        return types.SimpleNamespace(embed_size=D, hid_router=8)

    def test_interaction_golden(self, rng, opt):
        from models.others.AMC_Model import InteractionModule

        torch.manual_seed(4)
        tm = InteractionModule(opt).eval()
        rgn = _np32(rng, 2, 6, D)
        img = _np32(rng, 2, D)
        wrd = _np32(rng, 2, 9, D)
        stc = _np32(rng, 2, D)
        with torch.no_grad():
            w1, w2, p1, p2 = tm(torch.tensor(rgn), torch.tensor(img),
                                torch.tensor(wrd), torch.tensor(stc), None)
        m = AMCInteractionModule(embed_size=D, hid_router=8)
        g1, g2, q1, q2 = m.apply(
            amc_interaction_from_torch(tm.state_dict()), rgn, img, wrd, stc
        )
        np.testing.assert_allclose(np.asarray(q1), p1.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(g1), w1.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(g2), w2.numpy(), atol=5e-5)

    def test_ensemble_runs(self, rng):
        m = AMCEnsemble(embed_size=D)
        rgn = _np32(rng, 2, 6, D)
        v = m.init(jax.random.PRNGKey(0), rgn, _np32(rng, 2, D),
                   _np32(rng, 2, 9, D), _np32(rng, 2, D))
        out = m.apply(v, rgn, _np32(rng, 2, D), _np32(rng, 2, 9, D), _np32(rng, 2, D))
        assert out.shape == (2, 6, D)


class TestArtemis:
    def test_formula(self, rng):
        """Reference file is unimportable (broken l2norm import); check
        against the same torch formula with the converted weights."""
        m = Artemis(D)
        r = _np32(rng, 4, D)
        mm = _np32(rng, 4, D)
        t = _np32(rng, 4, D)
        v = m.init(jax.random.PRNGKey(5), r, mm, t)
        per_triple = m.apply(v, r, mm, t)
        matrix = m.apply(v, r, mm, t, broadcast=True)
        # diagonal of broadcast == per-triple scores
        np.testing.assert_allclose(np.asarray(jax_diag(matrix)),
                                   np.asarray(per_triple), atol=1e-5)
        assert matrix.shape == (4, 4)

    def test_converter_shapes(self):
        torch.manual_seed(6)
        sd = {
            "Transform_m.0.weight": torch.randn(D, D),
            "Transform_m.0.bias": torch.randn(D),
            "Attention_EM.attention.0.weight": torch.randn(D, D),
            "Attention_EM.attention.0.bias": torch.randn(D),
            "Attention_EM.attention.2.weight": torch.randn(D, D),
            "Attention_EM.attention.2.bias": torch.randn(D),
            "Attention_IS.attention.0.weight": torch.randn(D, D),
            "Attention_IS.attention.0.bias": torch.randn(D),
            "Attention_IS.attention.2.weight": torch.randn(D, D),
            "Attention_IS.attention.2.bias": torch.randn(D),
            "temperature": torch.tensor([2.65926]),
        }
        variables = artemis_from_torch(sd)
        m = Artemis(D)
        g = np.random.default_rng(0)
        out = m.apply(variables, _np32(g, 3, D), _np32(g, 3, D), _np32(g, 3, D))
        assert out.shape == (3,)
        # EM+IS of normalized products is bounded by 2
        assert np.all(np.abs(np.asarray(out)) <= 2.0 + 1e-5)


def jax_diag(x):
    import jax.numpy as jnp

    return jnp.diagonal(x)


class TestDQUCIR:
    def test_formula(self, rng):
        tq = _np32(rng, 4, D)
        vq = _np32(rng, 4, D)
        m = DQUCIRHead(hidden_dim=8)
        v = m.init(jax.random.PRNGKey(7), tq, vq)
        out = m.apply(v, tq, vq)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0,
                                   atol=1e-5)
        # reproduce with torch given the same weights
        p = v["params"]
        tqn = F.normalize(torch.tensor(tq), dim=-1)
        vqn = F.normalize(torch.tensor(vq), dim=-1)
        comb = torch.relu(
            torch.cat([tqn, vqn], -1) @ torch.tensor(np.asarray(p["combiner_fc_0"]["kernel"]))
            + torch.tensor(np.asarray(p["combiner_fc_0"]["bias"]))
        )
        h = torch.relu(comb @ torch.tensor(np.asarray(p["scaler_fc_0"]["kernel"]))
                       + torch.tensor(np.asarray(p["scaler_fc_0"]["bias"])))
        sc = torch.sigmoid(h @ torch.tensor(np.asarray(p["scaler_fc_3"]["kernel"]))
                           + torch.tensor(np.asarray(p["scaler_fc_3"]["bias"])))
        want = F.normalize(sc * tqn + (1 - sc) * vqn, dim=-1).numpy()
        np.testing.assert_allclose(np.asarray(out), want, atol=2e-5)

    def test_ranking_nce_matches_torch(self, rng):
        from fashionern_aaai2024_tpu.models.zoo.dqu_cir import ranking_nce_loss

        q = _np32(rng, 5, D)
        t = _np32(rng, 5, D)
        want = float(F.cross_entropy(
            10.0 * torch.tensor(q) @ torch.tensor(t).t(), torch.arange(5)
        ))
        got = float(ranking_nce_loss(q, t, 10.0))
        assert got == pytest.approx(want, rel=1e-5)


class TestRegistry:
    def test_get(self):
        m = get_zoo_model("clip4cir_combiner", clip_feature_dim=D,
                          projection_dim=4 * D, hidden_dim=8 * D)
        assert isinstance(m, Clip4CirCombiner)

    def test_unknown(self):
        with pytest.raises(ValueError, match="unknown zoo model"):
            get_zoo_model("bogus")


@pytest.mark.slow
class TestCompoDiff:
    def test_forward_shapes(self, rng):
        from fashionern_aaai2024_tpu.models.zoo.compodiff import CompoDiffNetwork

        m = CompoDiffNetwork(dim=32, depth=2, dim_head=16, heads=4,
                             text_cond_dim=48, mask_hw=8)
        b = 2
        img_emb = _np32(rng, b, 1, 32)
        img_cond = _np32(rng, b, 5, 32)
        txt_cond = _np32(rng, b, 7, 48)
        mask = _np32(rng, b, 8, 8)
        t = np.array([3.0, 11.0], np.float32)
        v = m.init(jax.random.PRNGKey(8), img_emb, img_cond, txt_cond, mask, t)
        out = m.apply(v, img_emb, img_cond, txt_cond, mask, t)
        assert out.shape == (b, 1, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_cfg_scale_one_is_plain_forward(self, rng):
        from fashionern_aaai2024_tpu.models.zoo.compodiff import CompoDiffNetwork

        m = CompoDiffNetwork(dim=32, depth=1, dim_head=16, heads=2,
                             text_cond_dim=48, mask_hw=8)
        b = 2
        args = (_np32(rng, b, 1, 32), _np32(rng, b, 5, 32), _np32(rng, b, 7, 48),
                _np32(rng, b, 8, 8), np.array([3.0, 11.0], np.float32))
        v = m.init(jax.random.PRNGKey(9), *args)
        plain = m.apply(v, *args)
        cfg = m.apply(v, *args, _np32(rng, b, 7, 48), 1.0,
                      method=m.forward_with_cond_scale)
        np.testing.assert_allclose(np.asarray(cfg), np.asarray(plain), atol=1e-6)

    def test_cfg_triple_combination(self, rng):
        from fashionern_aaai2024_tpu.models.zoo.compodiff import CompoDiffNetwork

        m = CompoDiffNetwork(dim=32, depth=1, dim_head=16, heads=2,
                             text_cond_dim=48, mask_hw=8)
        b = 2
        ie, ic, tc, mk = (_np32(rng, b, 1, 32), _np32(rng, b, 5, 32),
                          _np32(rng, b, 7, 48), _np32(rng, b, 8, 8))
        ts = np.array([3.0, 11.0], np.float32)
        tcu = _np32(rng, b, 7, 48)
        v = m.init(jax.random.PRNGKey(10), ie, ic, tc, mk, ts)
        got = m.apply(v, ie, ic, tc, mk, ts, tcu, (1.5, 2.0),
                      method=m.forward_with_cond_scale)
        logits = m.apply(v, ie, ic, tc, mk, ts)
        null_text = m.apply(v, ie, ic, tcu, mk, ts)
        null_all = m.apply(v, ie, np.zeros_like(ic), tcu, mk, ts)
        want = null_all + (logits - null_text) * 2.0 + (null_text - null_all) * 1.5
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_relposbias_matches_t5_reference(self):
        """Bucket function vs the reference torch implementation
        (`CompoDiff_Model.py:462-477`), reproduced here in torch."""
        from fashionern_aaai2024_tpu.models.zoo.compodiff import _rel_pos_bucket

        def torch_bucket(rel, num_buckets=32, max_distance=128):
            import math as _m

            n = torch.max(-rel, torch.zeros_like(rel))
            max_exact = num_buckets // 2
            is_small = n < max_exact
            val = max_exact + (
                torch.log(n.float() / max_exact) / _m.log(max_distance / max_exact)
                * (num_buckets - max_exact)
            ).long()
            val = torch.min(val, torch.full_like(val, num_buckets - 1))
            return torch.where(is_small, n, val)

        i, j = 9, 10
        rel = torch.arange(j)[None, :] - torch.arange(i)[:, None]
        want = torch_bucket(rel).numpy()
        got = np.asarray(_rel_pos_bucket(np.asarray(rel.numpy())))
        np.testing.assert_array_equal(got, want)

    def test_rotary_preserves_norm(self, rng):
        from fashionern_aaai2024_tpu.models.zoo.compodiff import rotate_queries_or_keys

        t = _np32(rng, 2, 4, 6, 16)
        out = np.asarray(rotate_queries_or_keys(t, 8))
        assert out.shape == t.shape
        np.testing.assert_allclose(
            np.linalg.norm(out[..., :8], axis=-1),
            np.linalg.norm(t[..., :8], axis=-1), atol=1e-5,
        )
        np.testing.assert_array_equal(out[..., 8:], t[..., 8:])
