"""Ablation-loss registry tests: parity vs torch formulas (the
reference loss modules hardcode `.cuda()` so CPU-safe ones are imported
directly; the rest are checked against the same formula in torch)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fashionern_aaai2024_tpu.ops.extra_losses import (
    LOGIT_SCALE_INIT,
    TextRelevanceBank,
    accuracy,
    cross_entropy_loss,
    cyclip_loss,
    get_loss,
    rank_loss,
    text_relevance_loss,
)

sys.path.insert(0, "/root/reference")


class TestCE:
    def test_matches_torch(self, rng):
        logits = rng.standard_normal((6, 10)).astype(np.float32)
        labels = rng.integers(0, 10, 6)
        want = float(F.cross_entropy(torch.tensor(logits), torch.tensor(labels)))
        got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
        assert got == pytest.approx(want, rel=1e-5)

    def test_accuracy_matches_reference(self, rng):
        from losses.others.ce_loss import accuracy as torch_accuracy

        logits = rng.standard_normal((8, 5)).astype(np.float32)
        labels = rng.integers(0, 5, 8)
        want = [float(x) for x in torch_accuracy(
            torch.tensor(logits), torch.tensor(labels), topk=(1, 3)
        )]
        got = [float(x) for x in accuracy(jnp.asarray(logits), jnp.asarray(labels), (1, 3))]
        assert got == pytest.approx(want)


class TestRank:
    def test_matches_reference(self, rng):
        from losses.others.rank_loss import RankLoss

        # margin_pos=0.6 so the ignore mask actually fires on some rows
        inputs = rng.standard_normal((10, 2)).astype(np.float32)
        targets = rng.integers(0, 2, 10)
        want = float(RankLoss(margin_pos=0.6, margin_neg=0.1)(
            torch.tensor(inputs), torch.tensor(targets)
        ))
        got = float(rank_loss(
            jnp.asarray(inputs), jnp.asarray(targets), margin_pos=0.6, margin_neg=0.1
        ))
        assert got == pytest.approx(want, rel=1e-5)


class TestCyCLIP:
    def test_matches_torch_formula(self, rng):
        b, d = 6, 8
        img = rng.standard_normal((b, d)).astype(np.float32)
        txt = rng.standard_normal((b, d)).astype(np.float32)
        s = LOGIT_SCALE_INIT
        ti, tt = torch.tensor(img), torch.tensor(txt)
        l_it = s * ti @ tt.t()
        l_ti = s * tt @ ti.t()
        l_ii = s * ti @ ti.t()
        l_tt = s * tt @ tt.t()
        gt = torch.arange(b)
        contrastive = (F.cross_entropy(l_it, gt) + F.cross_entropy(l_ti, gt)) / 2
        crossmodal = (l_ti - l_it).square().mean() / (s * s) * b
        inmodal = (l_ii - l_tt).square().mean() / (s * s) * b
        want = float(contrastive + 0.25 * inmodal + 0.25 * crossmodal)
        got = float(cyclip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(s)))
        assert got == pytest.approx(want, rel=1e-4)


class TestTextRelevance:
    def test_empty_bank_equals_double_contrastive(self, rng):
        """First call: bank holds exactly the current batch, so the two
        bank terms equal the two in-batch terms."""
        b, d = 4, 8
        img = np.linalg.qr(rng.standard_normal((d, b)))[0].T[:, :d].astype(np.float32)
        txt = rng.standard_normal((b, d)).astype(np.float32)
        bank = TextRelevanceBank.create(capacity=40, dim=d)
        s = jnp.asarray(LOGIT_SCALE_INIT)
        loss, bank2 = text_relevance_loss(bank, jnp.asarray(img), jnp.asarray(txt), s)
        ti, tt = torch.tensor(np.asarray(img)), torch.tensor(txt)
        gt = torch.arange(b)
        li = F.cross_entropy(s.item() * ti @ tt.t(), gt)
        lt = F.cross_entropy(s.item() * tt @ ti.t(), gt)
        assert float(loss) == pytest.approx(float((li + lt) / 2), rel=1e-4)
        assert int(bank2.size) == b

    def test_bank_accumulates_and_caps(self, rng):
        b, d, cap = 4, 8, 10
        bank = TextRelevanceBank.create(capacity=cap, dim=d)
        s = jnp.asarray(LOGIT_SCALE_INIT)
        for i in range(4):
            img = rng.standard_normal((b, d)).astype(np.float32)
            txt = rng.standard_normal((b, d)).astype(np.float32)
            loss, bank = text_relevance_loss(bank, jnp.asarray(img), jnp.asarray(txt), s)
            assert np.isfinite(float(loss))
        assert int(bank.size) == cap
        # newest batch sits at the front rows
        np.testing.assert_allclose(np.asarray(bank.query[:b]), img, rtol=1e-6)


class TestRegistry:
    def test_known_names(self):
        for name in ("bbc", "ce", "rank", "cyclip", "text_relevance", "text_generation"):
            assert get_loss(name).name == name

    def test_unknown_name(self):
        with pytest.raises(ValueError, match="unknown loss"):
            get_loss("nope")

    def test_bbc_dispatch(self, rng):
        pred = rng.standard_normal((4, 8)).astype(np.float32)
        tar = rng.standard_normal((4, 8)).astype(np.float32)
        spec = get_loss("bbc")
        assert np.isfinite(float(spec.fn(jnp.asarray(pred), jnp.asarray(tar))))


class TestExtrasUtils:
    def test_concat_global_local(self, rng):
        from fashionern_aaai2024_tpu.utils.extras import concat_global_local_feats

        g = jnp_arr(rng, 4, 8)
        l = jnp_arr(rng, 4, 13, 8)
        out = concat_global_local_feats(g, l)
        assert out.shape == (4, 14, 8)
        np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(g))

    def test_element_wise_sum_matches_torch(self, rng):
        from fashionern_aaai2024_tpu.utils.extras import element_wise_sum

        a = rng.standard_normal((3, 6)).astype(np.float32)
        b = rng.standard_normal((3, 6)).astype(np.float32)
        want = F.normalize(torch.tensor(a) + torch.tensor(b), dim=-1).numpy()
        got = np.asarray(element_wise_sum(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_cutout_changes_pixels_deterministically(self):
        from PIL import Image

        from fashionern_aaai2024_tpu.utils.extras import cutout

        img1 = Image.new("RGB", (32, 32), (0, 0, 0))
        img2 = Image.new("RGB", (32, 32), (0, 0, 0))
        cutout(img1, rng=np.random.default_rng(5))
        cutout(img2, rng=np.random.default_rng(5))
        a1, a2 = np.asarray(img1), np.asarray(img2)
        assert a1.sum() > 0           # something was painted
        np.testing.assert_array_equal(a1, a2)

    def test_ema(self, rng):
        from fashionern_aaai2024_tpu.utils.extras import EmaState

        p0 = {"w": jnp.zeros((3,))}
        ema = EmaState.create(p0, decay=0.9)
        ema = ema.update({"w": jnp.ones((3,))})
        np.testing.assert_allclose(np.asarray(ema.params["w"]), 0.1, atol=1e-6)
        ema = ema.set({"w": jnp.full((3,), 7.0)})
        np.testing.assert_allclose(np.asarray(ema.params["w"]), 7.0)


def jnp_arr(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))
