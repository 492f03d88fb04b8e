"""Golden parity: our flax fusion stack vs the reference PyTorch modules.

The reference's `models/fusion_model.py` is pure torch+transformers (no
open_clip / no missing TME symbols), so it is imported directly from the
read-only mount and executed in eval mode to produce goldens. Weights
flow torch → flax through models.ern.convert.
"""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, requires_reference

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from fashionern_aaai2024_tpu.models.ern import convert, fusion
from fashionern_aaai2024_tpu.models.ern.ern import ERN
from fashionern_aaai2024_tpu.models.ern.layers import TorchMultiheadAttention

DIM = 128  # keep test fast; reference dims are 512/640


@pytest.fixture(scope="module")
def ref_mod():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import models.fusion_model as m

    return m


def _seed_all():
    torch.manual_seed(0)
    np.random.seed(0)


@requires_reference
class TestCombinerParity:
    def test_eval_forward(self, ref_mod, rng):
        _seed_all()
        t = ref_mod.CombinerSimple(DIM, DIM * 4, DIM * 8).eval()
        params = convert.combiner_from_torch(
            {"x." + k: v for k, v in t.state_dict().items()}, "x"
        )
        img = rng.normal(size=(4, DIM)).astype(np.float32)
        txt = rng.normal(size=(4, DIM)).astype(np.float32)
        with torch.no_grad():
            want = t(torch.from_numpy(img), torch.from_numpy(txt)).numpy()
        got = fusion.CombinerSimple(DIM).apply(
            {"params": params}, jnp.asarray(img), jnp.asarray(txt), deterministic=True
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@requires_reference
class TestVisualSRParity:
    def test_eval_forward(self, ref_mod, rng):
        _seed_all()
        t = ref_mod.VisualSR(embed_dim=DIM, num_region=13)
        # push non-trivial running stats through a train-mode pass
        t.train()
        with torch.no_grad():
            t(torch.from_numpy(rng.normal(size=(8, 13, DIM)).astype(np.float32)))
        t.eval()
        sd = {"x." + k: v for k, v in t.state_dict().items()}
        params, stats = convert.visual_sr_from_torch(sd, "x")
        x = rng.normal(size=(4, 13, DIM)).astype(np.float32)
        with torch.no_grad():
            want = t(torch.from_numpy(x)).numpy()
        got = fusion.VisualSR(DIM).apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x), deterministic=True
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@requires_reference
class TestMultiheadAttentionParity:
    def test_cross_attention(self, rng):
        _seed_all()
        t = torch.nn.MultiheadAttention(DIM, 8, dropout=0.1, batch_first=True).eval()
        sd = {"x." + k: v for k, v in t.state_dict().items()}
        params = convert.mha_from_torch(sd, "x")
        q = rng.normal(size=(3, 77, DIM)).astype(np.float32)
        kv = rng.normal(size=(3, 13, DIM)).astype(np.float32)
        with torch.no_grad():
            want, _ = t(torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv))
        got = TorchMultiheadAttention(DIM, 8, dropout=0.1).apply(
            {"params": params}, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv),
            deterministic=True,
        )
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


@requires_reference
class TestPlusModelParity:
    def test_eval_forward(self, ref_mod, rng):
        _seed_all()
        t = ref_mod.PlusModel(feature_dim=DIM, device="cpu", layers=2).eval()
        with torch.no_grad():
            t.cls_token.normal_()  # make the CLS token non-trivial
        sd = {"x." + k: v for k, v in t.state_dict().items()}
        sd["x.cls_token"] = t.cls_token  # survives the .to() deregistration quirk
        params = convert.plus_model_from_torch(sd, "x", layers=2)
        ref = rng.normal(size=(2, 13, DIM)).astype(np.float32)
        txt = rng.normal(size=(2, 77, DIM)).astype(np.float32)
        with torch.no_grad():
            w_norm, w_hidden, w_pool = t(torch.from_numpy(ref), torch.from_numpy(txt))
        g_norm, g_hidden, g_pool = fusion.PlusModel(DIM, layers=2).apply(
            {"params": params}, jnp.asarray(ref), jnp.asarray(txt), deterministic=True
        )
        np.testing.assert_allclose(np.asarray(g_hidden), w_hidden.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(g_pool), w_pool.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(g_norm), w_norm.numpy(), atol=2e-4)


@requires_reference
class TestDVRParity:
    def test_eval_forward(self, ref_mod, rng):
        _seed_all()
        t = ref_mod.DVR_module(feature_dim=DIM, device="cpu")
        t.train()
        with torch.no_grad():  # populate BN running stats
            t.SR_module(torch.from_numpy(rng.normal(size=(8, 13, DIM)).astype(np.float32)))
        t.eval()
        sd = {"DVR." + k: v for k, v in t.state_dict().items()}
        sd["DVR.transformer_layer.cls_token"] = t.transformer_layer.cls_token
        params, stats = convert.dvr_from_torch(sd, "DVR")
        rp = rng.normal(size=(2, 13, DIM)).astype(np.float32)
        ts = rng.normal(size=(2, 77, DIM)).astype(np.float32)
        rg = rng.normal(size=(2, DIM)).astype(np.float32)
        tg = rng.normal(size=(2, DIM)).astype(np.float32)
        with torch.no_grad():
            want = t(*map(torch.from_numpy, (rp, ts, rg, tg))).numpy()
        got = fusion.DVRModule(DIM).apply(
            {"params": params, "batch_stats": stats},
            *map(jnp.asarray, (rp, ts, rg, tg)),
            deterministic=True,
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


@requires_reference
class TestERNParity:
    @pytest.fixture(scope="class")
    def torch_ern(self, ref_mod):
        _seed_all()

        class RefERNNoClip(torch.nn.Module):
            """Reference ERN minus the CLIP wrappers (same trainable tree,
            same state_dict names — `models/model.py:7-20`)."""

            def __init__(self):
                super().__init__()
                self.DVR = ref_mod.DVR_module(feature_dim=DIM, device="cpu")
                self.SR_module = ref_mod.VisualSR(embed_dim=DIM)
                self.Combiner_module = ref_mod.CombinerSimple(DIM, DIM * 4, DIM * 8)

        t = RefERNNoClip()
        t.train()
        with torch.no_grad():
            x = torch.randn(8, 13, DIM)
            t.DVR.SR_module(x)
            t.SR_module(x)
        t.eval()
        return t

    def _variables(self, t):
        sd = dict(t.state_dict())
        sd["DVR.transformer_layer.cls_token"] = t.DVR.transformer_layer.cls_token
        return convert.ern_variables_from_torch(sd)

    def test_index_mode(self, torch_ern, rng):
        variables = self._variables(torch_ern)
        tf = rng.normal(size=(4, DIM)).astype(np.float32)
        tl = rng.normal(size=(4, 13, DIM)).astype(np.float32)
        with torch.no_grad():
            center = torch_ern.SR_module(torch.from_numpy(tl))
            want = torch_ern.Combiner_module(torch.from_numpy(tf), center).numpy()
        got = ERN(DIM).apply(
            variables, tar_feats=jnp.asarray(tf), tar_local_feats=jnp.asarray(tl),
            mode="index",
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_query_mode(self, torch_ern, rng):
        variables = self._variables(torch_ern)
        rf = rng.normal(size=(4, DIM)).astype(np.float32)
        rl = rng.normal(size=(4, 13, DIM)).astype(np.float32)
        tx = rng.normal(size=(4, DIM)).astype(np.float32)
        txs = rng.normal(size=(4, 77, DIM)).astype(np.float32)
        with torch.no_grad():
            want = torch_ern.DVR(*map(torch.from_numpy, (rl, txs, rf, tx))).numpy()
        got = ERN(DIM).apply(
            variables,
            ref_feats=jnp.asarray(rf), ref_local_feats=jnp.asarray(rl),
            text_feats=jnp.asarray(tx), text_seq_feats=jnp.asarray(txs),
            mode="test",
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
