"""Training-layer tests: schedule parity vs torch, loss semantics,
the pjit train step on the 8-device CPU mesh, checkpointing, and a
tiny end-to-end Trainer run on synthetic data."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

# whole module is pjit-train-step compile-heavy on the CPU mesh
pytestmark = pytest.mark.slow

from fashionern_aaai2024_tpu.models import composed
from fashionern_aaai2024_tpu.models.clip import config as clip_config
from fashionern_aaai2024_tpu.ops.losses import batch_based_classification_loss
from fashionern_aaai2024_tpu.parallel import mesh as meshlib
from fashionern_aaai2024_tpu.train.checkpoint import (
    BestCheckpointer,
    restore_params,
    restore_state,
    save_state,
)
from fashionern_aaai2024_tpu.train.schedule import (
    cosine_annealing_schedule,
    warmup_cosine_schedule,
)
from fashionern_aaai2024_tpu.train.state import create_train_state
from fashionern_aaai2024_tpu.train.step import build_train_step, grouped_bbc_loss

TINY = clip_config.CLIPConfig(
    name="vit-test",
    vision=clip_config.VisionConfig(
        kind="vit", image_size=32, embed_dim=24, width=64, layers=2, heads=4,
        patch_size=16,
    ),
    text=clip_config.TextConfig(
        vocab_size=100, context_length=16, width=32, heads=4, layers=2, embed_dim=24
    ),
)


def tiny_model():
    return composed.ComposedCIRModel(TINY, patch_num=13)


def tiny_batch(rng, b=16):
    return {
        "ref_image": rng.random((b, 32, 32, 3), dtype=np.float32),
        "tar_image": rng.random((b, 32, 32, 3), dtype=np.float32),
        "text_ids": rng.integers(0, 100, (b, 16)).astype(np.int32),
        "ref_patch": rng.standard_normal((b, 13, 24), dtype=np.float32),
        "tar_patch": rng.standard_normal((b, 13, 24), dtype=np.float32),
    }


def init_variables(model, batch):
    k = jax.random.PRNGKey(0)
    return model.init(
        {"params": k, "dropout": k},
        batch["ref_image"], batch["tar_image"], batch["text_ids"],
        batch["ref_patch"], batch["tar_patch"],
        deterministic=False, method=model.train_forward,
    )


class TestSchedules:
    def test_cosine_matches_torch_closed_form(self):
        """Per-iteration CosineAnnealingLR, incl. past T_max (the
        reference runs 300 epochs with T_max=100 epochs of steps)."""
        base, t_max = 4e-5, 50
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.Adam([p], lr=base)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=t_max)
        ours = cosine_annealing_schedule(base, t_max)
        for step in range(130):
            want = opt.param_groups[0]["lr"]
            got = float(ours(step))
            assert got == pytest.approx(want, rel=1e-5, abs=1e-12), step
            opt.step()
            sched.step()

    def test_warmup_cosine_shape(self):
        s = warmup_cosine_schedule(1.0, warmup_steps=10, total_steps=100)
        assert float(s(0)) == 0.0
        assert float(s(10)) == pytest.approx(1.0)
        assert float(s(5)) == pytest.approx(0.5)
        assert float(s(100)) == pytest.approx(0.0, abs=1e-6)
        assert float(s(55)) < float(s(20))


class TestGroupedLoss:
    def test_matches_per_group_mean(self, rng):
        pred = rng.standard_normal((16, 8), dtype=np.float32)
        tar = rng.standard_normal((16, 8), dtype=np.float32)
        got = float(grouped_bbc_loss(jnp.asarray(pred), jnp.asarray(tar), 4))
        want = np.mean([
            float(batch_based_classification_loss(
                jnp.asarray(pred[i * 4:(i + 1) * 4]), jnp.asarray(tar[i * 4:(i + 1) * 4])
            ))
            for i in range(4)
        ])
        assert got == pytest.approx(want, rel=1e-5)

    def test_one_group_is_plain_bbc(self, rng):
        pred = rng.standard_normal((8, 8), dtype=np.float32)
        tar = rng.standard_normal((8, 8), dtype=np.float32)
        got = float(grouped_bbc_loss(jnp.asarray(pred), jnp.asarray(tar), 1))
        want = float(batch_based_classification_loss(jnp.asarray(pred), jnp.asarray(tar)))
        assert got == pytest.approx(want, rel=1e-5)


class TestTrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(0)
        model = tiny_model()
        batch = tiny_batch(rng)
        variables = init_variables(model, batch)
        opt = optax.adam(1e-3)
        mesh = meshlib.create_mesh()
        return model, batch, variables, opt, mesh

    def test_loss_descends_and_clip_frozen(self, setup):
        model, batch, variables, opt, mesh = setup
        state = create_train_state(variables, opt, jax.random.PRNGKey(1))
        clip_before = jax.tree_util.tree_map(np.asarray, state.clip_params)
        ern_before = jax.tree_util.tree_map(np.asarray, state.ern_params)
        step = build_train_step(model, opt, negatives="local", local_groups=8, donate=False)
        losses = []
        for _ in range(6):
            db = meshlib.shard_batch(mesh, batch)
            state, loss = step(state, db)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        clip_after = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, state.clip_params)
        )
        for a, b in zip(jax.tree_util.tree_leaves(clip_before), clip_after):
            np.testing.assert_array_equal(a, b)
        ern_after = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, state.ern_params)
        )
        assert any(
            not np.array_equal(a, b)
            for a, b in zip(jax.tree_util.tree_leaves(ern_before), ern_after)
        )

    def test_bn_stats_update(self, setup):
        model, batch, variables, opt, mesh = setup
        state = create_train_state(variables, opt, jax.random.PRNGKey(1))
        before = jax.tree_util.tree_map(np.asarray, state.batch_stats)
        step = build_train_step(model, opt, donate=False)
        state, _ = step(state, meshlib.shard_batch(mesh, batch))
        after = jax.tree_util.tree_map(np.asarray, state.batch_stats)
        changed = [
            not np.allclose(a, b)
            for a, b in zip(
                jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
            )
        ]
        assert any(changed)

    def test_local_vs_global_negatives_differ(self, setup):
        model, batch, variables, opt, mesh = setup

        def run(**kw):
            state = create_train_state(variables, opt, jax.random.PRNGKey(1))
            step = build_train_step(model, opt, donate=False, **kw)
            _, loss = step(state, meshlib.shard_batch(mesh, batch))
            return float(loss)

        local = run(negatives="local", local_groups=8)
        glob = run(negatives="global")
        assert local != pytest.approx(glob)
        # fewer negatives per query → smaller CE on random features
        assert local < glob


class TestCheckpoint:
    def test_state_roundtrip(self, tmp_path, rng):
        model = tiny_model()
        batch = tiny_batch(np.random.default_rng(0), b=4)
        variables = init_variables(model, batch)
        opt = optax.adam(1e-3)
        state = create_train_state(variables, opt, jax.random.PRNGKey(1))
        step = build_train_step(model, opt, donate=False)
        state, _ = step(state, batch)
        path = str(tmp_path / "ckpt")
        save_state(path, state)
        template = create_train_state(variables, opt, jax.random.PRNGKey(1))
        restored = restore_state(path, template)
        assert int(restored.step) == 1
        for a, b in zip(
            jax.tree_util.tree_leaves(state.ern_params),
            jax.tree_util.tree_leaves(restored.ern_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_split_layout_writes_frozen_once(self, tmp_path, rng):
        """Default saves use the split layout: the frozen CLIP subtree
        lands in <path>.frozen exactly once; a second periodic save
        rewrites only the mutable part; restore merges both and every
        leaf (incl. frozen towers + opt state) round-trips bitwise."""
        import os

        model = tiny_model()
        batch = tiny_batch(np.random.default_rng(0), b=4)
        variables = init_variables(model, batch)
        opt = optax.adam(1e-3)
        state = create_train_state(variables, opt, jax.random.PRNGKey(1))
        step = build_train_step(model, opt, donate=False)
        state, _ = step(state, batch)
        path = str(tmp_path / "ckpt")
        save_state(path, state)
        fpath = path + ".frozen"
        assert os.path.isdir(fpath)
        frozen_mtime = os.path.getmtime(fpath)
        state2, _ = step(state, batch)
        save_state(path, state2)  # periodic overwrite
        assert os.path.getmtime(fpath) == frozen_mtime  # written once
        template = create_train_state(variables, opt, jax.random.PRNGKey(1))
        restored = restore_state(path, template)
        assert int(restored.step) == 2
        for a, b in zip(jax.tree_util.tree_leaves(state2),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_legacy_full_layout_still_restores(self, tmp_path, rng):
        """Checkpoints written before the split layout (or with
        frozen="full") restore unchanged."""
        model = tiny_model()
        batch = tiny_batch(np.random.default_rng(0), b=4)
        variables = init_variables(model, batch)
        opt = optax.adam(1e-3)
        state = create_train_state(variables, opt, jax.random.PRNGKey(1))
        path = str(tmp_path / "ckpt")
        save_state(path, state, frozen="full")
        import os

        assert not os.path.isdir(path + ".frozen")
        template = create_train_state(variables, opt, jax.random.PRNGKey(1))
        restored = restore_state(path, template)
        for a, b in zip(jax.tree_util.tree_leaves(state),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_frozen_fingerprint_rewrites_stale_towers(self, tmp_path):
        """ADVICE r4 (medium): a fresh run reusing a previous run's
        ckpt_dir with different frozen towers (other init seed / other
        loaded CLIP weights) must REWRITE <path>.frozen, not silently
        keep the stale towers; within one run the skip optimization
        stays. The decision is a process-local memo — no filesystem
        vote, no collective — so multi-process saves can never desync
        on it."""
        from fashionern_aaai2024_tpu.train import checkpoint as C

        model = tiny_model()
        batch = tiny_batch(np.random.default_rng(0), b=4)
        v1 = init_variables(model, batch)
        opt = optax.adam(1e-3)
        path = str(tmp_path / "ckpt")
        fpath = path + ".frozen"

        C._frozen_written.clear()  # fresh-process state, run 1
        s1 = create_train_state(v1, opt, jax.random.PRNGKey(1))
        save_state(path, s1, frozen_fingerprint="seed=1")
        mtime = os.path.getmtime(fpath)
        save_state(path, s1, frozen_fingerprint="seed=1")  # periodic
        assert os.path.getmtime(fpath) == mtime  # same-run skip kept

        # run 2: same ckpt_dir, DIFFERENT towers (the r4 silent-staleness
        # scenario). A fresh process starts with an empty memo.
        C._frozen_written.clear()
        v2 = jax.tree_util.tree_map(lambda x: x, v1)
        v2 = {
            "params": {
                "clip": jax.tree_util.tree_map(
                    lambda x: x + 1.0, v1["params"]["clip"]),
                "ern": v1["params"]["ern"],
            },
            **({"batch_stats": v1["batch_stats"]} if "batch_stats" in v1 else {}),
        }
        s2 = create_train_state(v2, opt, jax.random.PRNGKey(1))
        save_state(path, s2, frozen_fingerprint="seed=2")
        template = create_train_state(v1, opt, jax.random.PRNGKey(1))
        restored = restore_state(path, template)
        for a, b in zip(jax.tree_util.tree_leaves(s2.clip_params),
                        jax.tree_util.tree_leaves(restored.clip_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_best_checkpointer(self, tmp_path):
        bc = BestCheckpointer(str(tmp_path / "ckpt"), "fiq")
        params = {"w": np.ones((2, 2), np.float32)}
        assert bc.update(10.0, params)
        assert not bc.update(9.0, {"w": np.zeros((2, 2), np.float32)})
        assert bc.update(11.0, {"w": 2 * np.ones((2, 2), np.float32)})
        got = restore_params(bc.best_path, params)
        np.testing.assert_array_equal(got["w"], 2 * np.ones((2, 2)))


class SyntheticRelativeDataset:
    """FashionIQ-shaped triplets over a tiny universe of random images."""

    def __init__(self, n=32, seed=0):
        g = np.random.default_rng(seed)
        self.items = []
        for i in range(n):
            self.items.append({
                "ref_name": f"img{i}",
                "tar_name": f"img{(i + 1) % n}",
                "captions": ["make it red", "with longer sleeves"],
                "ref_image": g.random((32, 32, 3), dtype=np.float32),
                "tar_image": g.random((32, 32, 3), dtype=np.float32),
                "ref_patch": g.standard_normal((13, 24), dtype=np.float32),
                "tar_patch": g.standard_normal((13, 24), dtype=np.float32),
            })

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def fake_tokenizer(texts, context_length=16):
    out = np.zeros((len(texts), context_length), np.int32)
    for i, t in enumerate(texts):
        h = [hash(w) % 97 + 1 for w in t.split()][: context_length]
        out[i, : len(h)] = h
    return out


class TestTrainerEndToEnd:
    def test_two_epochs_with_validation(self, tmp_path):
        from fashionern_aaai2024_tpu.train.trainer import (
            DatasetPlugin, TrainConfig, Trainer, _fiq_captions,
        )

        cfg = TrainConfig(
            dataset="fashioniq", batch_size=2, num_epochs=2,
            validation_frequency=1, lr=1e-3, num_workers=0,
            ckpt_dir=str(tmp_path / "ckpt"), eval_batch_size=4,
            print_frequency=1000,
        )
        model = tiny_model()
        calls = []

        def validator(api):
            calls.append(1)
            q = api.query(
                np.ones((3, 24), np.float32),
                np.ones((3, 13, 24), np.float32),
                np.ones((3, 24), np.float32),
                np.ones((3, 16, 24), np.float32),
            )
            assert q.shape == (3, 24)
            return float(len(calls)), {"recall_at10": 1.0}

        plugin = DatasetPlugin(
            "synthetic", lambda c: SyntheticRelativeDataset(), _fiq_captions
        )
        mesh = meshlib.create_mesh(2)
        tr = Trainer(
            cfg, mesh=mesh, model=model,
            train_dataset=SyntheticRelativeDataset(),
            validator=validator, plugin=plugin, tokenizer=fake_tokenizer,
        )
        state = tr.train()
        assert int(state.step) > 0
        assert len(calls) == 2
        assert tr.best.best_metric == 2.0
        assert os.path.exists(tr.best.best_path)

    def test_resume_checkpoint(self, tmp_path):
        from fashionern_aaai2024_tpu.train.trainer import (
            DatasetPlugin, TrainConfig, Trainer, _fiq_captions,
        )

        cfg = TrainConfig(
            dataset="fashioniq", batch_size=2, num_epochs=1, lr=1e-3,
            num_workers=0, ckpt_dir=str(tmp_path / "ckpt"), print_frequency=1000,
        )
        plugin = DatasetPlugin(
            "synthetic", lambda c: SyntheticRelativeDataset(), _fiq_captions
        )
        tr = Trainer(
            cfg, mesh=meshlib.create_mesh(2), model=tiny_model(),
            train_dataset=SyntheticRelativeDataset(),
            validator=None, plugin=plugin, tokenizer=fake_tokenizer,
        )
        tr.train()
        path = tr.save_resume_checkpoint()
        assert os.path.exists(path)


def _synthetic_trainer(tmp_path, *, mesh_size=2, record_losses=None, **overrides):
    from fashionern_aaai2024_tpu.train.trainer import (
        DatasetPlugin, TrainConfig, Trainer, _fiq_captions,
    )

    plugin = DatasetPlugin(
        "synthetic", lambda c: SyntheticRelativeDataset(), _fiq_captions
    )
    base = dict(
        dataset="fashioniq", batch_size=2, num_epochs=1, lr=1e-3,
        num_workers=0, ckpt_dir=str(tmp_path / "ckpt"), print_frequency=1000,
    )
    base.update(overrides)
    tr = Trainer(
        TrainConfig(**base), mesh=meshlib.create_mesh(mesh_size),
        model=tiny_model(), train_dataset=SyntheticRelativeDataset(),
        validator=None, plugin=plugin, tokenizer=fake_tokenizer,
    )
    if record_losses is not None:
        orig = tr.step_fn

        def recording_step(state, batch):
            state, loss = orig(state, batch)
            record_losses.append(float(loss))
            return state, loss

        tr.step_fn = recording_step
    return tr


class TestResume:
    def test_resume_continues_original_schedule(self, tmp_path):
        """Resume picks up at the saved (epoch, step) and trains to
        `num_epochs` TOTAL — it does not restart the epoch loop."""
        tr = _synthetic_trainer(tmp_path, num_epochs=1)
        state = tr.train()
        steps = int(state.step)
        assert steps == tr.steps_per_epoch
        path = tr.save_resume_checkpoint()

        tr2 = _synthetic_trainer(tmp_path, num_epochs=2, resume_path=path)
        state2 = tr2.train()
        # epoch 0 is NOT re-run: exactly one more epoch of steps
        assert int(state2.step) == 2 * steps
        assert tr2.global_step == 2 * steps

    def test_resume_after_completion_is_noop(self, tmp_path):
        tr = _synthetic_trainer(tmp_path, num_epochs=1)
        steps = int(tr.train().step)
        path = tr.save_resume_checkpoint()
        tr2 = _synthetic_trainer(tmp_path, num_epochs=1, resume_path=path)
        assert int(tr2.train().step) == steps

    def test_resume_continuation_parity(self, tmp_path):
        """THE resume property (VERDICT r3 §weak-1): a run killed
        mid-epoch and resumed from the checkpoint produces the exact
        same per-step losses and final parameters as the uninterrupted
        control. Exercises mid-epoch data-order reconstruction
        (Loader.iter_batches), the per-step caption rng, fold_in(step)
        dropout, and restored optimizer/BN state together."""

        class Kill(Exception):
            pass

        control_losses: list[float] = []
        control = _synthetic_trainer(tmp_path, num_epochs=2, seed=7,
                                     record_losses=control_losses,
                                     ckpt_dir=str(tmp_path / "c"))
        control_state = control.train()
        total = int(control_state.step)
        spe = control.steps_per_epoch
        kill_at = spe + spe // 2 + 1  # mid-epoch-1, off the epoch boundary
        assert 0 < kill_at < total

        interrupted_losses: list[float] = []
        tr = _synthetic_trainer(tmp_path, num_epochs=2, seed=7,
                                record_losses=interrupted_losses,
                                ckpt_dir=str(tmp_path / "a"))
        orig = tr.step_fn

        def killing_step(state, batch):
            if tr.global_step >= kill_at:
                raise Kill
            return orig(state, batch)

        tr.step_fn = killing_step
        with pytest.raises(Kill):
            tr.train()
        assert tr.global_step == kill_at
        path = tr.save_resume_checkpoint()

        resumed_losses: list[float] = []
        tr2 = _synthetic_trainer(tmp_path, num_epochs=2, seed=7,
                                 record_losses=resumed_losses,
                                 ckpt_dir=str(tmp_path / "b"),
                                 resume_path=path)
        resumed_state = tr2.train()

        assert int(resumed_state.step) == total
        # per-step losses: interrupted prefix + resumed suffix == control
        full = interrupted_losses + resumed_losses
        assert len(full) == len(control_losses)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(control_losses))
        # final parameters bit-identical to the uninterrupted run
        for a, b in zip(jax.tree_util.tree_leaves(resumed_state.ern_params),
                        jax.tree_util.tree_leaves(control_state.ern_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_preserves_best_metric(self, tmp_path):
        tr = _synthetic_trainer(tmp_path, num_epochs=1)
        tr.train()
        tr.best.best_metric = 0.75
        path = tr.save_resume_checkpoint()
        tr2 = _synthetic_trainer(tmp_path, num_epochs=2, resume_path=path)
        tr2.maybe_resume()
        assert tr2.best.best_metric == 0.75


class TestTMETraining:
    def test_tme_trains_loss_decreases_params_move_off_zero(self, tmp_path):
        """VERDICT r4 #6: `tme=True` must actually LEARN. The module
        lives in the trainable ERN subtree (models/ern/tme.py) — the r4
        in-tower placement sat behind the frozen-CLIP stop_gradient and
        could never move. Asserts: stable training (finite, decreasing
        loss) and the zero-initialized cross-attn output projection
        moving off zero."""
        from fashionern_aaai2024_tpu.train.trainer import (
            DatasetPlugin, TrainConfig, Trainer, _fiq_captions,
        )

        tme_cfg = dataclasses.replace(
            TINY, text=dataclasses.replace(TINY.text, tme=True))
        model = composed.ComposedCIRModel(tme_cfg, patch_num=13)
        losses = []
        plugin = DatasetPlugin(
            "synthetic", lambda c: SyntheticRelativeDataset(), _fiq_captions
        )
        cfg = TrainConfig(
            dataset="fashioniq", batch_size=4, num_epochs=3, lr=1e-3,
            num_workers=0, ckpt_dir=str(tmp_path / "ckpt"),
            print_frequency=1000,
        )
        tr = Trainer(
            cfg, mesh=meshlib.create_mesh(2), model=model,
            train_dataset=SyntheticRelativeDataset(), validator=None,
            plugin=plugin, tokenizer=fake_tokenizer,
        )
        out0 = np.asarray(
            tr.state.ern_params["TME"]["cross_attn"]["out"]["kernel"])
        assert np.all(out0 == 0.0)  # zero-init start (vanilla parity)
        orig = tr.step_fn

        def recording(state, batch):
            state, loss = orig(state, batch)
            losses.append(float(loss))
            return state, loss

        tr.step_fn = recording
        state = tr.train()
        assert all(np.isfinite(losses)), losses
        k = max(1, len(losses) // 4)
        assert np.mean(losses[-k:]) < np.mean(losses[:k]), losses
        out1 = np.asarray(
            state.ern_params["TME"]["cross_attn"]["out"]["kernel"])
        assert np.abs(out1).max() > 0.0, "TME params never moved"


class TestGlobalNegatives:
    def test_shard_map_global_matches_single_device(self, rng):
        """negatives="global" inside shard_map (all_gather over the mesh)
        must equal the plain in-batch loss over the full global batch."""
        from jax.sharding import PartitionSpec as P

        pred = rng.standard_normal((16, 8)).astype(np.float32)
        tar = rng.standard_normal((16, 8)).astype(np.float32)
        want = float(batch_based_classification_loss(
            jnp.asarray(pred), jnp.asarray(tar)))

        mesh = meshlib.create_mesh(8)

        def local_loss(p, t):
            loss = batch_based_classification_loss(
                p, t, negatives="global", axis_name="data")
            return jax.lax.pmean(loss, "data")

        fn = jax.jit(jax.shard_map(
            local_loss, mesh=mesh,
            in_specs=(P("data", None), P("data", None)),
            out_specs=P(),
        ))
        got = float(fn(jnp.asarray(pred), jnp.asarray(tar)))
        assert got == pytest.approx(want, rel=1e-5)


class TestBf16Precision:
    def test_bf16_clip_fp32_fusion(self, tmp_path):
        from fashionern_aaai2024_tpu.train.trainer import (
            DatasetPlugin, TrainConfig, Trainer, _fiq_captions,
        )

        cfg = TrainConfig(
            dataset="fashioniq", batch_size=4, num_epochs=1, lr=1e-3,
            num_workers=0, ckpt_dir=str(tmp_path / "ckpt"),
            print_frequency=1000, precision="bf16",
        )
        plugin = DatasetPlugin(
            "synthetic", lambda c: SyntheticRelativeDataset(), _fiq_captions
        )
        tr = Trainer(
            cfg, mesh=meshlib.create_mesh(2), model=tiny_model(),
            train_dataset=SyntheticRelativeDataset(), validator=None,
            plugin=plugin, tokenizer=fake_tokenizer,
        )
        clip_dtypes = {x.dtype for x in jax.tree_util.tree_leaves(tr.state.clip_params)}
        ern_dtypes = {x.dtype for x in jax.tree_util.tree_leaves(tr.state.ern_params)}
        assert clip_dtypes == {np.dtype(jnp.bfloat16)}
        assert ern_dtypes == {np.dtype(jnp.float32)}
        state = tr.train()
        assert int(state.step) > 0
        # ERN stays fp32 after updates; loss finite
        assert {x.dtype for x in jax.tree_util.tree_leaves(state.ern_params)} == {np.dtype(jnp.float32)}

    def test_bad_precision_rejected(self, tmp_path):
        from fashionern_aaai2024_tpu.train.trainer import (
            DatasetPlugin, TrainConfig, Trainer, _fiq_captions,
        )

        plugin = DatasetPlugin(
            "synthetic", lambda c: SyntheticRelativeDataset(), _fiq_captions
        )
        with pytest.raises(ValueError, match="precision"):
            Trainer(
                TrainConfig(dataset="fashioniq", batch_size=2, num_workers=0,
                            ckpt_dir=str(tmp_path), precision="fp8"),
                mesh=meshlib.create_mesh(2), model=tiny_model(),
                train_dataset=SyntheticRelativeDataset(), validator=None,
                plugin=plugin, tokenizer=fake_tokenizer,
            )


class TestDeterminism:
    def test_same_seed_same_losses(self, tmp_path):
        """Full-run reproducibility: PRNGKey + host RNG discipline (the
        reference's setup_seed(42) role, `utils/utils.py:15-19`)."""
        from fashionern_aaai2024_tpu.train.trainer import (
            DatasetPlugin, TrainConfig, Trainer, _fiq_captions,
        )

        def run(tag):
            cfg = TrainConfig(
                dataset="fashioniq", batch_size=2, num_epochs=1, lr=1e-3,
                num_workers=0, ckpt_dir=str(tmp_path / tag), print_frequency=1000,
                seed=7,
            )
            plugin = DatasetPlugin(
                "synthetic", lambda c: SyntheticRelativeDataset(), _fiq_captions
            )
            tr = Trainer(
                cfg, mesh=meshlib.create_mesh(2), model=tiny_model(),
                train_dataset=SyntheticRelativeDataset(), validator=None,
                plugin=plugin, tokenizer=fake_tokenizer,
            )
            tr.train()
            return jax.tree_util.tree_map(np.asarray, tr.state.ern_params)

        a, b = run("a"), run("b")
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(x, y)


class TestFeatureTrainStep:
    def test_descends_on_cached_features(self, rng):
        """Feature-only training path (pre-extracted CLIP features, no
        image towers in the graph)."""
        from fashionern_aaai2024_tpu.train.step import build_feature_train_step

        model = tiny_model()
        batch = tiny_batch(np.random.default_rng(0), b=8)
        variables = init_variables(model, batch)
        opt = optax.adam(1e-3)
        state = create_train_state(variables, opt, jax.random.PRNGKey(1))
        step = build_feature_train_step(model, opt, donate=False)
        g = np.random.default_rng(1)
        fbatch = {
            "ref_feats": g.standard_normal((8, 24)).astype(np.float32),
            "tar_feats": g.standard_normal((8, 24)).astype(np.float32),
            "text_feats": g.standard_normal((8, 24)).astype(np.float32),
            "text_seq_feats": g.standard_normal((8, 16, 24)).astype(np.float32),
            "ref_patch": g.standard_normal((8, 13, 24)).astype(np.float32),
            "tar_patch": g.standard_normal((8, 13, 24)).astype(np.float32),
        }
        losses = []
        for _ in range(5):
            state, loss = step(state, fbatch)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestCachedFeatures:
    def test_cache_features_trains_and_matches_online_forward(self, tmp_path):
        """--cache-features: unique images are encoded once, the loss
        descends, and the cached-step forward equals the online
        train_forward numerics for the same batch (CLIP is frozen, so
        cached raw globals are exact)."""
        from fashionern_aaai2024_tpu.train.trainer import (
            DatasetPlugin, TrainConfig, Trainer, _fiq_captions,
        )

        cfg = TrainConfig(
            dataset="fashioniq", batch_size=4, num_epochs=2, lr=1e-3,
            num_workers=0, ckpt_dir=str(tmp_path / "ckpt"),
            print_frequency=1000, cache_features=True,
        )
        plugin = DatasetPlugin(
            "synthetic", lambda c: SyntheticRelativeDataset(), _fiq_captions
        )
        tr = Trainer(
            cfg, mesh=meshlib.create_mesh(2), model=tiny_model(),
            train_dataset=SyntheticRelativeDataset(),
            validator=None, plugin=plugin, tokenizer=fake_tokenizer,
        )
        state = tr.train()
        assert tr._feature_cache is not None
        assert len(tr._feature_cache) == 32  # every unique image, once
        # per-shard batch 4 x mesh 2 = global 8 -> 4 steps/epoch x 2
        assert int(state.step) == 2 * (32 // 8)

        # cached feats == online tower output (raw, pre-normalize)
        ds = tr.train_dataset
        import jax as _jax

        variables = tr.state.variables()
        item = ds[0]
        want = np.asarray(tr.model.apply(
            variables, item["ref_image"][None],
            method=tr.model.encode_image)[0][0])
        np.testing.assert_allclose(
            tr._feature_cache[item["ref_name"]], want, atol=1e-6)

    def test_lazy_fill_on_new_names(self, tmp_path):
        from fashionern_aaai2024_tpu.train.trainer import (
            DatasetPlugin, TrainConfig, Trainer, _fiq_captions,
        )

        cfg = TrainConfig(
            dataset="fashioniq", batch_size=4, num_epochs=1, lr=1e-3,
            num_workers=0, ckpt_dir=str(tmp_path / "ckpt"),
            print_frequency=1000, cache_features=True,
        )
        small = SyntheticRelativeDataset(n=8)
        plugin = DatasetPlugin(
            "synthetic", lambda c: small, _fiq_captions
        )
        tr = Trainer(
            cfg, mesh=meshlib.create_mesh(2), model=tiny_model(),
            train_dataset=small, validator=None, plugin=plugin,
            tokenizer=fake_tokenizer,
        )
        tr.build_feature_cache()
        assert len(tr._feature_cache) == 8
        # simulate a resample introducing new images mid-training
        g = np.random.default_rng(99)
        for it in small.items:
            it["ref_name"] = it["ref_name"] + "_v2"
            it["ref_image"] = g.random((32, 32, 3), dtype=np.float32)
        tr.train()
        assert len(tr._feature_cache) == 16  # lazily filled


class TestShardMapTrainStep:
    """The shard_map step (explicit pmean collectives, per-shard
    negatives) computes the same update as the GSPMD step for a
    deterministic forward."""

    def test_matches_gspmd_step(self):
        import optax

        from fashionern_aaai2024_tpu.train.state import create_train_state
        from fashionern_aaai2024_tpu.train.step import build_train_step

        model = tiny_model()
        mesh = meshlib.create_mesh(2)
        rngs = np.random.default_rng(0)
        host_batch = tiny_batch(rngs, b=8)
        variables = init_variables(model, host_batch)
        batch = meshlib.shard_batch(mesh, host_batch)
        opt = optax.sgd(1e-2)

        def det_forward(mdl, ref_image, tar_image, text_ids, ref_patch,
                        tar_patch, *, deterministic=False):
            # dropout-free forward so both paths are bit-comparable
            return mdl.train_forward(ref_image, tar_image, text_ids,
                                     ref_patch, tar_patch,
                                     deterministic=True)

        outs = {}
        for name, mesh_arg, groups in (("gspmd", None, 2),
                                       ("shard_map", mesh, 2)):
            state = create_train_state(variables, opt, jax.random.PRNGKey(7))
            step = build_train_step(model, opt, negatives="local",
                                    local_groups=groups, forward=det_forward,
                                    donate=False, mesh=mesh_arg)
            state2, loss = step(state, batch)
            outs[name] = (float(loss),
                          jax.tree_util.tree_leaves(state2.ern_params)[0])
        assert outs["gspmd"][0] == pytest.approx(outs["shard_map"][0], rel=1e-6)
        np.testing.assert_allclose(np.asarray(outs["gspmd"][1]),
                                   np.asarray(outs["shard_map"][1]),
                                   atol=1e-6)


class TestShardMapLocalGroupsGuard:
    def test_mismatched_local_groups_raise(self):
        """negatives='local' under shard_map uses per-shard groups; a
        local_groups that matches neither 1 nor the mesh size must fail
        loudly (ADVICE r2) instead of silently changing loss semantics."""
        import optax

        from fashionern_aaai2024_tpu.train.step import build_train_step

        mesh = meshlib.create_mesh(4)
        with pytest.raises(ValueError, match="local_groups"):
            build_train_step(
                object(), optax.sgd(1e-3), negatives="local",
                local_groups=8, mesh=mesh,
            )


class TestQuantizedTowerTraining:
    """`train --quantize-towers`: int8 frozen-tower MLPs inside the
    train step — the fallback when the image set outruns
    --cache-features (BASELINE.md r3 roofline: the full step is ~80%
    frozen-tower forward). Legal because the towers sit behind
    stop_gradient (models/composed.py:42); the int8 kernels carry no
    VJP and must never be asked for one."""

    def test_descends_clip_frozen_tree_unchanged(self):
        rng = np.random.default_rng(3)
        q_cfg = dataclasses.replace(TINY, quantize_mlp=True)
        model = composed.ComposedCIRModel(q_cfg, patch_num=13)
        batch = tiny_batch(rng)
        variables = init_variables(model, batch)

        # checkpoint-tree compatibility: quantization is a compute-path
        # flag, not a parameter change — same tree as the fp path
        ref_vars = init_variables(tiny_model(), batch)
        assert (jax.tree_util.tree_structure(variables)
                == jax.tree_util.tree_structure(ref_vars))

        opt = optax.adam(1e-3)
        mesh = meshlib.create_mesh()
        state = create_train_state(variables, opt, jax.random.PRNGKey(1))
        clip_before = jax.tree_util.tree_map(np.asarray, state.clip_params)
        step = build_train_step(model, opt, negatives="local",
                                local_groups=8, donate=False)
        losses = []
        for _ in range(6):
            state, loss = step(state, meshlib.shard_batch(mesh, batch))
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        for a, b in zip(jax.tree_util.tree_leaves(clip_before),
                        jax.tree_util.tree_leaves(
                            jax.tree_util.tree_map(np.asarray,
                                                   state.clip_params))):
            np.testing.assert_array_equal(a, b)

    def test_trainer_config_plumbs_flag(self):
        from fashionern_aaai2024_tpu.cli.main import build_parser

        args = build_parser().parse_args(
            ["train", "--dataset", "fashioniq", "--data-root", "/tmp/x",
             "--quantize-towers"])
        assert args.quantize_towers


class TestUint8TrainFeed:
    def test_u8_batch_matches_f32_loss(self):
        """The uint8 image feed (TrainConfig.image_dtype="uint8") flows
        raw pixels into the train step; CLIP.encode_image normalizes on
        device. Loss must match the host-normalized f32 feed."""
        from fashionern_aaai2024_tpu import native

        rng = np.random.default_rng(3)
        model = tiny_model()
        b = 16
        u8 = {
            "ref_image": rng.integers(0, 256, (b, 32, 32, 3), dtype=np.uint8),
            "tar_image": rng.integers(0, 256, (b, 32, 32, 3), dtype=np.uint8),
            "text_ids": rng.integers(0, 100, (b, 16)).astype(np.int32),
            "ref_patch": rng.standard_normal((b, 13, 24), dtype=np.float32),
            "tar_patch": rng.standard_normal((b, 13, 24), dtype=np.float32),
        }
        f32 = dict(u8, ref_image=native.normalize_images(u8["ref_image"]),
                   tar_image=native.normalize_images(u8["tar_image"]))
        variables = init_variables(model, f32)
        opt = optax.adam(1e-3)
        mesh = meshlib.create_mesh()
        step = build_train_step(model, opt, negatives="local",
                                local_groups=8, donate=False)
        losses = {}
        for key, batch in (("f32", f32), ("u8", u8)):
            state = create_train_state(variables, opt, jax.random.PRNGKey(1))
            _, loss = step(state, meshlib.shard_batch(mesh, batch))
            losses[key] = float(loss)
        assert np.isfinite(losses["u8"])
        np.testing.assert_allclose(losses["u8"], losses["f32"],
                                   rtol=0, atol=1e-5)
