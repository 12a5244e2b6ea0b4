"""Core substrate tests: config composition, checkpointing, mesh, loaders."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibravox_tpu.core.checkpoint import CheckpointManager
from vibravox_tpu.core.config import Config, compose, instantiate
from vibravox_tpu.data.loader import DataLoader
from vibravox_tpu.parallel.mesh import MeshConfig, build_mesh, shard_batch

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"


class TestConfigCompose:
    def test_group_selection_and_interpolation(self):
        cfg = compose(CONFIG_DIR, "run", ["lightning_datamodule=bwe", "lightning_module=eben"])
        assert cfg.lightning_datamodule.sample_rate == 16000
        assert cfg.description == "bwe: rigid_in_ear_microphone"
        assert "EBEN(M=4,P=2,Q=4)" in cfg.lightning_module.description
        # nested defaults with @renaming resolved
        assert cfg.lightning_module.generator_optimizer._partial_ is True
        assert cfg.lightning_module.generator_optimizer.lr == pytest.approx(3e-4)

    def test_value_overrides(self):
        cfg = compose(CONFIG_DIR, "run", [
            "lightning_datamodule=bwe", "lightning_module=eben",
            "lightning_datamodule.batch_size=4",
            "++trainer.max_epochs=7",
            "+trainer.brand_new_key=hello",
        ])
        assert cfg.lightning_datamodule.batch_size == 4
        assert cfg.trainer.max_epochs == 7
        assert cfg.trainer.brand_new_key == "hello"

    def test_plus_on_existing_key_fails(self):
        with pytest.raises(ValueError):
            compose(CONFIG_DIR, "run", [
                "lightning_datamodule=bwe", "lightning_module=eben",
                "+lightning_datamodule.batch_size=4",
            ])

    def test_group_option_switch(self):
        cfg = compose(CONFIG_DIR, "run", [
            "lightning_datamodule=bwe", "lightning_module=eben",
            "lightning_datamodule.data_augmentation=aggressive",
        ])
        assert cfg.lightning_datamodule.data_augmentation.p_data_augmentation == 1.0

    def test_scientific_notation_is_float(self):
        cfg = compose(CONFIG_DIR, "run", ["lightning_datamodule=bwe", "lightning_module=eben"])
        assert isinstance(cfg.lightning_module.generator_optimizer.lr, float)

    def test_nested_group_override_switches_optimizer(self):
        cfg = compose(CONFIG_DIR, "run", [
            "lightning_datamodule=bwe", "lightning_module=eben",
            "lightning_module/optimizer@lightning_module.generator_optimizer=sgd",
        ])
        assert cfg.lightning_module.generator_optimizer._target_.endswith("optim.sgd")
        # the sibling default keeps its own choice
        assert cfg.lightning_module.discriminator_optimizer._target_.endswith("optim.adam")
        opt = instantiate(cfg.lightning_module.generator_optimizer)()
        assert hasattr(opt, "init") and hasattr(opt, "update")

    def test_unmatched_group_override_raises(self):
        with pytest.raises(ValueError, match="matched no defaults entry"):
            compose(CONFIG_DIR, "run", [
                "lightning_datamodule=bwe", "lightning_module=eben",
                "lightning_module/optimizer@lightning_module.not_an_optimizer=sgd",
            ])

    def test_callbacks_rich_model_summary_composes(self):
        cfg = compose(CONFIG_DIR, "run", [
            "lightning_datamodule=bwe", "lightning_module=eben",
            "callbacks=rich_model_summary",
        ])
        ms = instantiate(cfg.callbacks["model_summary"])
        from vibravox_tpu.core.callbacks import ModelSummary

        assert isinstance(ms, ModelSummary) and ms.max_depth == 3

    def test_instantiate_partial_and_tuple(self):
        node = Config({
            "_target_": "vibravox_tpu.core.optim.adam",
            "_partial_": True,
            "lr": 1e-3,
            "betas": {"_target_": "builtins.tuple", "_args_": [[0.5, 0.9]]},
        })
        opt_factory = instantiate(node)
        opt = opt_factory()
        assert hasattr(opt, "init") and hasattr(opt, "update")


class TestOptimizerFactories:
    def test_sgd_matches_torch_sgd(self):
        """vibravox_tpu.core.optim.sgd vs torch.optim.SGD trajectories
        (momentum + L2 weight decay + nesterov)."""
        torch = pytest.importorskip("torch")
        from vibravox_tpu.core.optim import sgd

        for momentum, wd, nesterov in [(0.0, 0.0, False), (0.9, 0.01, False),
                                       (0.9, 0.0, True)]:
            w0 = np.random.default_rng(3).standard_normal(6).astype(np.float32)
            tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
            topt = torch.optim.SGD([tw], lr=0.05, momentum=momentum,
                                   weight_decay=wd, nesterov=nesterov)
            opt = sgd(lr=0.05, momentum=momentum, weight_decay=wd, nesterov=nesterov)
            jw = jnp.asarray(w0)
            state = opt.init(jw)
            for step in range(4):
                g = np.random.default_rng(10 + step).standard_normal(6).astype(np.float32)
                tw.grad = torch.from_numpy(g.copy())
                topt.step()
                updates, state = opt.update(jnp.asarray(g), state, jw)
                jw = jw + updates
            np.testing.assert_allclose(
                np.asarray(jw), tw.detach().numpy(), rtol=1e-5, atol=1e-6,
                err_msg=f"momentum={momentum} wd={wd} nesterov={nesterov}",
            )


class TestModelSummary:
    def test_depth_controls_breakdown(self):
        import dataclasses

        from vibravox_tpu.core.callbacks import ModelSummary

        @dataclasses.dataclass
        class State:
            gen_params: dict
            step: int

        state = State(
            gen_params={"enc": {"w": np.zeros((2, 3))}, "dec": {"w": np.zeros((4,))}},
            step=0,
        )
        shallow = ModelSummary(max_depth=1).summarize(state)
        assert "gen_params: 10 params" in shallow and "enc" not in shallow
        deep = ModelSummary(max_depth=3).summarize(state)
        assert "gen_params.enc: 6 params" in deep
        assert "gen_params.dec: 4 params" in deep
        assert "total: 10" in deep


class TestCheckpointManager:
    def _state(self, value: float):
        return {"params": {"w": jnp.full((4,), value)}, "step": jnp.asarray(1)}

    def test_last_round_trip(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), save_last=True)
        mgr.save(self._state(3.0), step=5)
        restored = mgr.restore(self._state(0.0), "last")
        np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), 3.0)

    def test_top_k_pruning_and_best(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), monitor="stoi", mode="max", save_top_k=2)
        for step, stoi in [(1, 0.5), (2, 0.8), (3, 0.6), (4, 0.9)]:
            mgr.save(self._state(float(step)), step=step, metrics={"stoi": stoi})
        assert mgr.best_step() == 4
        kept = sorted(p.name for p in tmp_path.glob("step_*"))
        assert kept == ["step_00000002", "step_00000004"]
        best = mgr.restore(self._state(0.0), "best")
        np.testing.assert_array_equal(np.asarray(best["params"]["w"]), 4.0)

    def test_min_mode(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), monitor="loss", mode="min", save_top_k=1)
        mgr.save(self._state(1.0), 1, {"loss": 2.0})
        mgr.save(self._state(2.0), 2, {"loss": 1.0})
        mgr.save(self._state(3.0), 3, {"loss": 5.0})
        assert mgr.best_step() == 2


class TestMesh:
    def test_mesh_shape(self):
        mesh = build_mesh(MeshConfig(data=-1, model=1))
        assert mesh.shape["data"] == jax.device_count()
        assert mesh.shape["model"] == 1

    def test_shard_batch_divisible_and_fallback(self):
        mesh = build_mesh()
        n = mesh.shape["data"]
        batch = {"x": np.zeros((n * 2, 10), np.float32), "y": np.zeros((1, 10), np.float32)}
        sharded = shard_batch(mesh, batch)
        assert sharded["x"].sharding.is_fully_replicated is False
        assert sharded["y"].sharding.is_fully_replicated is True

    def test_bad_mesh_rejected(self):
        with pytest.raises(ValueError):
            MeshConfig(data=3, model=5).resolve(8)


class TestDataLoader:
    class _Src:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"v": np.asarray([i], np.float32)}

    def test_shuffle_deterministic_and_epoch_varying(self):
        def collate(items):
            return {"v": np.stack([x["v"] for x in items])}

        l1 = DataLoader(self._Src(), collate, 2, shuffle=True, seed=1)
        l2 = DataLoader(self._Src(), collate, 2, shuffle=True, seed=1)
        e1 = [b["v"].ravel().tolist() for b in l1]
        e2 = [b["v"].ravel().tolist() for b in l2]
        assert e1 == e2  # same seed, same first epoch
        e1b = [b["v"].ravel().tolist() for b in l1]
        assert e1 != e1b  # second epoch reshuffles

    def test_set_epoch_keys_shuffle_to_trainer_epoch(self):
        """A preemption-resumed run must see epoch-N data order, not a
        replay of the original run's epoch-0 order: set_epoch pins the next
        pass's (seed, epoch) shuffle key (torch DistributedSampler pattern;
        the Trainer calls it with current_epoch at each epoch start)."""

        def collate(items):
            return {"v": np.stack([x["v"] for x in items])}

        def order(loader):
            return [b["v"].ravel().tolist() for b in loader]

        # original run: epochs 1, 2, 3 (the Trainer pins each)
        orig = DataLoader(self._Src(), collate, 2, shuffle=True, seed=1)
        by_epoch = {}
        for e in (1, 2, 3):
            orig.set_epoch(e)
            by_epoch[e] = order(orig)
        assert by_epoch[1] != by_epoch[2]  # epochs really differ

        # resumed run starts straight at epoch 3: identical order
        resumed = DataLoader(self._Src(), collate, 2, shuffle=True, seed=1)
        resumed.set_epoch(3)
        assert order(resumed) == by_epoch[3]
        # an unpinned follow-up pass advances normally (epoch 4)
        orig.set_epoch(4)
        assert order(resumed) == order(orig)

    def test_drop_last(self):
        def collate(items):
            return {"v": np.stack([x["v"] for x in items])}

        loader = DataLoader(self._Src(), collate, 4, drop_last=True)
        assert len(loader) == 2
        assert sum(1 for _ in loader) == 2

    def test_worker_error_propagates(self):
        def bad_collate(items):
            raise RuntimeError("boom")

        loader = DataLoader(self._Src(), bad_collate, 2)
        with pytest.raises(RuntimeError, match="boom"):
            list(loader)


class TestTrainerResume:
    def test_fit_resumes_from_last_checkpoint(self, tmp_path):
        import optax

        from vibravox_tpu.core.loop import Trainer
        from vibravox_tpu.data.stp import STPDataModule
        from vibravox_tpu.data.phonemes import build_phoneme_tokenizer
        from vibravox_tpu.models.wav2vec2 import wav2vec2_for_ctc_from_config
        from vibravox_tpu.tasks.wav2vec2_stp import Wav2Vec2STPTask

        dm = STPDataModule(
            dataset_name_principal="synthetic", batch_size=2, synthetic_size=4,
            tokenizer=build_phoneme_tokenizer(),
        )
        model = wav2vec2_for_ctc_from_config(preset="tiny")

        def make(max_epochs):
            task = Wav2Vec2STPTask(
                wav2vec2_for_ctc=model, optimizer=optax.adam(1e-4),
                tokenizer=dm.tokenizer,
            )
            mgr = CheckpointManager(str(tmp_path / "ckpt"), save_last=True)
            return task, Trainer(
                max_epochs=max_epochs, limit_train_batches=1, limit_val_batches=1,
                checkpoint=mgr, log_every_n_steps=1,
            )

        task, t1 = make(1)
        t1.fit(task, dm)
        assert t1.global_step == 1
        step_after_first = int(np.asarray(t1.state.step))

        # a fresh Trainer resumes epoch counting + optimizer/train state
        task2, t2 = make(2)
        t2.fit(task2, dm)
        assert t2.current_epoch == 1  # resumed past epoch 0
        assert t2.global_step == 2
        assert int(np.asarray(t2.state.step)) == step_after_first + 1


class TestModelAxisMesh:
    """The 2-D mesh's model axis is the declared TP extension point
    (SURVEY §2.5): a (data=4, model=2) mesh must run a full sharded train
    step with replicated state — the partitioner handles the unused axis."""

    def test_2d_mesh_train_step(self, rng_np):
        import optax

        from vibravox_tpu.losses.gan import HingeLoss
        from vibravox_tpu.models.eben_discriminator import DiscriminatorEBENMultiScales
        from vibravox_tpu.models.eben_generator import EBENGenerator
        from vibravox_tpu.parallel.mesh import DataParallel, MeshConfig, build_mesh
        from vibravox_tpu.tasks.eben import EBENTask

        mesh = build_mesh(MeshConfig(data=4, model=2))
        assert mesh.shape == {"data": 4, "model": 2}
        task = EBENTask(
            sample_rate=16000,
            generator=EBENGenerator(m=4, n=32, p=2),
            discriminator=DiscriminatorEBENMultiScales(q=1, min_channels=8),
            generator_optimizer=optax.adam(3e-4),
            discriminator_optimizer=optax.adam(3e-4),
            adversarial_loss_fn=HingeLoss(),
        )
        t = 4064
        batch = {
            "audio_body_conducted": jnp.asarray(
                rng_np.standard_normal((4, t, 1)).astype(np.float32) * 0.1
            ),
            "audio_airborne": jnp.asarray(
                rng_np.standard_normal((4, t, 1)).astype(np.float32) * 0.1
            ),
        }
        dp = DataParallel(task, mesh)
        state = dp.init_state(jax.random.key(0), batch)
        state, logs = dp.train_step(state, batch)
        assert np.isfinite(float(logs["train/discriminator/backprop_loss"]))
