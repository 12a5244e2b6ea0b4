"""Single- vs multi-device numerical equivalence of sharded train steps.

The actual data-parallel correctness property (SURVEY §2.5): an N-device
sharded step on a batch must produce the same updated parameters as a
1-device step on the identical batch — a missed mean over the data axis,
a wrong psum, a mis-assembled global batch, or a divergent RNG split would
all break this while leaving "losses are finite" green.  Runs on the
8-device virtual CPU mesh (f32, reduction-order tolerance only).

The tasks run with SGD here: updated params are then *linear* in the
gradients, which is the property under test.  Adam would both hide
gradient-scaling bugs (its update is scale-invariant) and amplify
reduction-order float noise on zero-gradient parameters (e.g. attention key
biases, whose gradient cancels in softmax) into full-lr random steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vibravox_tpu.parallel.mesh import DataParallel, MeshConfig, build_mesh


def _allclose_trees(a, b, rtol=1e-5, atol=1e-6):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for (path, x), y in zip(la, lb):
        if not hasattr(x, "dtype") or jax.dtypes.issubdtype(
            np.asarray(x).dtype, jax.dtypes.prng_key
        ):
            continue
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(path),
        )


def _tp_specs(params):
    """{trailing (module, param) names -> sharding spec} for every leaf that
    ended up sharded over the model axis."""
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        spec = getattr(getattr(leaf, "sharding", None), "spec", None)
        if spec and any(ax == "model" for ax in spec if ax is not None):
            names = tuple(str(getattr(p, "key", getattr(p, "name", ""))) for p in path)
            out[names[-2:]] = spec
    return out


def _run_step(task, mesh_cfg, devices, batch, seed=0, steps=2):
    mesh = build_mesh(mesh_cfg, devices)
    dp = DataParallel(task, mesh, donate_state=False)
    state = dp.init_state(jax.random.key(seed), batch)
    logs = None
    for _ in range(steps):
        state, logs = dp.train_step(state, batch)
    jax.block_until_ready(state)
    return state, {k: float(v) for k, v in logs.items()}


class TestEBENEquivalence:
    def test_8_device_step_matches_single_device(self, rng_np):
        from vibravox_tpu.losses.gan import FeatureMatchingLoss, HingeLoss
        from vibravox_tpu.models.eben_discriminator import DiscriminatorEBENMultiScales
        from vibravox_tpu.models.eben_generator import EBENGenerator
        from vibravox_tpu.ops.stft import MultiResolutionSTFTLoss
        from vibravox_tpu.tasks.eben import EBENTask

        def make_task():
            return EBENTask(
                sample_rate=16000,
                generator=EBENGenerator(m=4, n=32, p=2),
                discriminator=DiscriminatorEBENMultiScales(q=1, min_channels=8),
                generator_optimizer=optax.sgd(1e-3),
                discriminator_optimizer=optax.sgd(1e-3),
                reconstructive_loss_freq_fn=MultiResolutionSTFTLoss(
                    (256,), (64,), (128,), sample_rate=16000
                ),
                feature_matching_loss_fn=FeatureMatchingLoss(),
                adversarial_loss_fn=HingeLoss(),
                dynamic_loss_balancing="ema",
            )

        t = make_task().generator.valid_length(4096)
        batch = {
            "audio_body_conducted": jnp.asarray(
                rng_np.standard_normal((8, t, 1)).astype(np.float32) * 0.1
            ),
            "audio_airborne": jnp.asarray(
                rng_np.standard_normal((8, t, 1)).astype(np.float32) * 0.1
            ),
        }
        devs = jax.devices()
        assert len(devs) >= 8, "conftest must provide the 8-device CPU mesh"
        s1, logs1 = _run_step(make_task(), MeshConfig(data=1, model=1), devs[:1], batch)
        s8, logs8 = _run_step(make_task(), MeshConfig(data=4, model=2), devs[:8], batch)

        _allclose_trees(s1.gen_params, s8.gen_params)
        _allclose_trees(s1.disc_params, s8.disc_params)
        for k in logs1:
            assert logs1[k] == pytest.approx(logs8[k], rel=1e-4, abs=1e-6), k


class TestMimiEquivalence:
    def test_8_device_step_matches_single_device(self, rng_np):
        from vibravox_tpu.models.mimi.mimi import Mimi
        from vibravox_tpu.tasks.regressive_mimi import RegressiveMimiTask

        mimi = Mimi(preset="tiny")

        def make_task():
            return RegressiveMimiTask(mimi=mimi, optimizer=optax.sgd(1e-2))

        t = 4 * mimi.frame_size
        ref = rng_np.standard_normal((8, t, 1)).astype(np.float32) * 0.1
        batch = {
            "audio_body_conducted": jnp.asarray(ref * 0.5),
            "audio_airborne": jnp.asarray(ref),
        }
        devs = jax.devices()
        s1, logs1 = _run_step(make_task(), MeshConfig(data=1, model=1), devs[:1], batch)
        s8, logs8 = _run_step(make_task(), MeshConfig(data=4, model=2), devs[:8], batch)
        _allclose_trees(s1.params, s8.params)
        for k in logs1:
            assert logs1[k] == pytest.approx(logs8[k], rel=1e-4, abs=1e-6), k
        # the bottleneck transformers' projections shard over the model axis
        # (tasks/regressive_mimi.py TP hook); SEANet convs stay replicated
        specs = _tp_specs(s8.params)
        from jax.sharding import PartitionSpec as P

        assert specs[("q_proj", "kernel")] == P(None, "model")
        assert specs[("linear2", "kernel")] == P("model", None)


class TestCTCEquivalence:
    def test_8_device_step_matches_single_device(self, rng_np):
        from vibravox_tpu.models.wav2vec2 import wav2vec2_for_ctc_from_config
        from vibravox_tpu.tasks.wav2vec2_stp import Wav2Vec2STPTask

        model = wav2vec2_for_ctc_from_config(preset="tiny")

        def make_task():
            return Wav2Vec2STPTask(
                wav2vec2_for_ctc=model, optimizer=optax.sgd(1e-3)
            )

        audio = rng_np.standard_normal((8, 4096)).astype(np.float32)
        ids = np.full((8, 16), -100, np.int64)
        ids[:, :5] = rng_np.integers(0, 30, size=(8, 5))
        batch = {"audio": jnp.asarray(audio), "phonemes_ids": jnp.asarray(ids)}

        devs = jax.devices()
        s1, logs1 = _run_step(make_task(), MeshConfig(data=1, model=1), devs[:1], batch)
        s8, logs8 = _run_step(make_task(), MeshConfig(data=4, model=2), devs[:8], batch)
        # CTC grads flow through per-frame logsumexps — slightly noisier
        # reduction ordering than the GAN step, hence atol 1e-5.  This test
        # caught a real GSPMD bug in round 3: the grouped positional conv's
        # dW was multiplied by the model-axis size on a (data, model) mesh
        # (fixed by ops/conv.py::grouped_conv1d_spmd_safe).
        _allclose_trees(s1.params, s8.params, atol=1e-5)
        for k in logs1:
            assert logs1[k] == pytest.approx(logs8[k], rel=1e-4, abs=1e-6), k

        # with the model axis >1 the task's TP hook engages: the encoder
        # projections must be genuinely sharded (Megatron column/row split,
        # parallel/tp.py), not replicated — and still match the 1-device step
        specs = _tp_specs(s8.params)
        from jax.sharding import PartitionSpec as P

        assert specs[("q_proj", "kernel")] == P(None, "model")
        assert specs[("out_proj", "kernel")] == P("model", None)
        assert specs[("intermediate_dense", "kernel")] == P(None, "model")
        assert specs[("output_dense", "kernel")] == P("model", None)

    def test_tp_checkpoint_roundtrip(self, rng_np, tmp_path):
        """Orbax save/restore of a TP-sharded state: restore targets the
        live state tree, so the restored leaves must come back with the
        same model-axis shardings AND values — the resume path a user hits
        when training with trainer.mesh.model > 1."""
        from jax.sharding import PartitionSpec as P

        from vibravox_tpu.core.checkpoint import CheckpointManager
        from vibravox_tpu.models.wav2vec2 import wav2vec2_for_ctc_from_config
        from vibravox_tpu.tasks.wav2vec2_stp import Wav2Vec2STPTask

        model = wav2vec2_for_ctc_from_config(preset="tiny")
        task = Wav2Vec2STPTask(wav2vec2_for_ctc=model, optimizer=optax.sgd(1e-3))
        audio = rng_np.standard_normal((4, 4096)).astype(np.float32)
        ids = np.full((4, 16), -100, np.int64)
        ids[:, :5] = rng_np.integers(0, 30, size=(4, 5))
        batch = {"audio": jnp.asarray(audio), "phonemes_ids": jnp.asarray(ids)}

        mesh = build_mesh(MeshConfig(data=2, model=2), jax.devices()[:4])
        dp = DataParallel(task, mesh, donate_state=False)
        state = dp.init_state(jax.random.key(0), batch)
        state, _ = dp.train_step(state, batch)
        jax.block_until_ready(state)

        mgr = CheckpointManager(str(tmp_path / "ckpt"), save_last=True)
        mgr.save(state, step=1)

        fresh = dp.init_state(jax.random.key(7), batch)  # different values
        restored = mgr.restore(fresh, "last")
        spec = restored.params["layer_0"]["q_proj"]["kernel"].sharding.spec
        assert spec == P(None, "model"), spec
        _allclose_trees(state.params, restored.params, rtol=0, atol=0)
        # and the restored state steps without resharding errors
        restored, logs = dp.train_step(restored, batch)
        assert np.isfinite(float(next(iter(logs.values()))))

    def test_tp_heavy_mesh_matches_single_device(self, rng_np):
        """(data=2, model=4): the model axis exceeds the tiny config's head
        count (2), so GSPMD must reshard inside attention — exercises the
        non-divisible-heads path of the TP placements."""
        from vibravox_tpu.models.wav2vec2 import wav2vec2_for_ctc_from_config
        from vibravox_tpu.tasks.wav2vec2_stp import Wav2Vec2STPTask

        model = wav2vec2_for_ctc_from_config(preset="tiny")

        def make_task():
            return Wav2Vec2STPTask(
                wav2vec2_for_ctc=model, optimizer=optax.sgd(1e-3)
            )

        audio = rng_np.standard_normal((8, 4096)).astype(np.float32)
        ids = np.full((8, 16), -100, np.int64)
        ids[:, :5] = rng_np.integers(0, 30, size=(8, 5))
        batch = {"audio": jnp.asarray(audio), "phonemes_ids": jnp.asarray(ids)}

        devs = jax.devices()
        s1, logs1 = _run_step(make_task(), MeshConfig(data=1, model=1), devs[:1], batch)
        s8, logs8 = _run_step(make_task(), MeshConfig(data=2, model=4), devs[:8], batch)
        _allclose_trees(s1.params, s8.params, atol=1e-5)
        for k in logs1:
            assert logs1[k] == pytest.approx(logs8[k], rel=1e-4, abs=1e-6), k
