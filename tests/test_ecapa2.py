"""ECAPA2 hybrid speaker embedder: shapes, fwSE semantics, SPKV contract."""

import jax
import jax.numpy as jnp
import numpy as np

from vibravox_tpu.models.ecapa2 import ECAPA2, ECAPA2Config, FwSEBlock

TINY = ECAPA2Config(
    stem_channels=8,
    lfe_stages=((8, 1, 2), (12, 1, 2)),
    gfe_channels=16,
    res2_scale=4,
    embed_dim=16,
)


class TestECAPA2:
    def test_forward_shape_and_jit(self, rng_np):
        model = ECAPA2(TINY)
        x = jnp.asarray(rng_np.standard_normal((2, 16000)).astype(np.float32))
        variables = model.init(jax.random.key(0), x)
        emb = jax.jit(model.apply)(variables, x)
        assert emb.shape == (2, 16)
        assert bool(jnp.all(jnp.isfinite(emb)))

    def test_time_resolution_preserved_in_lfe(self, rng_np):
        """ECAPA2's LFE strides only the frequency axis — embeddings must be
        computable for any utterance length with frame count scaling in T."""
        model = ECAPA2(TINY)
        short = jnp.asarray(rng_np.standard_normal((1, 8000)).astype(np.float32))
        lng = jnp.asarray(rng_np.standard_normal((1, 24000)).astype(np.float32))
        variables = model.init(jax.random.key(0), short)
        assert model.apply(variables, short).shape == model.apply(variables, lng).shape

    def test_fwse_scales_frequencies(self, rng_np):
        blk = FwSEBlock(bottleneck=4)
        x = jnp.asarray(
            (np.abs(rng_np.standard_normal((2, 5, 6, 3))) + 1.0).astype(np.float32)
        )
        variables = blk.init(jax.random.key(0), x)
        y = blk.apply(variables, x)
        assert y.shape == x.shape
        # excitation is per-frequency: the ratio y/x is constant over (T, C)
        ratio = np.asarray(y / x)
        np.testing.assert_allclose(
            ratio, np.broadcast_to(ratio[:, :1, :, :1], ratio.shape), atol=1e-5
        )

    def test_spkv_embedder_contract(self, rng_np):
        """Drops into the SPKV task's embedder slot: (B, T) -> (B, D)."""
        from vibravox_tpu.tasks.ecapa2_spkv import SPKVTask

        task = SPKVTask(sample_rate=16000, embedder=ECAPA2(TINY))
        state = task.init_state(jax.random.key(0), {})
        batch = {
            "sensor_a_audio": jnp.asarray(rng_np.standard_normal((2, 16000)).astype(np.float32)),
            "sensor_b_audio": jnp.asarray(rng_np.standard_normal((2, 16000)).astype(np.float32)),
        }
        out = task.eval_step(state, batch)
        assert out["cosine"].shape == (2,)
        assert out["euclidean"].shape == (2,)
