"""EBEN generator/discriminator model tests (flax).

Mirror of the reference tier-1 unit tests (shape preservation, param count,
embedding structure — ``tests/torch_modules/*_test.py``) plus the front/tail
split property this framework adds for dynamic loss balancing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibravox_tpu.losses.gan import feature_matching_loss, hinge_loss
from vibravox_tpu.models.eben_discriminator import DiscriminatorEBENMultiScales
from vibravox_tpu.models.eben_generator import EBENGenerator
from vibravox_tpu.models.melgan_discriminator import MelganMultiScalesDiscriminator


@pytest.fixture(scope="module")
def gen():
    return EBENGenerator(m=4, n=32, p=2)


@pytest.fixture(scope="module")
def gen_params(gen):
    x = jnp.zeros((1, gen.valid_length(8000), 1))
    return gen.init(jax.random.key(0), x)


class TestEBENGenerator:
    def test_param_count_matches_reference(self, gen, gen_params):
        # torch reference EBENGenerator(4, 32, 2) has 1,945,984 trainable params
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(gen_params))
        assert n == 1_945_984

    def test_shape_preservation(self, gen, gen_params, sample_batch):
        x = gen.cut_to_valid_length(sample_batch)
        enhanced, decomposed = gen.apply(gen_params, x)
        assert enhanced.shape == x.shape
        # after cut_to_valid_length, (T + n) % m == 0 and T' = (T + n) / m
        assert decomposed.shape == (x.shape[0], (x.shape[1] + gen.n) // gen.m, gen.m)

    def test_front_tail_split_equivalence(self, gen, gen_params, sample_batch):
        x = gen.cut_to_valid_length(sample_batch)
        enhanced, decomposed = gen.apply(gen_params, x)
        feats, fb = gen.apply(gen_params, x, method="front")
        e2, d2 = gen.apply(gen_params, feats, fb, method="tail")
        np.testing.assert_allclose(np.asarray(e2), np.asarray(enhanced), atol=1e-6)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(decomposed), atol=1e-6)

    def test_output_bounded_by_tanh_synthesis(self, gen, gen_params, sample_batch):
        x = gen.cut_to_valid_length(sample_batch) * 100.0
        _, decomposed = gen.apply(gen_params, x)
        assert float(jnp.max(jnp.abs(decomposed))) <= 1.0

    def test_valid_length(self, gen):
        for t in [8000, 15679, 40000]:
            v = gen.valid_length(t)
            assert v <= t and (v + gen.n) % gen.multiple == 0


class TestDiscriminators:
    def test_eben_multiscales_structure(self, sample_batch):
        gen = EBENGenerator(m=4, n=32, p=2)
        x = gen.cut_to_valid_length(sample_batch)
        bands = gen.pqmf.analysis(x)
        disc = DiscriminatorEBENMultiScales(q=4, min_channels=24)
        params = disc.init(jax.random.key(1), bands, x)
        emb = disc.apply(params, bands, x)
        assert len(emb) == 4  # 3 band discs + melgan
        assert [len(e) for e in emb] == [9, 9, 9, 8]
        # certainties are single-channel
        for e in emb:
            assert e[-1].shape[-1] == 1

    def test_melgan_multiscales(self, sample_batch):
        disc = MelganMultiScalesDiscriminator(sample_rate=16000, scales=3)
        params = disc.init(jax.random.key(2), sample_batch)
        emb = disc.apply(params, sample_batch)
        assert len(emb) == 3
        assert all(len(e) == 8 for e in emb)
        # successive scales halve the time axis (within resampler rounding)
        t0, t1 = emb[0][0].shape[1], emb[1][0].shape[1]
        assert abs(t1 - t0 / 2) <= 1


class TestGANLosses:
    def _embeddings(self, value):
        cert = jnp.full((2, 10, 1), value)
        hidden = jnp.ones((2, 10, 4))
        return [[jnp.ones((2, 10, 1)), hidden, cert]] * 3

    def test_hinge_perfect_real(self):
        # certainties ≥ 1 with target 1 → zero loss
        assert float(hinge_loss(self._embeddings(2.0), 1)) == 0.0

    def test_hinge_fake(self):
        # certainties = -1 with target -1 → zero; with target 1 → 2
        assert float(hinge_loss(self._embeddings(-1.0), -1)) == 0.0
        assert float(hinge_loss(self._embeddings(-1.0), 1)) == 2.0

    def test_feature_matching_zero_on_identical(self):
        e = self._embeddings(0.5)
        assert float(feature_matching_loss(e, e)) == 0.0

    def test_feature_matching_scalar(self, rng_np):
        a = [[jnp.asarray(rng_np.standard_normal((2, 10, 4)).astype(np.float32)) for _ in range(4)]]
        b = [[jnp.asarray(rng_np.standard_normal((2, 10, 4)).astype(np.float32)) for _ in range(4)]]
        loss = feature_matching_loss(a, b)
        assert loss.shape == () and float(loss) > 0
