"""int8 quantized conv (ops/quant.py) + int8-discriminator experiment gates.

The experiment's correctness contract: forward within quantization error of
the plain conv, backward BITWISE the plain conv's vjp (straight-through),
and the discriminator param tree unchanged by the flag (checkpoints are
interchangeable — only the forward arithmetic differs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibravox_tpu.ops.conv import _conv1d_raw
from vibravox_tpu.ops.quant import conv1d_int8_ste, quantize_symmetric


class TestQuantizeSymmetric:
    def test_roundtrip_error_bound(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 64, 8)).astype(np.float32))
        q, scale = quantize_symmetric(x, axes=(0, 1, 2))
        assert q.dtype == jnp.int8
        err = np.abs(np.asarray(q, np.float32) * np.asarray(scale) - np.asarray(x))
        # symmetric rounding: error <= scale/2 everywhere
        assert err.max() <= float(np.asarray(scale).max()) / 2 + 1e-7

    def test_all_zero_input(self):
        q, scale = quantize_symmetric(jnp.zeros((2, 8, 4)), axes=(0, 1, 2))
        assert np.all(np.asarray(q) == 0)
        assert np.all(np.isfinite(np.asarray(scale)))


class TestConv1dInt8STE:
    @pytest.mark.parametrize("stride,groups,k", [(1, 1, 5), (2, 4, 7), (4, 4, 41)])
    def test_forward_within_quantization_error(self, stride, groups, k):
        rng = np.random.default_rng(1)
        cin, cout, t = 8, 16, 128
        x = jnp.asarray(rng.standard_normal((2, t, cin)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((k, cin // groups, cout)).astype(np.float32) * 0.1
        )
        pad = (k // 2, k // 2)
        y_q = conv1d_int8_ste(x, w, stride, pad, 1, groups)
        y_p = _conv1d_raw(x, w, stride, pad, 1, groups)
        # per-tap error ~ (|x|max/254 + |w|max/254); k taps accumulate.
        # 2% relative of the output scale is a loose but meaningful bound.
        scale = float(jnp.max(jnp.abs(y_p))) + 1e-9
        assert float(jnp.max(jnp.abs(y_q - y_p))) / scale < 0.05

    def test_backward_is_plain_conv_vjp_bitwise(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 64, 8)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((7, 2, 16)).astype(np.float32) * 0.1)

        def loss_q(x, w):
            return jnp.sum(jnp.tanh(conv1d_int8_ste(x, w, 2, (3, 3), 1, 4)))

        def loss_p(x, w):
            return jnp.sum(jnp.tanh(_conv1d_raw(x, w, 2, (3, 3), 1, 4)))

        g_q = jax.jit(jax.grad(loss_q, argnums=(0, 1)))(x, w)
        g_p = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(x, w)
        # NOT bitwise overall: the cotangent entering the conv vjp differs
        # (tanh' is evaluated at the quantized forward).  Pin the straight-
        # through property instead on a LINEAR head, where the cotangent is
        # input-independent — there the grads must be bitwise the plain vjp's.
        def lin_q(x, w):
            return jnp.sum(conv1d_int8_ste(x, w, 2, (3, 3), 1, 4))

        def lin_p(x, w):
            return jnp.sum(_conv1d_raw(x, w, 2, (3, 3), 1, 4))

        lg_q = jax.jit(jax.grad(lin_q, argnums=(0, 1)))(x, w)
        lg_p = jax.jit(jax.grad(lin_p, argnums=(0, 1)))(x, w)
        for a, b in zip(jax.tree.leaves(lg_q), jax.tree.leaves(lg_p)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # and the nonlinear-head grads stay close (quantization-bounded)
        for a, b in zip(jax.tree.leaves(g_q), jax.tree.leaves(g_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.05)

    def test_bf16_inputs(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((1, 32, 4)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        w = jnp.asarray(rng.standard_normal((3, 4, 8)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        y = conv1d_int8_ste(x, w, 1, (1, 1), 1, 1)
        assert y.dtype == jnp.bfloat16
        assert bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))


class TestInt8Discriminator:
    def test_flag_preserves_param_tree_and_bounds_outputs(self, monkeypatch):
        from vibravox_tpu.models.eben_discriminator import (
            DiscriminatorEBENMultiScales,
        )

        rng = np.random.default_rng(4)
        bands = jnp.asarray(rng.standard_normal((2, 256, 4)).astype(np.float32) * 0.3)
        audio = jnp.asarray(rng.standard_normal((2, 1024, 1)).astype(np.float32) * 0.3)

        monkeypatch.delenv("VIBRAVOX_INT8_DISC", raising=False)
        disc = DiscriminatorEBENMultiScales(q=4, min_channels=8)
        params = disc.init(jax.random.key(0), bands, audio)
        plain = disc.apply(params, bands, audio)

        monkeypatch.setenv("VIBRAVOX_INT8_DISC", "1")
        disc8 = DiscriminatorEBENMultiScales(q=4, min_channels=8)
        params8 = disc8.init(jax.random.key(0), bands, audio)
        # identical param tree: the flag changes arithmetic, not checkpoints
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
            params8
        )
        quant = disc8.apply(params, bands, audio)

        for emb_p, emb_q in zip(plain, quant):
            for a, b in zip(emb_p, emb_q):
                assert a.shape == b.shape
                if a.size == 0:  # dilation-3 stage collapses at this tiny T
                    continue
                scale = float(jnp.max(jnp.abs(a))) + 1e-6
                # layered quantization noise compounds through the leaky-relu
                # stack; ~15% of each activation's own scale is the loose gate
                assert float(jnp.max(jnp.abs(a - b))) / scale < 0.15

    def test_int8_disc_grads_finite(self, monkeypatch):
        from vibravox_tpu.models.eben_discriminator import (
            DiscriminatorEBENMultiScales,
        )

        monkeypatch.setenv("VIBRAVOX_INT8_DISC", "1")
        rng = np.random.default_rng(5)
        bands = jnp.asarray(rng.standard_normal((1, 128, 4)).astype(np.float32) * 0.3)
        audio = jnp.asarray(rng.standard_normal((1, 512, 1)).astype(np.float32) * 0.3)
        disc = DiscriminatorEBENMultiScales(q=4, min_channels=8)
        params = disc.init(jax.random.key(0), bands, audio)

        def loss(p, bands, audio):
            embs = disc.apply(p, bands, audio)
            return sum(jnp.sum(e[-1]) for e in embs)

        grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(params, bands, audio)
        for leaf in jax.tree.leaves(grads):
            assert bool(jnp.all(jnp.isfinite(leaf)))
