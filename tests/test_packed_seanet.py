"""Packed SEANet encoder stem: exactness vs the plain path.

The packed stem (``ops/packed_seanet.py``) must be a pure re-layout of the
plain causal convs — same param tree, same values, same gradients.  Causal
zero padding makes it exact up to float reassociation (no edge stitching, in
contrast with EBEN's reflect-padded packed stacks).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vibravox_tpu.models.mimi.seanet import SEANetDecoder, SEANetEncoder
from vibravox_tpu.ops.conv import conv1d, conv_transpose1d
from vibravox_tpu.ops.packed_seanet import (
    pack_causal_kernel,
    pack_transpose_kernel,
    stem_packable,
    tail_packable,
)


@pytest.fixture()
def rng_np():
    return np.random.default_rng(7)


def _toggle(monkeypatch, on: bool):
    monkeypatch.setenv("VIBRAVOX_PACKED_SEANET", "1" if on else "0")


class TestPackCausalKernel:
    @pytest.mark.parametrize("k,cin,cout,d", [(7, 1, 8, 1), (3, 8, 4, 1), (3, 8, 8, 2), (1, 4, 8, 1)])
    def test_stride1_matches_causal_conv(self, rng_np, k, cin, cout, d):
        p = 4
        t = 64
        x = jnp.asarray(rng_np.standard_normal((2, t, cin)).astype(np.float32))
        w = jnp.asarray(rng_np.standard_normal((k, cin, cout)).astype(np.float32))
        pad_left = (k - 1) * d
        ref = conv1d(x, w, padding=(pad_left, 0), dilation=d)
        kp, pads = pack_causal_kernel(w, stride=1, pad_left=pad_left, p_in=p, p_out=p, dilation=d)
        y = conv1d(x.reshape(2, t // p, p * cin), kp, padding=pads)
        np.testing.assert_allclose(
            np.asarray(y.reshape(2, t, cout)), np.asarray(ref), atol=1e-5
        )

    def test_strided_down_conv(self, rng_np):
        p = 4
        t = 64
        cin, cout = 8, 16
        x = jnp.asarray(rng_np.standard_normal((2, t, cin)).astype(np.float32))
        w = jnp.asarray(rng_np.standard_normal((2 * p, cin, cout)).astype(np.float32))
        # causal: pad_total = k_eff - stride = p
        ref = conv1d(x, w, stride=p, padding=(p, 0))
        kp, pads = pack_causal_kernel(w, stride=p, pad_left=p, p_in=p, p_out=1)
        y = conv1d(x.reshape(2, t // p, p * cin), kp, padding=pads)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


class TestPackTransposeKernel:
    @pytest.mark.parametrize("p,cin,cout", [(4, 8, 4), (2, 4, 8)])
    def test_matches_causal_transpose(self, rng_np, p, cin, cout):
        t = 16
        x = jnp.asarray(rng_np.standard_normal((2, t, cin)).astype(np.float32))
        # torch layout (in, out, K), K = 2*stride as in SEANet upsamplers
        w = jnp.asarray(
            rng_np.standard_normal((cin, cout, 2 * p)).astype(np.float32))
        ref = conv_transpose1d(x, w, stride=p, padding=0)
        trim = 2 * p - p
        ref = ref[:, :-trim, :]  # causal right trim (CausalConvTranspose)
        kp, pads = pack_transpose_kernel(w, stride=p)
        y = conv1d(x, kp, padding=pads)
        np.testing.assert_allclose(
            np.asarray(y.reshape(2, t * p, cout)), np.asarray(ref), atol=1e-5
        )


class TestPackedDecoderTail:
    CFG = dict(dimension=64, n_filters=32, ratios=(8, 4), kernel_size=7,
               last_kernel_size=3, residual_kernel_size=3,
               n_residual_layers=2, dilation_base=2)

    def _decoder_io(self, rng_np, t=16):
        dec = SEANetDecoder(**self.CFG)
        z = jnp.asarray(
            rng_np.standard_normal((2, t, 64)).astype(np.float32) * 0.3)
        return dec, z

    def test_admissibility(self):
        assert tail_packable(32, 4)
        assert not tail_packable(4, 4)
        assert not tail_packable(32, 1)

    def test_forward_matches_plain(self, rng_np, monkeypatch):
        dec, z = self._decoder_io(rng_np)
        _toggle(monkeypatch, False)
        params = dec.init(jax.random.key(0), z)
        y_plain = dec.apply(params, z)
        _toggle(monkeypatch, True)
        y_packed = dec.apply(params, z)
        assert y_packed.shape == y_plain.shape
        np.testing.assert_allclose(
            np.asarray(y_packed), np.asarray(y_plain), atol=2e-5
        )

    def test_param_tree_identical(self, rng_np, monkeypatch):
        dec, z = self._decoder_io(rng_np)
        _toggle(monkeypatch, True)
        tree_packed = jax.tree_util.tree_structure(dec.init(jax.random.key(0), z))
        _toggle(monkeypatch, False)
        tree_plain = jax.tree_util.tree_structure(dec.init(jax.random.key(0), z))
        assert tree_packed == tree_plain

    def test_grad_matches_plain(self, rng_np, monkeypatch):
        dec, z = self._decoder_io(rng_np)
        _toggle(monkeypatch, False)
        params = dec.init(jax.random.key(0), z)

        def loss(p, z):
            return jnp.mean(dec.apply(p, z) ** 2)

        g_plain = jax.grad(loss)(params, z)
        _toggle(monkeypatch, True)
        g_packed = jax.grad(loss)(params, z)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(g_packed))
        for path, leaf in jax.tree_util.tree_leaves_with_path(g_plain):
            np.testing.assert_allclose(
                np.asarray(flat_b[path]), np.asarray(leaf), atol=3e-5,
                err_msg=jax.tree_util.keystr(path),
            )


class TestPackedEncoderStem:
    # n_filters=32 with first reversed ratio 4 → packed width 128: admissible
    CFG = dict(dimension=64, n_filters=32, ratios=(8, 4), kernel_size=7,
               residual_kernel_size=3, n_residual_layers=2, dilation_base=2)

    def _encoder_io(self, rng_np, t=256):
        enc = SEANetEncoder(**self.CFG)
        x = jnp.asarray(rng_np.standard_normal((2, t, 1)).astype(np.float32) * 0.3)
        return enc, x

    def test_admissibility(self):
        assert stem_packable(256, 1, 32, 4)
        assert not stem_packable(255, 1, 32, 4)     # T % p != 0
        assert not stem_packable(256, 2, 32, 4)     # non-waveform input
        assert not stem_packable(256, 1, 4, 4)      # packed width < 128

    def test_forward_matches_plain(self, rng_np, monkeypatch):
        enc, x = self._encoder_io(rng_np)
        _toggle(monkeypatch, False)
        params = enc.init(jax.random.key(0), x)
        y_plain = enc.apply(params, x)
        _toggle(monkeypatch, True)
        # identical param tree: plain-init params drive the packed path
        y_packed = enc.apply(params, x)
        assert y_packed.shape == y_plain.shape
        np.testing.assert_allclose(
            np.asarray(y_packed), np.asarray(y_plain), atol=2e-5
        )

    def test_param_tree_identical(self, rng_np, monkeypatch):
        enc, x = self._encoder_io(rng_np)
        _toggle(monkeypatch, True)
        tree_packed = jax.tree_util.tree_structure(enc.init(jax.random.key(0), x))
        _toggle(monkeypatch, False)
        tree_plain = jax.tree_util.tree_structure(enc.init(jax.random.key(0), x))
        assert tree_packed == tree_plain

    def test_grad_matches_plain(self, rng_np, monkeypatch):
        enc, x = self._encoder_io(rng_np)
        _toggle(monkeypatch, False)
        params = enc.init(jax.random.key(0), x)

        def loss(p, x):
            y = enc.apply(p, x)
            return jnp.mean(y**2)

        g_plain = jax.grad(loss)(params, x)
        _toggle(monkeypatch, True)
        g_packed = jax.grad(loss)(params, x)
        flat_a = jax.tree_util.tree_leaves_with_path(g_plain)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(g_packed))
        for path, leaf in flat_a:
            np.testing.assert_allclose(
                np.asarray(flat_b[path]), np.asarray(leaf), atol=3e-5,
                err_msg=jax.tree_util.keystr(path),
            )

    def test_mimi_train_step_matches(self, rng_np, monkeypatch):
        """One regressive-Mimi train step, packed vs plain: same loss, same
        updated params (the end-to-end integration surface)."""
        import optax

        from vibravox_tpu.models.mimi.mimi import Mimi, MimiConfig
        from vibravox_tpu.tasks.regressive_mimi import RegressiveMimiTask

        cfg = MimiConfig(
            dimension=64, n_filters=32, ratios=(8, 4), transformer_layers=1,
            transformer_heads=2, transformer_ff=128, rvq_dimension=32,
            rvq_n_q=4, rvq_codebook_size=32, downsample=2,
        )
        hop = cfg.hop_length
        batch = {
            "audio_body_conducted": jnp.asarray(
                rng_np.standard_normal((2, 2 * hop, 1)).astype(np.float32) * 0.3),
            "audio_airborne": jnp.asarray(
                rng_np.standard_normal((2, 2 * hop, 1)).astype(np.float32) * 0.3),
        }

        def one_step(flag: bool):
            _toggle(monkeypatch, flag)
            task = RegressiveMimiTask(
                mimi=Mimi(cfg, seed=0), optimizer=optax.adam(1e-3))
            state = task.init_state(jax.random.key(1), batch)
            state, logs = task.train_step(state, batch)
            return logs["train/l1_latent_loss"], state.params

        loss_plain, params_plain = one_step(False)
        loss_packed, params_packed = one_step(True)
        np.testing.assert_allclose(float(loss_packed), float(loss_plain), atol=1e-6)
        a = jax.tree_util.tree_leaves(params_plain)
        b = jax.tree_util.tree_leaves(params_packed)
        for la, lb in zip(a, b):
            np.testing.assert_allclose(np.asarray(lb), np.asarray(la), atol=1e-4)
