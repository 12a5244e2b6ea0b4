"""Packed MelGAN discriminator stem: exactness vs the plain path.

The packed stem (``ops/packed_melgan.py``) must reproduce the plain
discriminator bit-for-bit up to float reassociation — same param tree, same
embeddings (the FM loss consumes every layer), same gradients.  The conv_0
reflect pad is the one place zero-padded packing diverges; the one-packed-row
edge stitch must close it exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vibravox_tpu.models.melgan_discriminator import DiscriminatorMelGAN
from vibravox_tpu.ops.conv import conv1d
from vibravox_tpu.ops.packed_melgan import dense_from_grouped, disc_stem_packable


@pytest.fixture()
def rng_np():
    return np.random.default_rng(11)


def _toggle(monkeypatch, on: bool):
    monkeypatch.setenv("VIBRAVOX_PACKED_DISC", "1" if on else "0")


class TestDenseFromGrouped:
    def test_matches_grouped_conv(self, rng_np):
        x = jnp.asarray(rng_np.standard_normal((2, 32, 16)).astype(np.float32))
        w = jnp.asarray(rng_np.standard_normal((7, 4, 24)).astype(np.float32))
        ref = conv1d(x, w, stride=2, padding=3, groups=4)
        dense = conv1d(x, dense_from_grouped(w, 4), stride=2, padding=3)
        np.testing.assert_allclose(np.asarray(dense), np.asarray(ref), atol=1e-5)


class TestPackedDiscStem:
    def _disc_io(self, rng_np, t):
        disc = DiscriminatorMelGAN()
        x = jnp.asarray(rng_np.standard_normal((2, t, 1)).astype(np.float32) * 0.3)
        return disc, x

    def test_admissibility(self):
        assert disc_stem_packable(39936)
        assert not disc_stem_packable(39937)
        assert not disc_stem_packable(128)  # shorter than the edge windows

    # 512: T/8 even (conv_2 packed); 520: T/8 odd (conv_2 plain fallback)
    @pytest.mark.parametrize("t", [512, 520])
    def test_embeddings_match_plain(self, rng_np, monkeypatch, t):
        disc, x = self._disc_io(rng_np, t)
        _toggle(monkeypatch, False)
        params = disc.init(jax.random.key(0), x)
        plain = disc.apply(params, x)
        _toggle(monkeypatch, True)
        packed = disc.apply(params, x)
        assert len(packed) == len(plain) == 8
        for i, (a, b) in enumerate(zip(plain, packed)):
            assert a.shape == b.shape, f"embedding {i}"
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-5, err_msg=f"embedding {i}"
            )

    def test_param_tree_identical(self, rng_np, monkeypatch):
        disc, x = self._disc_io(rng_np, 512)
        _toggle(monkeypatch, True)
        tree_packed = jax.tree_util.tree_structure(disc.init(jax.random.key(0), x))
        _toggle(monkeypatch, False)
        tree_plain = jax.tree_util.tree_structure(disc.init(jax.random.key(0), x))
        assert tree_packed == tree_plain

    def test_grad_matches_plain(self, rng_np, monkeypatch):
        """FM-loss-shaped gradient (all embeddings contribute) through the
        packed stem equals the plain gradient — incl. the stitch vjp."""
        disc, x = self._disc_io(rng_np, 512)
        _toggle(monkeypatch, False)
        params = disc.init(jax.random.key(0), x)

        def loss(p, x):
            embs = disc.apply(p, x)
            return sum(jnp.mean(jnp.abs(e)) for e in embs[1:])

        g_plain, gx_plain = jax.grad(loss, argnums=(0, 1))(params, x)
        _toggle(monkeypatch, True)
        g_packed, gx_packed = jax.grad(loss, argnums=(0, 1))(params, x)
        np.testing.assert_allclose(
            np.asarray(gx_packed), np.asarray(gx_plain), atol=3e-5
        )
        flat_b = dict(jax.tree_util.tree_leaves_with_path(g_packed))
        for path, leaf in jax.tree_util.tree_leaves_with_path(g_plain):
            np.testing.assert_allclose(
                np.asarray(flat_b[path]), np.asarray(leaf), atol=3e-5,
                err_msg=jax.tree_util.keystr(path),
            )
