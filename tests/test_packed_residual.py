"""Space-to-depth packed residual stack vs the plain XLA path: exact values
and full vjp (dx + all six weight gradients), including the stitched
reflect-pad edges.  (``ops/packed_residual.py``)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibravox_tpu.ops.packed_residual import (
    _plain_stack,
    can_pack,
    packed_residual_stack,
)


def _mk_kernels(rng, c):
    scale = 0.5 / np.sqrt(3 * c)
    ks = []
    for _ in range(3):
        wd = jnp.asarray(rng.standard_normal((3, c, c)).astype(np.float32) * scale)
        wp = jnp.asarray(rng.standard_normal((1, c, c)).astype(np.float32) * scale)
        ks.append((wd, wp))
    return tuple(ks)


class TestPackedResidualStack:
    @pytest.mark.parametrize("c,t", [(32, 1024), (64, 1280), (16, 512)])
    def test_forward_matches_plain(self, c, t, rng_np):
        assert can_pack(t, c)
        x = jnp.asarray(rng_np.standard_normal((2, t, c)).astype(np.float32) * 0.5)
        ks = _mk_kernels(rng_np, c)
        ref = _plain_stack(x, ks, (1, 3, 9), 0.01)
        out = packed_residual_stack(x, ks, (1, 3, 9), 0.01)
        assert out.shape == ref.shape
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5 * scale
        )

    def test_vjp_matches_plain(self, rng_np):
        c, t = 32, 1024
        x = jnp.asarray(rng_np.standard_normal((2, t, c)).astype(np.float32) * 0.5)
        ks = _mk_kernels(rng_np, c)
        g = jnp.asarray(rng_np.standard_normal((2, t, c)).astype(np.float32))

        def flatten(kk):
            return (kk[0][0], kk[0][1], kk[1][0], kk[1][1], kk[2][0], kk[2][1])

        def unflatten(kf):
            return ((kf[0], kf[1]), (kf[2], kf[3]), (kf[4], kf[5]))

        plain = lambda xx, kf: _plain_stack(xx, unflatten(kf), (1, 3, 9), 0.01)
        packed = lambda xx, kf: packed_residual_stack(xx, unflatten(kf), (1, 3, 9), 0.01)

        _, vjp_plain = jax.vjp(plain, x, flatten(ks))
        _, vjp_packed = jax.vjp(packed, x, flatten(ks))
        ref = vjp_plain(g)
        out = vjp_packed(g)
        for o, r in zip(jax.tree_util.tree_leaves(out), jax.tree_util.tree_leaves(ref)):
            scale = float(jnp.max(jnp.abs(r))) + 1e-8
            np.testing.assert_allclose(
                np.asarray(o), np.asarray(r), atol=5e-5 * scale
            )

    def test_small_t_falls_back(self, rng_np):
        # below the edge-window threshold the packed path must not engage
        x = jnp.asarray(rng_np.standard_normal((1, 128, 32)).astype(np.float32))
        ks = _mk_kernels(rng_np, 32)
        assert not can_pack(128, 32)
        out = packed_residual_stack(x, ks)
        ref = _plain_stack(x, ks, (1, 3, 9), 0.01)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_generator_uses_packed_path_consistently(self, rng_np):
        """The generator forward is identical with the packed path on/off."""
        import os

        from vibravox_tpu.models.eben_generator import EBENGenerator

        model = EBENGenerator(m=4, n=32, p=2)
        t = model.valid_length(8192)
        x = jnp.asarray(rng_np.standard_normal((1, t, 1)).astype(np.float32) * 0.1)
        params = model.init(jax.random.key(0), x)
        prev = os.environ.get("VIBRAVOX_PACKED_RU")
        try:
            os.environ["VIBRAVOX_PACKED_RU"] = "1"
            on = model.apply(params, x)[0]
            os.environ["VIBRAVOX_PACKED_RU"] = "0"
            off = model.apply(params, x)[0]
        finally:
            if prev is None:
                os.environ.pop("VIBRAVOX_PACKED_RU", None)
            else:
                os.environ["VIBRAVOX_PACKED_RU"] = prev
        scale = float(jnp.max(jnp.abs(off))) + 1e-8
        np.testing.assert_allclose(
            np.asarray(on), np.asarray(off), atol=3e-5 * scale
        )
