"""Fused residual-stack kernels vs the plain XLA path: exact values and vjp.

The Pallas kernels (``ops/fused_residual.py``) must reproduce the
reference-parity XLA formulation — including the reflect-padded edges
(stitched from short XLA windows) — for both the forward values and the
full vjp (dx and all six weight gradients)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibravox_tpu.ops.fused_residual import (
    _EDGE_W,
    _plain_stack,
    residual_stack,
)


def _mk_kernels(rng, c):
    scale = 0.5 / np.sqrt(3 * c)  # keep the residual chain O(1)
    ks = []
    for _ in range(3):
        wd = jnp.asarray(rng.standard_normal((3, c, c)).astype(np.float32) * scale)
        wp = jnp.asarray(rng.standard_normal((1, c, c)).astype(np.float32) * scale)
        ks.append((wd, wp))
    return tuple(ks)


def _fused(x, kernels):
    prev = os.environ.get("VIBRAVOX_FUSED_RU")
    os.environ["VIBRAVOX_FUSED_RU"] = "1"
    try:
        return residual_stack(x, kernels)
    finally:
        if prev is None:
            os.environ.pop("VIBRAVOX_FUSED_RU", None)
        else:
            os.environ["VIBRAVOX_FUSED_RU"] = prev


class TestFusedResidualStack:
    @pytest.mark.parametrize("c,t", [(32, 700), (16, 1025), (64, 512)])
    def test_forward_matches_plain(self, c, t, rng_np):
        x = jnp.asarray(rng_np.standard_normal((2, t, c)).astype(np.float32) * 0.5)
        ks = _mk_kernels(rng_np, c)
        ref = _plain_stack(x, ks, (1, 3, 9), 0.01)
        out = _fused(x, ks)
        assert out.shape == ref.shape
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5 * scale
        )

    def test_vjp_matches_plain(self, rng_np):
        c, t = 32, 700
        x = jnp.asarray(rng_np.standard_normal((2, t, c)).astype(np.float32) * 0.5)
        ks = _mk_kernels(rng_np, c)
        g = jnp.asarray(rng_np.standard_normal((2, t, c)).astype(np.float32))

        def plain_fn(xx, kflat):
            kk = ((kflat[0], kflat[1]), (kflat[2], kflat[3]), (kflat[4], kflat[5]))
            return _plain_stack(xx, kk, (1, 3, 9), 0.01)

        def fused_fn(xx, kflat):
            kk = ((kflat[0], kflat[1]), (kflat[2], kflat[3]), (kflat[4], kflat[5]))
            return _fused(xx, kk)

        kflat = [w for pair in ks for w in pair]
        _, vjp_p = jax.vjp(plain_fn, x, kflat)
        _, vjp_f = jax.vjp(fused_fn, x, kflat)
        (dx_p, dk_p), (dx_f, dk_f) = vjp_p(g), vjp_f(g)
        scale = float(jnp.max(jnp.abs(dx_p)))
        np.testing.assert_allclose(
            np.asarray(dx_f), np.asarray(dx_p), atol=1e-4 * scale
        )
        for a, b in zip(dk_f, dk_p):
            s = float(jnp.max(jnp.abs(b))) + 1e-9
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4 * s
            )

    def test_short_signal_falls_back(self, rng_np):
        """Signals shorter than the edge-window regime use the plain path."""
        c, t = 32, _EDGE_W
        x = jnp.asarray(rng_np.standard_normal((1, t, c)).astype(np.float32))
        ks = _mk_kernels(rng_np, c)
        out = _fused(x, ks)
        ref = _plain_stack(x, ks, (1, 3, 9), 0.01)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_generator_forward_unchanged(self, rng_np):
        """EBENGenerator output is identical whether or not the fused path
        is active (CPU: fused runs the Pallas kernels in interpret mode)."""
        from vibravox_tpu.models.eben_generator import EBENGenerator

        gen = EBENGenerator(m=4, n=32, p=2)
        t = gen.valid_length(6000)
        x = jnp.asarray(rng_np.standard_normal((1, t, 1)).astype(np.float32) * 0.1)
        params = gen.init(jax.random.key(0), x)
        y_plain, _ = gen.apply(params, x)
        prev = os.environ.get("VIBRAVOX_FUSED_RU")
        os.environ["VIBRAVOX_FUSED_RU"] = "1"
        try:
            y_fused, _ = gen.apply(params, x)
        finally:
            if prev is None:
                os.environ.pop("VIBRAVOX_FUSED_RU", None)
            else:
                os.environ["VIBRAVOX_FUSED_RU"] = prev
        np.testing.assert_allclose(
            np.asarray(y_fused), np.asarray(y_plain), atol=5e-5
        )
