"""EnhanceServer: bucketing, micro-batching, exactness vs direct apply."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vibravox_tpu.models.eben_generator import EBENGenerator
from vibravox_tpu.serving import EnhanceServer


@pytest.fixture(scope="module")
def model_and_params():
    model = EBENGenerator(m=4, n=32, p=2)
    t = model.valid_length(8192)
    params = model.init(jax.random.key(0), jnp.zeros((1, t, 1)))
    return model, params


@pytest.fixture()
def server(model_and_params):
    model, params = model_and_params
    srv = EnhanceServer(
        model, params, max_batch=4, max_delay_ms=10.0,
        bucket_seconds=(0.5, 1.0),
    )
    yield srv
    srv.close()


class TestEnhanceServer:
    def test_single_request_matches_direct_apply(self, server, model_and_params, rng_np):
        model, params = model_and_params
        bucket = server.buckets[0]
        audio = rng_np.standard_normal(bucket).astype(np.float32) * 0.1
        out = server.enhance(audio)
        assert out.shape == audio.shape
        direct = np.asarray(model.apply(params, jnp.asarray(audio)[None, :, None])[0])
        np.testing.assert_allclose(out, direct[0, :, 0], atol=1e-5)

    def test_short_request_padded_and_trimmed(self, server, rng_np):
        n = server.buckets[0] // 2 + 3
        audio = rng_np.standard_normal(n).astype(np.float32) * 0.1
        out = server.enhance(audio)
        assert out.shape == (n,)
        assert np.isfinite(out).all()

    def test_concurrent_requests_batched(self, server, rng_np):
        futs = [
            server.submit(rng_np.standard_normal(server.buckets[0]).astype(np.float32) * 0.1)
            for _ in range(8)
        ]
        outs = [f.result(timeout=120) for f in futs]
        assert all(o.shape == (server.buckets[0],) for o in outs)
        stats = server.stats()
        assert stats["served"] == 8
        assert stats["latency_p95_ms"] > 0

    def test_batching_is_row_consistent(self, server, model_and_params, rng_np):
        """Co-batched requests must each get THEIR OWN row's output."""
        model, params = model_and_params
        bucket = server.buckets[0]
        audios = [rng_np.standard_normal(bucket).astype(np.float32) * 0.1 for _ in range(4)]
        futs = [server.submit(a) for a in audios]
        outs = [f.result(timeout=120) for f in futs]
        for a, o in zip(audios, outs):
            direct = np.asarray(model.apply(params, jnp.asarray(a)[None, :, None])[0])
            np.testing.assert_allclose(o, direct[0, :, 0], atol=1e-5)

    def test_oversize_request_rejected(self, server):
        with pytest.raises(ValueError, match="exceeds the largest bucket"):
            server.submit(np.zeros(10 * 16000, np.float32))

    def test_closed_server_rejects(self, model_and_params):
        model, params = model_and_params
        srv = EnhanceServer(model, params, bucket_seconds=(0.5,))
        srv.close()
        with pytest.raises(RuntimeError):
            srv.submit(np.zeros(100, np.float32))
