"""EnhanceServer: bucketing, micro-batching, exactness vs direct apply."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vibravox_tpu.models.eben_generator import EBENGenerator
from vibravox_tpu.serving import EnhanceServer, StreamingEnhancer


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

    def test_arbitrary_input_rate_round_trip(self, server, rng_np):
        """A 48 kHz request is host-resampled to the model rate and back:
        the caller gets their own rate and length."""
        n48 = (server.buckets[0] // 2) * 3  # maps under 48k->16k to bucket/2
        audio = rng_np.standard_normal(n48).astype(np.float32) * 0.1
        out = server.enhance(audio, input_sample_rate=48000)
        assert out.shape == audio.shape
        assert np.isfinite(out).all()

    def test_oversize_request_rejected(self, server):
        with pytest.raises(ValueError, match="exceeds the largest bucket"):
            server.submit(np.zeros(10 * 16000, np.float32))

    def test_closed_server_rejects(self, model_and_params):
        model, params = model_and_params
        srv = EnhanceServer(model, params, bucket_seconds=(0.5,))
        srv.close()
        with pytest.raises(RuntimeError):
            srv.submit(np.zeros(100, np.float32))

    def test_close_fails_raced_requests_instead_of_hanging(self, model_and_params):
        """A request that lands behind the shutdown sentinel (the tiny
        submit/close race window) must resolve with an error, not block its
        caller on .result() forever."""
        from concurrent.futures import Future

        from vibravox_tpu.serving import _Request

        model, params = model_and_params
        srv = EnhanceServer(model, params, bucket_seconds=(0.5,))
        # simulate the race: the worker sees a shutdown sentinel, then a
        # straggler request lands behind it before close() runs
        srv._queue.put(None)
        srv._worker.join(timeout=10)
        fut: Future = Future()
        srv._queue.put(_Request(fut, np.zeros(100, np.float32), srv.buckets[0], 0.0))
        srv.close()
        with pytest.raises(RuntimeError, match="closed"):
            fut.result(timeout=10)


class TestStreamingEnhancer:
    """Chunked streaming must reproduce the offline forward in the interior
    (finite receptive field + stride-grid-aligned windows make it exact)."""

    def test_matches_offline_interior(self, model_and_params, rng_np):
        model, params = model_and_params
        chunk, context = 2048, 8192
        stream = StreamingEnhancer(model, params, chunk=chunk, context=context)
        n = model.valid_length(12 * chunk)
        audio = rng_np.standard_normal(n).astype(np.float32) * 0.1

        outs = []
        # irregular push block sizes: output must not depend on arrival shape
        pos, sizes = 0, [333, 4096, 1, 2047, 8192]
        i = 0
        while pos < n:
            step = sizes[i % len(sizes)]
            outs.append(stream.push(audio[pos : pos + step]))
            pos += step
            i += 1
        outs.append(stream.flush())
        streamed = np.concatenate(outs)
        assert streamed.shape == (n,)

        offline = np.asarray(model.apply(params, jnp.asarray(audio)[None, :, None])[0])[0, :, 0]
        # the head is exact (the first window consumes the raw signal edge);
        # exclude only the flushed tail, where the stream substituted zeros
        # for future samples offline never had to invent
        interior = slice(0, n - (context + model.n))
        np.testing.assert_allclose(streamed[interior], offline[interior], atol=2e-5)

    def test_latency_and_incremental_output(self, model_and_params):
        model, params = model_and_params
        stream = StreamingEnhancer(model, params, chunk=1024, context=2048)
        lat = stream.latency_samples
        got = stream.push(np.zeros(lat - 1, np.float32))
        assert got.size == 0  # one short of the first window
        got = stream.push(np.zeros(1, np.float32))
        # the first window emits its exact head: context + chunk samples
        assert got.size == 2048 + 1024
        # steady state: one chunk per chunk pushed
        got = stream.push(np.zeros(1024, np.float32))
        assert got.size == 1024

    def test_flush_semantics(self, model_and_params, rng_np):
        model, params = model_and_params
        stream = StreamingEnhancer(model, params, chunk=1024, context=1024)
        stream.push(rng_np.standard_normal(2500).astype(np.float32))
        stream.flush()
        # flushing twice is a no-op; pushing after flush is an error
        assert stream.flush().size == 0
        with pytest.raises(RuntimeError):
            stream.push(np.zeros(1, np.float32))

    def test_total_sample_conservation(self, model_and_params, rng_np):
        model, params = model_and_params
        stream = StreamingEnhancer(model, params, chunk=1024, context=1024)
        n = 5000
        out = stream.push(rng_np.standard_normal(n).astype(np.float32))
        out2 = stream.flush()
        assert out.size + out2.size == n

    def test_grid_validation(self, model_and_params):
        model, params = model_and_params
        with pytest.raises(ValueError, match="stride grid"):
            StreamingEnhancer(model, params, chunk=1000, context=2048)
