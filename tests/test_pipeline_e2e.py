"""End-to-end pipeline tests through TestHarness with the dev-tiny random model.

Transcript *quality* is untestable with random weights; these tests pin the
pipeline mechanics the reference's test_pipeline.py pins: buffer lifecycle,
silence detection and flushing, timing invariants, metrics collection,
progressive updates, abrupt cutoff.
"""

import asyncio

import numpy as np
import pytest

from conftest import reference_asset
from whisperlivekit_tpu.harness.harness import TestHarness, reset_engine_cache

pytestmark = pytest.mark.skipif(
    reference_asset("whisperlivekit/whisper/assets/multilingual.tiktoken") is None,
    reason="tokenizer vocab assets unavailable",
)


def run(coro):
    return asyncio.run(coro)


def speech_like(seconds: float, seed: int = 0) -> np.ndarray:
    """Loud modulated tone — 'speech' for the energy VAD."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * seconds)) / 16000
    sig = 0.3 * np.sin(2 * np.pi * 220 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
    return (sig + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)


ENGINE_KW = dict(
    model_size="random:dev-tiny",
    lan="en",
    backend_policy="simulstreaming",
    vac=True,
    log_level="WARNING",
)


@pytest.fixture(scope="module", autouse=True)
def _fresh_engines():
    reset_engine_cache()
    yield
    reset_engine_cache()


def test_pipeline_runs_and_finishes():
    async def main():
        async with TestHarness(**ENGINE_KW) as h:
            await h.feed_audio(speech_like(3.0), speed=0)
            await h.drain(1.5)
            final = await h.finish(timeout=20)
            assert final.status in ("active_transcription", "no_audio_detected")
            assert final.timing_valid, final.timing_errors
            m = h.metrics
            assert m.n_chunks_received > 0
            fed = h._processor.total_pcm_samples / 16000
            assert fed == pytest.approx(3.0, abs=0.2)
        return True

    assert run(main())


def test_silence_detection_long_pause():
    async def main():
        async with TestHarness(**ENGINE_KW) as h:
            await h.feed_audio(speech_like(2.0), speed=0)
            await h.pause(7.0, speed=0)
            await h.feed_audio(speech_like(1.5, seed=3), speed=0)
            await h.drain(1.5)
            final = await h.finish(timeout=20)
            assert h.metrics.n_silence_events >= 1
            return final

    final = run(main())
    # a >5s pause must surface as a silence segment (speaker -2 line)
    assert final.has_silence or final.status in ("active_transcription", "no_audio_detected")


def test_progressive_updates_history():
    async def main():
        async with TestHarness(**ENGINE_KW) as h:
            await h.feed_audio(speech_like(2.0), speed=0)
            await h.drain(1.0)
            n_before = len(h.history)
            await h.feed_audio(speech_like(2.0, seed=5), speed=0)
            await h.drain(1.0)
            await h.finish(timeout=20)
            return n_before, len(h.history)

    n_before, n_after = run(main())
    assert n_after >= n_before


def test_abrupt_cut():
    async def main():
        async with TestHarness(**ENGINE_KW) as h:
            await h.feed_audio(speech_like(1.5), speed=0)
            state = await h.cut(timeout=10)
            assert state is not None
        return True

    assert run(main())


def test_local_agreement_policy_pipeline():
    async def main():
        kw = dict(ENGINE_KW, backend_policy="localagreement")
        async with TestHarness(**kw) as h:
            await h.feed_audio(speech_like(2.5), speed=0)
            await h.drain(2.0)
            final = await h.finish(timeout=30)
            assert final.timing_valid, final.timing_errors
        return True

    assert run(main())


def test_metrics_shape():
    async def main():
        async with TestHarness(**ENGINE_KW) as h:
            await h.feed_audio(speech_like(2.0), speed=0)
            await h.drain(1.0)
            await h.finish(timeout=20)
            d = h.metrics.to_dict()
            for key in ("rtf", "n_transcription_calls", "avg_latency_ms", "p95_latency_ms"):
                assert key in d
        return True

    assert run(main())
