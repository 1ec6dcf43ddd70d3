"""Translation through the full pipeline (EchoTranslation backend) +
translate-on-complete holdback + sidecar client logic."""

import asyncio

import numpy as np
import pytest

from conftest import reference_asset
from whisperlivekit_tpu.timed import ASRToken, HypothesisTail
from whisperlivekit_tpu.translation.alignatt_client import AlignAttTranslationClient
from whisperlivekit_tpu.translation.base import EchoTranslation


def tok(start, end, text):
    return ASRToken(start=start, end=end, text=text)


class TestEchoTranslation:
    def test_emits_on_punctuation(self):
        t = EchoTranslation("en", "fr")
        t.insert_tokens([tok(0, 1, " hello")])
        out, buf = t.process()
        assert out is None
        assert buf.text == " hello"
        t.insert_tokens([tok(1, 2, " world.")])
        out, buf = t.process()
        assert out is not None
        assert out.text == " hello world."
        assert out.start == 0 and out.end == 2

    def test_validate_flushes(self):
        t = EchoTranslation("en", "fr")
        t.insert_tokens([tok(0, 1, " unfinished")])
        out, _ = t.validate_buffer_and_reset()
        assert out.text == " unfinished"
        out2, _ = t.validate_buffer_and_reset()
        assert out2 is None


class TestAlignAttClient:
    def make(self):
        class Cfg:
            alignatt_url = "ws://localhost:1"  # nothing listening
            alignatt_latency = "low"
            alignatt_context = ""

        return AlignAttTranslationClient(Cfg(), "en", "fr")

    def test_collects_tokens_and_tail(self):
        c = self.make()
        c.insert_tokens([tok(0, 1, " word"), HypothesisTail(start=1, end=2, text="draft")])
        assert len(c._committed_words) == 1
        assert c._tail.text == "draft"

    def test_down_sidecar_degrades_gracefully(self):
        c = self.make()
        c.insert_tokens([tok(0, 1, " word.")])
        out, buf = c.process()  # connection refused -> backoff, no crash
        assert out is None
        assert c._down_until > 0

    def test_validate_emits_source_fallback(self):
        c = self.make()
        c.insert_tokens([tok(0, 1, " fin.")])
        out, _ = c.validate_buffer_and_reset()
        assert out is not None and out.text == " fin."


@pytest.mark.skipif(
    reference_asset("whisperlivekit/whisper/assets/multilingual.tiktoken") is None,
    reason="tokenizer vocab assets unavailable",
)
def test_pipeline_attaches_translations():
    """Full AudioProcessor run with target_language: translation segments
    must flow through the queue into the aligned lines."""
    from whisperlivekit_tpu.harness.harness import TestHarness, reset_engine_cache

    async def main():
        reset_engine_cache()
        kw = dict(
            model_size="random:dev-tiny",
            lan="en",
            vac=False,
            target_language="fr",
            log_level="ERROR",
        )
        try:
            async with TestHarness(**kw) as h:
                t = np.arange(16000 * 3) / 16000
                sig = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
                await h.feed_audio(sig, speed=0)
                await h.drain(1.5)
                final = await h.finish(timeout=30)
                # translation plumbing ran; queue consumed without errors
                assert final.error == ""
                return True
        finally:
            reset_engine_cache()

    assert asyncio.run(main())
