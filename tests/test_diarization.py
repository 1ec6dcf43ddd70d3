"""Diarization backends + speaker attribution through the full pipeline."""

import asyncio

import numpy as np
import pytest

from conftest import reference_asset
from whisperlivekit_tpu.diarization.embedding import EmbeddingDiarization
from whisperlivekit_tpu.session.alignment import TokensAlignment
from whisperlivekit_tpu.timed import ASRToken, SpeakerSegment, State


def voice(f0: float, seconds: float, seed: int) -> np.ndarray:
    """Synthetic 'speaker': harmonic stack at f0 with formant-ish filtering."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * seconds)) / 16000
    sig = sum(
        (0.5 / k) * np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6))
        for k in range(1, 9)
    )
    return (0.25 * sig / np.max(np.abs(sig)) + 0.01 * rng.standard_normal(t.shape)).astype(
        np.float32
    )


class TestEmbeddingDiarization:
    def test_distinguishes_two_synthetic_speakers(self):
        d = EmbeddingDiarization(max_speakers=4)

        async def run():
            segs = []
            # alternating speakers, 3 s each
            for rep in range(2):
                d.insert_audio_chunk(voice(110, 3.0, seed=rep))
                while True:
                    out = await d.diarize()
                    if not out:
                        break
                    segs.extend(out)
                d.insert_audio_chunk(voice(290, 3.0, seed=10 + rep))
                while True:
                    out = await d.diarize()
                    if not out:
                        break
                    segs.extend(out)
            return segs

        segs = asyncio.run(run())
        assert len(segs) == 12
        speakers = {s.speaker for s in segs}
        assert len(speakers) >= 2
        # same-speaker chunks must mostly agree: first 3 chunks one speaker
        first = [s.speaker for s in segs[:3]]
        assert len(set(first)) == 1

    def test_silence_shifts_offset(self):
        d = EmbeddingDiarization()

        async def run():
            d.insert_audio_chunk(voice(150, 1.0, 0))
            first = await d.diarize()
            d.insert_silence(5.0)
            d.insert_audio_chunk(voice(150, 1.0, 1))
            second = await d.diarize()
            return first, second

        first, second = asyncio.run(run())
        assert first[0].start == 0.0
        assert second[0].start == pytest.approx(6.0)

    def test_zero_audio_yields_nothing(self):
        d = EmbeddingDiarization()

        async def run():
            d.insert_audio_chunk(np.zeros(16000, np.float32))
            return await d.diarize()

        assert asyncio.run(run()) == []


class TestSpeakerAttribution:
    def make_alignment(self):
        class Args:
            diarization = True

        return TokensAlignment(State(), Args(), sep=" ")

    def tok(self, start, end, text):
        return ASRToken(start=start, end=end, text=text)

    def test_max_overlap_attribution(self):
        ta = self.make_alignment()
        ta.all_tokens = [
            self.tok(0.0, 1.0, "hello"),
            self.tok(1.0, 2.0, " world."),
            self.tok(2.2, 3.0, "hi"),
            self.tok(3.0, 4.0, " there."),
        ]
        ta.all_diarization_segments = [
            SpeakerSegment(start=0.0, end=2.1, speaker=0),
            SpeakerSegment(start=2.1, end=4.5, speaker=1),
        ]
        lines, buffer = ta.get_lines_diarization()
        assert [ln.speaker for ln in lines] == [1, 2]  # wire speakers are 1-based
        assert lines[0].text == "hello world."
        assert lines[1].text == "hi there."

    def test_text_after_last_diar_goes_to_buffer(self):
        ta = self.make_alignment()
        ta.all_tokens = [self.tok(0.0, 1.0, "spoken."), self.tok(5.0, 6.0, "late.")]
        ta.all_diarization_segments = [SpeakerSegment(start=0.0, end=2.0, speaker=0)]
        lines, buffer = ta.get_lines_diarization()
        assert "late." in buffer

    def test_same_speaker_lines_merge(self):
        ta = self.make_alignment()
        ta.all_tokens = [
            self.tok(0.0, 1.0, "one."),
            self.tok(1.0, 2.0, " two."),
        ]
        ta.all_diarization_segments = [SpeakerSegment(start=0.0, end=2.5, speaker=0)]
        lines, _ = ta.get_lines_diarization()
        assert len(lines) == 1
        assert lines[0].text == "one. two."
