"""Fine-grained units for the session host plane (session/processor.py):
SilenceGate transitions, PcmIngest VAD segmentation (sample-precise), and
StateStore watermark arithmetic — complementing the integration tests in
test_audio_processor.py."""

import asyncio
from types import SimpleNamespace

import numpy as np
import pytest

from whisperlivekit_tpu.session.metrics import SessionMetrics
from whisperlivekit_tpu.session.processor import (
    PcmIngest,
    SilenceGate,
    StateStore,
    TranslationRouter,
)
from whisperlivekit_tpu.timed import ASRToken, Silence, Transcript


def run(coro):
    return asyncio.run(coro)


# ---------------------------------------------------------------------------
# SilenceGate
# ---------------------------------------------------------------------------


def make_gate(events):
    async def on_begin(s):
        events.append(("begin", s.start))

    async def on_end(s):
        events.append(("end", s.start, s.end, s.duration))

    return SilenceGate(SessionMetrics(), on_begin, on_end)


def test_gate_transitions_and_durations():
    events = []
    gate = make_gate(events)
    assert not gate.closed

    async def main():
        await gate.close(1.0)
        assert gate.closed
        await gate.close(2.0)  # idempotent while closed
        sil = await gate.open(4.5)
        assert sil.duration == pytest.approx(3.5)
        assert not gate.closed
        assert await gate.open(5.0) is None  # idempotent while open

    run(main())
    assert events == [("begin", 1.0), ("end", 1.0, 4.5, 3.5)]


def test_gate_initial_silence():
    events = []
    gate = make_gate(events)
    gate.open_initial()
    assert gate.closed and gate.current.start == 0.0

    async def main():
        return await gate.open(0.25)

    sil = run(main())
    assert sil.duration == pytest.approx(0.25)
    # open_initial emits no begin event (the stream starts inside silence)
    assert events == [("end", 0.0, 0.25, 0.25)]


# ---------------------------------------------------------------------------
# PcmIngest
# ---------------------------------------------------------------------------


class _Gate:
    def __init__(self):
        self.closed = True


class FakeProcessor:
    """Captures the processor-facing callbacks PcmIngest drives."""

    def __init__(self):
        self.audio_spans = []
        self.transitions = []
        self.args = SimpleNamespace(transcription=True, diarization=False)
        self.silence_gate = _Gate()

    async def on_active_audio(self, pcm):
        self.audio_spans.append(len(pcm))

    async def on_silence_open(self, at_sample):
        self.transitions.append(("open", at_sample))
        self.silence_gate.closed = False

    async def on_silence_close(self, at_sample):
        self.transitions.append(("close", at_sample))
        self.silence_gate.closed = True


class ScriptedVAD:
    def __init__(self, script):
        self.script = list(script)

    def __call__(self, pcm):
        return self.script.pop(0) if self.script else []


def pcm_bytes(n_samples):
    return (np.zeros(n_samples, "<i2")).tobytes()


def test_vad_segmentation_sample_precise():
    """start/end events split the chunk exactly at (clamped) sample offsets."""
    proc = FakeProcessor()
    vad = ScriptedVAD([[{"start": 4000}, {"end": 12000}]])
    ing = PcmIngest(proc, vad, False, use_vad=True, chunk_seconds=1.0)
    ing.feed(pcm_bytes(16000))
    run(ing.pump())
    # silence [0,4000) -> speech [4000,12000) -> silence [12000,16000)
    assert proc.transitions == [("open", 4000), ("close", 12000)]
    assert proc.audio_spans == [8000]
    assert ing.total_samples == 16000


def test_vad_event_clamped_into_chunk():
    proc = FakeProcessor()
    vad = ScriptedVAD([[{"start": -500}], [{"end": 99999999}]])
    ing = PcmIngest(proc, vad, False, use_vad=True, chunk_seconds=1.0)
    ing.feed(pcm_bytes(16000))
    run(ing.pump())
    assert proc.transitions[0] == ("open", 0)
    assert proc.audio_spans == [16000]
    ing.feed(pcm_bytes(16000))
    run(ing.pump())
    # end clamped to the chunk boundary (32000), audio up to it emitted
    assert proc.transitions[1] == ("close", 32000)
    assert sum(proc.audio_spans) == 32000


def test_ingest_buffers_until_chunk():
    proc = FakeProcessor()
    ing = PcmIngest(proc, None, False, use_vad=False, chunk_seconds=1.0)
    ing.feed(pcm_bytes(8000))
    run(ing.pump())
    assert proc.audio_spans == []  # below one framing chunk
    ing.feed(pcm_bytes(8000))
    run(ing.pump())
    assert proc.audio_spans == [16000]


def test_flush_emits_remainder_and_ends_silence():
    proc = FakeProcessor()
    ing = PcmIngest(proc, None, False, use_vad=True, chunk_seconds=1.0)
    ing.feed(pcm_bytes(1234))
    run(ing.flush())
    assert proc.transitions == [("open", 0)]
    assert proc.audio_spans == [1234]
    assert ing.total_samples == 1234


# ---------------------------------------------------------------------------
# StateStore watermarks
# ---------------------------------------------------------------------------


def test_commit_watermarks():
    async def main():
        store = StateStore(retention_seconds=300.0)
        tok = ASRToken(start=0.5, end=1.2, text=" hi")
        await store.commit([tok], Transcript(1.2, 1.8, "there"), processed_upto=2.0)
        st = store.state
        assert st.end_transcription_processed == 2.0
        assert st.end_transcription_committed == 1.2
        assert st.end_buffer == 2.0  # max(committed, buffer end, processed)
        assert st.tokens == [tok] and st.new_tokens == [tok]

        st = await store.snapshot(audio_seconds=3.0, beg_loop=None, transcription_enabled=True)
        assert st.remaining_time_transcription_processing == pytest.approx(1.0)
        assert st.remaining_time_transcription_policy == pytest.approx(0.8)

    run(main())


def test_retention_bounds_tokens():
    async def main():
        store = StateStore(retention_seconds=10.0)
        for i in range(30):
            await store.commit(
                [ASRToken(start=float(i), end=float(i + 1), text=f" w{i}")],
                Transcript(None, None, ""), processed_upto=float(i + 1),
            )
        return store.state.tokens

    tokens = run(main())
    assert tokens[0].end >= 30.0 - 10.0
    assert tokens[-1].text == " w29"


# ---------------------------------------------------------------------------
# TranslationRouter (translate-on-complete batching)
# ---------------------------------------------------------------------------


def test_router_holds_until_punctuation():
    async def main():
        q = asyncio.Queue()
        r = TranslationRouter(q, on_complete=True)
        await r.route([ASRToken(0, 1, " hello"), ASRToken(1, 2, " world")])
        assert q.qsize() == 0  # held: no sentence end yet
        await r.route([ASRToken(2, 3, " done."), ASRToken(3, 4, " next")])
        assert q.qsize() == 3  # everything through "done." released
        await r.flush()
        assert q.qsize() == 4

    run(main())
