"""Streaming policy logic tests — fakes for guards, pure logic for commits.

Mirrors the reference test strategy (tests/test_backend_deep_bugs.py): the
stability guards are tested against scripted fake models, no weights needed.
"""

from types import SimpleNamespace
from typing import List

import numpy as np
import pytest

from whisperlivekit_tpu.streaming.local_agreement import HypothesisBuffer, OnlineASRProcessor
from whisperlivekit_tpu.streaming.simul_processor import SimulStreamingOnlineProcessor
from whisperlivekit_tpu.timed import ASRToken, ChangeSpeaker


def tok(start, end, text, p=None):
    return ASRToken(start=start, end=end, text=text, probability=p)


# ---------------------------------------------------------------------------
# HypothesisBuffer (LocalAgreement-2 commit semantics)
# ---------------------------------------------------------------------------


class TestHypothesisBuffer:
    def test_commit_on_agreement(self):
        hb = HypothesisBuffer()
        hb.insert([tok(0, 1, "hello"), tok(1, 2, "world")], 0)
        assert hb.flush() == []  # first hypothesis: nothing stable yet
        hb.insert([tok(0, 1, "hello"), tok(1, 2, "world"), tok(2, 3, "foo")], 0)
        committed = hb.flush()
        assert [t.text for t in committed] == ["hello", "world"]
        assert hb.last_committed_time == 2

    def test_disagreement_blocks_commit(self):
        hb = HypothesisBuffer()
        hb.insert([tok(0, 1, "hello")], 0)
        hb.flush()
        hb.insert([tok(0, 1, "yellow")], 0)
        assert hb.flush() == []

    def test_ngram_dedup_against_committed_tail(self):
        hb = HypothesisBuffer()
        hb.insert([tok(0, 1, "a"), tok(1, 2, "b")], 0)
        hb.flush()
        hb.insert([tok(0, 1, "a"), tok(1, 2, "b")], 0)
        committed = hb.flush()
        assert [t.text for t in committed] == ["a", "b"]
        # new hypothesis repeats the committed tail near the committed time
        hb.insert([tok(1.95, 2.5, "b"), tok(2.5, 3, "c")], 0)
        # "b" should be deduped; only "c" remains pending
        assert [t.text for t in hb.new] == ["c"]

    def test_confidence_fast_path(self):
        hb = HypothesisBuffer(confidence_validation=True)
        hb.insert([tok(0, 1, "sure", p=0.99)], 0)
        committed = hb.flush()
        assert [t.text for t in committed] == ["sure"]

    def test_stale_tokens_dropped(self):
        hb = HypothesisBuffer()
        hb.last_committed_time = 5.0
        hb.insert([tok(1, 2, "old"), tok(5.5, 6, "new")], 0)
        assert [t.text for t in hb.new] == ["new"]

    def test_pop_committed(self):
        hb = HypothesisBuffer()
        hb.committed_in_buffer = [tok(0, 1, "a"), tok(1, 2, "b"), tok(2, 3, "c")]
        hb.pop_committed(2.0)
        assert [t.text for t in hb.committed_in_buffer] == ["c"]


# ---------------------------------------------------------------------------
# OnlineASRProcessor with a fake batch backend
# ---------------------------------------------------------------------------


class FakeBatchASR:
    """Scripted transcribe(): returns a fixed hypothesis per call."""

    sep = " "
    buffer_trimming = "segment"
    buffer_trimming_sec = 15.0
    confidence_validation = False
    tokenizer = None

    def __init__(self, scripts: List[List[ASRToken]]):
        self.scripts = scripts
        self.calls = 0

    def transcribe(self, audio, init_prompt=""):
        idx = min(self.calls, len(self.scripts) - 1)
        self.calls += 1
        words = self.scripts[idx]
        return {
            "segments": [
                {
                    "end": words[-1].end if words else 0.0,
                    "no_speech_prob": 0.0,
                    "words": [
                        {"start": w.start, "end": w.end, "word": w.text, "probability": None}
                        for w in words
                    ],
                }
            ]
        }

    def ts_words(self, res):
        return [
            ASRToken(start=w["start"], end=w["end"], text=w["word"])
            for w in res["segments"][0]["words"]
        ]

    def segments_end_ts(self, res):
        return [s["end"] for s in res["segments"]]


class TestOnlineASRProcessor:
    def test_local_agreement_commits_prefix(self):
        asr = FakeBatchASR(
            [
                [tok(0, 1, "the"), tok(1, 2, "quick")],
                [tok(0, 1, "the"), tok(1, 2, "quick"), tok(2, 3, "fox")],
            ]
        )
        proc = OnlineASRProcessor(asr)
        proc.insert_audio_chunk(np.zeros(16000, np.float32))
        committed, upto = proc.process_iter()
        assert committed == []
        proc.insert_audio_chunk(np.zeros(16000, np.float32))
        committed, upto = proc.process_iter()
        assert [t.text for t in committed] == ["the", "quick"]
        assert upto == pytest.approx(2.0)

    def test_buffer_trimming_at_segment(self):
        words = [tok(i, i + 1, f"w{i}") for i in range(20)]
        asr = FakeBatchASR([words, words])
        asr.buffer_trimming_sec = 10.0
        proc = OnlineASRProcessor(asr)
        proc.insert_audio_chunk(np.zeros(16000 * 20, np.float32))
        proc.process_iter()
        proc.process_iter()  # commits everything, then trims
        assert len(proc.audio_buffer) / 16000 < 20

    def test_freeze_reset(self):
        asr = FakeBatchASR([[]])
        asr.buffer_trimming_sec = 2.0
        proc = OnlineASRProcessor(asr)
        proc.time_of_last_asr_output = 0.0
        proc.insert_audio_chunk(np.zeros(16000 * 5, np.float32))
        committed, _ = proc.process_iter()
        assert committed == []
        # freeze-protection must have reset the buffer
        assert proc.audio_buffer.size == 0
        assert proc.buffer_time_offset == pytest.approx(5.0)

    def test_prompt_is_200_chars_of_committed_outside_buffer(self):
        asr = FakeBatchASR([[]])
        proc = OnlineASRProcessor(asr)
        proc.committed = [tok(i, i + 1, f"word{i}") for i in range(100)]
        proc.buffer_time_offset = 100.0
        prompt, context = proc.prompt()
        assert len(prompt) <= 210
        assert prompt.endswith("word99")

    def test_end_silence_short_inserts_gap(self):
        asr = FakeBatchASR([[]])
        proc = OnlineASRProcessor(asr)
        proc.insert_audio_chunk(np.zeros(16000, np.float32))
        proc.end_silence(1.0, 0.0)
        assert proc.audio_buffer.size == 32000

    def test_end_silence_long_resets(self):
        asr = FakeBatchASR([[]])
        proc = OnlineASRProcessor(asr)
        proc.insert_audio_chunk(np.zeros(16000, np.float32))
        proc.end_silence(6.0, 1.0)
        assert proc.audio_buffer.size == 0
        assert proc.buffer_time_offset == pytest.approx(7.0)


# ---------------------------------------------------------------------------
# SimulStreaming guards with a scripted fake AlignAtt session
# ---------------------------------------------------------------------------


class FakeAlignAttSession:
    """Scripted infer() batches (reference FakeSimulStreamingModel role)."""

    def __init__(self, batches):
        self.batches = list(batches)
        self.refreshed = 0
        self.global_time_offset = 0.0
        self.speaker = -1
        self.segments = []

    def insert_audio(self, seg=None):
        if seg is not None:
            self.segments.append(seg)

    def infer(self, is_last=False):
        return self.batches.pop(0) if self.batches else []

    def refresh_segment(self, complete=False):
        self.refreshed += 1


def make_sim_proc(batches):
    proc = SimulStreamingOnlineProcessor.__new__(SimulStreamingOnlineProcessor)
    proc.engine = SimpleNamespace(cfg=SimpleNamespace(language="en"))
    proc.model = FakeAlignAttSession(batches)
    proc.end = 0.0
    proc.buffer = []
    proc._last_committed_end = 0.0
    proc._recent_words = []
    return proc


class TestSimulStreamingGuards:
    def test_stale_tokens_filtered(self):
        proc = make_sim_proc([[tok(0, 1, " hello")], [tok(0.2, 0.9, " hello"), tok(1, 2, " world")]])
        words, _ = proc.process_iter()
        assert [w.text for w in words] == [" hello"]
        words, _ = proc.process_iter()
        assert [w.text for w in words] == [" world"]  # stale re-emit dropped

    def test_intra_batch_rewind_dropped(self):
        proc = make_sim_proc([[tok(3, 4, " later"), tok(0.5, 1.0, " rewound")]])
        words, _ = proc.process_iter()
        assert [w.text for w in words] == [" later"]

    def test_full_rewind_triggers_reset(self):
        proc = make_sim_proc([[tok(9, 10, " far")], [tok(1, 2, " way-back")]])
        proc.process_iter()
        words, _ = proc.process_iter()
        assert words == []
        assert proc.model.refreshed == 1  # reset fired

    def test_repetition_loop_triggers_reset(self):
        looped = [tok(i, i + 0.5, " spam") for i in np.arange(0, 8, 0.5)]
        proc = make_sim_proc([looped])
        words, _ = proc.process_iter()
        assert words == []
        assert proc.model.refreshed == 1

    def test_invalid_span_dropped(self):
        proc = make_sim_proc([[tok(2, 1, " bad"), tok(2, 3, " good")]])
        words, _ = proc.process_iter()
        assert [w.text for w in words] == [" good"]

    def test_new_speaker_resets(self):
        proc = make_sim_proc([[], []])
        proc.new_speaker(ChangeSpeaker(speaker=2, start=4.0))
        assert proc.model.refreshed == 1
        assert proc.model.speaker == 2
        assert proc.model.global_time_offset == 4.0
        assert proc._last_committed_end == 4.0

    def test_end_silence_long_resets(self):
        proc = make_sim_proc([[]])
        proc.end_silence(6.0, 2.0)
        assert proc.model.refreshed == 1
        assert proc.model.global_time_offset == 8.0

    def test_end_silence_short_inserts_gap(self):
        proc = make_sim_proc([[]])
        proc.end_silence(1.0, 0.0)
        assert proc.model.refreshed == 0
        assert len(proc.model.segments) == 1
        assert proc.model.segments[0].shape[0] == 16000
