"""Windowed native-streaming policy: hold-back, bounded window, sentence reset."""

import numpy as np
import pytest

from whisperlivekit_tpu.streaming.windowed import WindowedStreamingProcessor
from whisperlivekit_tpu.timed import ASRToken


def tok(start, end, text):
    return ASRToken(start=start, end=end, text=text)


class ScriptedASR:
    sep = " "
    buffer_trimming = "segment"
    buffer_trimming_sec = 15.0
    confidence_validation = False
    tokenizer = None

    def __init__(self):
        self.hypotheses = []
        self.calls = 0

    def transcribe(self, audio, init_prompt=""):
        idx = min(self.calls, len(self.hypotheses) - 1)
        self.calls += 1
        return {"words": self.hypotheses[idx] if self.hypotheses else []}

    def ts_words(self, res):
        return list(res["words"])

    def segments_end_ts(self, res):
        return [res["words"][-1].end] if res["words"] else []


def make_proc(hypotheses, hold_back=2, window=8.0):
    asr = ScriptedASR()
    asr.hypotheses = hypotheses
    p = WindowedStreamingProcessor(asr, window_sec=window, hold_back_words=hold_back)
    return p, asr


def words(n, start=0.0, prefix="w"):
    return [tok(start + i, start + i + 1, f"{prefix}{i}") for i in range(n)]


def test_holdback_delays_frontier_words():
    hyp = words(6)
    p, asr = make_proc([hyp, hyp])
    p.insert_audio_chunk(np.zeros(16000 * 6, np.float32))
    p.process_iter()
    committed, _ = p.process_iter()
    # 6 words - 2 held back = 4 eligible; LA-2 commits the agreed prefix
    assert [t.text for t in committed] == ["w0", "w1", "w2", "w3"]


def test_short_hypothesis_fully_held():
    hyp = words(2)
    p, asr = make_proc([hyp, hyp], hold_back=4)
    p.insert_audio_chunk(np.zeros(16000 * 2, np.float32))
    p.process_iter()
    committed, _ = p.process_iter()
    assert committed == []


def test_window_bound_trims_audio():
    hyp = words(4)
    p, asr = make_proc([hyp, hyp], window=5.0)
    p.insert_audio_chunk(np.zeros(16000 * 12, np.float32))
    p.process_iter()
    assert len(p.audio_buffer) / 16000 <= 12  # trimmed toward window
    p.process_iter()
    assert len(p.audio_buffer) / 16000 <= 8


def test_sentence_reset_drops_window_behind_punctuation():
    hyp = [tok(0, 1, "done."), tok(1, 2, "next"), tok(2, 3, "words"), tok(3, 4, "x")]
    p, asr = make_proc([hyp, hyp], hold_back=1)
    p.insert_audio_chunk(np.zeros(16000 * 4, np.float32))
    p.process_iter()
    committed, _ = p.process_iter()
    assert any(t.text == "done." for t in committed)
    # window reset to the sentence end
    assert p.buffer_time_offset >= 1.0


def test_finish_flushes_without_holdback():
    hyp = words(3)
    p, asr = make_proc([hyp, hyp, hyp], hold_back=3)
    p.insert_audio_chunk(np.zeros(16000 * 3, np.float32))
    p.process_iter()
    committed, _ = p.process_iter()
    assert committed == []  # all held back
    remaining, upto = p.finish()
    texts = [t.text for t in p.committed + remaining]
    assert "w0" in texts and "w2" in texts


# ---- reference qwen3_streaming knobs (reference config.py:104-149) ----------


def test_chunk_sec_gates_retranscription():
    """chunk_sec: re-transcribe only once this much NEW audio accumulated."""
    hyp = words(6)
    asr = ScriptedASR()
    asr.hypotheses = [hyp, hyp, hyp]
    p = WindowedStreamingProcessor(asr, hold_back_words=0, chunk_sec=2.0)
    p.insert_audio_chunk(np.zeros(16000, np.float32))  # 1 s < 2 s
    out, _ = p.process_iter()
    assert asr.calls == 0 and out == []
    p.insert_audio_chunk(np.zeros(16000 * 2, np.float32))  # 3 s total
    p.process_iter()
    assert asr.calls == 1
    p.process_iter()  # no new audio since the last transcription
    assert asr.calls == 1


def test_right_context_is_lookahead_only():
    """right_context_ms: tokens inside the frontier span never commit."""
    hyp = words(6)  # w_i spans [i, i+1] over 6 s of audio
    p, asr = make_proc([hyp, hyp], hold_back=0)
    p.right_context_sec = 1.5  # cutoff = 6 - 1.5 = 4.5 s
    p.insert_audio_chunk(np.zeros(16000 * 6, np.float32))
    p.process_iter()
    committed, _ = p.process_iter()
    texts = [t.text for t in committed]
    assert "w3" in texts  # ends at 4.0 <= 4.5
    assert "w4" not in texts and "w5" not in texts  # inside the frontier


def test_static_context_prepends_prompt():
    """context: static text ahead of the rolling committed-words prompt."""
    captured = []

    class PromptCapturingASR(ScriptedASR):
        def transcribe(self, audio, init_prompt=""):
            captured.append(init_prompt)
            return super().transcribe(audio, init_prompt)

    asr = PromptCapturingASR()
    asr.hypotheses = [words(4)]
    p = WindowedStreamingProcessor(asr, hold_back_words=0, context="medical dictation")
    p.insert_audio_chunk(np.zeros(16000 * 4, np.float32))
    p.process_iter()
    p.finish()
    assert all(c.startswith("medical dictation") for c in captured)
    assert len(captured) == 2
