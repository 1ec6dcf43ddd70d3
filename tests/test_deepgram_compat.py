"""Deepgram adapter message semantics (unit level, fake websocket)."""

import asyncio

import pytest

from whisperlivekit_tpu.server.deepgram_compat import DeepgramAdapter, _line_to_words


class FakeWS:
    def __init__(self):
        self.sent = []

    async def send_json(self, msg):
        self.sent.append(msg)


def line(start, end, text, speaker=1):
    def fmt(s):
        h, rem = divmod(int(s * 100), 360000)
        m, rem = divmod(rem, 6000)
        sec, cs = divmod(rem, 100)
        return f"{h}:{m:02d}:{sec:02d}.{cs:02d}"

    return {"speaker": speaker, "text": text, "start": fmt(start), "end": fmt(end)}


def run(coro):
    return asyncio.run(coro)


def test_word_interpolation():
    words = _line_to_words(line(0.0, 2.0, "hello brave new world"))
    assert len(words) == 4
    assert words[0]["start"] == 0.0
    assert words[-1]["end"] == 2.0
    assert words[1]["start"] == pytest.approx(0.5)


def test_committed_lines_emit_final_results():
    ws = FakeWS()
    a = DeepgramAdapter(ws)

    async def go():
        await a.process_update({"lines": [line(0, 1, "hello there")], "buffer_transcription": ""})
        await a.process_update(
            {"lines": [line(0, 1, "hello there"), line(1, 2, "more words")],
             "buffer_transcription": ""}
        )

    run(go())
    finals = [m for m in ws.sent if m.get("type") == "Results" and m["is_final"]]
    assert len(finals) == 2
    assert finals[0]["channel"]["alternatives"][0]["transcript"] == "hello there"
    assert finals[1]["channel"]["alternatives"][0]["transcript"] == "more words"


def test_buffer_emits_interim():
    ws = FakeWS()
    a = DeepgramAdapter(ws)
    run(a.process_update({"lines": [], "buffer_transcription": "partial tex"}))
    interim = ws.sent[-1]
    assert interim["type"] == "Results" and interim["is_final"] is False
    assert interim["channel"]["alternatives"][0]["transcript"] == "partial tex"


def test_silence_after_speech_emits_utterance_end():
    ws = FakeWS()
    a = DeepgramAdapter(ws)

    async def go():
        await a.process_update({"lines": [line(0, 1, "said a thing")], "buffer_transcription": ""})
        await a.process_update(
            {"lines": [line(0, 1, "said a thing"), line(1.5, 7, "", speaker=-2)],
             "buffer_transcription": ""}
        )

    run(go())
    assert any(m.get("type") == "UtteranceEnd" for m in ws.sent)


def test_speech_started_only_with_vad_events():
    ws = FakeWS()
    a = DeepgramAdapter(ws)
    a._vad_events = True
    run(a.process_update({"lines": [], "buffer_transcription": "hi"}))
    assert ws.sent[0]["type"] == "SpeechStarted"

    ws2 = FakeWS()
    b = DeepgramAdapter(ws2)
    run(b.process_update({"lines": [], "buffer_transcription": "hi"}))
    assert all(m.get("type") != "SpeechStarted" for m in ws2.sent)


def test_metadata_shape():
    ws = FakeWS()
    a = DeepgramAdapter(ws)

    class Cfg:
        backend = "jax-tpu"

    run(a.send_metadata(Cfg()))
    md = ws.sent[0]
    assert md["type"] == "Metadata"
    assert md["channels"] == 1 and md["request_id"]
