"""OpenAI-compatible cloud backend: wire format + LocalAgreement integration.

Hermetic: a stub HTTP server plays the /v1/audio/transcriptions endpoint
(same protocol our own REST surface serves), so the test pins the multipart
request shape and the verbose_json parsing without network or weights.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from whisperlivekit_tpu.streaming.cloud_backend import CloudWhisperASR
from whisperlivekit_tpu.streaming.local_agreement import OnlineASRProcessor


class _StubAPI(BaseHTTPRequestHandler):
    requests = []

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        _StubAPI.requests.append(
            {"path": self.path, "auth": self.headers.get("Authorization"),
             "ctype": self.headers.get("Content-Type"), "len": len(body),
             "body_head": body[:2000]}
        )
        # scripted hypothesis grows by one word per call -> LocalAgreement
        # commits the agreed prefix
        n = len(_StubAPI.requests)
        words = [
            {"word": f"w{i}", "start": float(i), "end": float(i + 1)}
            for i in range(min(n + 1, 4))
        ]
        res = {
            "task": "transcribe",
            "text": " ".join(w["word"] for w in words),
            "words": words,
            "segments": [{"start": 0.0, "end": words[-1]["end"], "no_speech_prob": 0.0}],
        }
        payload = json.dumps(res).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def stub_server():
    _StubAPI.requests = []
    srv = HTTPServer(("127.0.0.1", 0), _StubAPI)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_port}/v1"
    srv.shutdown()


def test_transcribe_request_shape(stub_server):
    asr = CloudWhisperASR(language="en", base_url=stub_server, api_key="sk-test")
    audio = 0.1 * np.sin(np.arange(16000) / 30).astype(np.float32)
    res = asr.transcribe(audio, init_prompt="previous text")
    assert res["words"][0]["word"] == "w0"

    req = _StubAPI.requests[0]
    assert req["path"] == "/v1/audio/transcriptions"
    assert req["auth"] == "Bearer sk-test"
    assert b'name="language"' in req["body_head"]
    assert b'name="prompt"' in req["body_head"]
    assert b'filename="audio.wav"' in req["body_head"]
    assert "multipart/form-data" in req["ctype"]

    tokens = asr.ts_words(res)
    assert [t.text for t in tokens] == ["w0", "w1"]
    assert asr.segments_end_ts(res) == [1.0, 2.0]


def test_vad_suppression(stub_server):
    asr = CloudWhisperASR(language="en", base_url=stub_server)
    asr.use_vad()
    res = {
        "words": [{"word": "a", "start": 0.5, "end": 1.0},
                  {"word": "b", "start": 2.5, "end": 3.0}],
        "segments": [{"start": 0.0, "end": 2.0, "no_speech_prob": 0.95}],
    }
    tokens = asr.ts_words(res)
    assert [t.text for t in tokens] == ["b"]  # word inside no-speech dropped


def test_localagreement_over_cloud(stub_server):
    """The full LocalAgreement loop over the remote backend commits the
    stable prefix across successive hypotheses."""
    asr = CloudWhisperASR(language="en", base_url=stub_server)
    proc = OnlineASRProcessor(asr)
    committed = []
    for i in range(3):
        proc.insert_audio_chunk(0.05 * np.ones(16000, np.float32), float(i + 1))
        tokens, upto = proc.process_iter()
        committed.extend(tokens)
    assert committed, "agreed prefix must commit"
    texts = [t.text for t in committed]
    assert texts == sorted(texts, key=lambda w: int(w[1:]))  # ordered w0,w1,...


def test_engine_routing():
    from whisperlivekit_tpu.config import WLKConfig
    from whisperlivekit_tpu.engine.core import CloudASRHolder, TranscriptionEngine

    TranscriptionEngine.reset()
    cfg = WLKConfig(
        backend="openai-api", lan="en", vac=False, pcm_input=True,
        scheduler=False, log_level="ERROR", openai_base_url="http://localhost:1/v1",
    )
    engine = TranscriptionEngine(cfg)
    assert isinstance(engine.asr, CloudASRHolder)
    assert engine.asr.asr.base_url == "http://localhost:1/v1"
    TranscriptionEngine.reset()
