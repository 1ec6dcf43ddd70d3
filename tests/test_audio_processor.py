"""AudioProcessor orchestration with stub engine/transcription (no models).

Reference strategy: tests/test_backend_deep_bugs.py:702-776 — async pipeline
tests with stub transcription objects: lag watermarks, silence flow, finish
sequence, silent-backend watchdog.
"""

import asyncio
from types import SimpleNamespace

import numpy as np
import pytest

from whisperlivekit_tpu.config import WLKConfig
from whisperlivekit_tpu.session.processor import AudioProcessor
from whisperlivekit_tpu.timed import ASRToken, Silence, Transcript


class StubTranscription:
    """Scripted online processor: emits one token per second of audio."""

    SAMPLING_RATE = 16000

    def __init__(self):
        self.audio_buffer = np.zeros(0, np.float32)
        self.t = 0.0
        self.events = []
        self.silent = False

    def insert_audio_chunk(self, audio, end_time):
        self.audio_buffer = np.append(self.audio_buffer, audio)
        self.t = end_time

    def process_iter(self, is_last=False):
        self.events.append(("process", self.t))
        if self.silent:
            return [], self.t
        tok = ASRToken(start=self.t - 1.0, end=self.t, text=f" w{int(self.t)}")
        return [tok], self.t

    def get_buffer(self):
        return Transcript(None, None, "")

    def start_silence(self):
        self.events.append(("start_silence", self.t))
        return [], self.t

    def end_silence(self, duration, offset):
        self.events.append(("end_silence", duration))

    def finish(self):
        self.events.append(("finish", self.t))
        return [], self.t


def make_processor(stub=None, **cfg_kw):
    cfg = WLKConfig(
        model_size="random:dev-tiny", lan="en", vac=False, pcm_input=True,
        scheduler=False, log_level="ERROR", **cfg_kw,
    )
    # a real (uninitialized) engine instance so isinstance checks pass,
    # with stubbed state — no models loaded
    from whisperlivekit_tpu.engine.core import TranscriptionEngine

    TranscriptionEngine.reset()
    engine = object.__new__(TranscriptionEngine)
    engine._initialized = True
    engine.config = cfg
    engine.args = cfg
    engine.asr = None
    engine.vac_model = None
    engine.diarization_model = None
    engine.translation_model = None
    engine.scheduler = None
    engine.vad_scheduler = None
    proc = AudioProcessor(transcription_engine=engine)
    proc.transcription = stub or StubTranscription()
    TranscriptionEngine.reset()
    return proc


def pcm_seconds(n, amp=0.2):
    sig = amp * np.sin(2 * np.pi * 220 * np.arange(16000 * n) / 16000)
    return (sig * 32767).astype("<i2").tobytes()


def run(coro):
    return asyncio.run(coro)


def test_tokens_flow_and_watermarks():
    async def main():
        proc = make_processor()
        gen = await proc.create_tasks()
        results = []

        async def collect():
            async for fd in gen:
                results.append(fd)

        task = asyncio.create_task(collect())
        await proc.process_audio(pcm_seconds(3))
        await asyncio.sleep(0.5)
        await proc.process_audio(b"")
        await asyncio.wait_for(task, timeout=10)
        await proc.cleanup()
        return proc, results

    proc, results = run(main())
    assert proc.state.tokens, "stub tokens must reach state"
    # watermarks: processed end reached the fed audio, policy lag bounded
    assert proc.state.end_transcription_processed == pytest.approx(3.0, abs=0.2)
    assert proc.state.end_transcription_committed == pytest.approx(3.0, abs=1.1)
    final_lines = results[-1].lines if results else []
    assert any("w" in (ln.text or "") for ln in final_lines)


def test_finish_calls_transcription_finish():
    async def main():
        proc = make_processor()
        gen = await proc.create_tasks()
        task = asyncio.create_task(anext_drain(gen))
        await proc.process_audio(pcm_seconds(1))
        await proc.process_audio(b"")
        await asyncio.wait_for(task, timeout=10)
        await proc.cleanup()
        return proc

    async def anext_drain(gen):
        async for _ in gen:
            pass

    proc = run(main())
    kinds = [e[0] for e in proc.transcription.events]
    assert "finish" in kinds


def test_silent_backend_watchdog():
    async def main():
        stub = StubTranscription()
        stub.silent = True
        proc = make_processor(stub)
        gen = await proc.create_tasks()
        task = asyncio.create_task(drain(gen))
        # > 20s of audio with zero output
        for _ in range(5):
            await proc.process_audio(pcm_seconds(5))
            await asyncio.sleep(0.05)
        await asyncio.sleep(0.5)
        warned = proc._silent_backend_warned
        await proc.process_audio(b"")
        await asyncio.wait_for(task, timeout=10)
        await proc.cleanup()
        return warned

    async def drain(gen):
        async for _ in gen:
            pass

    assert run(main())


def test_metrics_collected():
    async def main():
        proc = make_processor()
        gen = await proc.create_tasks()
        task = asyncio.create_task(drain(gen))
        await proc.process_audio(pcm_seconds(2))
        await asyncio.sleep(0.3)
        await proc.process_audio(b"")
        await asyncio.wait_for(task, timeout=10)
        await proc.cleanup()
        return proc.metrics

    async def drain(gen):
        async for _ in gen:
            pass

    m = run(main())
    assert m.n_chunks_received >= 1
    assert m.n_transcription_calls >= 1
    assert m.total_audio_duration_s == pytest.approx(2.0, abs=0.1)


def test_probe_internals_surface():
    """wlk diagnose probes pipeline + backend internals per interval
    (reference cli.py:1253-1347); the snapshot must exist, carry queue
    depths, and never throw regardless of backend shape."""
    proc = make_processor()
    info = proc.probe_internals()
    assert info["in_silence"] is False or info["in_silence"] is True
    assert "transcription_queue_depth" in info
    assert info["n_state_tokens"] == 0
    # duck-typed stub backend: falls through to the generic branch
    assert info["backend"]["backend_type"] == "StubTranscription"
    assert info["backend"]["audio_buffer_sec"] == 0.0
    assert info["backend"]["buffer_text_chars"] == 0


def test_probe_backend_state_local_agreement():
    from whisperlivekit_tpu.session.processor import probe_backend_state
    from whisperlivekit_tpu.streaming.local_agreement import OnlineASRProcessor

    class _ASR:
        sep = " "

        def transcribe(self, audio, init_prompt=""):
            return []

        def ts_words(self, res):
            return []

        def segments_end_ts(self, res):
            return []

    online = OnlineASRProcessor(_ASR())
    info = probe_backend_state(online)
    assert info["backend_type"] == "onlineasrprocessor"
    assert info["hypothesis_words"] == 0
    assert info["committed_words_in_buffer"] == 0

    assert probe_backend_state(None) == {"error": "no transcription processor"}
