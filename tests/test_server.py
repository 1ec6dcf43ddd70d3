"""Server integration tests: /health, /asr WS (full + diff), OpenAI REST, /v1/models."""

import asyncio
import io
import json
import wave

import numpy as np
import pytest

from conftest import reference_asset

pytestmark = pytest.mark.skipif(
    reference_asset("whisperlivekit/whisper/assets/multilingual.tiktoken") is None,
    reason="tokenizer vocab assets unavailable",
)


def make_wav_bytes(seconds=2.0, seed=0) -> bytes:
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * seconds)) / 16000
    sig = 0.3 * np.sin(2 * np.pi * 220 * t) + 0.02 * rng.standard_normal(t.shape)
    pcm = (np.clip(sig, -1, 1) * 32767).astype("<i2").tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm)
    return buf.getvalue()


@pytest.fixture(scope="module")
def server_setup():
    from whisperlivekit_tpu.config import WLKConfig
    from whisperlivekit_tpu.engine.core import TranscriptionEngine
    from whisperlivekit_tpu.server.app import WLKServer

    TranscriptionEngine.reset()
    config = WLKConfig(
        model_size="random:dev-tiny", lan="en", pcm_input=True, log_level="ERROR"
    )
    engine = TranscriptionEngine(config)

    class Factory:
        def __init__(self):
            self.config = config

        def make(self):
            # aiohttp Applications are single-event-loop; build fresh per test
            return WLKServer(config, engine=engine)

    yield Factory()
    TranscriptionEngine.reset()


def run_with_server(factory, coro_factory):
    from aiohttp.test_utils import TestClient, TestServer

    async def main():
        client = TestClient(TestServer(factory.make().app))
        await client.start_server()
        try:
            return await coro_factory(client)
        finally:
            await client.close()

    return asyncio.run(main())


def test_health_and_models(server_setup):
    async def go(client):
        r = await client.get("/health")
        health = await r.json()
        r2 = await client.get("/v1/models")
        models = await r2.json()
        r3 = await client.get("/")
        html = await r3.text()
        return health, models, html

    health, models, html = run_with_server(server_setup, go)
    assert health["status"] == "ok" and health["ready"]
    assert models["object"] == "list" and models["data"]
    assert "<html" in html and "/asr" in html


def test_asr_websocket_full_mode(server_setup):
    async def go(client):
        ws = await client.ws_connect("/asr?language=en")
        config_msg = json.loads((await ws.receive()).data)
        assert config_msg["type"] == "config"

        pcm = np.zeros(16000, np.int16).tobytes()
        sig = (0.3 * np.sin(2 * np.pi * 300 * np.arange(32000) / 16000) * 32767).astype(
            "<i2"
        ).tobytes()
        await ws.send_bytes(sig)
        await ws.send_bytes(pcm)
        await ws.send_bytes(b"")

        messages = []
        try:
            while True:
                msg = await asyncio.wait_for(ws.receive(), timeout=30)
                if msg.type.name != "TEXT":
                    break
                data = json.loads(msg.data)
                messages.append(data)
                if data.get("type") == "ready_to_stop":
                    break
        finally:
            await ws.close()
        return messages

    messages = run_with_server(server_setup, go)
    assert messages, "no messages received"
    assert messages[-1].get("type") == "ready_to_stop"
    payloads = [m for m in messages if "lines" in m]
    for p in payloads:
        assert "buffer_transcription" in p
        assert "remaining_time_transcription" in p


def test_asr_websocket_diff_mode(server_setup):
    async def go(client):
        ws = await client.ws_connect("/asr?mode=diff")
        await ws.receive()  # config
        sig = (0.3 * np.sin(2 * np.pi * 300 * np.arange(32000) / 16000) * 32767).astype(
            "<i2"
        ).tobytes()
        await ws.send_bytes(sig)
        await ws.send_bytes(b"")
        messages = []
        while True:
            msg = await asyncio.wait_for(ws.receive(), timeout=30)
            if msg.type.name != "TEXT":
                break
            data = json.loads(msg.data)
            messages.append(data)
            if data.get("type") == "ready_to_stop":
                break
        await ws.close()
        return messages

    messages = run_with_server(server_setup, go)
    kinds = [m.get("type") for m in messages]
    assert "snapshot" in kinds
    assert kinds[-1] == "ready_to_stop"


def test_openai_rest_endpoint(server_setup):
    async def go(client):
        wav = make_wav_bytes(2.0)
        form = {"file": io.BytesIO(wav), "response_format": "verbose_json", "language": "en"}
        r = await client.post("/v1/audio/transcriptions", data=form)
        assert r.status == 200, await r.text()
        return await r.json()

    data = run_with_server(server_setup, go)
    assert data["task"] == "transcribe"
    assert "segments" in data and "duration" in data


def test_token_auth(server_setup):
    server_setup.config.api_token = "secret123"
    try:

        async def go(client):
            r = await client.post("/v1/audio/transcriptions", data={"x": "y"})
            unauthorized = r.status
            ws_resp = await client.get("/asr")  # missing token on WS upgrade
            return unauthorized, ws_resp.status

        unauthorized, ws_status = run_with_server(server_setup, go)
        assert unauthorized == 401
        assert ws_status == 401
    finally:
        server_setup.config.api_token = None
