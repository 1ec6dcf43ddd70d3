"""TranscriptionEngine singleton semantics + factories + config plumbing."""

import pytest

from conftest import reference_asset
from whisperlivekit_tpu.config import WLKConfig
from whisperlivekit_tpu.engine.core import TranscriptionEngine, online_factory

needs_vocab = pytest.mark.skipif(
    reference_asset("whisperlivekit/whisper/assets/multilingual.tiktoken") is None,
    reason="tokenizer vocab assets unavailable",
)


@pytest.fixture(autouse=True)
def reset_engine():
    TranscriptionEngine.reset()
    yield
    TranscriptionEngine.reset()


@needs_vocab
def test_singleton_shares_instance():
    cfg = WLKConfig(model_size="random:dev-tiny", lan="en", vac=False, log_level="ERROR")
    a = TranscriptionEngine(cfg)
    b = TranscriptionEngine()
    assert a is b
    TranscriptionEngine.reset()
    c = TranscriptionEngine(cfg)
    assert c is not a


@needs_vocab
def test_kwargs_path_with_no_negation():
    eng = TranscriptionEngine(
        model_size="random:dev-tiny", lan="en", no_vac=True, log_level="ERROR"
    )
    assert eng.config.vac is False


@needs_vocab
def test_simulstreaming_factory_and_scheduler():
    cfg = WLKConfig(model_size="random:dev-tiny", lan="en", vac=False, log_level="ERROR")
    eng = TranscriptionEngine(cfg)
    assert eng.scheduler is not None  # default scheduler on
    proc = online_factory(cfg, eng.asr, scheduler=eng.scheduler)
    from whisperlivekit_tpu.streaming.simul_processor import SimulStreamingOnlineProcessor

    assert isinstance(proc, SimulStreamingOnlineProcessor)
    assert proc.model.pool is eng.scheduler.pool


@needs_vocab
def test_localagreement_factory_with_session_language():
    TranscriptionEngine.reset()
    cfg = WLKConfig(
        model_size="random:dev-tiny", lan="en", vac=False,
        backend_policy="localagreement", log_level="ERROR",
    )
    eng = TranscriptionEngine(cfg)
    proc = online_factory(cfg, eng.asr, language="fr")
    from whisperlivekit_tpu.streaming.session_proxy import SessionASRProxy

    assert isinstance(proc.asr, SessionASRProxy)
    assert proc.asr._language == "fr"


@needs_vocab
def test_windowed_factory():
    TranscriptionEngine.reset()
    cfg = WLKConfig(
        model_size="random:dev-tiny", lan="en", vac=False,
        backend_policy="windowed", log_level="ERROR",
    )
    eng = TranscriptionEngine(cfg)
    proc = online_factory(cfg, eng.asr)
    from whisperlivekit_tpu.streaming.windowed import WindowedStreamingProcessor

    assert isinstance(proc, WindowedStreamingProcessor)


@needs_vocab
def test_session_admission_capacity():
    """max_sessions bounds concurrent AudioProcessors: the (cap+1)-th raises
    EngineAtCapacity, and cleanup() returns the slot (server "busy" path)."""
    import asyncio

    from whisperlivekit_tpu.engine.core import EngineAtCapacity
    from whisperlivekit_tpu.session.processor import AudioProcessor

    TranscriptionEngine.reset()
    cfg = WLKConfig(
        model_size="random:dev-tiny", lan="en", vac=False,
        max_sessions=1, log_level="ERROR",
    )
    eng = TranscriptionEngine(cfg)
    assert eng.session_capacity() == 1

    p1 = AudioProcessor(transcription_engine=eng)
    assert eng.active_sessions == 1
    with pytest.raises(EngineAtCapacity):
        AudioProcessor(transcription_engine=eng)
    asyncio.run(p1.cleanup())
    assert eng.active_sessions == 0
    p2 = AudioProcessor(transcription_engine=eng)  # slot came back
    asyncio.run(p2.cleanup())


@needs_vocab
def test_max_decode_steps_reaches_alignatt_config():
    TranscriptionEngine.reset()
    cfg = WLKConfig(
        model_size="random:dev-tiny", lan="en", vac=False,
        max_decode_steps=8, log_level="ERROR",
    )
    eng = TranscriptionEngine(cfg)
    assert eng.asr.cfg.max_steps == 8
