"""Streaming beam tick: beam=1 must equal the greedy tick; beam=2 coherent."""

import numpy as np
import pytest

import jax

from conftest import reference_asset
from whisperlivekit_tpu.models.whisper import model as M
from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS
from whisperlivekit_tpu.models.whisper.tokenizer import get_tokenizer
from whisperlivekit_tpu.streaming.alignatt import (
    AlignAttConfig,
    AlignAttEngine,
    AlignAttSession,
    run_tick_batch,
)
from whisperlivekit_tpu.streaming.alignatt_beam import run_tick_batch_beam

pytestmark = pytest.mark.skipif(
    reference_asset("whisperlivekit/whisper/assets/multilingual.tiktoken") is None,
    reason="tokenizer vocab assets unavailable",
)


@pytest.fixture(scope="module")
def engine():
    dims = MODEL_DIMS["dev-tiny"]
    params = M.init_params(dims, jax.random.PRNGKey(0))
    tok = get_tokenizer(True, language="en", task="transcribe")
    cfg = AlignAttConfig(language="en", max_steps=6)
    return AlignAttEngine(params, dims, tok, cfg)


def audio_for(seed, seconds=1.5):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * seconds)) / 16000
    return (0.3 * np.sin(2 * np.pi * (160 + 25 * seed) * t)
            + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)


def make_tick(engine, seed):
    s = AlignAttSession(engine)
    s.insert_audio(audio_for(seed))
    return s.prepare_tick(False)


def test_beam1_equals_greedy(engine):
    tis = [make_tick(engine, i) for i in range(2)]
    greedy = run_tick_batch(engine, tis, engine.tokenizer)
    beam1 = run_tick_batch_beam(engine, tis, engine.tokenizer, beam=1)
    for g, b in zip(greedy, beam1):
        assert g.n_keep == b.n_keep
        assert g.new_tokens[: g.n_keep] == b.new_tokens[: b.n_keep]
        assert g.reason == b.reason
        np.testing.assert_array_equal(g.frames, b.frames)
        assert g.last_attend == b.last_attend


def test_beam2_runs_and_is_coherent(engine):
    tis = [make_tick(engine, 5)]
    outs = run_tick_batch_beam(engine, tis, engine.tokenizer, beam=2)
    o = outs[0]
    assert 0 <= o.n_keep <= engine.cfg.max_steps
    assert all(0 <= t < engine.dims.n_vocab for t in o.new_tokens)
    assert all(0 <= f < engine.dims.n_audio_ctx for f in o.frames)


def test_beam_session_end_to_end(engine):
    import copy

    beam_engine = copy.copy(engine)
    beam_engine.cfg = AlignAttConfig(
        language="en", max_steps=6, decoder_type="beam", beam_size=2
    )
    s = AlignAttSession(beam_engine)
    s.insert_audio(audio_for(7))
    words = s.infer(False)
    assert isinstance(words, list)
    for w in words:
        assert w.start <= w.end
