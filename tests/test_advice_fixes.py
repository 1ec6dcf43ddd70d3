"""Regression tests for the round-1 advisor findings.

1. Decode-loop exhaustion must KEEP the tokens decoded that tick (not drop
   them and re-decode the same prefix forever).
2. Mixed pool/direct batches must still apply the HBM pool updates for the
   pool-backed lanes, so later all-pool ticks gather fresh audio.
3. Long-prompt prefill truncation must retain <|startofprev|> at position 0.
"""

import numpy as np
import pytest

import jax

from conftest import reference_asset
from whisperlivekit_tpu.decoding.task import truncate_initial_tokens
from whisperlivekit_tpu.models.whisper import model as M
from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS
from whisperlivekit_tpu.models.whisper.tokenizer import get_tokenizer
from whisperlivekit_tpu.streaming.alignatt import (
    STOP_CAP,
    AlignAttConfig,
    AlignAttEngine,
    AlignAttSession,
    AudioPool,
    run_tick_batch,
)

pytestmark = pytest.mark.skipif(
    reference_asset("whisperlivekit/whisper/assets/multilingual.tiktoken") is None,
    reason="tokenizer vocab assets unavailable",
)


def chunk(seed, seconds=1.0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * seconds)) / 16000
    return (0.3 * np.sin(2 * np.pi * (150 + 40 * seed) * t)
            + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)


@pytest.fixture(scope="module")
def exhaust_engine():
    """frame_threshold=0 disables the attention gate (content_frames - frame
    is always >= 1), so lanes run to the max_steps budget."""
    dims = MODEL_DIMS["dev-tiny"]
    params = M.init_params(dims, jax.random.PRNGKey(0))
    tok = get_tokenizer(True, language="en", task="transcribe")
    cfg = AlignAttConfig(language="en", max_steps=4, frame_threshold=0,
                         nonspeech_prob=1.1, audio_max_len=3.0)
    return AlignAttEngine(params, dims, tok, cfg)


def test_exhaustion_keeps_decoded_tokens(exhaust_engine):
    s = AlignAttSession(exhaust_engine)
    s.insert_audio(chunk(1))
    ti = s.prepare_tick(False)
    out = run_tick_batch(exhaust_engine, [ti], s.tokenizer)[0]
    if out.reason == STOP_CAP:
        assert out.n_keep == exhaust_engine.cfg.max_steps, (
            "lane active at loop exhaustion must keep all decoded tokens"
        )
    else:
        # random weights happened to stop early (EOT); still a valid run
        assert out.n_keep >= 0


def test_beam_exhaustion_keeps_decoded_tokens(exhaust_engine):
    from whisperlivekit_tpu.streaming.alignatt_beam import run_tick_batch_beam

    s = AlignAttSession(exhaust_engine)
    s.insert_audio(chunk(2))
    ti = s.prepare_tick(False)
    out = run_tick_batch_beam(exhaust_engine, [ti], s.tokenizer, 2)[0]
    if out.reason == STOP_CAP:
        assert out.n_keep == exhaust_engine.cfg.max_steps


@pytest.fixture(scope="module")
def pool_engine():
    dims = MODEL_DIMS["dev-tiny"]
    params = M.init_params(dims, jax.random.PRNGKey(0))
    tok = get_tokenizer(True, language="en", task="transcribe")
    cfg = AlignAttConfig(language="en", max_steps=6, audio_max_len=3.0)
    return AlignAttEngine(params, dims, tok, cfg)


def test_mixed_batch_keeps_pool_fresh(pool_engine):
    """Tick 1 is a mixed batch (one lane pool-backed, one direct after pool
    exhaustion); tick 2 is all-pool. The pool-backed session's outputs must
    match a pure-direct replay of the same audio."""
    pool = AudioPool(capacity=1)
    s_pool = AlignAttSession(pool_engine)
    s_over = AlignAttSession(pool_engine)
    s_pool.pool = s_over.pool = pool

    s_pool.insert_audio(chunk(10))
    s_over.insert_audio(chunk(11))
    t1 = s_pool.prepare_tick(False)
    t2 = s_over.prepare_tick(False)
    assert t1.pool_lane is not None and t2.pool_lane is None  # mixed
    outs = run_tick_batch(pool_engine, [t1, t2], s_pool.tokenizer, pool=pool)
    s_pool.finish_tick(t1, outs[0])
    s_over.finish_tick(t2, outs[1])

    # tick 2: all-pool (only the pool-backed lane) — incremental update
    s_pool.insert_audio(chunk(12))
    t1b = s_pool.prepare_tick(False)
    outs_b = run_tick_batch(pool_engine, [t1b], s_pool.tokenizer, pool=pool)
    got = s_pool.finish_tick(t1b, outs_b[0])

    # replay without any pool
    r = AlignAttSession(pool_engine)
    r.insert_audio(chunk(10))
    r.infer(False)
    r.insert_audio(chunk(12))
    want = r.infer(False)

    assert [(w.text, w.start, w.end) for w in got] == [
        (w.text, w.start, w.end) for w in want
    ]


def test_truncate_initial_retains_sot_prev():
    sot_prev = 50361
    initial = [sot_prev] + list(range(100, 160)) + [50258, 50259, 50359]
    out = truncate_initial_tokens(initial, 16, sot_prev)
    assert len(out) == 16
    assert out[0] == sot_prev
    assert out[-3:] == [50258, 50259, 50359]
    # no-op when it fits; no sot_prev -> plain tail
    assert truncate_initial_tokens([1, 2, 3], 16, sot_prev) == [1, 2, 3]
    assert truncate_initial_tokens(list(range(30)), 8, sot_prev) == list(range(22, 30))
