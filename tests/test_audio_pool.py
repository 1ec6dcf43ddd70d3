"""Device-resident audio pool: incremental updates must equal full transfers."""

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
    AudioPool,
)

pytestmark = pytest.mark.skipif(
    reference_asset("whisperlivekit/whisper/assets/multilingual.tiktoken") is None,
    reason="tokenizer vocab assets unavailable",
)


@pytest.fixture(scope="module")
def engine():
    dims = MODEL_DIMS["dev-tiny"]
    params = M.init_params(dims, jax.random.PRNGKey(0))
    tok = get_tokenizer(True, language="en", task="transcribe")
    cfg = AlignAttConfig(language="en", max_steps=6, audio_max_len=3.0)
    return AlignAttEngine(params, dims, tok, cfg)


def chunk(seed, seconds=1.0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * seconds)) / 16000
    return (0.3 * np.sin(2 * np.pi * (150 + 30 * seed) * t)
            + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)


def run_session(engine, use_pool, n_chunks=5, reset_at=None):
    s = AlignAttSession(engine)
    if use_pool:
        s.pool = AudioPool(capacity=4)
    results = []
    for i in range(n_chunks):
        if reset_at is not None and i == reset_at:
            s.refresh_segment(complete=True)
        s.insert_audio(chunk(i))
        words = s.infer(False)
        results.append([(w.text, w.start, w.end) for w in words])
    return results


def quantize(audio):
    return (np.clip(audio, -1.0, 1.0 - 1 / 32768) * 32768.0).astype(np.int16)


def test_pool_equals_direct_transfer(engine):
    """With int16 quantization applied in both paths, pool-incremental and
    direct-upload ticks must produce identical outputs (incl. after the
    audio_max_len=3s window starts evicting at chunk 4)."""
    direct = run_session(engine, use_pool=False)
    pooled = run_session(engine, use_pool=True)
    assert direct == pooled


def test_pool_survives_segment_reset(engine):
    direct = run_session(engine, use_pool=False, reset_at=2)
    pooled = run_session(engine, use_pool=True, reset_at=2)
    assert direct == pooled


def test_pool_lane_reuse(engine):
    pool = AudioPool(capacity=2)
    s1, s2 = AlignAttSession(engine), AlignAttSession(engine)
    s1.pool = s2.pool = pool
    s1.insert_audio(chunk(1))
    s2.insert_audio(chunk(2))
    s1.infer(False)
    s2.infer(False)
    assert {s1.pool_lane, s2.pool_lane} == {0, 1}
    s3 = AlignAttSession(engine)
    s3.pool = pool
    s3.insert_audio(chunk(3))
    s3.infer(False)  # pool exhausted: falls back to direct transfer
    assert s3.pool_lane is None
    s1.release_pool_lane()
    s4 = AlignAttSession(engine)
    s4.pool = pool
    s4.insert_audio(chunk(4))
    s4.infer(False)
    assert s4.pool_lane is not None
