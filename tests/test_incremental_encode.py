"""Incremental encoding (EncPool): the net-new TPU throughput path.

Invariants pinned here:
- the anchor program's tick outputs equal the legacy full-window program
  exactly (the enc-pool writeback must not perturb the decode);
- a session with an EncPool runs anchor → inc → inc…, re-anchoring after a
  window eviction;
- frames older than the rewrite margin are bit-stable across inc ticks
  (each frame is encoded a bounded number of times, then frozen);
- batches mixing inc/anchor/legacy lanes scatter outputs in input order.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_asset
from whisperlivekit_tpu.models.whisper import model as M
from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS
from whisperlivekit_tpu.models.whisper.tokenizer import get_tokenizer
from whisperlivekit_tpu.streaming.alignatt import (
    AlignAttConfig,
    AlignAttEngine,
    AlignAttSession,
    AudioPool,
    EncPool,
    run_tick_batch,
)

pytestmark = pytest.mark.skipif(
    reference_asset("whisperlivekit/whisper/assets/multilingual.tiktoken") is None,
    reason="tokenizer vocab assets unavailable",
)


def chunk(seed, seconds=1.0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * seconds)) / 16000
    return (0.3 * np.sin(2 * np.pi * (150 + 35 * seed) * t)
            + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)


@pytest.fixture(scope="module")
def engine():
    dims = MODEL_DIMS["dev-tiny"]
    params = M.init_params(dims, jax.random.PRNGKey(0))
    tok = get_tokenizer(True, language="en", task="transcribe")
    cfg = AlignAttConfig(
        language="en", max_steps=4, audio_max_len=4.0,
        enc_tail_frames=128, enc_rewrite_margin=16,
    )
    return AlignAttEngine(params, dims, tok, cfg)


def make_session(engine, audio_pool, enc_pool):
    s = AlignAttSession(engine)
    s.pool = audio_pool
    s.enc_pool = enc_pool
    return s


def test_anchor_outputs_equal_legacy(engine):
    """First tick of an enc-pool session is an anchor; its decode outputs
    must equal a plain session's (pool writeback is output-invariant)."""
    audio_pool = AudioPool(capacity=4)
    enc_pool = EncPool(4, engine.dims, dtype=jnp.float32)
    s = make_session(engine, audio_pool, enc_pool)
    s.insert_audio(chunk(1))
    ti = s.prepare_tick(False)
    assert ti.enc_mode == "anchor"
    got = run_tick_batch(engine, [ti], s.tokenizer, pool=audio_pool, enc_pool=enc_pool)

    plain = AlignAttSession(engine)
    plain.insert_audio(chunk(1))
    ti2 = plain.prepare_tick(False)
    want = run_tick_batch(engine, [ti2], plain.tokenizer)

    assert got[0].new_tokens == want[0].new_tokens
    assert got[0].n_keep == want[0].n_keep
    assert got[0].reason == want[0].reason


def test_session_mode_progression(engine):
    """anchor on tick 1, inc while the window grows, anchor again after the
    audio_max_len block eviction resets coordinates."""
    audio_pool = AudioPool(capacity=4)
    enc_pool = EncPool(4, engine.dims, dtype=jnp.float32)
    s = make_session(engine, audio_pool, enc_pool)
    modes = []
    for i in range(6):  # audio_max_len=4.0 -> eviction at the 5th second
        s.insert_audio(chunk(i))
        ti = s.prepare_tick(False)
        modes.append(ti.enc_mode)
        outs = run_tick_batch(engine, [ti], s.tokenizer, pool=audio_pool, enc_pool=enc_pool)
        s.finish_tick(ti, outs[0])
    assert modes[0] == "anchor"
    assert "inc" in modes[1:4]
    assert "anchor" in modes[4:], f"eviction must force a re-anchor: {modes}"


def test_frozen_frames_are_stable(engine):
    """Frames behind (win - tail) are never rewritten by later inc ticks."""
    audio_pool = AudioPool(capacity=4)
    enc_pool = EncPool(4, engine.dims, dtype=jnp.float32)
    s = make_session(engine, audio_pool, enc_pool)

    s.insert_audio(chunk(0))
    ti = s.prepare_tick(False)
    outs = run_tick_batch(engine, [ti], s.tokenizer, pool=audio_pool, enc_pool=enc_pool)
    s.finish_tick(ti, outs[0])
    lane = s.enc_lane
    frozen_upto = 50 - engine.cfg.enc_rewrite_margin  # 1 s = 50 enc frames
    before = np.asarray(enc_pool.pool[lane, :frozen_upto])

    s.insert_audio(chunk(1))
    ti = s.prepare_tick(False)
    assert ti.enc_mode == "inc"
    assert ti.write_start == frozen_upto
    outs = run_tick_batch(engine, [ti], s.tokenizer, pool=audio_pool, enc_pool=enc_pool)
    s.finish_tick(ti, outs[0])
    after = np.asarray(enc_pool.pool[lane, :frozen_upto])
    np.testing.assert_array_equal(before, after)


def test_mixed_mode_batch_scatters_in_order(engine):
    """inc + anchor + legacy lanes in one batch: outputs align with inputs."""
    audio_pool = AudioPool(capacity=8)
    enc_pool = EncPool(8, engine.dims, dtype=jnp.float32)

    s_inc = make_session(engine, audio_pool, enc_pool)
    s_inc.insert_audio(chunk(3))
    ti = s_inc.prepare_tick(False)
    outs = run_tick_batch(engine, [ti], s_inc.tokenizer, pool=audio_pool, enc_pool=enc_pool)
    s_inc.finish_tick(ti, outs[0])
    s_inc.insert_audio(chunk(4))

    s_anchor = make_session(engine, audio_pool, enc_pool)
    s_anchor.insert_audio(chunk(5))

    s_legacy = AlignAttSession(engine)  # no pools at all
    s_legacy.insert_audio(chunk(6))

    t_inc = s_inc.prepare_tick(False)
    t_anchor = s_anchor.prepare_tick(False)
    t_legacy = s_legacy.prepare_tick(False)
    assert (t_inc.enc_mode, t_anchor.enc_mode, t_legacy.enc_mode) == ("inc", "anchor", None)

    batch = run_tick_batch(
        engine, [t_legacy, t_inc, t_anchor], engine.tokenizer,
        pool=audio_pool, enc_pool=enc_pool,
    )

    solo_legacy = run_tick_batch(engine, [t_legacy], engine.tokenizer)
    assert batch[0].new_tokens == solo_legacy[0].new_tokens
    assert all(o is not None for o in batch)


def test_scheduler_attaches_enc_pool(engine):
    from whisperlivekit_tpu.engine.scheduler import BatchScheduler

    sched = BatchScheduler(engine, max_lanes=4, incremental_encode=True)
    assert sched.enc_pool is not None
    # sized with the audio pool (4x lanes + scratch): sessions past the cap
    # would fall to the legacy full re-encode program every tick
    assert sched.enc_pool.capacity == 17
    sched_off = BatchScheduler(engine, max_lanes=4, incremental_encode=False)
    assert sched_off.enc_pool is None
