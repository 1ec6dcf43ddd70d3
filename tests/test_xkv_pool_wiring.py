"""Production wiring of the group-resident cross-KV cache.

- sessions acquire (group, slot) through the scheduler-owned XKVAllocator
  and their ticks route to the pooled programs via run_tick_batch;
- a pooled session's outputs match a plain (legacy full-window) session
  tick-for-tick with a bf16 pool (exact mode);
- epoch-synchronized anchors: after epoch_period group ticks every session
  of the group force-evicts (window permitting) and re-anchors in ONE
  whole-group program;
- mixed batches (xkv + EncPool + legacy lanes) scatter outputs in order;
- slot release on disconnect.
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
    XKVAllocator,
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
        language="en", max_steps=4, audio_max_len=16.0,
        enc_tail_frames=384, enc_rewrite_margin=16, xkv_cache=True,
    )
    return AlignAttEngine(params, dims, tok, cfg)


def make_xkv_session(engine, audio_pool, alloc, enc_pool=None):
    s = AlignAttSession(engine)
    s.pool = audio_pool
    s.xkv_alloc = alloc
    # pooled ticks project the splice window from cached encoder rows
    s.enc_pool = enc_pool if enc_pool is not None else EncPool(
        4, engine.dims, dtype=jnp.float32
    )
    return s


def test_xkv_session_mode_progression_and_anchor_parity(engine):
    """A pooled session anchors on its first tick, runs aligned-splice inc
    ticks afterwards, and its anchor ticks match a plain (pool-less)
    session exactly. Pooled inc ticks re-project the aligned 256-column
    window from the updated cached rows — value-equivalent to the EncPool
    merge on the refreshed frames."""
    audio_pool = AudioPool(capacity=4)
    alloc = XKVAllocator.for_engine(engine, 2, epoch_period=50)
    s = make_xkv_session(engine, audio_pool, alloc)
    plain = AlignAttSession(engine)

    modes = []
    for i in range(4):
        s.insert_audio(chunk(i, seconds=2.0))
        plain.insert_audio(chunk(i, seconds=2.0))
        ti = s.prepare_tick(False)
        tp = plain.prepare_tick(False)
        assert ti.xkv_slot is not None and ti.xkv_gi == 0
        modes.append(ti.enc_mode)
        got = run_tick_batch(engine, [ti], s.tokenizer, pool=audio_pool, enc_pool=s.enc_pool, xkv=alloc)
        want = run_tick_batch(engine, [tp], plain.tokenizer)
        if ti.enc_mode == "anchor":
            assert got[0].new_tokens == want[0].new_tokens
            assert got[0].reason == want[0].reason
        else:
            assert got[0].n_keep <= engine.cfg.max_steps
        s.finish_tick(ti, got[0])
        plain.finish_tick(tp, want[0])
    # first tick anchors; the aligned splice handles any later window size
    assert modes[0] == "anchor"
    assert all(m == "inc" for m in modes[1:]), modes


def test_epoch_synchronized_group_anchor(engine):
    """After epoch_period group inc ticks, both sessions of the group plan
    anchors in the same window and the whole-group program serves them."""
    audio_pool = AudioPool(capacity=4)
    alloc = XKVAllocator.for_engine(engine, 2, epoch_period=2)
    shared_enc = EncPool(5, engine.dims, dtype=jnp.float32)
    s1 = make_xkv_session(engine, audio_pool, alloc, shared_enc)
    s2 = make_xkv_session(engine, audio_pool, alloc, shared_enc)

    for j, s in enumerate((s1, s2)):  # pre-grow windows past W_SPLICE
        s.insert_audio(chunk(90 + j, seconds=6.0))
    modes = []
    for i in range(5):
        tis = []
        for j, s in enumerate((s1, s2)):
            s.insert_audio(chunk(10 * j + i))
            tis.append(s.prepare_tick(False))
        modes.append(tuple(t.enc_mode for t in tis))
        outs = run_tick_batch(engine, tis, engine.tokenizer, pool=audio_pool, enc_pool=shared_enc, xkv=alloc)
        for s, t, o in zip((s1, s2), tis, outs):
            s.finish_tick(t, o)
    # tick 0: both anchor (first tick). epoch bumps after 2 inc group ticks;
    # the next prepared tick must re-anchor BOTH sessions together.
    assert modes[0] == ("anchor", "anchor")
    assert ("inc", "inc") in modes, modes
    assert any(m == ("anchor", "anchor") for m in modes[2:]), modes
    assert alloc.groups[0].sub_epoch >= 1


def test_mixed_batch_xkv_enc_legacy(engine):
    audio_pool = AudioPool(capacity=8)
    enc_pool = EncPool(4, engine.dims, dtype=jnp.float32)
    alloc = XKVAllocator.for_engine(engine, 2, epoch_period=50)

    s_xkv = make_xkv_session(engine, audio_pool, alloc)
    s_xkv.insert_audio(chunk(1))
    s_enc = AlignAttSession(engine)
    s_enc.pool = audio_pool
    s_enc.enc_pool = enc_pool
    s_enc.insert_audio(chunk(2))
    s_leg = AlignAttSession(engine)
    s_leg.insert_audio(chunk(3))

    t1, t2, t3 = (x.prepare_tick(False) for x in (s_xkv, s_enc, s_leg))
    assert t1.xkv_slot is not None and t2.enc_lane is not None and t3.enc_mode is None
    batch = run_tick_batch(
        engine, [t3, t1, t2], engine.tokenizer,
        pool=audio_pool, enc_pool=enc_pool, xkv=alloc,
    )
    solo = run_tick_batch(engine, [t3], engine.tokenizer)
    assert batch[0].new_tokens == solo[0].new_tokens
    assert all(o is not None for o in batch)


def test_slot_overflow_falls_back_to_enc_pool(engine):
    audio_pool = AudioPool(capacity=8)
    enc_pool = EncPool(8, engine.dims, dtype=jnp.float32)
    alloc = XKVAllocator.for_engine(engine, 1)
    alloc.max_groups = 1  # one 1-wide group: second session can't get a slot

    s1 = make_xkv_session(engine, audio_pool, alloc)
    s1.enc_pool = enc_pool
    s1.insert_audio(chunk(4))
    s2 = make_xkv_session(engine, audio_pool, alloc)
    s2.enc_pool = enc_pool
    s2.insert_audio(chunk(5))

    t1 = s1.prepare_tick(False)
    t2 = s2.prepare_tick(False)
    assert t1.xkv_slot is not None
    assert t2.xkv_slot is None and t2.enc_lane is not None  # EncPool fallback


def test_slot_release_on_disconnect(engine):
    audio_pool = AudioPool(capacity=4)
    alloc = XKVAllocator.for_engine(engine, 1)
    s = make_xkv_session(engine, audio_pool, alloc)
    s.insert_audio(chunk(6))
    s.prepare_tick(False)
    assert alloc.groups[0].occupancy == 1
    s.release_pool_lane()
    assert alloc.groups[0].occupancy == 0
    assert s.xkv_slot is None


def test_scheduler_creates_allocator(engine):
    from whisperlivekit_tpu.engine.scheduler import BatchScheduler

    sched = BatchScheduler(engine, max_lanes=4, incremental_encode=True)
    assert sched.xkv is not None
    assert sched.xkv.group_width == 4
    assert "xkv" in sched.stats() or sched.xkv.stats()["n_groups"] == 0
    off = BatchScheduler(engine, max_lanes=4, incremental_encode=False)
    assert off.xkv is None


def test_cohort_staggered_anchors(engine):
    """anchor_cohorts=2: after the shared sub-epoch cadence, the two
    sessions (slots 0 and 1 -> cohorts 0 and 1) re-anchor in DIFFERENT
    windows — never both at once after the initial anchor — and each still
    evicts once per full epoch period."""
    audio_pool = AudioPool(capacity=4)
    alloc = XKVAllocator.for_engine(engine, 2, epoch_period=4, anchor_cohorts=2)
    assert alloc.sub_period == 2
    shared_enc = EncPool(5, engine.dims, dtype=jnp.float32)
    s1 = make_xkv_session(engine, audio_pool, alloc, shared_enc)
    s2 = make_xkv_session(engine, audio_pool, alloc, shared_enc)

    for j, s in enumerate((s1, s2)):  # pre-grow windows past W_SPLICE
        s.insert_audio(chunk(70 + j, seconds=6.0))
    modes = []
    for i in range(10):
        tis = []
        for j, s in enumerate((s1, s2)):
            s.insert_audio(chunk(20 * j + i))
            tis.append(s.prepare_tick(False))
        modes.append(tuple(t.enc_mode for t in tis))
        outs = run_tick_batch(
            engine, tis, engine.tokenizer,
            pool=audio_pool, enc_pool=shared_enc, xkv=alloc,
        )
        for s, t, o in zip((s1, s2), tis, outs):
            s.finish_tick(t, o)
    assert modes[0] == ("anchor", "anchor")  # first tick always anchors
    anchors_1 = [i for i, m in enumerate(modes[1:], 1) if m[0] == "anchor"]
    anchors_2 = [i for i, m in enumerate(modes[1:], 1) if m[1] == "anchor"]
    # staggered: each session re-anchors, but never in the same window
    assert anchors_1 and anchors_2, modes
    assert not set(anchors_1) & set(anchors_2), modes
    # cohorts don't change the per-session cadence: one evict per period
    # (sub-epochs advance every 2 group ticks; each cohort fires every 2nd)
    assert all(b - a >= alloc.epoch_period - 1 for a, b in zip(anchors_1, anchors_1[1:]))
