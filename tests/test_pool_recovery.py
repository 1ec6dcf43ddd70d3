"""Pooled-program failure containment (VERDICT r3 weak #4 / ADVICE r3 #1-2).

Every pooled tick/anchor program donates the group's HBM pools, so a failed
program destroys them — observed in the r3 e2e run as a full serving outage
after one whole-group-anchor OOM at n=40. These tests pin the two
containment layers:

- the whole-group anchor budget guard: with more than one group resident
  (and no device memory stats, the CPU-test fallback) a majority-of-group
  anchor must route to the chunked slot-scatter program, never the
  whole-group program (ADVICE r3 #1); with memory stats the decision is
  budget math — XLA temp + margin vs free HBM (ADVICE r3 #2) — and a
  memoized failure blocks the fast path permanently;
- recovery: when a pooled program raises, the group's pools are rebuilt,
  the in-flight lanes are still served (legacy program, host state), and
  the sessions re-anchor on their next tick (generation resync) — no lane
  loses audio and no exception escapes to the scheduler.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_asset
from whisperlivekit_tpu.models.whisper import model as M
from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS
from whisperlivekit_tpu.models.whisper.tokenizer import get_tokenizer
from whisperlivekit_tpu.streaming import alignatt as A

pytestmark = pytest.mark.skipif(
    reference_asset("whisperlivekit/whisper/assets/multilingual.tiktoken") is None,
    reason="tokenizer vocab assets unavailable",
)


@pytest.fixture(scope="module")
def engine():
    dims = MODEL_DIMS["dev-tiny"]
    params = M.init_params(dims, jax.random.PRNGKey(0))
    tok = get_tokenizer(True, language="en", task="transcribe")
    cfg = A.AlignAttConfig(
        language="en", frame_threshold=2, xkv_cache=True, max_steps=4,
    )
    return A.AlignAttEngine(params, dims, tok, cfg, model_name=None)


def _wire(engine, n, group_width):
    pool = A.AudioPool(capacity=2 * n + 2)
    enc_pool = A.EncPool(
        2 * n + 2, engine.dims, dtype=engine.params["decoder"]["tok_emb"].dtype
    )
    xkv = A.XKVAllocator.for_engine(engine, group_width, dtype=jnp.float32)
    sessions = []
    for _ in range(n):
        s = A.AlignAttSession(engine)
        s.pool, s.enc_pool, s.xkv_alloc = pool, enc_pool, xkv
        sessions.append(s)
    return pool, enc_pool, xkv, sessions


def _audio(seconds, seed=0):
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    t = np.arange(n) / 16000
    return (
        0.3 * np.sin(2 * np.pi * (150 + 30 * seed) * t)
        + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)


def _tick(engine, sessions, pool, enc_pool, xkv, feed=True):
    tis, live = [], []
    for i, s in enumerate(sessions):
        if feed:
            s.insert_audio(_audio(1.0, seed=i))
        ti = s.prepare_tick(False)
        if ti is not None:
            tis.append(ti)
            live.append(s)
    outs = A.run_tick_batch(
        engine, tis, engine.tokenizer, pool=pool, enc_pool=enc_pool, xkv=xkv
    )
    for s, ti, o in zip(live, tis, outs):
        s.finish_tick(ti, o)
    return tis, outs


def test_multi_group_majority_anchor_routes_chunked(engine, monkeypatch):
    """With two groups resident and no device memory stats (CPU fallback),
    a majority-of-group anchor must use ONLY the chunked slot-scatter
    program — the whole-group program is the donated-OOM hazard."""
    pool, enc_pool, xkv, sessions = _wire(engine, n=4, group_width=2)
    # seed both groups (4 sessions, width 2 -> 2 groups)
    _tick(engine, sessions, pool, enc_pool, xkv)
    assert len(xkv.groups) == 2

    def boom(*a, **k):
        raise AssertionError("whole-group anchor must not run with 2 groups on CPU")

    monkeypatch.setattr(A, "alignatt_tick_anchor_group", boom)
    # force a full-group anchor for group 0's sessions (mirror death)
    g0 = [s for s in sessions if s.xkv_gi == 0]
    assert len(g0) == 2
    for s in g0:
        s.skv_tokens = None
    _tick(engine, g0, pool, enc_pool, xkv)  # would raise if whole-group ran


def test_budget_guard_math(engine, monkeypatch):
    pool, enc_pool, xkv, sessions = _wire(engine, n=1, group_width=1)
    _tick(engine, sessions, pool, enc_pool, xkv)
    monkeypatch.setattr(A, "_anchor_group_temp_bytes", lambda *a: 1 << 30)
    monkeypatch.setattr(A, "_device_free_bytes", lambda: (1 << 30) + A._ANCHOR_HBM_MARGIN)
    assert A._whole_group_anchor_fits(engine, xkv, 0, 1, 64)
    monkeypatch.setattr(A, "_device_free_bytes", lambda: (1 << 30))
    assert not A._whole_group_anchor_fits(engine, xkv, 0, 1, 64)
    # a memoized on-device failure blocks the fast path regardless of budget
    monkeypatch.setattr(A, "_device_free_bytes", lambda: 1 << 40)
    xkv.groups[0].whole_anchor_blocked = True
    assert not A._whole_group_anchor_fits(engine, xkv, 0, 1, 64)


def test_pooled_failure_recovers_and_serves(engine, monkeypatch):
    pool, enc_pool, xkv, sessions = _wire(engine, n=2, group_width=2)
    _tick(engine, sessions, pool, enc_pool, xkv)  # anchor seeds pools
    tis, _ = _tick(engine, sessions, pool, enc_pool, xkv)
    assert all(t.enc_mode == "inc" for t in tis)  # steady state reached

    real = A.alignatt_tick_inc_skv
    calls = {"n": 0}

    def dying(*a, **k):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError("RESOURCE_EXHAUSTED: injected")

    monkeypatch.setattr(A, "alignatt_tick_inc_skv", dying)
    shapes_before = {
        "k": xkv.groups[0].k.shape, "skv": xkv.groups[0].skv_k.shape,
    }
    # the failing tick must still produce outputs for every lane
    tis, outs = _tick(engine, sessions, pool, enc_pool, xkv)
    assert calls["n"] == 1
    assert len(outs) == len(tis) == 2
    assert all(o is not None for o in outs)
    g = xkv.groups[0]
    assert g.generation == 1
    assert enc_pool.generation == 1
    assert g.k.shape == shapes_before["k"]
    assert g.skv_k.shape == shapes_before["skv"]
    n_rec = A.TICK_PHASE_STATS.get("pool_recovery", (0, 0.0, 0))[0]
    assert n_rec == 1

    # next tick: sessions notice the generation bump and re-anchor ...
    monkeypatch.setattr(A, "alignatt_tick_inc_skv", real)
    tis, outs = _tick(engine, sessions, pool, enc_pool, xkv)
    assert all(t.enc_mode == "anchor" for t in tis)
    assert all(o is not None for o in outs)
    # ... and the one after is back on the steady pooled path
    tis, outs = _tick(engine, sessions, pool, enc_pool, xkv)
    assert all(t.enc_mode == "inc" for t in tis)
    assert all(o is not None for o in outs)
