"""Self-KV pool (persistent decoder state) invariants.

The pooled serving path keeps decoder self-attention K/V rows, gate-stat
running sums, and the cache-row token mirror resident per group
(alignatt_tick_inc_skv; seeded by the anchor programs' prefill). These
tests pin:

- **skv tick == prefill tick** when the cross-KV is unchanged: right after
  an anchor, an inc tick over the same audio must produce the same tokens/
  frames/stops through the refresh-decode path as through the full-prefix
  prefill path (the cached rows ARE the prefill's rows);
- **inactive slots ride untouched**: a group tick with one absent slot must
  not move that slot's self-KV rows, stats, or token mirror (refresh rows
  park on the scratch slot, loop writes park there too);
- **host refresh plan**: sot row at slot 0, last prefix row at slot R-1,
  delta rows covered, scratch padding, and anchor-forcing when the prefix
  shifts beyond the refresh reach (trim/truncation) or the mirror is gone.
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


def _wire(engine, n=2, group_width=2, epoch_period=50):
    pool = A.AudioPool(capacity=8)
    enc_pool = A.EncPool(8, engine.dims, dtype=engine.params["decoder"]["tok_emb"].dtype)
    xkv = A.XKVAllocator.for_engine(
        engine, group_width, dtype=jnp.float32, epoch_period=epoch_period,
    )
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


def _tick_all(engine, sessions, pool, enc_pool, xkv, audio_fn):
    tok = engine.tokenizer
    tis, live = [], []
    for i, s in enumerate(sessions):
        a = audio_fn(i)
        if a is not None:
            s.insert_audio(a)
            ti = s.prepare_tick(False)
            if ti is not None:
                tis.append(ti)
                live.append(s)
    outs = A.run_tick_batch(engine, tis, tok, pool=pool, enc_pool=enc_pool, xkv=xkv)
    words = [s.finish_tick(ti, o) for s, ti, o in zip(live, tis, outs)]
    return tis, outs, words


def test_skv_tick_matches_prefill_after_anchor(engine):
    """With identical cross-KV content (same audio re-ticked), the refresh
    path must reproduce the prefill path's decode decisions: the pooled
    self-KV rows are bitwise the anchor prefill's rows."""
    pool, enc_pool, xkv, sessions = _wire(engine)
    # tick 1: anchor (seeds pools)
    _tick_all(engine, sessions, pool, enc_pool, xkv, lambda i: _audio(2.0, seed=i))
    g = xkv.groups[0]
    # tick 2 prepared with NO new audio -> same window, inc mode plans a
    # tail re-encode over identical samples (bit-identical splice)
    tok = engine.tokenizer
    tis = []
    for s in sessions:
        ti = s.prepare_tick(False)
        assert ti is not None and ti.enc_mode == "inc"
        assert ti.skv_refresh_pos is not None
        tis.append(ti)
    # snapshot pools BY VALUE (the skv program donates them), run the program
    snap = tuple(
        jnp.asarray(np.asarray(x))
        for x in (g.k, g.v, g.skv_k, g.skv_v, g.asum, g.asq, g.alast, g.acount, g.tok)
    )
    outs_skv = A.run_tick_batch(engine, tis, tok, pool=pool, enc_pool=enc_pool, xkv=xkv)

    # reference: the SAME tick through the full-prefix prefill program
    # (alignatt_tick_inc_pooled) over the snapshot pools
    (g.k, g.v, g.skv_k, g.skv_v, g.asum, g.asq, g.alast, g.acount, g.tok) = snap
    G = g.group_width
    p_max = max(engine.bucket_for(len(t.prefix_ids)) for t in tis)
    arr = A._collect_lane_arrays(engine, tis, tok, G, p_max)
    audio_lanes = np.asarray([t.pool_lane for t in tis], np.int32)
    enc_lanes = np.asarray([t.enc_lane for t in tis], np.int32)
    tail_start = np.asarray([t.tail_start for t in tis], np.int32)
    win = np.asarray([t.content_frames for t in tis], np.int32)
    ws = np.asarray([t.write_start for t in tis], np.int32)
    args, statics = A._core_device_args(engine, arr, tok, p_max)
    raw = A.alignatt_tick_inc_pooled(
        engine.params, pool.pool, g.k, g.v, enc_pool.pool,
        jnp.asarray(audio_lanes), jnp.asarray(enc_lanes),
        jnp.asarray(tail_start), jnp.asarray(win), jnp.asarray(ws),
        *args, **statics, tail_frames=engine.cfg.enc_tail_frames,
    )
    outs_ref = A._scatter_outputs(raw[0], len(tis), engine.cfg.max_steps)

    for got, want in zip(outs_skv, outs_ref):
        # token decisions must match; the gate FRAMES are allowed to differ:
        # carried stats include the previous loop's decoded rows (incl.
        # dropped ones) while a fresh prefill covers exactly the prefix —
        # the z-norm populations differ by design (bounded; ab harness
        # measures the behavioral effect). test_skv_gate_stats_exact pins
        # the frames on the no-token path where the populations coincide.
        assert got.new_tokens[: got.n_keep] == want.new_tokens[: want.n_keep]
        assert got.n_keep == want.n_keep
        assert got.reason == want.reason
        np.testing.assert_allclose(got.no_speech_p, want.no_speech_p, atol=1e-5)


def test_refresh_decode_matches_prefill_rows():
    """The refresh mechanism at the model level: decoding rows
    [sot, plen-7..plen-1] with positions_override against a cache prefilled
    up to ``start`` must reproduce the full prefill's logits and attention
    row for those positions (same values through a different program —
    allclose, not bitwise)."""
    dims = MODEL_DIMS["dev-tiny"]
    params = M.init_params(dims, jax.random.PRNGKey(1))
    B, P, T = 2, 24, dims.n_audio_ctx
    rng = np.random.default_rng(0)
    prefix = jnp.asarray(rng.integers(0, dims.n_vocab, (B, P)), jnp.int32)
    enc = jnp.asarray(rng.standard_normal((B, T, dims.n_audio_state)), jnp.float32)
    xkv = M.cross_kv(params, enc, dims, transposed=True)
    from whisperlivekit_tpu.models.whisper.dims import default_alignment_heads

    pairs = np.asarray(default_alignment_heads(dims, None), np.int32)
    align = M.AlignSpec(layers=jnp.asarray(pairs[:, 0]), heads=jnp.asarray(pairs[:, 1]))

    Wc = P + 8
    cache = M.init_cache(dims, B, dtype=jnp.float32, width=Wc)
    last1 = (jnp.arange(P)[None, :] == P - 1).astype(jnp.float32)
    full_logits, (_, _, full_last), full_cache = M.decode(
        params, prefix, jnp.zeros((B,), jnp.int32), xkv, cache, dims,
        align=align, align_reduce=(jnp.zeros((B, P), jnp.float32), last1),
        xkv_transposed=True,
    )

    # refresh: rows [sot=2] + [P-7..P-1] against a cache holding rows [0, P)
    R = 8
    pos = np.zeros((B, R), np.int32)
    pos[:, 0] = 2
    pos[:, 1:] = np.arange(P - 7, P)[None, :]
    toks = np.take_along_axis(np.asarray(prefix), pos, axis=1)
    w_last = (jnp.arange(R)[None, :] == R - 1).astype(jnp.float32) * jnp.ones((B, 1))
    r_logits, (_, _, r_last), _ = M.decode(
        params, jnp.asarray(toks), jnp.zeros((B,), jnp.int32), xkv, full_cache,
        dims, align=align,
        align_reduce=(jnp.zeros((B, R), jnp.float32), w_last),
        xkv_transposed=True, positions_override=jnp.asarray(pos),
    )
    np.testing.assert_allclose(
        np.asarray(r_logits[:, 0]), np.asarray(full_logits[:, 2]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(r_logits[:, R - 1]), np.asarray(full_logits[:, P - 1]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(r_last), np.asarray(full_last), rtol=1e-4, atol=1e-5,
    )


def test_inactive_slot_pools_untouched(engine):
    pool, enc_pool, xkv, sessions = _wire(engine)
    _tick_all(engine, sessions, pool, enc_pool, xkv, lambda i: _audio(2.0, seed=i))
    g = xkv.groups[0]
    idle_slot = sessions[1].xkv_slot
    Wc = g.skv_width
    before = (
        np.asarray(g.skv_k[:, idle_slot, : Wc - 1]).copy(),  # Wc-1 = scratch
        np.asarray(g.asum[idle_slot]).copy(),
        np.asarray(g.acount[idle_slot]).copy(),
        np.asarray(g.tok[idle_slot]).copy(),
    )
    # only session 0 submits this tick; slot 1 rides along inactive
    _tick_all(
        engine, sessions, pool, enc_pool, xkv,
        lambda i: _audio(1.0, seed=10) if i == 0 else None,
    )
    np.testing.assert_array_equal(
        np.asarray(g.skv_k[:, idle_slot, : Wc - 1]), before[0]
    )
    np.testing.assert_array_equal(np.asarray(g.asum[idle_slot]), before[1])
    np.testing.assert_array_equal(np.asarray(g.acount[idle_slot]), before[2])
    np.testing.assert_array_equal(np.asarray(g.tok[idle_slot]), before[3])


def test_refresh_plan_layout(engine):
    pool, enc_pool, xkv, sessions = _wire(engine, n=1, group_width=1)
    s = sessions[0]
    _tick_all(engine, sessions[:1], pool, enc_pool, xkv, lambda i: _audio(2.0))
    R = A.SKV_REFRESH_ROWS
    Wc = xkv.groups[0].skv_width

    s.insert_audio(_audio(0.5, seed=3))
    ti = s.prepare_tick(False)
    assert ti.enc_mode == "inc"
    pos, tokns = ti.skv_refresh_pos, ti.skv_refresh_tokens
    plen = len(ti.prefix_ids)
    assert pos[0] == ti.sot_index and tokns[0] == ti.prefix_ids[ti.sot_index]
    assert pos[R - 1] == plen - 1 and tokns[R - 1] == ti.prefix_ids[-1]
    # mirror covers the whole prefix minus the refresh reach
    m = s.skv_tokens
    common = 0
    for a, b in zip(m, ti.prefix_ids):
        if a != b:
            break
        common += 1
    covered = {int(p) for p in pos if p != Wc - 1}
    assert all(q in covered for q in range(common, plen))
    s.finish_tick(ti, A.run_tick_batch(
        engine, [ti], engine.tokenizer, pool=pool, enc_pool=enc_pool, xkv=xkv
    )[0])
    # mirror now = prefix + kept
    assert s.skv_tokens[: len(ti.prefix_ids)] == list(ti.prefix_ids)


def test_prefix_shift_full_refreshes_not_anchors(engine):
    """A prefix front shift (context trim/reshuffle) with a VALID encoder
    state must stay on the inc path via the full-width refresh plan — the
    audio window did not change, so a full-window anchor re-encode would be
    pure waste (r4: head shifts were 580/1178 e2e anchors). A dead mirror
    (pool resync) still forces the anchor rebuild."""
    pool, enc_pool, xkv, sessions = _wire(engine, n=1, group_width=1)
    s = sessions[0]
    _tick_all(engine, sessions[:1], pool, enc_pool, xkv, lambda i: _audio(2.0))
    # simulate a context change that shifts the prefix front (trim/reset)
    s.context.text = "completely different context text that shifts everything"
    s.insert_audio(_audio(0.5, seed=4))
    ti = s.prepare_tick(False)
    assert ti.enc_mode == "inc"
    Rf = A._skv_full_refresh_rows(engine, xkv.groups[0].skv_width)
    assert len(ti.skv_refresh_tokens) == Rf
    plen = len(ti.prefix_ids)
    # full plan: slot 0 = sot row, rows cover the ENTIRE prefix [0, plen)
    assert ti.skv_refresh_pos[0] == ti.sot_index
    assert list(ti.skv_refresh_pos[Rf - plen:]) == list(range(plen))
    assert list(ti.skv_refresh_tokens[Rf - plen:]) == list(ti.prefix_ids)
    # the program runs and the mirror heals to the shifted prefix
    out = A.run_tick_batch(
        engine, [ti], engine.tokenizer, pool=pool, enc_pool=enc_pool, xkv=xkv
    )[0]
    s.finish_tick(ti, out)
    assert s.skv_tokens[:plen] == list(ti.prefix_ids)
    # a dead mirror still forces the anchor rebuild
    s.skv_tokens = None
    ti2 = s.prepare_tick(False)
    assert ti2.enc_mode == "anchor"


def test_serving_prefix_cap_bounds_pool_and_prefix(engine):
    """The r3 capacity regression guard (VERDICT r3 weak #1): pooled serving
    sizes the self-KV pool from serving_prefix_cap (NOT the top prefix
    bucket), and a pooled session's decode prefix never exceeds the cap —
    context is trimmed first, so committed tokens survive the trim."""
    cap = engine.serving_prefix_cap
    assert cap == 96  # auto default with xkv_cache on
    xkv = A.XKVAllocator.for_engine(engine, 2)
    assert xkv.skv_width == (
        cap + engine.serving_commit_budget + engine.cfg.max_steps + 2
    )
    assert xkv.skv_width < engine.prefix_buckets[-1] + engine.cfg.max_steps + 2

    pool, enc_pool, alloc, sessions = _wire(engine, n=1, group_width=1)
    s = sessions[0]
    # long scrolled context + a fat committed window: prefix would be ~180
    s.context.text = " hello" * 120
    s.insert_audio(_audio(2.0))
    s.committed_tokens = [[400 + i for i in range(60)]]
    ti = s.prepare_tick(False)
    assert ti is not None
    assert len(ti.prefix_ids) <= cap
    # committed tokens survive; the context absorbed the trim
    assert ti.prefix_ids[-60:] == s.committed_tokens[0]
    # a non-pooled session of the same engine is NOT capped at the serving
    # cap (legacy/exact paths keep the reference-like context budget)
    s2 = A.AlignAttSession(engine)
    s2.context.text = " hello" * 120
    s2.insert_audio(_audio(2.0))
    ti2 = s2.prepare_tick(False)
    assert len(ti2.prefix_ids) > cap


def test_cap_trim_hysteresis_keeps_refresh_plan_alive(engine):
    """Saturating the serving cap must not shift the prefix head every tick:
    trimming to exactly the cap invalidated the self-KV refresh plan each
    tick (common-prefix ~= 0 -> full prefill per tick; measured e2e n=24:
    975/1178 anchors were skv_plan_miss). The trim drops a block BELOW the
    cap, so steady commits reuse the plan until the next block trim."""
    cap = engine.serving_prefix_cap
    pool, enc_pool, alloc, sessions = _wire(engine, n=1, group_width=1)
    s = sessions[0]
    s.context.text = " hello" * 120
    s.committed_tokens = [[400 + i for i in range(40)]]
    s.insert_audio(_audio(2.0))
    ti = s.prepare_tick(False)
    assert ti is not None
    # hysteresis: trimmed a block under the cap, not to the brim
    assert len(ti.prefix_ids) <= cap - 16
    # seed the device mirror as finish_tick would, then commit a few more
    # tokens: the refresh plan must HIT (no anchor) because the head of the
    # prefix did not move
    s.skv_tokens = list(ti.prefix_ids)
    s.committed_tokens[0].extend([500, 501, 502])
    s.insert_audio(_audio(1.0))
    ti2 = s.prepare_tick(False)
    assert ti2 is not None
    assert ti2.prefix_ids[: len(ti.prefix_ids)] == ti.prefix_ids
    plan = s._skv_refresh_plan(ti2)
    assert plan is not None


def test_tail_keep_hysteresis_first_epoch(engine):
    """The first-epoch production case: context is EMPTY (nothing evicted
    yet) and in-window committed tokens alone exceed the serving cap, so
    trim_context cannot help and prepare_tick's tail-keep does the cut.
    Keeping exactly the last `cap` tokens moved the head every tick
    (measured e2e n=24: skv_miss.head_shift 593 of 1178 anchors -> one full
    prefill per tick). The block-aligned head drop must keep the kept head
    FIXED across a few commits so the refresh plan hits."""
    cap = engine.serving_prefix_cap
    pool, enc_pool, alloc, sessions = _wire(engine, n=1, group_width=1)
    s = sessions[0]
    assert s.context.is_empty()
    s.committed_tokens = [[600 + i for i in range(cap + 7)]]
    s.insert_audio(_audio(2.0))
    ti = s.prepare_tick(False)
    assert ti is not None
    assert len(ti.prefix_ids) <= cap
    # hysteresis: dropped a block extra, leaving headroom under the cap
    assert len(ti.prefix_ids) <= cap - 8
    s.skv_tokens = list(ti.prefix_ids)
    # a few more commits: head must not move, plan must hit
    for extra in range(3):
        s.committed_tokens[0].append(900 + extra)
        s.insert_audio(_audio(0.5))
        ti2 = s.prepare_tick(False)
        assert ti2 is not None
        assert ti2.prefix_ids[: len(ti.prefix_ids)] == ti.prefix_ids
        plan = s._skv_refresh_plan(ti2)
        assert plan is not None
        s.skv_tokens = list(ti2.prefix_ids)
        ti = ti2


def test_cap_head_drop_preserves_sot_sequence(engine):
    """When the cap head-drop reaches past the (empty) context into the sot
    sequence, the initial tokens must survive at the head — a prompt without
    sot/lang/task is malformed and the refresh plan's slot-0 'sot row' would
    re-decode an arbitrary committed token, skewing no_speech_p (ADVICE r4
    low, alignatt.py cap-trim)."""
    cap = engine.serving_prefix_cap
    pool, enc_pool, alloc, sessions = _wire(engine, n=1, group_width=1)
    s = sessions[0]
    assert s.context.is_empty()
    s.committed_tokens = [[600 + i for i in range(2 * cap)]]
    s.insert_audio(_audio(2.0))
    ti = s.prepare_tick(False)
    assert ti is not None
    assert len(ti.prefix_ids) <= cap
    tok = engine.tokenizer
    # sot sequence intact at the head, sot_index points at the real sot
    n_init = len(s.initial_tokens)
    assert ti.prefix_ids[:n_init] == list(s.initial_tokens)
    assert ti.prefix_ids[ti.sot_index] == tok.sot
    # the newest committed tokens survive the cut
    assert ti.prefix_ids[-1] == s.committed_tokens[0][-1]
    # head stays fixed across a few more commits (hysteresis) so the
    # refresh plan keeps hitting
    s.skv_tokens = list(ti.prefix_ids)
    s.committed_tokens[0].append(50)
    s.insert_audio(_audio(0.5))
    ti2 = s.prepare_tick(False)
    assert ti2.prefix_ids[: len(ti.prefix_ids)] == ti.prefix_ids
    assert s._skv_refresh_plan(ti2) is not None


def test_commit_budget_defers_trims_to_anchor(engine):
    """Mid-epoch commits past the cap must GROW the prefix into the commit
    budget instead of trimming the head: a head trim shifts every row's
    position, misses the slim refresh plan, and upgrades the whole group
    tick to the padded full-width program (measured e2e n=24:
    fullrefresh.head_shift 829/265 inc ticks -> group ticks ran 2.5x the
    model cost). Trims align with ticks that pay a full prefill anyway."""
    cap = engine.serving_prefix_cap
    budget = engine.serving_commit_budget
    assert budget > 0
    pool, enc_pool, alloc, sessions = _wire(engine, n=1, group_width=1)
    s = sessions[0]
    # establish a mirror at ~the cap (first tick anchors, deep => <= cap)
    s.committed_tokens = [[600 + i for i in range(cap + 5)]]
    s.insert_audio(_audio(2.0))
    ti = s.prepare_tick(False)
    assert len(ti.prefix_ids) <= cap
    A.run_tick_batch(engine, [ti], engine.tokenizer,
                     pool=pool, enc_pool=enc_pool, xkv=alloc)
    s.skv_tokens = list(ti.prefix_ids)
    base_plen = len(ti.prefix_ids)
    # mid-epoch commits: the head stays put (persistent drop) while the
    # prefix grows — through AND past the cap into the budget slack — and
    # the refresh plan stays slim the whole way; only when commits exhaust
    # the budget does the head move once (one non-slim refresh), then the
    # hysteresis holds again
    grew = False
    head_moves = 0
    n_steps = 2 * budget + 2 * cap // 3
    # when the budget exhausts, the re-drop backs off a hysteresis block —
    # so the head moves at most once per (budget + block) commits
    blk = min(32, max(8, (cap + budget) // 4))
    for step in range(n_steps):
        s.committed_tokens[0].append(50 + step)
        s.insert_audio(_audio(0.1))  # small: stay below the eviction window
        # fake the device-tick enc sync (finish_tick's enc_commit): this
        # test pins the host trim/plan scheduling, not the encoder
        s._enc_key = (s._audio_gen, s.evicted_samples)
        s._enc_synced_frames = int(s.segments_len() * 16000) // 320
        ti2 = s.prepare_tick(False)
        assert ti2.enc_mode == "inc", (step, ti2.enc_mode)
        plen = len(ti2.prefix_ids)
        if plen > cap:
            grew = True
            assert plen <= cap + budget
        if ti2.prefix_ids[: len(s.skv_tokens)] == s.skv_tokens[:plen]:
            plan = s._skv_refresh_plan(ti2)
            assert plan is not None
            assert len(plan[0]) == A.SKV_REFRESH_ROWS, (
                "head-stable commit forced a non-slim refresh"
            )
        else:
            head_moves += 1
        s.skv_tokens = list(ti2.prefix_ids)
    assert grew, "prefix never grew past the cap — budget not applied"
    allowed = -(-n_steps // (budget + blk))
    assert head_moves <= allowed, (
        f"head moved {head_moves}x in {n_steps} commits "
        f"(> {allowed} budget windows)"
    )


def test_full_refresh_rows_match_anchor_prefill(engine):
    """The full-width refresh rebuilds the self-KV rows through decode()'s
    scatter-before-attend, so the rebuilt rows must match what an anchor
    prefill computes for the same prefix against the same cross-KV (same
    math, different block width -> allclose, not bitwise)."""
    pool, enc_pool, xkv, sessions = _wire(engine, n=1, group_width=1)
    s = sessions[0]
    _tick_all(engine, sessions[:1], pool, enc_pool, xkv, lambda i: _audio(2.0))
    g = xkv.groups[0]
    # deterministic head shift: replace the committed window wholesale so
    # the mirror/prefix delta exceeds the slim refresh reach (the previous
    # guarded 3-token drop silently no-oped under the random-weight engine,
    # which commits <=4 tokens -> the parity check below never ran)
    s.committed_tokens = [[700 + i for i in range(3 * A.SKV_REFRESH_ROWS)]]
    s.insert_audio(_audio(0.5, seed=9))
    before = dict(A.ANCHOR_REASONS)
    ti = s.prepare_tick(False)
    assert ti.enc_mode == "inc"
    assert len(ti.skv_refresh_tokens) > A.SKV_REFRESH_ROWS  # full plan
    grew = {
        k: A.ANCHOR_REASONS[k] - before.get(k, 0)
        for k in A.ANCHOR_REASONS
        if A.ANCHOR_REASONS[k] != before.get(k, 0)
    }
    assert any(k.startswith("fullrefresh.") for k in grew), grew
    plen = len(ti.prefix_ids)
    A.run_tick_batch(engine, [ti], engine.tokenizer,
                     pool=pool, enc_pool=enc_pool, xkv=xkv)
    refreshed_k = np.asarray(g.skv_k[:, 0, :plen])

    # reference: a straight full-prefix prefill (M.decode, pos=0) against
    # the SAME pool cross-KV the refresh run read. (The production anchor
    # path re-encodes the window from scratch, so its cross-KV differs from
    # the inc splice by the incremental-encode approximation — that delta
    # is adjudicated in docs/perf/INC_ENCODE_ADJUDICATION.md; THIS test
    # pins the refresh-plan scatter layout, so both arms must share xkv.)
    dims = engine.dims
    Wc = g.skv_width
    xkv_ref = M.CrossKV(k=g.k[:, 0:1], v=g.v[:, 0:1])
    cache = M.init_cache(dims, 1, dtype=g.skv_k.dtype, width=Wc)
    prefix = jnp.asarray(np.asarray(ti.prefix_ids, np.int32))[None]
    Tp = g.k.shape[-1]
    _, _, ref_cache = M.decode(
        engine.params, prefix, jnp.zeros((1,), jnp.int32), xkv_ref, cache,
        dims, xkv_transposed=True,
        t_valid=dims.n_audio_ctx if Tp > dims.n_audio_ctx else None,
    )
    anchored_k = np.asarray(ref_cache.k[:, 0, :plen])
    np.testing.assert_allclose(refreshed_k, anchored_k, rtol=2e-4, atol=2e-5)


def _snap_group(pool, enc_pool, g):
    vals = (pool.pool, enc_pool.pool, g.k, g.v, g.skv_k, g.skv_v,
            g.asum, g.asq, g.alast, g.acount, g.tok)
    return tuple(jnp.asarray(np.asarray(x)) for x in vals)


def _restore_group(pool, enc_pool, g, snap):
    (pool.pool, enc_pool.pool, g.k, g.v, g.skv_k, g.skv_v,
     g.asum, g.asq, g.alast, g.acount, g.tok) = tuple(
        jnp.asarray(np.asarray(x)) for x in snap
    )


def test_mixed_slim_full_plans_match_solo(engine):
    """A group tick mixing a slim plan and a full plan (the common
    production case: one lane cap-trims while the other steadily commits)
    runs at the full width with the slim plan PADDED into it
    (_dispatch_group_xkv_inc scratch-row padding). Each lane's decisions
    must match its solo run from the same pool state."""
    pool, enc_pool, xkv, sessions = _wire(engine)
    _tick_all(engine, sessions, pool, enc_pool, xkv, lambda i: _audio(2.0, seed=i))
    g = xkv.groups[0]
    s0, s1 = sessions
    # lane 0: wholesale head shift -> full plan
    s0.committed_tokens = [[700 + i for i in range(3 * A.SKV_REFRESH_ROWS)]]
    s0.insert_audio(_audio(0.5, seed=9))
    # lane 1: steady state, new audio only -> slim plan
    s1.insert_audio(_audio(0.5, seed=11))
    ti0 = s0.prepare_tick(False)
    ti1 = s1.prepare_tick(False)
    assert ti0.enc_mode == "inc" and ti1.enc_mode == "inc"
    assert len(ti0.skv_refresh_tokens) > A.SKV_REFRESH_ROWS   # full
    assert len(ti1.skv_refresh_tokens) == A.SKV_REFRESH_ROWS  # slim
    tok = engine.tokenizer

    snap = _snap_group(pool, enc_pool, g)
    mixed = A.run_tick_batch(
        engine, [ti0, ti1], tok, pool=pool, enc_pool=enc_pool, xkv=xkv
    )
    mixed_k = np.asarray(g.skv_k).copy()

    _restore_group(pool, enc_pool, g, snap)
    solo0 = A.run_tick_batch(
        engine, [ti0], tok, pool=pool, enc_pool=enc_pool, xkv=xkv
    )[0]
    solo0_k = np.asarray(g.skv_k[:, ti0.xkv_slot]).copy()

    _restore_group(pool, enc_pool, g, snap)
    solo1 = A.run_tick_batch(
        engine, [ti1], tok, pool=pool, enc_pool=enc_pool, xkv=xkv
    )[0]
    solo1_k = np.asarray(g.skv_k[:, ti1.xkv_slot]).copy()

    for got, want in ((mixed[0], solo0), (mixed[1], solo1)):
        assert got.new_tokens[: got.n_keep] == want.new_tokens[: want.n_keep]
        assert got.n_keep == want.n_keep
        assert got.reason == want.reason
        np.testing.assert_allclose(got.no_speech_p, want.no_speech_p, atol=1e-5)
    # the rebuilt/updated self-KV rows must match the solo runs too (the
    # padded rows park on the scratch slot and never corrupt a legit row).
    # Compare only LIVE rows [0, plen + n_keep): rows past the kept tokens
    # are dropped-loop scratch (the while_loop runs more iterations when the
    # other lane is active, so a stopped lane's post-stop writes differ) and
    # the next tick's refresh plan re-decodes any row it will consume.
    live0 = len(ti0.prefix_ids) + mixed[0].n_keep
    live1 = len(ti1.prefix_ids) + mixed[1].n_keep
    np.testing.assert_allclose(
        mixed_k[:, ti0.xkv_slot, :live0], solo0_k[:, :live0],
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        mixed_k[:, ti1.xkv_slot, :live1], solo1_k[:, :live1],
        rtol=2e-4, atol=2e-5,
    )
