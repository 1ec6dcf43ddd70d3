"""Batch dispatch layer: pack N sessions' ticks into device programs.

Routes TickInputs batches to the tick programs in streaming/alignatt.py —
partitioned by encode mode (legacy / anchor / inc / pooled xkv) — with the
async dispatch/fetch split the serving loop needs, the whole-group-anchor
HBM budget guard, and the serving-program precompile set. Split out of
streaming/alignatt.py in round 5 (VERDICT r4 task #7); the alignatt module
remains the import facade.

Tick programs and the AOT budget probes are looked up through the alignatt
MODULE at call time (``_A.alignatt_tick_inc_skv`` etc.), so tests that
monkeypatch them on the facade keep working.
"""

from __future__ import annotations

import logging
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import alignatt as _A
from ..audio.mel import N_SAMPLES
from .alignatt import SKV_REFRESH_ROWS, TICK_PHASE_STATS
from .pools import AudioPool, EncPool, XKVAllocator, _dispatch_pooled_recovering
from .session_plan import TickInputs, TickOutputs, _skv_full_refresh_rows

logger = logging.getLogger(__name__)


def _collect_lane_arrays(engine, ticks: List[TickInputs], tokenizer, B: int, p_max: int):
    """Pad N lanes' host inputs to batch B (power of two) as numpy arrays."""
    arr = dict(
        prefix=np.full((B, p_max), tokenizer.eot, np.int32),
        prefix_len=np.ones(B, np.int32),
        sot_index=np.zeros(B, np.int32),
        content_frames=np.zeros(B, np.int32),
        last_attend=np.zeros(B, np.int32),
        is_last=np.zeros(B, bool),
        max_new=np.ones(B, np.int32),
        active=np.zeros(B, bool),
    )
    for i, t in enumerate(ticks):
        arr["prefix"][i, : len(t.prefix_ids)] = t.prefix_ids
        arr["prefix_len"][i] = len(t.prefix_ids)
        arr["sot_index"][i] = t.sot_index
        arr["content_frames"][i] = t.content_frames
        arr["last_attend"][i] = t.last_attend
        arr["is_last"][i] = t.is_last
        arr["max_new"][i] = t.max_new
        arr["active"][i] = True
    return arr


def _core_device_args(engine, arr, tokenizer, p_max: int):
    """(positional core args, static kwargs) shared by the tick programs."""
    cfg = engine.cfg
    args = (
        jnp.asarray(arr["prefix"]),
        jnp.asarray(arr["prefix_len"]),
        jnp.asarray(arr["sot_index"]),
        jnp.asarray(arr["content_frames"]),
        jnp.asarray(arr["last_attend"]),
        jnp.asarray(arr["is_last"]),
        jnp.asarray(arr["max_new"]),
        engine.suppress_mask,
        engine.align_layers,
        engine.align_heads,
        jnp.int32(cfg.frame_threshold),
        jnp.int32(cfg.rewind_threshold),
        jnp.float32(cfg.nonspeech_prob),
        jnp.asarray(arr["active"]),
        engine.cif_w,
        engine.cif_b,
    )
    statics = dict(
        dims=engine.dims,
        p_max=p_max,
        max_steps=cfg.max_steps,
        eot=tokenizer.eot,
        ts_begin=tokenizer.timestamp_begin,
        no_speech_tok=tokenizer.no_speech,
        space_tok=tokenizer.encode(" ")[0],
        use_cif=engine.use_cif,
        xkv_f8=cfg.xkv_f8,
        xkv_transposed=getattr(cfg, "xkv_transposed", True),
        mel_pallas=getattr(cfg, "mel_pallas", False),
    )
    return args, statics


def _gather_full_audio(ticks: List[TickInputs], pool: Optional[AudioPool], B: int):
    """Full 30 s windows for legacy/anchor ticks: HBM gather when every lane
    is pool-backed, otherwise one direct int16 transfer."""
    if pool is not None and all(t.pool_lane is not None for t in ticks):
        lanes = [t.pool_lane for t in ticks] + [0] * (B - len(ticks))
        return pool.gather(lanes)
    audio = np.zeros((B, N_SAMPLES), np.int16)
    for i, t in enumerate(ticks):
        a = t.audio
        if a.dtype != np.int16:
            a = (np.clip(a, -1.0, 1.0 - 1 / 32768) * 32768.0).astype(np.int16)
        audio[i, : len(a)] = a
    return jnp.asarray(audio)


def _scatter_outputs(raw, n: int, max_steps: int) -> List[TickOutputs]:
    """Unpack the single packed int32 tick output (see _tick_core's return:
    one device array = one tunnel round-trip instead of seven)."""
    packed = np.asarray(raw)
    S = max_steps
    new_tokens = packed[:, :S]
    frames = packed[:, S : 2 * S]
    n_keep = packed[:, 2 * S]
    reason = packed[:, 2 * S + 1]
    last_attend_out = packed[:, 2 * S + 2]
    fire = packed[:, 2 * S + 3]
    no_speech_p = packed[:, 2 * S + 4].view(np.float32)
    return [
        TickOutputs(
            new_tokens=[int(x) for x in new_tokens[i]],
            n_keep=int(n_keep[i]),
            frames=frames[i],
            reason=int(reason[i]),
            no_speech_p=float(no_speech_p[i]),
            last_attend=int(last_attend_out[i]),
            fire=bool(fire[i]),
        )
        for i in range(n)
    ]


def run_tick_batch(
    engine: "AlignAttEngine",
    ticks: List[TickInputs],
    tokenizer,
    pool: Optional[AudioPool] = None,
    enc_pool: Optional[EncPool] = None,
    xkv: Optional["XKVAllocator"] = None,
) -> List[TickOutputs]:
    """Pack N lanes into device programs and scatter the outputs.

    Lane count is padded to a power of two and the prefix width to the
    common bucket, so the set of compiled program shapes stays small.
    With an AudioPool, audio stays in HBM: lanes are updated with only
    their new samples, then gathered device-side.

    With an EncPool, ticks carry an encoding plan and the batch is
    partitioned by mode — "anchor" lanes run the full-window program (and
    refresh their cached rows), "inc" lanes run the tail-encode program,
    plan-less lanes run the legacy program. Outputs return in input order.
    """
    return finalize_tick_batch(
        dispatch_tick_batch(engine, ticks, tokenizer, pool, enc_pool, xkv),
        len(ticks),
    )


def _timed_pool_update(pool: AudioPool, ticks: List[TickInputs]) -> None:
    # Audio-pool rows must stay in sync with the sessions' _pool_synced
    # bookkeeping (committed in prepare_tick), so apply updates for every
    # pool-backed lane before anything gathers.
    t_p = time.perf_counter()
    pool.update(
        [
            (t.pool_lane, *t.pool_update)
            for t in ticks
            if t.pool_lane is not None and t.pool_update is not None
        ]
    )
    n_t, tot, lanes = TICK_PHASE_STATS.get("pool_update", (0, 0.0, 0))
    TICK_PHASE_STATS["pool_update"] = (
        n_t + 1, tot + (time.perf_counter() - t_p), lanes + len(ticks)
    )


def dispatch_tick_batch(engine, ticks, tokenizer, pool, enc_pool, xkv) -> list:
    """Dispatch every group program WITHOUT fetching outputs.

    Device dispatch is asynchronous: each group call enqueues its program
    and updates the (device-array) pool references immediately; the blocking
    host<->device round-trip happens only in the returned fetch closures.
    Splitting lets the serving loop (a) enqueue all of a window's programs
    back-to-back so XLA pipelines them, and (b) yield the asyncio event loop
    while the device computes — on axon, inference must run ON the loop
    thread (session/processor._inline_inference_default), so without the
    split every device tick froze audio feeding for its full duration.
    Returns [(phase_key, lane_idxs, fetch, t_dispatch_start), ...]."""
    if pool is not None:
        _timed_pool_update(pool, ticks)
    groups: dict = {}
    for i, t in enumerate(ticks):
        if t.xkv_slot is not None and xkv is not None:
            key = ("xkv", t.xkv_gi, t.enc_mode)
        elif t.enc_lane is not None and enc_pool is not None:
            key = t.enc_mode
        else:
            key = None  # plan-less or mis-routed lane: legacy full re-encode
        groups.setdefault(key, []).append(i)
    pends = []
    for mode, idxs in groups.items():
        t_g = time.perf_counter()
        group = [ticks[i] for i in idxs]
        if isinstance(mode, tuple):
            _, gi, enc_mode = mode
            if enc_mode == "inc":
                fetch = _dispatch_group_xkv_inc(
                    engine, group, tokenizer, pool, enc_pool, xkv, gi
                )
                xkv.note_group_tick(gi)
            else:
                fetch = _dispatch_group_xkv_anchor(
                    engine, group, tokenizer, pool, enc_pool, xkv, gi
                )
        elif mode == "inc":
            fetch = _dispatch_group_inc(engine, group, tokenizer, pool, enc_pool)
        elif mode == "anchor":
            fetch = _dispatch_group_anchor(engine, group, tokenizer, pool, enc_pool)
        else:
            fetch = _dispatch_group_legacy(engine, group, tokenizer, pool)
        mk = mode[2] + "_xkv" if isinstance(mode, tuple) else (mode or "legacy")
        pends.append((mk, idxs, fetch, t_g))
    return pends


def finalize_tick_batch(pends: list, n: int) -> List[TickOutputs]:
    """Fetch every dispatched group's outputs (input order restored).
    Phase wall time spans dispatch start -> fetch done per group; groups
    dispatched together overlap, so the per-phase means attribute the
    window's wall time, not exclusive device time."""
    outs: List[Optional[TickOutputs]] = [None] * n
    for mk, idxs, fetch, t_g in pends:
        res = fetch()
        n_t, tot, lanes = TICK_PHASE_STATS.get(mk, (0, 0.0, 0))
        TICK_PHASE_STATS[mk] = (
            n_t + 1, tot + (time.perf_counter() - t_g), lanes + len(idxs)
        )
        for i, o in zip(idxs, res):
            outs[i] = o
    return outs  # type: ignore[return-value]


# mode -> (n_group_calls, total_s, n_lanes): where batch ticks spend wall
def _dispatch_group_legacy(engine, ticks, tokenizer, pool):
    n = len(ticks)
    B = 1 << (n - 1).bit_length()
    p_max = max(engine.bucket_for(len(t.prefix_ids)) for t in ticks)
    arr = _collect_lane_arrays(engine, ticks, tokenizer, B, p_max)
    audio = _gather_full_audio(ticks, pool, B)
    args, statics = _core_device_args(engine, arr, tokenizer, p_max)
    raw = _A.alignatt_tick(engine.params, audio, *args, **statics)
    return lambda: _scatter_outputs(raw, n, engine.cfg.max_steps)


def _run_group_legacy(engine, ticks, tokenizer, pool) -> List[TickOutputs]:
    return _dispatch_group_legacy(engine, ticks, tokenizer, pool)()


def _dispatch_group_anchor(engine, ticks, tokenizer, pool, enc_pool):
    n = len(ticks)
    B = 1 << (n - 1).bit_length()
    p_max = max(engine.bucket_for(len(t.prefix_ids)) for t in ticks)
    arr = _collect_lane_arrays(engine, ticks, tokenizer, B, p_max)
    audio = _gather_full_audio(ticks, pool, B)
    # padded lanes write their (garbage) rows to the scratch row
    enc_lanes = [t.enc_lane for t in ticks] + [EncPool.SCRATCH] * (B - n)
    args, statics = _core_device_args(engine, arr, tokenizer, p_max)
    raw = _A.alignatt_tick_anchor(
        engine.params, audio, enc_pool.pool,
        jnp.asarray(np.asarray(enc_lanes, np.int32)), *args, **statics,
    )
    enc_pool.pool = raw[-1]
    return lambda: _scatter_outputs(raw[0], n, engine.cfg.max_steps)


def _dispatch_group_inc(engine, ticks, tokenizer, pool, enc_pool):
    n = len(ticks)
    B = 1 << (n - 1).bit_length()
    p_max = max(engine.bucket_for(len(t.prefix_ids)) for t in ticks)
    arr = _collect_lane_arrays(engine, ticks, tokenizer, B, p_max)
    audio_lanes = np.zeros(B, np.int32)
    enc_lanes = np.full(B, EncPool.SCRATCH, np.int32)
    tail_start = np.zeros(B, np.int32)
    win_frames = np.zeros(B, np.int32)   # 0 for padded lanes: nothing written
    write_start = np.zeros(B, np.int32)
    for i, t in enumerate(ticks):
        audio_lanes[i] = t.pool_lane
        enc_lanes[i] = t.enc_lane
        tail_start[i] = t.tail_start
        win_frames[i] = t.content_frames
        write_start[i] = t.write_start
    args, statics = _core_device_args(engine, arr, tokenizer, p_max)
    raw = _A.alignatt_tick_inc(
        engine.params, pool.pool, enc_pool.pool,
        jnp.asarray(audio_lanes), jnp.asarray(enc_lanes),
        jnp.asarray(tail_start), jnp.asarray(win_frames),
        jnp.asarray(write_start),
        *args, **statics, tail_frames=engine.cfg.enc_tail_frames,
    )
    enc_pool.pool = raw[-1]
    return lambda: _scatter_outputs(raw[0], n, engine.cfg.max_steps)


def _whole_group_anchor_fits(engine, xkv: "XKVAllocator", gi: int, G: int, p_max: int) -> bool:
    """Budget-math guard for the whole-group anchor: its XLA temp must fit
    in the device's free HBM (pools of EVERY resident group count against
    it) with a safety margin. Falls back to the single-group proxy when the
    platform exposes no memory stats (e.g. CPU tests)."""
    g = xkv.groups[gi]
    if g.whole_anchor_blocked:
        return False
    free = _A._device_free_bytes()
    if free is None:
        return len(xkv.groups) == 1
    temp = _A._anchor_group_temp_bytes(engine, xkv, G, p_max)
    if temp is None:
        return len(xkv.groups) == 1
    return temp + _A._ANCHOR_HBM_MARGIN <= free


def precompile_serving_programs(
    engine, xkv: "XKVAllocator", enc_capacity: int, audio_capacity: int
) -> dict:
    """AOT-compile the steady-serving program set into the (persistent)
    compile cache so no session ever stalls on a mid-stream compile:

    - the group inc tick (_A.alignatt_tick_inc_skv at the group width),
    - the chunked anchor (_A.alignatt_tick_anchor_pooled at B=8 x cap bucket —
      the ONE shape capped engines route every chunk to),
    - the whole-group anchor (via _A._anchor_group_temp_bytes, which the
      budget guard needs anyway).

    The r3 e2e runs spent most of their measured window compiling these
    lazily (ADVICE r3 #4: the first multi-group anchor stalled serving).
    Returns {program: compile_seconds}. Nothing runs on device."""
    dims = engine.dims
    cfg = engine.cfg
    tok = engine.tokenizer
    sds = jax.ShapeDtypeStruct
    p_sds = jax.tree.map(lambda x: sds(x.shape, x.dtype), engine.params)
    Tp = -(-dims.n_audio_ctx // 128) * 128
    G = xkv.group_width
    K = int(engine.align_layers.shape[0])
    wdt = engine.params["decoder"]["tok_emb"].dtype
    kv = lambda: sds((dims.n_text_layer, G, dims.n_text_head, dims.head_dim, Tp), xkv.dtype)  # noqa: E731
    skv = lambda: sds(  # noqa: E731
        (dims.n_text_layer, G, xkv.skv_width, dims.n_text_head, dims.head_dim),
        xkv.skv_dtype,
    )
    stat = lambda: sds((G, K, dims.n_audio_ctx), jnp.float32)  # noqa: E731
    i32 = lambda *s: sds(s, jnp.int32)  # noqa: E731
    enc_p = lambda: sds((enc_capacity, dims.n_audio_ctx, dims.n_audio_state), wdt)  # noqa: E731
    statics = dict(
        dims=dims, max_steps=cfg.max_steps, eot=tok.eot,
        ts_begin=tok.timestamp_begin, no_speech_tok=tok.no_speech,
        space_tok=tok.encode(" ")[0],
        xkv_f8=cfg.xkv_f8, xkv_transposed=getattr(cfg, "xkv_transposed", True),
    )
    times: dict = {}

    for key, R in (
        ("inc_skv", SKV_REFRESH_ROWS),
        ("inc_skv_full", _skv_full_refresh_rows(engine, xkv.skv_width)),
    ):
        t0 = time.perf_counter()
        try:
            _A.alignatt_tick_inc_skv.lower(
                p_sds, sds((audio_capacity, N_SAMPLES), jnp.int16),
                kv(), kv(), enc_p(), skv(), skv(), stat(), stat(), stat(),
                sds((G,), jnp.float32), i32(G, dims.n_text_ctx),
                i32(G), i32(G), i32(G), i32(G), i32(G),
                i32(G, R), i32(G, R),
                i32(G), i32(G), i32(G), sds((G,), bool), i32(G),
                sds((dims.n_vocab,), jnp.float32),
                sds((K,), jnp.int32), sds((K,), jnp.int32),
                sds((), jnp.int32), sds((), jnp.int32), sds((), jnp.float32),
                sds((G,), bool),
                sds((dims.n_audio_state,), jnp.float32), sds((), jnp.float32),
                tail_frames=cfg.enc_tail_frames, **statics,
            ).compile()
            times[key] = round(time.perf_counter() - t0, 1)
        except Exception as e:
            logger.warning("precompile %s failed: %s", key, e)
            times[key] = None

    p_max = engine.bucket_for(engine.serving_prefix_cap or engine.prefix_buckets[-1])
    for B in (4, 8):  # both chunked-anchor widths (CHUNK_SMALL and CHUNK)
        t0 = time.perf_counter()
        try:
            _A.alignatt_tick_anchor_pooled.lower(
                p_sds, sds((B, N_SAMPLES), jnp.int16),
                kv(), kv(), enc_p(), skv(), skv(), stat(), stat(), stat(),
                sds((G,), jnp.float32), i32(G, dims.n_text_ctx),
                i32(B), i32(B),
                i32(B, p_max), i32(B), i32(B), i32(B), i32(B),
                sds((B,), bool), i32(B),
                sds((dims.n_vocab,), jnp.float32),
                sds((K,), jnp.int32), sds((K,), jnp.int32),
                sds((), jnp.int32), sds((), jnp.int32), sds((), jnp.float32),
                sds((B,), bool),
                sds((dims.n_audio_state,), jnp.float32), sds((), jnp.float32),
                p_max=p_max, use_cif=engine.use_cif,
                mel_pallas=getattr(cfg, "mel_pallas", False), **statics,
            ).compile()
            times[f"anchor_pooled_b{B}"] = round(time.perf_counter() - t0, 1)
        except Exception as e:
            logger.warning("precompile anchor_pooled b%d failed: %s", B, e)
            times[f"anchor_pooled_b{B}"] = None

    t0 = time.perf_counter()
    temp = _A._anchor_group_temp_bytes(engine, xkv, G, p_max)
    times["anchor_group"] = round(time.perf_counter() - t0, 1) if temp is not None else None
    logger.info("serving programs precompiled: %s", times)
    return times

def _dispatch_group_xkv_inc(engine, ticks, tokenizer, pool, enc_pool, xkv, gi):
    """Incremental ticks over the group-resident cross-KV AND self-KV pools
    (_A.alignatt_tick_inc_skv — no per-tick prefill, no prefix upload, and no
    prefix-bucket program dimension).

    The program ALWAYS runs at the group's full width in slot order (the
    decode reads the pool arrays directly; a per-lane gather measured 4.8x
    slower). Slots without a submission this window ride along inactive
    (win_frames=0, active=False, refresh rows parked on the scratch slot):
    their pool rows are untouched and their outputs discarded."""
    g = xkv.groups[gi]
    G = g.group_width
    Wc = g.skv_width
    # Two refresh widths only: the slim per-tick delta (SKV_REFRESH_ROWS)
    # and the full-prefix rebuild (head shift with a valid encoder state —
    # re-decoding the prefix against the pooled cross-KV costs a prefill,
    # not the chunked anchor's full-window re-encode). A group tick runs at
    # the widest width any lane needs; slim plans pad with scratch rows.
    R = max(len(t.skv_refresh_tokens) for t in ticks)
    # p_max only sizes the (unused-on-device) prefix array here; prefix_len
    # still rides to the device for the loop's position math
    p_host = max(8, max(len(t.prefix_ids) for t in ticks))
    arr = _collect_lane_arrays(engine, ticks, tokenizer, G, p_host)
    # re-index every per-lane row from input order to slot order
    slot_of = [t.xkv_slot for t in ticks]
    perm = np.full(G, -1, np.int32)
    for i, sl in enumerate(slot_of):
        perm[sl] = i
    for k, v in arr.items():
        out = np.zeros((G,) + v.shape[1:], v.dtype)
        for sl in range(G):
            if perm[sl] >= 0:
                out[sl] = v[perm[sl]]
        arr[k] = out
    audio_lanes = np.zeros(G, np.int32)
    enc_lanes = np.full(G, EncPool.SCRATCH, np.int32)
    tail_start = np.zeros(G, np.int32)
    win_frames = np.zeros(G, np.int32)
    write_start = np.zeros(G, np.int32)
    r_tok = np.full((G, R), tokenizer.eot, np.int32)
    r_pos = np.full((G, R), Wc - 1, np.int32)  # scratch for absent slots
    for t in ticks:
        sl = t.xkv_slot
        audio_lanes[sl] = t.pool_lane
        enc_lanes[sl] = t.enc_lane
        tail_start[sl] = t.tail_start
        win_frames[sl] = t.content_frames
        write_start[sl] = t.write_start
        r = len(t.skv_refresh_tokens)
        if r == R:
            r_tok[sl] = t.skv_refresh_tokens
            r_pos[sl] = t.skv_refresh_pos
        else:
            # pad a slim plan to the full width: slot 0 (sot row) and the
            # right-aligned delta rows keep their conventional slots; the
            # middle fills with scratch rows (layout is positional only in
            # slots 0 and R-1)
            r_tok[sl, 0] = t.skv_refresh_tokens[0]
            r_pos[sl, 0] = t.skv_refresh_pos[0]
            r_tok[sl, R - (r - 1):] = t.skv_refresh_tokens[1:]
            r_pos[sl, R - (r - 1):] = t.skv_refresh_pos[1:]
    cfg = engine.cfg
    mode_key = "inc_skv" if R == SKV_REFRESH_ROWS else "inc_skv_full"

    def call():
        raw = _A.alignatt_tick_inc_skv(
            engine.params, pool.pool, g.k, g.v, enc_pool.pool,
            g.skv_k, g.skv_v, g.asum, g.asq, g.alast, g.acount, g.tok,
            jnp.asarray(audio_lanes), jnp.asarray(enc_lanes),
            jnp.asarray(tail_start), jnp.asarray(win_frames),
            jnp.asarray(write_start),
            jnp.asarray(r_tok), jnp.asarray(r_pos),
            jnp.asarray(arr["prefix_len"]),
            jnp.asarray(arr["content_frames"]),
            jnp.asarray(arr["last_attend"]),
            jnp.asarray(arr["is_last"]),
            jnp.asarray(arr["max_new"]),
            engine.suppress_mask, engine.align_layers, engine.align_heads,
            jnp.int32(cfg.frame_threshold), jnp.int32(cfg.rewind_threshold),
            jnp.float32(cfg.nonspeech_prob),
            jnp.asarray(arr["active"]),
            engine.cif_w, engine.cif_b,
            dims=engine.dims, max_steps=cfg.max_steps, eot=tokenizer.eot,
            ts_begin=tokenizer.timestamp_begin, no_speech_tok=tokenizer.no_speech,
            space_tok=tokenizer.encode(" ")[0],
            xkv_f8=cfg.xkv_f8, xkv_transposed=getattr(cfg, "xkv_transposed", True),
            tail_frames=cfg.enc_tail_frames,
        )
        (g.k, g.v, enc_pool.pool, g.skv_k, g.skv_v,
         g.asum, g.asq, g.alast, g.acount, g.tok) = raw[1:]

        def fetch():
            slot_outs = _scatter_outputs(raw[0], G, engine.cfg.max_steps)
            return [slot_outs[sl] for sl in slot_of]

        return fetch

    return _dispatch_pooled_recovering(
        call, engine, xkv, gi, enc_pool, ticks, tokenizer, pool, mode_key
    )


def _dispatch_group_xkv_anchor(engine, ticks, tokenizer, pool, enc_pool, xkv, gi):
    """Anchor ticks writing into a group's cross-KV pool rows.

    A majority of the group anchoring together (the epoch-synchronized
    eviction case) runs the whole-group program (in-place layer-scanned pool
    rebuild — no dense [L,G,H,Dh,T] transient); small subsets (session join,
    resets) run the slot-scatter program in chunks so the dense per-chunk
    cross-KV transient stays bounded.

    The whole-group program's working set (full-window encode of G lanes +
    prefill) needs several GB of transient HBM on top of every resident
    group's pools; on a 16 GB v5e it RESOURCE_EXHAUSTs once other groups'
    pools eat the headroom (observed e2e r3 at n=40). The budget guard
    (_whole_group_anchor_fits) asks XLA for the program's temp size and
    routes to the chunked slot-scatter path (~2 GB transient per 8-lane
    chunk) when it cannot fit; if a pooled program still dies, the donated
    pools are rebuilt and the lanes served via the legacy program
    (_dispatch_pooled_recovering) instead of cascading into a serving outage."""
    g = xkv.groups[gi]
    G = g.group_width
    if len(ticks) >= max(2, G // 2) and _whole_group_anchor_fits(
        engine, xkv, gi, G, max(engine.bucket_for(len(t.prefix_ids)) for t in ticks)
    ):
        p_max = max(engine.bucket_for(len(t.prefix_ids)) for t in ticks)
        arr = _collect_lane_arrays(engine, ticks, tokenizer, G, p_max)
        slot_of = [t.xkv_slot for t in ticks]
        perm = np.full(G, -1, np.int32)
        for i, sl in enumerate(slot_of):
            perm[sl] = i
        for k, v in arr.items():
            out = np.zeros((G,) + v.shape[1:], v.dtype)
            for sl in range(G):
                if perm[sl] >= 0:
                    out[sl] = v[perm[sl]]
            arr[k] = out
        lanes = [0] * G  # absent slots gather a throwaway row (inactive)
        enc_lanes = np.full(G, EncPool.SCRATCH, np.int32)
        for t in ticks:
            lanes[t.xkv_slot] = t.pool_lane
            enc_lanes[t.xkv_slot] = t.enc_lane
        audio = pool.gather(lanes)
        args, statics = _core_device_args(engine, arr, tokenizer, p_max)

        def call():
            raw = _A.alignatt_tick_anchor_group(
                engine.params, jnp.asarray(audio), g.k, g.v, enc_pool.pool,
                g.skv_k, g.skv_v, g.asum, g.asq, g.alast, g.acount, g.tok,
                jnp.asarray(enc_lanes), *args, **statics,
            )
            (g.k, g.v, enc_pool.pool, g.skv_k, g.skv_v,
             g.asum, g.asq, g.alast, g.acount, g.tok) = raw[1:]

            def fetch():
                slot_outs = _scatter_outputs(raw[0], G, engine.cfg.max_steps)
                return [slot_outs[sl] for sl in slot_of]

            return fetch

        return _dispatch_pooled_recovering(
            call, engine, xkv, gi, enc_pool, ticks, tokenizer, pool,
            "anchor_group",
        )

    fetches: List = []
    CHUNK = 8  # dense cross-KV transient ~2 GB at large-v3
    CHUNK_SMALL = 4  # measured e2e: anchor calls average ~4 lanes (epoch
    #                  waves spread across scheduler windows), so half the
    #                  calls padded 4 idle lanes' worth of full-window
    #                  encode into the 8-wide program; a second compiled
    #                  width serves small calls at ~half the encode cost
    for c0 in range(0, len(ticks), CHUNK):
        chunk = ticks[c0 : c0 + CHUNK]
        n = len(chunk)
        # TWO compiled shapes for every chunked anchor (capped engines): a
        # chunk pads to CHUNK_SMALL or the full CHUNK width and every
        # prefix pads to the cap's bucket. Joins waste a little prefill;
        # serving never stalls on a fresh (width, bucket) compile
        # mid-stream (the r3 e2e runs spent most of their measured window
        # compiling straggler anchor shapes — wall 798 s for a 60 s run at
        # n=40).
        if engine.serving_prefix_cap:
            B = CHUNK_SMALL if n <= CHUNK_SMALL else CHUNK
            p_max = engine.bucket_for(engine.serving_prefix_cap)
        else:
            B = 1 << (n - 1).bit_length()
            p_max = max(engine.bucket_for(len(t.prefix_ids)) for t in chunk)
        arr = _collect_lane_arrays(engine, chunk, tokenizer, B, p_max)
        audio = _gather_full_audio(chunk, pool, B)
        slots = np.full(B, G, np.int32)  # padded lanes -> OOB, dropped
        enc_lanes = np.full(B, EncPool.SCRATCH, np.int32)
        for i, t in enumerate(chunk):
            slots[i] = t.xkv_slot
            enc_lanes[i] = t.enc_lane
        args, statics = _core_device_args(engine, arr, tokenizer, p_max)

        def call(audio=audio, enc_lanes=enc_lanes, slots=slots, args=args,
                 statics=statics, n=n):
            raw = _A.alignatt_tick_anchor_pooled(
                engine.params, audio, g.k, g.v, enc_pool.pool,
                g.skv_k, g.skv_v, g.asum, g.asq, g.alast, g.acount, g.tok,
                jnp.asarray(enc_lanes), jnp.asarray(slots), *args, **statics,
            )
            (g.k, g.v, enc_pool.pool, g.skv_k, g.skv_v,
             g.asum, g.asq, g.alast, g.acount, g.tok) = raw[1:]
            return lambda: _scatter_outputs(raw[0], n, engine.cfg.max_steps)

        # chunks chain through the donated pool refs, so later dispatches
        # enqueue immediately behind earlier ones; all fetches defer
        fetches.append(
            _dispatch_pooled_recovering(
                call, engine, xkv, gi, enc_pool, chunk, tokenizer, pool,
                "anchor_pooled",
            )
        )
    return lambda: [o for f in fetches for o in f()]
