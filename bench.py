"""Driver benchmark: concurrent real-time streaming capacity of one chip.

Measures the AlignAtt streaming tick packed over B lanes, for the models
that matter (whisper base / large-v3-turbo / large-v3), in the production
configuration: **group-resident cross-KV cache** (XKVGroupPool — columns
live in HBM per lane-slot; the tick re-encodes only the window tail and
projects only the tail's cross-KV: alignatt_tick_inc_pooled) with the
whole-group re-anchor amortized once per eviction block
(alignatt_tick_anchor_group; the scheduler epoch-synchronizes group
evictions), 8 gated decode steps per tick (a realistic token rate), audio
resident in HBM (AudioPool). Pool dtype sweeps bf16 (exact — pooled ticks
match the legacy program bitwise) and f8_e4m3 (capacity mode,
cfg.xkv_cache_dtype="f8": half the pool HBM and ~11% more streams).

Capacity model: each live session needs one tick per TICK_SECONDS of audio;
the scheduler packs lanes into groups of B and rotates groups within the
second (engine/scheduler.py lane-group rotation), so sustainable streams =
max over B of B / amortized_tick_time(B), with per-tick latency bounding
word-emission latency.

Headline metric (BASELINE.json north-star): concurrent real-time streams
per chip at **large-v3** (target ≥64). vs_baseline divides by the
reference's best large-model streaming figure: faster-whisper SimulStreaming
large-v3-turbo compute-aware RTF 0.144 on H100 (BASELINE.md) = 6.94
perfectly time-sliced real-time sessions.

Weights are random (no network in the bench environment); compute cost is
weight-independent because the decode step count is pinned (gates disabled).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

TICK_SECONDS = 1.0       # audio consumed per tick per lane
DECODE_STEPS = 8         # pinned decode work per tick (~ realistic token rate)
PREFIX_BUCKET = 64
# pooled-serving (xkv) arms model the production prefix policy: the decode
# prefix is capped at serving_prefix_cap=96 (context trimmed first —
# AlignAttSession.trim_context), the self-KV pool is cap+steps+2 rows, and
# anchors prefill at the 96 bucket with a near-full prefix (steady-state
# worst case: context + sot + ~1 evict-block of committed tokens)
SERVING_PREFIX_CAP = 96
SERVING_COMMIT_BUDGET = 16  # pool-width slack past the cap (config
                            # serving_commit_budget default): mid-epoch
                            # commits grow the prefix instead of trimming
                            # the head; widths here must match production
SERVING_PLEN = 90
ANCHOR_EVERY = 15.0      # ticks between full re-anchors (evict block = 15 s,
                         # the production default: audio_max_len/2)
LATENCY_P50_BUDGET_S = 0.5  # BASELINE.json's second clause: p50 word-emission
                            # latency <= 500 ms; the peak picker only admits
                            # arms whose amortized tick fits this budget
EOT = 50257
TS_BEGIN = 50364
NO_SPEECH = 50362
SPACE = 220

# (model, lane-group widths, tail frames, pool dtypes, is_headline)
# tails match the engine's auto defaults (alignatt.AlignAttEngine.__init__)
SWEEP = [
    ("base", (96,), 384, ("enc",), False),       # EncPool path (auto: xkv off <d1280)
    ("large-v3-turbo", (64,), 256, ("bf16",), False),
    # "f8d" = f8 pool + weight-only f8 decoder linears (config decoder_dtype
    # = f8; docs/perf/decoder_f8_v5e.json: 7.6 vs 14.2 ms/step at B=24)
    ("large-v3", (24, 32, 40, 48), 160, ("bf16", "f8", "f8d"), True),
]


def _suppress(dims):
    s = np.zeros(dims.n_vocab, np.float32)
    s[TS_BEGIN:] = -np.inf
    return jnp.asarray(s)


def _align(dims, name):
    from whisperlivekit_tpu.models.whisper.dims import default_alignment_heads

    pairs = np.asarray(default_alignment_heads(dims, name), np.int32).reshape(-1, 2)
    return jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1])


def _core_args(dims, B, rng, suppress_mask, align_layers, align_heads,
               bucket=PREFIX_BUCKET, plen=20):
    prefix = np.full((B, bucket), EOT, np.int32)
    prefix[:, 0:4] = [50258, 50259, 50359, 50363]
    prefix[:, 4:plen] = rng.integers(100, 40000, (B, plen - 4))
    return (
        jnp.asarray(prefix),
        jnp.full((B,), plen, jnp.int32),
        jnp.zeros((B,), jnp.int32),              # sot_index
        jnp.full((B,), 1500, jnp.int32),         # content_frames
        jnp.full((B,), -200, jnp.int32),         # last_attend
        jnp.zeros((B,), bool),                   # is_last
        jnp.full((B,), 10**6, jnp.int32),        # max_new: cap disabled
        suppress_mask,
        align_layers,
        align_heads,
        jnp.int32(-(10**9)),                     # frame_threshold: gate never fires
        jnp.int32(10**9),                        # rewind_threshold: never rewinds
        jnp.float32(2.0),                        # nonspeech_prob: never stops
        jnp.ones((B,), bool),                    # active
        jnp.zeros((dims.n_audio_state,), jnp.float32),
        jnp.float32(0.0),
    )


def _statics(dims):
    return dict(
        dims=dims, p_max=PREFIX_BUCKET, max_steps=DECODE_STEPS, eot=EOT,
        ts_begin=TS_BEGIN, no_speech_tok=NO_SPEECH, space_tok=SPACE,
    )


def time_call(fn, iters=4) -> float:
    # Sync via host readback of the packed per-lane output: block_until_ready
    # is unreliable on the axon platform, and the real pipeline reads the
    # same packed array back every tick, so this is the honest per-tick
    # latency (ticks return ONE packed int32 array — each extra fresh-array
    # fetch costs a full ~40 ms tunnel round-trip).
    np.asarray(fn()[0])  # warmup + compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
        np.asarray(out[0])
    return (time.perf_counter() - t0) / iters


#: fallback headroom for the programs' XLA temp buffers when AOT memory
#: analysis is unavailable (measured: B=32 bf16 resident ~11.6 GB ran, B=40
#: bf16 ~13.8 GB RESOURCE_EXHAUSTed on a 15.75 GB v5e)
_TEMP_MARGIN = 3 << 30
#: allocator-fragmentation + host-transfer headroom on top of the compiler's
#: exact temp figure
_TEMP_SAFETY = 768 << 20


def _arm_temp_bytes(dims, B: int, pool_dt, K_al: int, tail_frames: int,
                    params) -> int | None:
    """Exact XLA temp-buffer bytes for this pooled arm's programs (AOT
    lowering — nothing allocates on device), max over the inc tick and the
    whole-group anchor. The blanket _TEMP_MARGIN under-counted the B=40
    bf16 anchor's temps in r4 (BENCH_r04: FAILED JaxRuntimeError on an arm
    the precheck passed): temps scale with B and pool dtype, so read them
    from the compiler the way the serving allocator's whole-group-anchor
    guard does (alignatt._anchor_group_temp_bytes). The compile also
    populates the persistent compile cache, so a runnable arm pays nothing
    extra at run time. Returns None when lowering fails (fallback margin)."""
    from whisperlivekit_tpu.streaming import alignatt as A

    try:
        sds = jax.ShapeDtypeStruct
        p_sds = jax.tree.map(lambda x: sds(x.shape, x.dtype), params)
        L, H, Dh = dims.n_text_layer, dims.n_text_head, dims.head_dim
        T, d = dims.n_audio_ctx, dims.n_audio_state
        Tp = -(-T // 128) * 128
        Wc = SERVING_PREFIX_CAP + SERVING_COMMIT_BUDGET + DECODE_STEPS + 2
        kv = sds((L, B, H, Dh, Tp), pool_dt)
        skv = sds((L, B, Wc, H, Dh), jnp.bfloat16)
        stat = sds((B, K_al, T), jnp.float32)
        i32 = lambda *s: sds(s, jnp.int32)  # noqa: E731
        pools = (
            sds((B, 16000 * 30), jnp.int16), kv, kv,
            sds((B + 1, T, d), jnp.bfloat16), skv, skv, stat, stat, stat,
            sds((B,), jnp.float32), i32(B, dims.n_text_ctx),
        )
        core_tail = (  # content_frames .. cif_b (bench _core_args[3:])
            i32(B), i32(B), sds((B,), bool), i32(B),
            sds((dims.n_vocab,), jnp.float32),
            sds((K_al,), jnp.int32), sds((K_al,), jnp.int32),
            sds((), jnp.int32), sds((), jnp.int32), sds((), jnp.float32),
            sds((B,), bool), sds((d,), jnp.float32), sds((), jnp.float32),
        )
        skv_statics = dict(
            dims=dims, max_steps=DECODE_STEPS, eot=EOT, ts_begin=TS_BEGIN,
            no_speech_tok=NO_SPEECH, space_tok=SPACE,
        )
        t_inc = int(getattr(
            A.alignatt_tick_inc_skv.lower(
                p_sds, *pools,
                i32(B), i32(B), i32(B), i32(B), i32(B),
                i32(B, A.SKV_REFRESH_ROWS), i32(B, A.SKV_REFRESH_ROWS),
                i32(B), *core_tail,
                **skv_statics, tail_frames=tail_frames,
            ).compile().memory_analysis(),
            "temp_size_in_bytes", 0,
        ))
        t_anchor = int(getattr(
            A.alignatt_tick_anchor_group.lower(
                p_sds, *pools,
                i32(B),                           # enc_lanes
                i32(B, SERVING_PREFIX_CAP), i32(B), i32(B), *core_tail,
                **skv_statics, p_max=SERVING_PREFIX_CAP,
            ).compile().memory_analysis(),
            "temp_size_in_bytes", 0,
        ))
        return max(t_inc, t_anchor)
    except Exception as e:
        print(f"AOT temp probe failed at B={B}: {e}", file=sys.stderr, flush=True)
        return None


def _hbm_limit() -> int:
    try:
        return int(jax.local_devices()[0].memory_stats()["bytes_limit"])
    except Exception:
        return int(15.75 * (1 << 30))


def _arm_resident_bytes(dims, B: int, pool_dt, Wc: int, K_al: int) -> int:
    """Resident HBM of one pooled arm: params + cross-KV/self-KV pools +
    encoder rows + align stats + audio windows."""
    Tp = -(-dims.n_audio_ctx // 128) * 128
    d = dims.n_audio_state
    p_bytes = (
        2 * (dims.n_audio_layer + dims.n_text_layer) * 12 * d * d  # qkvo+mlp
        + 2 * dims.n_vocab * d
    )
    kv = 2 * dims.n_text_layer * B * dims.n_text_head * dims.head_dim * Tp
    kv *= jnp.dtype(pool_dt).itemsize
    skv = 2 * dims.n_text_layer * B * Wc * dims.n_text_head * dims.head_dim * 2
    enc = (B + 1) * dims.n_audio_ctx * d * 2
    stats = 3 * B * K_al * dims.n_audio_ctx * 4
    audio = B * 16000 * 30 * 2
    return p_bytes + kv + skv + enc + stats + audio


def bench_model(name: str, widths, results: dict, tail_frames=384, dtypes=("bf16",)) -> float:
    from whisperlivekit_tpu.models.whisper import model as wm
    from whisperlivekit_tpu.models.whisper.dims import MODEL_DIMS
    from whisperlivekit_tpu.streaming import alignatt as A

    dims = MODEL_DIMS[name]
    base_params = wm.init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    q_params = None  # built lazily for the f8d arm
    rng = np.random.default_rng(0)
    suppress_mask = _suppress(dims)
    align_layers, align_heads = _align(dims, name)
    statics = _statics(dims)

    # Two peaks: the unconstrained max and the latency-honest one. The
    # north-star (BASELINE.json) has TWO clauses — streams AND p50
    # word-emission <= 500 ms; the amortized tick latency bounds word
    # emission (a word waits at most one tick), so the headline peak only
    # admits arms with amortized tick <= LATENCY_P50_BUDGET_S.
    best_streams, best_B, best_lat = 0.0, 0, 0.0
    raw_streams, raw_B, raw_lat = 0.0, 0, 0.0
    for B in widths:
      for dt_name in dtypes:
        dt = jnp.float8_e4m3fn if dt_name in ("f8", "f8d") else jnp.bfloat16
        if dt_name == "f8d":
            if q_params is None:
                q_params = wm.quantize_decoder_f8(base_params)
            params = q_params
        else:
            params = base_params
        if dt_name != "enc":
            # budget precheck: an arm whose resident pools + program temp
            # cannot fit is SKIPPED (the serving allocator would never build
            # this configuration), not run to a destructive OOM that poisons
            # the process allocator for later arms
            est = _arm_resident_bytes(
                dims, B, dt,
                SERVING_PREFIX_CAP + SERVING_COMMIT_BUDGET + DECODE_STEPS + 2,
                int(align_layers.shape[0]),
            )
            temp = _arm_temp_bytes(
                dims, B, dt, int(align_layers.shape[0]), tail_frames, params
            )
            need = temp + _TEMP_SAFETY if temp is not None else _TEMP_MARGIN
            if est + need > _hbm_limit():
                tstr = f"{need / (1 << 30):.1f}G temp" if temp is not None else "temp"
                results[f"{name}_B{B}_{dt_name}"] = (
                    f"SKIPPED resident {est / (1 << 30):.1f}G + {tstr} > HBM"
                )
                print(
                    f"{name} B={B} {dt_name}: skipped (resident "
                    f"{est / (1 << 30):.1f}G + {tstr} exceeds HBM budget)",
                    file=sys.stderr, flush=True,
                )
                continue
        try:
            audio_pool = jnp.asarray(
                (rng.integers(-3000, 3000, (B, 16000 * 30))).astype(np.int16)
            )
            if dt_name == "enc":
                core = _core_args(dims, B, rng, suppress_mask, align_layers, align_heads)
            else:
                core = _core_args(
                    dims, B, rng, suppress_mask, align_layers, align_heads,
                    bucket=SERVING_PREFIX_CAP, plen=SERVING_PLEN,
                )
            lanes = jnp.arange(B, dtype=jnp.int32)
            tail_start = jnp.full((B,), 1500 - tail_frames, jnp.int32)
            win = jnp.full((B,), 1500, jnp.int32)
            write_start = jnp.full((B,), 1500 - 50 - 32, jnp.int32)  # 1 s + margin
            if dt_name == "enc":
                enc_pool = jnp.zeros(
                    (B + 1, dims.n_audio_ctx, dims.n_audio_state), jnp.bfloat16
                )
                enc_lanes = lanes + 1
                state = {"enc_pool": enc_pool}

                def inc_tick():
                    out = A.alignatt_tick_inc(
                        params, audio_pool, state["enc_pool"], lanes, enc_lanes,
                        tail_start, win, write_start, *core,
                        **statics, tail_frames=tail_frames,
                    )
                    state["enc_pool"] = out[-1]
                    return out

                def anchor_tick():
                    out = A.alignatt_tick_anchor(
                        params, audio_pool, state["enc_pool"], enc_lanes,
                        *core, **statics,
                    )
                    state["enc_pool"] = out[-1]
                    return out
            else:
                shape = (
                    dims.n_text_layer, B, dims.n_text_head, dims.head_dim,
                    -(-dims.n_audio_ctx // 128) * 128,
                )
                enc_lanes = lanes + 1
                # serving self-KV width = the production prefix cap
                # (XKVAllocator.for_engine): the decode loop COPIES the pool
                # every step (scan restacking), so width is ~linear in tick
                # time — top-bucket sizing (266 rows) was the r3 capacity
                # regression (docs/perf/probe_skv_width.json)
                Wc = SERVING_PREFIX_CAP + SERVING_COMMIT_BUDGET + DECODE_STEPS + 2
                sshape = (dims.n_text_layer, B, Wc, dims.n_text_head, dims.head_dim)
                K_al = int(align_layers.shape[0])
                state = {
                    "k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt),
                    "enc": jnp.zeros(
                        (B + 1, dims.n_audio_ctx, dims.n_audio_state), jnp.bfloat16
                    ),
                    "sk": jnp.zeros(sshape, jnp.bfloat16),
                    "sv": jnp.zeros(sshape, jnp.bfloat16),
                    "asum": jnp.zeros((B, K_al, dims.n_audio_ctx), jnp.float32),
                    "asq": jnp.zeros((B, K_al, dims.n_audio_ctx), jnp.float32),
                    "alast": jnp.zeros((B, K_al, dims.n_audio_ctx), jnp.float32),
                    "acount": jnp.zeros((B,), jnp.float32),
                    "tok": jnp.zeros((B, dims.n_text_ctx), jnp.int32),
                }
                _SKV_KEYS = (
                    "k", "v", "enc", "sk", "sv", "asum", "asq", "alast",
                    "acount", "tok",
                )
                # refresh plan: sot row (pos 0) + the last 7 prefix rows —
                # exactly the serving plan (_skv_refresh_plan)
                r_pos = np.full((B, A.SKV_REFRESH_ROWS), Wc - 1, np.int32)
                r_pos[:, 0] = 0
                r_pos[:, 1:] = np.arange(SERVING_PLEN - 7, SERVING_PLEN)[None, :]
                r_tok = np.full((B, A.SKV_REFRESH_ROWS), EOT, np.int32)
                r_tok[:, 0] = 50258
                r_tok[:, 1:] = rng.integers(100, 40000, (B, 7))
                r_pos_j, r_tok_j = jnp.asarray(r_pos), jnp.asarray(r_tok)
                skv_statics = dict(
                    dims=dims, max_steps=DECODE_STEPS, eot=EOT,
                    ts_begin=TS_BEGIN, no_speech_tok=NO_SPEECH, space_tok=SPACE,
                )
                anchor_statics = dict(statics, p_max=SERVING_PREFIX_CAP)

                def inc_tick():
                    # core layout: prefix, prefix_len, sot_index, then the
                    # 13 args the skv program shares from content_frames on
                    out = A.alignatt_tick_inc_skv(
                        params, audio_pool, state["k"], state["v"], state["enc"],
                        state["sk"], state["sv"], state["asum"], state["asq"],
                        state["alast"], state["acount"], state["tok"],
                        lanes, enc_lanes, tail_start, win, write_start,
                        r_tok_j, r_pos_j, core[1], *core[3:],
                        **skv_statics, tail_frames=tail_frames,
                    )
                    for key, vv in zip(_SKV_KEYS, out[1:]):
                        state[key] = vv
                    return out

                def anchor_tick():
                    out = A.alignatt_tick_anchor_group(
                        params, audio_pool, state["k"], state["v"], state["enc"],
                        state["sk"], state["sv"], state["asum"], state["asq"],
                        state["alast"], state["acount"], state["tok"],
                        enc_lanes, *core, **anchor_statics,
                    )
                    for key, vv in zip(_SKV_KEYS, out[1:]):
                        state[key] = vv
                    return out

            t_inc = time_call(inc_tick)
            t_anchor = time_call(anchor_tick, iters=2)
            t_amort = ((ANCHOR_EVERY - 1) * t_inc + t_anchor) / ANCHOR_EVERY
            streams = B * TICK_SECONDS / t_amort if t_amort > 0 else 0.0
            results[f"{name}_B{B}_{dt_name}"] = {
                "inc_ms": round(t_inc * 1e3, 1),
                "anchor_ms": round(t_anchor * 1e3, 1),
                "amortized_ms": round(t_amort * 1e3, 1),
                "streams": round(streams, 1),
            }
            print(
                f"{name} B={B} {dt_name}: inc={t_inc*1e3:.1f} ms anchor={t_anchor*1e3:.1f} ms "
                f"amortized={t_amort*1e3:.1f} ms -> {streams:.1f} streams",
                file=sys.stderr, flush=True,
            )
            # f8d (quantized decoder weights) is reported but kept out of
            # the headline until its transcript-quality A/B is pinned
            # (VERDICT r2 #5: "quality-gated"); rollout agreement under
            # random weights is chaotic-worst-case only.
            if dt_name != "f8d":
                if streams > raw_streams:
                    raw_streams, raw_B, raw_lat = streams, B, t_amort
                if streams > best_streams and t_amort <= LATENCY_P50_BUDGET_S:
                    best_streams, best_B, best_lat = streams, B, t_amort
        except Exception as e:
            print(f"{name} B={B} {dt_name}: failed ({type(e).__name__})", file=sys.stderr, flush=True)
            results[f"{name}_B{B}_{dt_name}"] = f"FAILED {type(e).__name__}"
        finally:
            # a failed arm (HBM OOM) must not leak its pools into the next
            # arm's allocation budget — r4 saw a bf16 B=40 OOM poison the
            # f8/f8d B=40 arms that fit on their own
            audio_pool = core = state = inc_tick = anchor_tick = None  # noqa: F841
            import gc

            gc.collect()
    print(
        f"{name}: peak {best_streams:.1f} streams at B={best_B} "
        f"(p50 tick latency {best_lat*1e3:.0f} ms, <= "
        f"{LATENCY_P50_BUDGET_S*1e3:.0f} ms budget; unconstrained "
        f"{raw_streams:.1f} at B={raw_B}, {raw_lat*1e3:.0f} ms)",
        file=sys.stderr, flush=True,
    )
    results[f"{name}_peak_streams"] = round(best_streams, 1)
    results[f"{name}_peak_streams_unconstrained"] = round(raw_streams, 1)
    results[f"{name}_peak_tick_ms"] = round(best_lat * 1e3, 1)
    return best_streams


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="also write the full sweep as a JSON artifact "
                    "(consumed by scripts/gen_capacity_table.py — the ONE "
                    "source the capacity docs are generated from)")
    ap.add_argument("--round", default=None, help="stamp for --out")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from whisperlivekit_tpu.compile_cache import enable_compile_cache

    enable_compile_cache()
    results: dict = {}
    headline = 0.0
    for name, widths, tail, dtypes, is_headline in SWEEP:
        streams = bench_model(name, widths, results, tail_frames=tail, dtypes=dtypes)
        if is_headline:
            headline = streams

    baseline_streams = 1.0 / 0.144  # reference fw SS large-v3-turbo aware RTF, H100
    print(json.dumps({"sub_metrics": results}), file=sys.stderr, flush=True)
    headline_obj = {
        "metric": "concurrent_realtime_streams_per_chip_whisper_large_v3",
        "value": round(headline, 1),
        "unit": "streams",
        "vs_baseline": round(headline / baseline_streams, 2),
    }
    if args.out:
        import platform

        with open(args.out, "w") as f:
            json.dump({
                "round": args.round,
                "device": str(jax.devices()[0]),
                "platform": platform.platform(),
                "headline": headline_obj,
                "sub_metrics": results,
            }, f, indent=1)
            f.write("\n")
    print(json.dumps(headline_obj))


if __name__ == "__main__":
    main()
