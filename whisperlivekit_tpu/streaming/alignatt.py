"""AlignAtt / SimulStreaming policy on TPU — the flagship streaming path.

Behavioral port of the reference's AlignAtt decode loop (reference
simul_whisper/align_att_base.py:174-322 + simul_whisper/simul_whisper.py)
restructured so one *tick* = one jitted device program:

    mel → encoder → cross-KV → prefill(prefix) → lax.while_loop of
    (filter → DRY → argmax → attention gate / rewind / EOT decisions)

Reference inversions for TPU:

- The reference's per-token host loop (decode 1 token → softmax attn →
  z-norm → median filter → argmax on host) becomes an in-graph loop; only
  the final (tokens, frames, reason) leave the device once per tick.
- Attention statistics use running mean/variance accumulators per
  (head, frame) instead of materializing the token-axis history
  (reference keeps the last 16 attention entries,
  simul_whisper/align_att_base.py:226-229; the running form is exact while
  an infer emits ≤16 tokens — the overwhelmingly common case — and only
  the normalization window differs beyond that).
- The DRY repetition penalty (align_att_base.py:492-537) is vectorized over
  match lengths instead of dict-based host scanning.
- Lanes are batched: the same program serves B sessions at different decode
  depths (per-lane prefix_len/content_frames/stop state) — this is what the
  multi-session scheduler packs.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.mel import N_SAMPLES, SAMPLE_RATE, TOKENS_PER_SECOND, log_mel_spectrogram, pad_or_trim
from ..models.whisper import model as wm
from ..models.whisper.dims import ModelDimensions, default_alignment_heads
from ..models.whisper.tokenizer import Tokenizer
from ..ops.median import median_filter
from ..timed import ASRToken

logger = logging.getLogger(__name__)

DEC_PAD = 50257  # tokens >= this are special (reference align_att_base.py:10)

# stop reasons
RUNNING, STOP_EOT, STOP_GATE, STOP_REWIND, STOP_NOSPEECH, STOP_CAP, STOP_CTX = range(7)

# Encoder-row refresh width: inc ticks rewrite the cached encoder rows over
# at least the last XKV_WRITE_BLOCK columns of each lane's window (matching
# the cross-KV pool's aligned splice source, ops/xkv_merge.W_SPLICE / 2);
# the session plan re-anchors when a catch-up burst leaves older frames
# unsynced.
XKV_WRITE_BLOCK = 128

#: skip the last decode step's compute for exited lanes via lax.cond
#: (A/B knob: the cond's branch capture can force defensive copies of the
#: aliased cross-KV pools — measured via scripts/probe_merge_cost.py)
DEAD_DECODE_SKIP = True

#: rows per self-KV refresh decode (alignatt_tick_inc_skv): slot 0 re-decodes
#: the sot row (fresh no_speech_p), slot R-1 the last prefix row (fresh
#: first-token logits + gate attention); the middle slots absorb this tick's
#: prefix delta (pending-UTF8 commits land up to a few rows behind the tail).
#: 8 = the flash-prefill sublane granularity; bursts beyond R-1 delta rows
#: force a (chunked) anchor for that lane instead.
SKV_REFRESH_ROWS = 8


@dataclass
class AlignAttConfig:
    """Policy knobs (reference simul_whisper/config.py:5-23)."""

    segment_length: float = 0.5
    frame_threshold: int = 25
    rewind_threshold: int = 200
    audio_max_len: float = 30.0
    audio_min_len: float = 0.0
    nonspeech_prob: float = 0.5
    language: str = "auto"
    task: str = "transcribe"
    decoder_type: str = "greedy"
    beam_size: int = 1
    init_prompt: Optional[str] = None
    static_init_prompt: Optional[str] = None
    max_context_tokens: Optional[int] = None
    never_fire: bool = False
    cif_ckpt_path: Optional[str] = None
    max_steps: int = 8   # static per-tick decode budget (device loop bound).
                         # A ~1 s tick rarely commits >5 tokens; exhaustion
                         # KEEPS decoded tokens and the next tick continues
                         # (STOP_CAP handling), and final flushes drain in a
                         # host loop (simul_processor._FINAL_DRAIN_TICKS) —
                         # so 8 bounds the worst lane's hold of a 24-lane
                         # group (each junk step is ~8-14 ms all lanes pay)
                         # and shrinks the self-KV pool + program temps.
    # incremental encoding (EncPool): net-new TPU throughput mode — frames
    # are encoded once and cached; each tick re-encodes only the window tail
    enc_tail_frames: int = 0     # tail length (enc frames); 0 = auto by model
                                 # class: 384 (<=d512), 256 (turbo), 160
                                 # (large-v3 class — the capacity sweet spot,
                                 # docs/perf/xkv_pool_tick_v5e.json; fresh
                                 # frames keep >=1.5 s left context and every
                                 # eviction block re-anchors the window)
    enc_rewrite_margin: int = 32 # trailing frames re-encoded every tick so a
                                 # frame freezes only after 0.64 s of right ctx
    evict_block_s: float = 0.0   # 0 = audio_max_len/2 when enc caching is on
                                 # (anchor re-encodes amortize 1-in-15 ticks;
                                 # the window hovers 15-30 s)
    xkv_f8: bool = False         # store cross-KV in f8_e4m3 (memory mode:
                                 # halves cross-KV HBM footprint; SLOWER than
                                 # xkv_transposed on v5e — the per-layer cast
                                 # materializes a bf16 copy)
    xkv_transposed: bool = True  # [B,H,Dh,T] cross-KV layout: decode step
                                 # 6.0 vs 15.0 ms (B=16 large-v3 v5e) with
                                 # exact bf16 numerics; scripts/probe_xattn_tpu.py
    mel_pallas: bool = False     # fused Pallas log-mel for full-window ticks
                                 # (wins at B>=32 on v5e: docs/perf/mel_ab_v5e.json)
    # group-resident cross-KV cache (XKVGroupPool): the incremental tick
    # skips the full-window cross-KV projection entirely — columns live in
    # HBM per (group, slot) and only the tail is projected per tick
    # (docs/perf/xkv_pool_tick_v5e.json: large-v3 B=24 63.0 streams f8 /
    # 56.7 bf16-exact vs 54.8 for projection-per-tick)
    xkv_cache: object = "auto"   # group cross-KV cache: "auto" = on for
                                 # d>=1280 models (the projection it removes
                                 # is negligible below that; base measured
                                 # ~4% FASTER on the plain EncPool path)
    xkv_cache_dtype: str = "bf16"  # "bf16" = exact (pooled == legacy bitwise);
                                   # "f8" = f8_e4m3 storage: ~11% more streams
                                   # + half the pool HBM, last-bit logits drift
    xkv_budget_bytes: int = 9 << 30  # HBM cap for all groups' pools — cross-KV
                                     # + self-KV + gate stats (auto group
                                     # count; large-v3 f8 xkv + bf16 skv is
                                     # ~4.2 GB/group of 24 → 2 groups)
    anchor_cohorts: int = 1      # stagger group re-anchors over this many
                                 # sub-epochs (slot % cohorts): 1 = whole
                                 # group anchors at once (max batching, ~1 s
                                 # stall at large-v3); 3 = only ~G/3 lanes
                                 # anchor per stall (p95 word-emission tail)
    serving_prefix_cap: int = 0  # pooled-serving bound on the decode prefix
                                 # (context + sot + in-window committed
                                 # tokens). Sizes the self-KV pool width
                                 # (cap + max_steps + 2): the decode loop
                                 # copies the pool every step (lax.scan
                                 # restacking), so tick time scales ~linearly
                                 # with it — sizing pools to the TOP prefix
                                 # bucket (266 rows) regressed capacity 73.5
                                 # -> 58.9 streams and OOM'd B=32 (r3); cap 96
                                 # measured 356 ms vs 581 at B=32 f8
                                 # (docs/perf/probe_skv_width.json). Context
                                 # is trimmed FIRST to fit the cap, so the
                                 # effective text history is still the last
                                 # ~cap tokens (context IS scrolled committed
                                 # history); the reference instead lets the
                                 # prompt reach n_text_ctx - 20 ~= 428
                                 # (reference align_att_base.py:100-113) —
                                 # see docs/perf/README.md for the measured
                                 # capacity cost of wider caps.
                                 # 0 = auto: 96 when the xkv group pools are
                                 # on, uncapped otherwise.
    serving_commit_budget: int = 16  # extra self-KV pool rows past the cap:
                                 # mid-epoch commits grow the prefix into
                                 # this slack instead of trimming the head
                                 # (a head trim shifts every row's position,
                                 # missing the slim refresh plan and forcing
                                 # the padded full-width refresh for the
                                 # whole group tick — measured e2e n=24:
                                 # fullrefresh.head_shift 829/265 inc ticks,
                                 # inflating the group tick 2.5x). Trims
                                 # align with eviction anchors instead,
                                 # which pay a full prefill anyway. Costs
                                 # ~1.4 ms/row on the B=32 f8 tick
                                 # (probe_skv_width.json linearity).



# ---------------------------------------------------------------------------
# In-graph DRY repetition penalty
# ---------------------------------------------------------------------------


def dry_penalty(logits: jnp.ndarray, tokens: jnp.ndarray, cur_len: jnp.ndarray, eot: int):
    """Vectorized DRY v0 (reference align_att_base.py:492-537).

    logits [B,V], tokens [B,L], cur_len [B]. Penalizes tokens that would
    extend a verbatim repetition of the current suffix.
    """
    B, L = tokens.shape
    V = logits.shape[-1]
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]  # [1,L]
    last = jnp.take_along_axis(tokens, (cur_len - 1)[:, None], axis=1)  # [B,1]

    # candidate positions i: tokens[i] == last, i < cur_len-1, next token is text
    next_tok = jnp.roll(tokens, -1, axis=1)
    cand = (tokens == last) & (idx < (cur_len - 1)[:, None]) & (next_tok < eot)

    # match length: consecutive equality of suffixes ending at i vs cur_len-1.
    # A fully-vectorized [B,49,L] formulation was measured SLOWER inside the
    # decode while_loop on v5e (larger per-step working set); the 49-step
    # fori over [B,L] vectors wins.
    def match_step(l, carry):
        length, alive = carry
        j = idx - l                      # position behind candidate
        k = (cur_len - 1)[:, None] - l   # position behind suffix end
        ok = (j >= 0) & (k > idx)
        tj = jnp.take_along_axis(tokens, jnp.maximum(j, 0), axis=1)
        tk = jnp.take_along_axis(tokens, jnp.maximum(k, 0), axis=1)
        step_ok = ok & (tj == tk) & (tj < eot)
        alive = alive & step_ok
        return length + alive.astype(jnp.int32), alive

    length, _ = jax.lax.fori_loop(
        1, 50, match_step, (jnp.ones((B, L), jnp.int32), cand)
    )

    pen_len = jnp.where(cand, length, 0)
    # scatter-max per next-token id
    pen_per_tok = jnp.zeros((B, V), jnp.int32).at[
        jnp.arange(B)[:, None], jnp.where(cand, next_tok, 0)
    ].max(pen_len)
    penalty = jnp.where(
        pen_per_tok >= 2, 2.0 ** (pen_per_tok.astype(jnp.float32) - 2.0), 0.0
    )
    apply = (cur_len >= 5)[:, None] & (last < eot)
    return logits - jnp.where(apply, penalty, 0.0)


# ---------------------------------------------------------------------------
# The jitted tick program
# ---------------------------------------------------------------------------


def _tick_front(
    params, audio: jnp.ndarray, dims: ModelDimensions, mel_pallas: bool = False
) -> jnp.ndarray:
    """Full-window front-end: int16/f32 audio [B, N_SAMPLES] -> enc [B, T, D].

    In-graph so one tick is one host->device transfer and zero extra
    dispatches (the mel is never materialized on host). Audio ships as int16
    (PCM's native width) to halve the transfer; conversion is device-side.
    ``mel_pallas`` uses the fused Pallas front-end (faster at lane groups
    >= 32 on v5e — measured A/B in docs/perf/mel_ab_v5e.json).
    """
    if audio.dtype == jnp.int16:
        audio = audio.astype(jnp.float32) / 32768.0
    if mel_pallas:
        from ..ops.mel_pallas import log_mel_pallas

        mel = log_mel_pallas(audio, n_mels=dims.n_mels)
    else:
        mel = log_mel_spectrogram(
            audio, n_mels=dims.n_mels, precision=jax.lax.Precision.DEFAULT
        )
    mel = pad_or_trim(mel, 2 * dims.n_audio_ctx)
    return wm.encode(params, mel, dims)


def _tick_core(
    params,
    enc: jnp.ndarray,            # [B, T, D] encoder features
    prefix: jnp.ndarray,         # [B, p_max] right-padded with eot
    prefix_len: jnp.ndarray,     # [B]
    sot_index: jnp.ndarray,      # [B]
    content_frames: jnp.ndarray, # [B] encoder frames of real audio
    last_attend: jnp.ndarray,    # [B] carry-in attention watermark
    is_last: jnp.ndarray,        # [B] bool
    max_new: jnp.ndarray,        # [B] loop-detection cap
    suppress_mask: jnp.ndarray,  # [V] additive
    align_layers: jnp.ndarray,   # [K]
    align_heads: jnp.ndarray,    # [K]
    frame_threshold: jnp.ndarray,  # scalar
    rewind_threshold: jnp.ndarray, # scalar
    nonspeech_prob: jnp.ndarray,   # scalar
    active_in: jnp.ndarray,      # [B] bool — lanes with work this tick
    cif_w: jnp.ndarray,          # [D] CIF linear weight (zeros when unused)
    cif_b: jnp.ndarray,          # scalar CIF bias
    dims: ModelDimensions,
    p_max: int,
    max_steps: int,
    eot: int,
    ts_begin: int,
    no_speech_tok: int,
    space_tok: int,
    use_cif: bool = False,
    xkv_f8: bool = False,
    xkv_transposed: bool = True,
    xkv_pre: Optional[wm.CrossKV] = None,
    xkv_t_valid: Optional[int] = None,
    skv: Optional[dict] = None,
    cache_width: Optional[int] = None,
    return_state: bool = False,
):
    """The decode phase of one streaming tick (everything after encoding).

    ``xkv_pre`` supplies precomputed cross-attention K/V (the per-group HBM
    cache — see XKVGroupPool); the projection over the full window is then
    skipped entirely. ``enc`` may be None in that mode (CIF excepted).

    ``skv`` supplies the persistent per-group decoder state (see
    SKV design note at alignatt_tick_inc_skv): dict with ``cache``
    (KVCache [L,G,Wc,H,Dh]), ``asum``/``asq``/``alast`` ([G,K,T] f32),
    ``acount`` ([G] f32), ``tok`` ([G,n_text_ctx] i32), ``refresh_tokens``/
    ``refresh_pos`` ([G,R] i32). The full-prefix prefill is then replaced by
    an R-row refresh decode (sot row for no_speech + the last prefix rows
    for fresh logits/gate input against the updated cross-KV); everything
    older rides on cached rows — the reference instead re-prefills the whole
    prompt every infer (reference align_att_base.py:206-214 new_segment
    path + _clean_cache), which is exact but costs O(prefix) decoder passes
    per tick.

    ``return_state=True`` additionally returns (cache, (asum, asq, acount,
    alast), tokens_buf) so anchor ticks can (re)seed the pools."""
    B = enc.shape[0] if enc is not None else xkv_pre.k.shape[1]
    align = wm.AlignSpec(layers=align_layers, heads=align_heads)
    K = align_layers.shape[0]
    T = dims.n_audio_ctx

    # CIF end-of-word fire detection (reference eow_detection.py:28-77):
    # integrate sigmoid alphas over the content frames; fire when the first
    # un-consumed boundary lies within 2 frames of the chunk end.
    if use_cif:
        frame_ids = jnp.arange(T, dtype=jnp.int32)[None, :]
        content_mask = frame_ids < content_frames[:, None]
        alphas = jax.nn.sigmoid(
            jnp.einsum("btd,d->bt", enc.astype(jnp.float32), cif_w) + cif_b
        )
        # zero outside content and at the final content frame (end peak)
        alphas = jnp.where(content_mask & (frame_ids < content_frames[:, None] - 1), alphas, 0.0)
        total = alphas.sum(axis=-1)
        target = jnp.round(total)
        alphas = alphas * jnp.where(total > 0, target / jnp.maximum(total, 1e-6), 0.0)[:, None]
        integrate = jnp.cumsum(alphas, axis=-1)
        exceed = jnp.floor(integrate[:, -1:] / 0.999)
        adjusted = integrate - exceed
        valid = content_mask & (frame_ids < content_frames[:, None] - 1) & (adjusted >= 0)
        first_pos = jnp.argmax(valid, axis=-1)
        has_any = jnp.any(valid, axis=-1)
        fire = has_any & (first_pos >= content_frames - 2)
    else:
        fire = jnp.ones((B,), bool)
    # xkv_transposed ([B,H,Dh,T], T on lanes) is the decode-loop fast path:
    # no tile padding, no operand transposes — 2.5x faster steps than the
    # default layout with exact bf16 numerics. xkv_f8 (per-layer f8 cast,
    # storage only) halves the HBM *footprint* when memory is the binding
    # constraint, at the price of a per-layer bf16 materialization.
    if xkv_pre is not None:
        xkv = xkv_pre
    else:
        xkv = wm.cross_kv(
            params, enc, dims,
            out_dtype=jnp.float8_e4m3fn if xkv_f8 else None,
            transposed=xkv_transposed,
        )

    if skv is not None:
        # ---- self-KV pool fast path: R-row refresh instead of prefill ----
        cache = skv["cache"]
        r_tok, r_pos = skv["refresh_tokens"], skv["refresh_pos"]
        R = r_tok.shape[1]
        w_zero = jnp.zeros((B, R), jnp.float32)
        w_last = (
            jnp.arange(R)[None, :] == (R - 1)
        ).astype(jnp.float32) * active_in.astype(jnp.float32)[:, None]
        refresh_logits, (_, _, fresh_last), cache = wm.decode(
            params, r_tok, jnp.zeros((B,), jnp.int32), xkv, cache, dims,
            align=align, align_reduce=(w_zero, w_last),
            xkv_transposed=xkv_transposed, t_valid=xkv_t_valid,
            positions_override=r_pos,
        )
        asum, asq, acount = skv["asum"], skv["asq"], skv["acount"]
        last_row = jnp.where(active_in[:, None, None], fresh_last, skv["alast"])
        # slot 0 is the sot row by host construction; slot R-1 the last
        # prefix row (fresh logits for the first sampled token)
        no_speech_p = jax.nn.softmax(refresh_logits[:, 0], axis=-1)[:, no_speech_tok]
        logits0 = refresh_logits[:, R - 1]
        # heal the token mirror: scatter the refresh rows' tokens in place
        tokens_buf = skv["tok"]
        tokens_buf = tokens_buf.at[
            jnp.arange(B)[:, None], jnp.minimum(r_pos, dims.n_text_ctx - 1)
        ].set(jnp.where(active_in[:, None], r_tok, jnp.take_along_axis(
            tokens_buf, jnp.minimum(r_pos, dims.n_text_ctx - 1), axis=1)))
    else:
        cache = wm.init_cache(
            dims, B, dtype=params["decoder"]["tok_emb"].dtype,
            width=cache_width or (p_max + max_steps + 1),
        )

        # prefill with in-scan alignment reductions: running stats over the
        # real prefix rows + the last row's attention, all [B,K,T] (the full
        # [K,B,P,T] buffer would cost ~2x its size in HBM traffic per layer)
        row_mask = (jnp.arange(p_max)[None, :] < prefix_len[:, None]).astype(jnp.float32)
        last_onehot = (
            jnp.arange(p_max)[None, :] == (prefix_len - 1)[:, None]
        ).astype(jnp.float32)
        prefill_logits, (asum, asq, last_row), cache = wm.decode(
            params, prefix, jnp.zeros((B,), jnp.int32), xkv, cache, dims,
            align=align, align_reduce=(row_mask, last_onehot),
            xkv_transposed=xkv_transposed, t_valid=xkv_t_valid,
        )
        acount = prefix_len.astype(jnp.float32)

        no_speech_logits = jnp.take_along_axis(
            prefill_logits, sot_index[:, None, None], axis=1
        )[:, 0]
        no_speech_p = jax.nn.softmax(no_speech_logits, axis=-1)[:, no_speech_tok]

        logits0 = jnp.take_along_axis(
            prefill_logits, (prefix_len - 1)[:, None, None], axis=1
        )[:, 0]

        tokens_buf = jnp.full((B, dims.n_text_ctx), eot, jnp.int32)
        tokens_buf = jax.lax.dynamic_update_slice(tokens_buf, prefix, (0, 0))

    frame_idx = jnp.arange(T, dtype=jnp.int32)[None, :]

    init = dict(
        cache=cache,
        tokens=tokens_buf,
        logits=logits0,
        k=jnp.int32(0),
        active=active_in,
        n_keep=jnp.zeros((B,), jnp.int32),
        reason=jnp.where(active_in, RUNNING, STOP_CAP).astype(jnp.int32),
        new_tokens=jnp.full((B, max_steps), eot, jnp.int32),
        frames=jnp.zeros((B, max_steps), jnp.int32),
        asum=asum,
        asq=asq,
        acount=acount,
        last_row=last_row,
        last_attend=last_attend,
    )

    def cond(s):
        return (s["k"] < max_steps) & jnp.any(s["active"])

    def body(s):
        k = s["k"]
        cur_len = prefix_len + k  # [B]

        # ---- logit filters ----
        lg = s["logits"] + suppress_mask[None, :]
        vocab_idx = jnp.arange(lg.shape[-1], dtype=jnp.int32)[None, :]
        blank = (vocab_idx == space_tok) | (vocab_idx == eot)
        lg = jnp.where((k == 0) & blank, -jnp.inf, lg)
        lg = dry_penalty(lg, s["tokens"], cur_len, eot)

        tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        completed = tok == eot

        # ---- attention of the last fed token (gate input) ----
        mean = s["asum"] / jnp.maximum(s["acount"], 1.0)[:, None, None]
        var = s["asq"] / jnp.maximum(s["acount"], 1.0)[:, None, None] - mean * mean
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        z = (s["last_row"] - mean) / (std + 1e-8)
        filt = median_filter(z, 7)           # [B,K,T]
        gatt = filt.mean(axis=1)             # [B,T]
        gatt = jnp.where(frame_idx < content_frames[:, None], gatt, -jnp.inf)
        frame = jnp.argmax(gatt, axis=-1).astype(jnp.int32)  # [B]

        frames = s["frames"].at[:, k].set(jnp.where(s["active"], frame, 0))

        # ---- stop decisions ----
        nospeech_stop = (k == 0) & (no_speech_p > nonspeech_prob)
        prev_tok = jnp.take_along_axis(s["tokens"], (cur_len - 1)[:, None], axis=1)[:, 0]
        special_exempt = prev_tok >= DEC_PAD
        rewind_cond = (~is_last) & (s["last_attend"] - frame > rewind_threshold)
        do_rewind = rewind_cond & ~special_exempt
        new_last_attend = jnp.where(
            rewind_cond & special_exempt,
            frame,
            jnp.where(do_rewind, -rewind_threshold, frame),
        )
        thr = jnp.where(is_last, 4, frame_threshold)
        gate = (content_frames - frame) <= thr
        ctx_full = cur_len + 1 >= dims.n_text_ctx
        cap = (k + 1) > max_new

        stop_keep_k = completed | gate        # drop the new token, keep others
        stop_keep_0 = do_rewind | nospeech_stop | cap
        stop_keep_k1 = ctx_full & ~stop_keep_k & ~stop_keep_0
        stopped_now = (stop_keep_k | stop_keep_0 | stop_keep_k1) & s["active"]

        reason = s["reason"]
        reason = jnp.where(stopped_now & completed, STOP_EOT, reason)
        reason = jnp.where(stopped_now & gate & ~completed, STOP_GATE, reason)
        reason = jnp.where(stopped_now & do_rewind, STOP_REWIND, reason)
        reason = jnp.where(stopped_now & nospeech_stop, STOP_NOSPEECH, reason)
        reason = jnp.where(stopped_now & cap, STOP_CAP, reason)
        reason = jnp.where(stopped_now & stop_keep_k1, STOP_CTX, reason)

        n_keep = jnp.where(
            s["active"],
            jnp.where(
                stop_keep_0, 0,
                jnp.where(stop_keep_k, k, jnp.where(stop_keep_k1, k + 1, k + 1)),
            ),
            s["n_keep"],
        )

        keep_writing = s["active"]
        tokens = s["tokens"].at[jnp.arange(B), jnp.minimum(cur_len, dims.n_text_ctx - 1)].set(
            jnp.where(keep_writing, tok, s["tokens"][jnp.arange(B), jnp.minimum(cur_len, dims.n_text_ctx - 1)])
        )
        new_tokens = s["new_tokens"].at[:, k].set(jnp.where(keep_writing, tok, eot))

        active = s["active"] & ~stopped_now
        last_attend_out = jnp.where(s["active"], new_last_attend, s["last_attend"])

        # ---- decode the sampled token (produces attn row + next logits) ----
        # The loop exits when every lane stopped or k+1 == max_steps; in both
        # cases this step's decoder pass would produce logits/attention no
        # one consumes — skip it (one full decoder pass, ~12 ms at large-v3
        # B=24). Exact: the skipped outputs are dead in the exit state.
        # with a persistent cache (skv), lanes riding along inactive must
        # park their writes on the scratch row (width-1, above any legit
        # fill) instead of corrupting their pooled rows at position 0+k
        pos_w = jnp.minimum(cur_len, dims.n_text_ctx - 1)
        if skv is not None:
            scratch = skv["cache"].k.shape[2] - 1
            pos_w = jnp.where(active_in, pos_w, scratch)

        def _do_decode(cache):
            return wm.decode(
                params,
                tok[:, None],
                pos_w,
                xkv,
                cache,
                dims,
                align=align,
                xkv_transposed=xkv_transposed,
                t_valid=xkv_t_valid,
            )

        def _skip_decode(cache):
            return (
                jnp.zeros((B, 1, dims.n_vocab), jnp.float32),
                jnp.zeros((align.count, B, 1, T), jnp.float32),
                cache,
            )

        will_continue = (k + 1 < max_steps) & jnp.any(active)
        if DEAD_DECODE_SKIP:
            new_logits, step_aprobs, cache = jax.lax.cond(
                will_continue, _do_decode, _skip_decode, s["cache"]
            )
        else:
            new_logits, step_aprobs, cache = _do_decode(s["cache"])
        step_row = step_aprobs.transpose(1, 0, 2, 3)[:, :, 0, :]  # [B,K,T]
        upd = active.astype(jnp.float32)[:, None, None]
        asum = s["asum"] + step_row * upd
        asq = s["asq"] + step_row * step_row * upd
        acount = s["acount"] + active.astype(jnp.float32)
        last_row_n = jnp.where(active[:, None, None], step_row, s["last_row"])

        return dict(
            cache=cache,
            tokens=tokens,
            logits=new_logits[:, 0],
            k=k + 1,
            active=active,
            n_keep=n_keep,
            reason=reason,
            new_tokens=new_tokens,
            frames=frames,
            asum=asum,
            asq=asq,
            acount=acount,
            last_row=last_row_n,
            last_attend=last_attend_out,
        )

    out = jax.lax.while_loop(cond, body, init)
    # lanes still active at loop exhaustion keep everything they decoded
    # (reference breaks out of the token loop with the tokens in hand;
    # dropping them would re-decode + re-drop the same prefix every tick)
    reason = jnp.where(out["active"], STOP_CAP, out["reason"])
    n_keep = jnp.where(out["active"], jnp.int32(max_steps), out["n_keep"])
    # ONE packed int32 output [B, 2*max_steps + 5]: every np.asarray on a
    # fresh device array costs a full tunnel round-trip on the axon
    # platform (~40 ms measured); seven per tick made the host-side scatter
    # ~8x the cost of the fetch itself. Layout: tokens | frames | n_keep |
    # reason | last_attend | fire | no_speech_p (f32 bits).
    packed = jnp.concatenate(
        [
            out["new_tokens"],
            out["frames"],
            n_keep[:, None],
            reason[:, None],
            out["last_attend"][:, None],
            fire.astype(jnp.int32)[:, None],
            jax.lax.bitcast_convert_type(no_speech_p.astype(jnp.float32), jnp.int32)[
                :, None
            ],
        ],
        axis=1,
    )
    if return_state:
        state = (
            out["cache"],
            (out["asum"], out["asq"], out["acount"], out["last_row"]),
            out["tokens"],
        )
        return packed, state
    return packed


_TICK_STATICS = (
    "dims", "p_max", "max_steps", "eot", "ts_begin", "no_speech_tok",
    "space_tok", "use_cif", "xkv_f8", "xkv_transposed", "mel_pallas",
)

@partial(jax.jit, static_argnames=_TICK_STATICS)
def alignatt_tick(
    params, audio,
    prefix, prefix_len, sot_index, content_frames, last_attend, is_last,
    max_new, suppress_mask, align_layers, align_heads, frame_threshold,
    rewind_threshold, nonspeech_prob, active_in, cif_w, cif_b,
    dims, p_max, max_steps, eot, ts_begin, no_speech_tok, space_tok,
    use_cif=False, xkv_f8=False, xkv_transposed=True, mel_pallas=False,
):
    """One streaming tick for B lanes from raw audio [B, N_SAMPLES].

    Returns (new_tokens [B,max_steps], n_keep [B], frames [B,max_steps],
    reason [B], no_speech_prob [B], last_attend_out [B], fire [B])."""
    enc = _tick_front(params, audio, dims, mel_pallas)
    return _tick_core(
        params, enc, prefix, prefix_len, sot_index, content_frames,
        last_attend, is_last, max_new, suppress_mask, align_layers,
        align_heads, frame_threshold, rewind_threshold, nonspeech_prob,
        active_in, cif_w, cif_b, dims, p_max, max_steps, eot, ts_begin,
        no_speech_tok, space_tok, use_cif, xkv_f8, xkv_transposed,
    )


@partial(jax.jit, static_argnames=_TICK_STATICS, donate_argnames=("enc_pool",))
def alignatt_tick_anchor(
    params, audio, enc_pool, enc_lanes,
    prefix, prefix_len, sot_index, content_frames, last_attend, is_last,
    max_new, suppress_mask, align_layers, align_heads, frame_threshold,
    rewind_threshold, nonspeech_prob, active_in, cif_w, cif_b,
    dims, p_max, max_steps, eot, ts_begin, no_speech_tok, space_tok,
    use_cif=False, xkv_f8=False, xkv_transposed=True, mel_pallas=False,
):
    """Full-window tick that also re-anchors the per-lane encoder cache:
    the freshly computed enc rows are written into ``enc_pool`` at
    ``enc_lanes`` so subsequent incremental ticks extend them.

    Returns (*tick outputs, enc_pool')."""
    enc = _tick_front(params, audio, dims, mel_pallas)
    enc_pool = enc_pool.at[enc_lanes].set(enc.astype(enc_pool.dtype))
    outs = _tick_core(
        params, enc, prefix, prefix_len, sot_index, content_frames,
        last_attend, is_last, max_new, suppress_mask, align_layers,
        align_heads, frame_threshold, rewind_threshold, nonspeech_prob,
        active_in, cif_w, cif_b, dims, p_max, max_steps, eot, ts_begin,
        no_speech_tok, space_tok, use_cif, xkv_f8, xkv_transposed,
    )
    return (outs, enc_pool)


def _slice_audio_tails(rows, tail_start, tail_frames):
    """Per-lane audio tail slice as a 128-sample ROW gather.

    rows: [B, N] int16 (N % 128 == 0); tail_start [B] must be EVEN — an even
    frame index puts the sample offset (tail_start*320) on a 128-sample
    boundary (320 = 2.5*128), so the slice becomes a gather of contiguous
    128-element rows instead of an element-granular minor-axis gather (which
    XLA lowers scalar-wise: 33 ms/tick at large-v3 B=32, ~3.6x that at base
    B=96 — the profiler's biggest non-compute op).
    Returns [B, (tail_frames+1)*320] float32 in [-1, 1)."""
    B, N = rows.shape
    S_tail = (tail_frames + 1) * 320
    n_rows = -(-S_tail // 128)
    r3 = rows.reshape(B, N // 128, 128)
    r0 = (tail_start * 320) // 128
    idx = r0[:, None] + jnp.arange(n_rows, dtype=jnp.int32)[None, :]
    take = jnp.take_along_axis(
        r3, jnp.minimum(idx, N // 128 - 1)[:, :, None], axis=1
    )
    flat = take.reshape(B, n_rows * 128)[:, :S_tail]
    samp_idx = tail_start[:, None] * 320 + jnp.arange(S_tail, dtype=jnp.int32)[None, :]
    flat = jnp.where(samp_idx < N, flat, 0)
    return flat.astype(jnp.float32) / 32768.0


@partial(
    jax.jit,
    static_argnames=_TICK_STATICS + ("tail_frames",),
    donate_argnames=("enc_pool",),
)
def alignatt_tick_inc(
    params,
    audio_pool,            # [W, N_SAMPLES] int16 device-resident windows
    enc_pool,              # [W_enc, T, D] cached encoder frames (donated)
    audio_lanes,           # [B] rows in audio_pool
    enc_lanes,             # [B] rows in enc_pool
    tail_start,            # [B] first encoder frame of the re-encoded tail
    win_frames,            # [B] current window length in encoder frames
    write_start,           # [B] first frame (re)written into the cache
    prefix, prefix_len, sot_index, content_frames, last_attend, is_last,
    max_new, suppress_mask, align_layers, align_heads, frame_threshold,
    rewind_threshold, nonspeech_prob, active_in, cif_w, cif_b,
    dims, p_max, max_steps, eot, ts_begin, no_speech_tok, space_tok,
    use_cif=False,
    xkv_f8=False,
    xkv_transposed=True,
    mel_pallas=False,  # accepted for statics symmetry; tails stay on XLA mel
    tail_frames: int = 384,
):
    """Incremental tick: re-encode only the window tail and extend the cache.

    The audio tail is sliced device-side from the audio pool (the host ships
    only new PCM via AudioPool.update), encoded with absolute positional
    offsets (frames keep the positions of the current anchor), and frames
    [write_start, win_frames) replace the cached rows; the decode then runs
    over the full cached window. Frames outside [0, win) keep their
    anchor-time values (silence-pad encodings), matching full-window padding
    semantics.

    vs the reference: simul_whisper re-encodes the whole ≤30 s window every
    tick (reference simul_whisper/simul_whisper.py:299-352) — at large-v3
    that is ~30x redundant encoder compute per second of audio and caps one
    H100/TPU at ~16 streams; this path makes per-tick encoder cost O(tail).
    """
    B = audio_lanes.shape[0]
    T = dims.n_audio_ctx

    # --- slice per-lane audio tails: (tail_frames+1) enc frames of samples;
    # tail_start rounds UP to even so the slice is an aligned row gather (an
    # element gather costs 33+ ms/tick at large-v3, ~145 ms at base B=96).
    # Rounding up keeps the NEWEST frame (win-1) inside the tail; the plan
    # reserves the 1-frame slack (win - write_start <= tail - 2) ---
    tail_start = tail_start + (tail_start & 1)
    rows = audio_pool[audio_lanes]  # [B, N_SAMPLES] int16
    tail = _slice_audio_tails(rows, tail_start, tail_frames)

    # --- tail mel + encode at absolute positions ---
    mel = log_mel_spectrogram(
        tail, n_mels=dims.n_mels, precision=jax.lax.Precision.DEFAULT
    )
    mel = pad_or_trim(mel, 2 * tail_frames)
    enc_tail = wm.encode(params, mel, dims, pos_start=tail_start)  # [B, F_tail, D]

    # --- merge into cached rows: t in [ws_eff, win) <- tail[t - tail_start]
    # (ws_eff widens the interval to the static XKV_WRITE_BLOCK so the
    # EncPool and cross-KV-pool paths refresh identical columns) ---
    Wb = XKV_WRITE_BLOCK
    ws_eff = jnp.where(
        win_frames >= Wb, jnp.minimum(write_start, win_frames - Wb), write_start
    )
    ws_eff = jnp.maximum(ws_eff, tail_start)  # tail coverage bound
    cached = enc_pool[enc_lanes]  # [B, T, D]
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    src = jnp.clip(t_idx - tail_start[:, None], 0, tail_frames - 1)
    fresh = jnp.take_along_axis(
        enc_tail.astype(enc_pool.dtype), src[:, :, None], axis=1
    )
    in_write = (t_idx >= ws_eff[:, None]) & (t_idx < win_frames[:, None])
    enc_rows = jnp.where(in_write[:, :, None], fresh, cached)
    enc_pool = enc_pool.at[enc_lanes].set(enc_rows)

    outs = _tick_core(
        params, enc_rows.astype(enc_tail.dtype), prefix, prefix_len, sot_index,
        content_frames, last_attend, is_last, max_new, suppress_mask,
        align_layers, align_heads, frame_threshold, rewind_threshold,
        nonspeech_prob, active_in, cif_w, cif_b, dims, p_max, max_steps, eot,
        ts_begin, no_speech_tok, space_tok, use_cif, xkv_f8, xkv_transposed,
    )
    return (outs, enc_pool)


@partial(
    jax.jit,
    static_argnames=_TICK_STATICS + ("tail_frames",),
    donate_argnames=("xkv_k", "xkv_v", "enc_pool"),
)
def alignatt_tick_inc_pooled(
    params,
    audio_pool,            # [W, N] int16 — device-resident audio windows
    xkv_k,                 # [L, G, H, Dh, Tp] — per-group cross-KV cache (donated)
    xkv_v,                 # [L, G, H, Dh, Tp] (donated)
    enc_pool,              # [cap, T, D] — cached encoder frames (donated)
    audio_lanes,           # [G] int32 — audio pool rows, slot order
    enc_lanes,             # [G] int32 — enc_pool rows, slot order
    tail_start,            # [G] first encoder frame of the re-encoded tail
    win_frames,            # [G] current window extent (0 = inactive slot)
    write_start,           # [G] first frame whose features are (re)written
    prefix, prefix_len, sot_index, content_frames, last_attend, is_last,
    max_new, suppress_mask, align_layers, align_heads, frame_threshold,
    rewind_threshold, nonspeech_prob, active_in, cif_w, cif_b,
    dims, p_max, max_steps, eot, ts_begin, no_speech_tok, space_tok,
    use_cif=False, xkv_f8=False, xkv_transposed=True, mel_pallas=False,
    tail_frames: int = 160,
):
    """Incremental tick over a *group-resident cross-KV cache*.

    Per tick: (1) re-encode only the window tail and merge it into the
    cached encoder rows (EncPool — identical to alignatt_tick_inc); (2)
    slice the aligned 256-column window [align128(win-128), +256) from the
    UPDATED rows (a fast non-minor-axis gather) and project just those
    columns' cross-KV; (3) splice them into the donated pool with one
    strided DMA per lane (ops/xkv_merge.py — every XLA merge formulation
    measured 40-134 ms; the aligned DMA is ~free); (4) decode straight off
    the pool, its padding columns masked via ``t_valid``.

    Columns outside [win-128, win) that fall in the splice window are
    re-projections of their own cached encoder rows — bit-identical
    rewrites — so the pool semantics equal the variable-width EncPool
    merge. ``write_start`` must lie inside the splice window (the session
    plan re-anchors on longer catch-up bursts).

    This removes the full-window cross-KV projection (~90 ms at large-v3
    G=24 on v5e) from the steady-state tick. Slot order IS batch order —
    no gathers touch the pool (a dynamic per-layer lane gather measured
    4.8x slower than direct reads: docs/perf/probe_xkv_gather).

    Returns (*tick outputs, xkv_k', xkv_v', enc_pool')."""
    from ..ops.xkv_merge import W_SPLICE, splice_dst0, xkv_splice, xkv_splice_ref

    assert not use_cif, "CIF needs full-window encoder features; use the EncPool path"
    G = audio_lanes.shape[0]
    T = dims.n_audio_ctx
    Tp = xkv_k.shape[-1]
    rows = audio_pool[audio_lanes]

    # --- slice per-lane audio tails: (tail_frames+1) enc frames of samples;
    # see alignatt_tick_inc: round UP to even for the aligned row gather
    tail_start = tail_start + (tail_start & 1)
    tail = _slice_audio_tails(rows, tail_start, tail_frames)

    # --- tail mel + encode at absolute positions ---
    mel = log_mel_spectrogram(
        tail, n_mels=dims.n_mels, precision=jax.lax.Precision.DEFAULT
    )
    mel = pad_or_trim(mel, 2 * tail_frames)
    enc_tail = wm.encode(params, mel, dims, pos_start=tail_start)  # [G, F, D]

    # --- merge into cached rows (same interval as alignatt_tick_inc) ---
    Wb = XKV_WRITE_BLOCK
    ws_eff = jnp.where(
        win_frames >= Wb, jnp.minimum(write_start, win_frames - Wb), write_start
    )
    ws_eff = jnp.maximum(ws_eff, tail_start)
    cached = enc_pool[enc_lanes]  # [G, T, D]
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    src = jnp.clip(t_idx - tail_start[:, None], 0, tail_frames - 1)
    fresh_rows = jnp.take_along_axis(
        enc_tail.astype(enc_pool.dtype), src[:, :, None], axis=1
    )
    in_write = (t_idx >= ws_eff[:, None]) & (t_idx < win_frames[:, None])
    enc_rows = jnp.where(in_write[:, :, None], fresh_rows, cached)
    enc_pool = enc_pool.at[enc_lanes].set(enc_rows)

    # --- project the aligned splice window from the UPDATED rows ---
    dst0 = splice_dst0(win_frames, Tp)  # [G], 128-aligned
    w_idx = dst0[:, None] + jnp.arange(W_SPLICE, dtype=jnp.int32)[None, :]
    window_rows = jnp.take_along_axis(
        enc_rows, jnp.minimum(w_idx, T - 1)[:, :, None], axis=1
    ).astype(enc_tail.dtype)  # [G, 256, D]
    fresh = wm.cross_kv(params, window_rows, dims, transposed=True)
    if jax.default_backend() == "tpu":
        xkv_k, xkv_v = xkv_splice(xkv_k, xkv_v, fresh.k, fresh.v, win_frames)
    else:
        xkv_k, xkv_v = xkv_splice_ref(xkv_k, xkv_v, fresh.k, fresh.v, win_frames)

    outs = _tick_core(
        params, None, prefix, prefix_len, sot_index, content_frames,
        last_attend, is_last, max_new, suppress_mask, align_layers,
        align_heads, frame_threshold, rewind_threshold, nonspeech_prob,
        active_in, cif_w, cif_b, dims, p_max, max_steps, eot, ts_begin,
        no_speech_tok, space_tok, use_cif, xkv_f8, xkv_transposed,
        xkv_pre=wm.CrossKV(k=xkv_k, v=xkv_v),
        xkv_t_valid=dims.n_audio_ctx if Tp > dims.n_audio_ctx else None,
    )
    return (outs, xkv_k, xkv_v, enc_pool)


@partial(
    jax.jit,
    static_argnames=(
        "dims", "max_steps", "eot", "ts_begin", "no_speech_tok", "space_tok",
        "xkv_f8", "xkv_transposed", "tail_frames",
    ),
    donate_argnames=(
        "xkv_k", "xkv_v", "enc_pool", "skv_k", "skv_v",
        "asum", "asq", "acount", "alast", "tok_pool",
    ),
)
def alignatt_tick_inc_skv(
    params,
    audio_pool,            # [W, N] int16 — device-resident audio windows
    xkv_k,                 # [L, G, H, Dh, Tp] — group cross-KV cache (donated)
    xkv_v,
    enc_pool,              # [cap, T, D] — cached encoder frames (donated)
    skv_k,                 # [L, G, Wc, H, Dh] — group decoder self-KV (donated)
    skv_v,
    asum,                  # [G, K, T] f32 — gate stats running sums (donated)
    asq,
    alast,                 # [G, K, T] f32 — last attended row (donated)
    acount,                # [G] f32 (donated... rides in the stats tuple)
    tok_pool,              # [G, n_text_ctx] i32 — cache-row token mirror (donated)
    audio_lanes,           # [G] i32 — audio pool rows, slot order
    enc_lanes,             # [G] i32
    tail_start,            # [G] first encoder frame of the re-encoded tail
    win_frames,            # [G] current window extent (0 = inactive slot)
    write_start,           # [G] first frame whose features are (re)written
    refresh_tokens,        # [G, R] i32 — slot0 = sot row, slot R-1 = last prefix row
    refresh_pos,           # [G, R] i32 — cache positions (Wc-1 = scratch padding)
    prefix_len, content_frames, last_attend, is_last,
    max_new, suppress_mask, align_layers, align_heads, frame_threshold,
    rewind_threshold, nonspeech_prob, active_in, cif_w, cif_b,
    dims, max_steps, eot, ts_begin, no_speech_tok, space_tok,
    xkv_f8=False, xkv_transposed=True,
    tail_frames: int = 160,
):
    """Steady-state pooled tick over BOTH persistent caches.

    On top of alignatt_tick_inc_pooled (tail re-encode + aligned cross-KV
    splice), the decoder's per-tick full-prefix prefill is replaced by an
    R-row refresh against the group-resident self-KV pool: committed tokens'
    K/V rows persist across ticks exactly as the reference persists its
    dict KV cache across decode steps WITHIN one infer (reference
    whisper/model.py:100-146) — extended across ticks. The refresh decodes
    the sot row (fresh no_speech_p over the updated audio) and the last
    prefix rows (fresh first-token logits + gate attention), so every
    per-tick decision input reflects the new audio; only the deep history
    rows keep their decode-time hidden states (bounded staleness: their
    own encoder frames are frozen by the incremental-encode scheme, and
    every anchor epoch rebuilds them exactly — see docs/perf/ab_skv_r3).

    This also removes the prefix bucket from the program signature: ONE
    compiled shape per (G, steps, tail) serves every prefix length, where
    the prefill path compiled per bucket (32/64/128/256) x mode.

    Returns (outs, xkv_k', xkv_v', enc_pool', skv_k', skv_v', asum', asq',
    alast', acount', tok_pool')."""
    from ..ops.xkv_merge import W_SPLICE, splice_dst0, xkv_splice, xkv_splice_ref

    G = audio_lanes.shape[0]
    T = dims.n_audio_ctx
    Tp = xkv_k.shape[-1]
    rows = audio_pool[audio_lanes]

    tail_start = tail_start + (tail_start & 1)
    tail = _slice_audio_tails(rows, tail_start, tail_frames)
    mel = log_mel_spectrogram(
        tail, n_mels=dims.n_mels, precision=jax.lax.Precision.DEFAULT
    )
    mel = pad_or_trim(mel, 2 * tail_frames)
    enc_tail = wm.encode(params, mel, dims, pos_start=tail_start)  # [G, F, D]

    Wb = XKV_WRITE_BLOCK
    ws_eff = jnp.where(
        win_frames >= Wb, jnp.minimum(write_start, win_frames - Wb), write_start
    )
    ws_eff = jnp.maximum(ws_eff, tail_start)
    cached = enc_pool[enc_lanes]  # [G, T, D]
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    src = jnp.clip(t_idx - tail_start[:, None], 0, tail_frames - 1)
    fresh_rows = jnp.take_along_axis(
        enc_tail.astype(enc_pool.dtype), src[:, :, None], axis=1
    )
    in_write = (t_idx >= ws_eff[:, None]) & (t_idx < win_frames[:, None])
    enc_rows = jnp.where(in_write[:, :, None], fresh_rows, cached)
    enc_pool = enc_pool.at[enc_lanes].set(enc_rows)

    dst0 = splice_dst0(win_frames, Tp)
    w_idx = dst0[:, None] + jnp.arange(W_SPLICE, dtype=jnp.int32)[None, :]
    window_rows = jnp.take_along_axis(
        enc_rows, jnp.minimum(w_idx, T - 1)[:, :, None], axis=1
    ).astype(enc_tail.dtype)
    fresh = wm.cross_kv(params, window_rows, dims, transposed=True)
    if jax.default_backend() == "tpu":
        xkv_k, xkv_v = xkv_splice(xkv_k, xkv_v, fresh.k, fresh.v, win_frames)
    else:
        xkv_k, xkv_v = xkv_splice_ref(xkv_k, xkv_v, fresh.k, fresh.v, win_frames)

    skv = dict(
        cache=wm.KVCache(k=skv_k, v=skv_v),
        asum=asum, asq=asq, acount=acount, alast=alast, tok=tok_pool,
        refresh_tokens=refresh_tokens, refresh_pos=refresh_pos,
    )
    packed, (cache, (asum, asq, acount, alast), tok_pool) = _tick_core(
        params, None, None, prefix_len, None, content_frames,
        last_attend, is_last, max_new, suppress_mask, align_layers,
        align_heads, frame_threshold, rewind_threshold, nonspeech_prob,
        active_in, cif_w, cif_b, dims, 0, max_steps, eot, ts_begin,
        no_speech_tok, space_tok, False, xkv_f8, xkv_transposed,
        xkv_pre=wm.CrossKV(k=xkv_k, v=xkv_v),
        xkv_t_valid=dims.n_audio_ctx if Tp > dims.n_audio_ctx else None,
        skv=skv, return_state=True,
    )
    return (
        packed, xkv_k, xkv_v, enc_pool, cache.k, cache.v,
        asum, asq, alast, acount, tok_pool,
    )


@partial(
    jax.jit,
    static_argnames=_TICK_STATICS,
    donate_argnames=(
        "xkv_k", "xkv_v", "enc_pool", "skv_k", "skv_v",
        "asum", "asq", "acount", "alast", "tok_pool",
    ),
)
def alignatt_tick_anchor_pooled(
    params, audio, xkv_k, xkv_v, enc_pool,
    skv_k, skv_v, asum, asq, alast, acount, tok_pool,
    enc_lanes, slots,
    prefix, prefix_len, sot_index, content_frames, last_attend, is_last,
    max_new, suppress_mask, align_layers, align_heads, frame_threshold,
    rewind_threshold, nonspeech_prob, active_in, cif_w, cif_b,
    dims, p_max, max_steps, eot, ts_begin, no_speech_tok, space_tok,
    use_cif=False, xkv_f8=False, xkv_transposed=True, mel_pallas=False,
):
    """Full-window tick that re-anchors per-group cross-KV cache rows.

    ``slots`` maps each batch lane to its group slot (G for padded lanes —
    dropped). Runs at full window cost; the scheduler amortizes it to
    1-in-N ticks (window eviction) plus session admission/migration.
    The tick itself decodes from the freshly computed dense cross-KV (in
    compute dtype), so an anchor tick's outputs match the legacy program
    exactly; the pool stores the pool-dtype cast the inc ticks will read.
    The prefill also (re)seeds the lanes' self-KV/stat/token pool rows
    (slot-scatter; padded lanes drop).

    Returns (*tick outputs, pools...)."""
    enc = _tick_front(params, audio, dims, mel_pallas)
    enc_pool = enc_pool.at[enc_lanes].set(enc.astype(enc_pool.dtype))
    fresh = wm.cross_kv(params, enc, dims, transposed=True)
    Tp = xkv_k.shape[-1]
    padw = ((0, 0),) * 4 + ((0, Tp - fresh.k.shape[-1]),)
    xkv_k = xkv_k.at[:, slots].set(
        jnp.pad(fresh.k.astype(xkv_k.dtype), padw), mode="drop"
    )
    xkv_v = xkv_v.at[:, slots].set(
        jnp.pad(fresh.v.astype(xkv_v.dtype), padw), mode="drop"
    )
    packed, (cache, (n_asum, n_asq, n_acount, n_alast), n_tok) = _tick_core(
        params, enc, prefix, prefix_len, sot_index, content_frames,
        last_attend, is_last, max_new, suppress_mask, align_layers,
        align_heads, frame_threshold, rewind_threshold, nonspeech_prob,
        active_in, cif_w, cif_b, dims, p_max, max_steps, eot, ts_begin,
        no_speech_tok, space_tok, use_cif, xkv_f8, xkv_transposed,
        xkv_pre=fresh,
        cache_width=skv_k.shape[2], return_state=True,
    )
    skv_k = skv_k.at[:, slots].set(cache.k.astype(skv_k.dtype), mode="drop")
    skv_v = skv_v.at[:, slots].set(cache.v.astype(skv_v.dtype), mode="drop")
    asum = asum.at[slots].set(n_asum, mode="drop")
    asq = asq.at[slots].set(n_asq, mode="drop")
    alast = alast.at[slots].set(n_alast, mode="drop")
    acount = acount.at[slots].set(n_acount, mode="drop")
    tok_pool = tok_pool.at[slots].set(n_tok, mode="drop")
    return (
        packed, xkv_k, xkv_v, enc_pool,
        skv_k, skv_v, asum, asq, alast, acount, tok_pool,
    )


@partial(
    jax.jit,
    static_argnames=_TICK_STATICS,
    donate_argnames=(
        "xkv_k", "xkv_v", "enc_pool", "skv_k", "skv_v",
        "asum", "asq", "acount", "alast", "tok_pool",
    ),
)
def alignatt_tick_anchor_group(
    params, audio, xkv_k, xkv_v, enc_pool,
    skv_k, skv_v, asum, asq, alast, acount, tok_pool,
    enc_lanes,
    prefix, prefix_len, sot_index, content_frames, last_attend, is_last,
    max_new, suppress_mask, align_layers, align_heads, frame_threshold,
    rewind_threshold, nonspeech_prob, active_in, cif_w, cif_b,
    dims, p_max, max_steps, eot, ts_begin, no_speech_tok, space_tok,
    use_cif=False, xkv_f8=False, xkv_transposed=True, mel_pallas=False,
):
    """Whole-group anchor: re-encode every lane's full window and rebuild the
    group's cross-KV pool IN PLACE (cross_kv_into_pool — one layer's K/V
    transient instead of a dense [L,G,H,Dh,T] copy beside the donated pool,
    which OOMs at large-v3 G=24 bf16). The decode reads the rebuilt pool, so
    with a bf16 pool the outputs equal the legacy program exactly.

    The full-prefix prefill that the anchor runs anyway also (re)seeds the
    group's self-KV pool + gate-stat pools EXACTLY, so between anchors the
    steady ticks (alignatt_tick_inc_skv) can skip prefill entirely;
    inactive slots keep their pooled rows untouched.

    The scheduler aligns a group's window evictions to a shared epoch so this
    runs once per eviction block for the whole group (batching the anchors
    measured ~6x cheaper than staggering them lane-by-lane).

    Returns (*tick outputs, pools...)."""
    enc = _tick_front(params, audio, dims, mel_pallas)
    keep = active_in[:, None, None]
    enc_rows = jnp.where(keep, enc.astype(enc_pool.dtype), enc_pool[enc_lanes])
    enc_pool = enc_pool.at[enc_lanes].set(enc_rows)
    pooled = wm.cross_kv_into_pool(params, enc, xkv_k, xkv_v, dims, active=active_in)
    Tp = pooled.k.shape[-1]
    packed, (cache, (n_asum, n_asq, n_acount, n_alast), n_tok) = _tick_core(
        params, enc, prefix, prefix_len, sot_index, content_frames,
        last_attend, is_last, max_new, suppress_mask, align_layers,
        align_heads, frame_threshold, rewind_threshold, nonspeech_prob,
        active_in, cif_w, cif_b, dims, p_max, max_steps, eot, ts_begin,
        no_speech_tok, space_tok, use_cif, xkv_f8, xkv_transposed,
        xkv_pre=pooled,
        xkv_t_valid=dims.n_audio_ctx if Tp > dims.n_audio_ctx else None,
        cache_width=skv_k.shape[2], return_state=True,
    )
    sel5 = active_in[None, :, None, None, None]
    skv_k = jnp.where(sel5, cache.k.astype(skv_k.dtype), skv_k)
    skv_v = jnp.where(sel5, cache.v.astype(skv_v.dtype), skv_v)
    sel3 = active_in[:, None, None]
    asum = jnp.where(sel3, n_asum, asum)
    asq = jnp.where(sel3, n_asq, asq)
    alast = jnp.where(sel3, n_alast, alast)
    acount = jnp.where(active_in, n_acount, acount)
    tok_pool = jnp.where(active_in[:, None], n_tok, tok_pool)
    return (
        packed, pooled.k, pooled.v, enc_pool,
        skv_k, skv_v, asum, asq, alast, acount, tok_pool,
    )



# time, by encode-mode partition (exported via BatchScheduler.stats)
TICK_PHASE_STATS: dict = {}

# why lanes fell off the cheap "inc" path (exported next to TICK_PHASE_STATS;
# the e2e-vs-tick-model gap attribution needs to know whether anchors come
# from evictions — the 1-in-epoch cost the capacity model amortizes — or
# from resets/catch-up bursts the model does not see)
ANCHOR_REASONS: dict = {}


def _count_anchor(reason: str) -> None:
    ANCHOR_REASONS[reason] = ANCHOR_REASONS.get(reason, 0) + 1



# ---------------------------------------------------------------------------
# Pooled-program failure containment
#
# Every pooled tick/anchor program donates the group's HBM pools. A program
# that fails AFTER donation (the observed case: RESOURCE_EXHAUSTED compiling
# or running the whole-group anchor with a second group's pools resident,
# e2e r3 n=40) leaves the donated buffers deleted — without recovery one OOM
# cascades into a full serving outage for every session of the group.
# Containment has two layers:
#   1. a budget guard (_whole_group_anchor_fits): AOT-ask XLA for the
#      program's temp size and compare against the device's free HBM, so the
#      destructive attempt is not made when it cannot fit (the r3 guard was
#      the proxy `len(groups) == 1`, which also disabled the ~6x-cheaper
#      whole-group anchor on devices where it fits — ADVICE r3 #2);
#   2. recovery (_recover_group): on ANY pooled-program failure, swap in
#      fresh pool arrays, bump generations so sessions invalidate their
#      device mirrors (next tick re-anchors from host audio — the audio pool
#      is never donated to tick programs), and serve the in-flight ticks
#      through the legacy full-window program so no session misses a tick.
# ---------------------------------------------------------------------------

#: free-HBM safety margin for the whole-group anchor budget check
_ANCHOR_HBM_MARGIN = 512 << 20


def _device_free_bytes() -> Optional[int]:
    try:
        dev = jax.local_devices()[0]
        stats = dev.memory_stats()
        return int(stats["bytes_limit"]) - int(stats["bytes_in_use"])
    except Exception:
        return None


def _anchor_group_temp_bytes(engine, xkv: "XKVAllocator", G: int, p_max: int) -> Optional[int]:
    """XLA's temp-buffer size for the whole-group anchor program at this
    shape (AOT lowering — nothing runs). Cached per shape on the engine;
    the compile populates the persistent compile cache, so the first real
    anchor does not pay it again."""
    key = (G, p_max, str(xkv.dtype), str(xkv.skv_dtype), xkv.skv_width)
    cache = getattr(engine, "_anchor_temp_cache", None)
    if cache is None:
        cache = engine._anchor_temp_cache = {}
    if key in cache:
        return cache[key]
    try:
        dims = engine.dims
        sds = jax.ShapeDtypeStruct
        p_sds = jax.tree.map(lambda x: sds(x.shape, x.dtype), engine.params)
        Tp = -(-dims.n_audio_ctx // 128) * 128
        kv = sds((dims.n_text_layer, G, dims.n_text_head, dims.head_dim, Tp), xkv.dtype)
        skv = sds(
            (dims.n_text_layer, G, xkv.skv_width, dims.n_text_head, dims.head_dim),
            xkv.skv_dtype,
        )
        K = int(engine.align_layers.shape[0])
        stat = sds((G, K, dims.n_audio_ctx), jnp.float32)
        i32 = lambda *s: sds(s, jnp.int32)  # noqa: E731
        cap = 4 * G  # enc/audio pool capacities scale with lanes (scheduler)
        cfg = engine.cfg
        lowered = alignatt_tick_anchor_group.lower(
            p_sds,
            sds((G, N_SAMPLES), jnp.int16),
            kv, kv,
            sds((cap + 1, dims.n_audio_ctx, dims.n_audio_state),
                engine.params["decoder"]["tok_emb"].dtype),
            skv, skv, stat, stat, stat, sds((G,), jnp.float32),
            i32(G, dims.n_text_ctx),
            i32(G),                                  # enc_lanes
            i32(G, p_max), i32(G), i32(G), i32(G), i32(G),
            sds((G,), bool), i32(G),
            sds((dims.n_vocab,), jnp.float32),
            sds((K,), jnp.int32), sds((K,), jnp.int32),
            sds((), jnp.int32), sds((), jnp.int32), sds((), jnp.float32),
            sds((G,), bool),
            sds((dims.n_audio_state,), jnp.float32), sds((), jnp.float32),
            dims=dims, p_max=p_max, max_steps=cfg.max_steps,
            eot=engine.tokenizer.eot, ts_begin=engine.tokenizer.timestamp_begin,
            no_speech_tok=engine.tokenizer.no_speech,
            space_tok=engine.tokenizer.encode(" ")[0],
            use_cif=engine.use_cif, xkv_f8=cfg.xkv_f8,
            xkv_transposed=getattr(cfg, "xkv_transposed", True),
            mel_pallas=getattr(cfg, "mel_pallas", False),
        )
        mem = lowered.compile().memory_analysis()
        temp = int(getattr(mem, "temp_size_in_bytes", 0))
    except Exception as e:  # lowering/compiling itself OOM'd or unsupported
        logger.warning("anchor-group AOT memory analysis failed: %s", e)
        temp = None
    cache[key] = temp
    return temp



# Shared engine + per-session state (host)
# ---------------------------------------------------------------------------


class AlignAttEngine:
    """Shared compiled engine: params + static config; sessions share it."""

    # 32 serves the common early-session prefixes (sot sequence + a few
    # committed tokens): prefill cost scales with the bucket width, so short
    # prefixes decode ~2x cheaper than under a 64-wide floor. 96 matches the
    # pooled-serving prefix cap (serving_prefix_cap) so capped anchors
    # prefill at exactly the cap. Widths stay multiples of 8 (the
    # flash-prefill sublane constraint).
    PREFIX_BUCKETS = (32, 64, 96, 128, 256, 384)

    def __init__(
        self,
        params,
        dims: ModelDimensions,
        tokenizer: Tokenizer,
        cfg: AlignAttConfig,
        model_name: Optional[str] = None,
        align_pairs=None,
    ):
        self.params = params
        self.dims = dims
        self.tokenizer = tokenizer
        self.cfg = cfg
        pairs = align_pairs or default_alignment_heads(dims, model_name)
        arr = np.asarray(pairs, np.int32).reshape(-1, 2)
        self.align_layers = jnp.asarray(arr[:, 0])
        self.align_heads = jnp.asarray(arr[:, 1])
        self.suppress_mask = jnp.asarray(self._build_suppress_mask(tokenizer, dims))
        self.use_cif, self.cif_w, self.cif_b = self._load_cif(cfg, dims)
        if cfg.xkv_cache == "auto":
            cfg.xkv_cache = bool(dims.n_audio_state >= 1280)
        if not cfg.enc_tail_frames:
            if dims.n_audio_state >= 1280 and dims.n_text_layer >= 16:
                cfg.enc_tail_frames = 160   # large-v3 class
            elif dims.n_audio_state >= 1280:
                cfg.enc_tail_frames = 256   # turbo class
            else:
                cfg.enc_tail_frames = 384
        # Large class: cap the top prefix bucket at 256. The tick program's
        # temp grows ~27 MB/prefix-token at G=24 (the self-KV cache width
        # P+steps is held in the prefill scan stack AND the decode loop
        # carry: 4.9G at P=128 -> 11.9G at P=384, scripts/probe_tick_mem.py)
        # — the P=384 program plus the resident pools EXCEEDS v5e HBM.
        # Prefixes over the bucket keep the newest tokens (prepare_tick);
        # the reference instead lets context reach n_text_ctx (reference
        # align_att_base.py:59-62) because per-session torch decode never
        # holds 24 lanes' caches at once.
        top = 256 if (
            dims.n_audio_state >= 1280 and dims.n_text_layer >= 16
        ) else dims.n_text_ctx
        self.prefix_buckets = tuple(
            b for b in self.PREFIX_BUCKETS if b < min(dims.n_text_ctx, top + 1)
        ) or (dims.n_text_ctx // 2,)
        # pooled-serving prefix cap (see AlignAttConfig.serving_prefix_cap):
        # bounds the self-KV pool width so the per-step pool copy stays
        # small. Applies only to sessions wired to an XKVAllocator.
        cap = int(getattr(cfg, "serving_prefix_cap", 0) or 0)
        if cap == 0 and bool(cfg.xkv_cache):
            cap = 96
        self.serving_prefix_cap = min(cap, dims.n_text_ctx - 20) if cap else 0
        # commit budget: extra pool rows past the cap so mid-epoch commits
        # grow the prefix instead of trimming the head (head trims shift
        # every row's position -> padded full-width refresh for the whole
        # group tick; see AlignAttConfig.serving_commit_budget)
        budget = max(0, int(getattr(cfg, "serving_commit_budget", 16)))
        if self.serving_prefix_cap:
            budget = min(
                budget, dims.n_text_ctx - 20 - self.serving_prefix_cap
            )
        self.serving_commit_budget = budget if self.serving_prefix_cap else 0

    @staticmethod
    def _load_cif(cfg: AlignAttConfig, dims: ModelDimensions):
        """CIF end-of-word linear head (reference eow_detection.py:10-34):
        without a checkpoint, fall back to always-fire (or never-fire)."""
        if not cfg.cif_ckpt_path:
            return False, jnp.zeros((dims.n_audio_state,), jnp.float32), jnp.float32(0.0)
        import torch

        ckpt = torch.load(cfg.cif_ckpt_path, map_location="cpu")
        w = np.asarray(ckpt["weight"].float().numpy()).reshape(-1)
        b = float(np.asarray(ckpt["bias"].float().numpy()).reshape(())) if "bias" in ckpt else 0.0
        return True, jnp.asarray(w, jnp.float32), jnp.float32(b)

    @staticmethod
    def _build_suppress_mask(tokenizer: Tokenizer, dims: ModelDimensions) -> np.ndarray:
        """Streaming suppression set (reference simul_whisper.py:161-172):
        task/sot/lang/no_speech/no_timestamps tokens + all timestamps."""
        mask = np.zeros(dims.n_vocab, np.float32)
        ids = [
            tokenizer.transcribe,
            tokenizer.translate,
            tokenizer.sot,
            tokenizer.sot_prev,
            tokenizer.sot_lm,
            tokenizer.no_timestamps,
        ]
        ids += list(tokenizer.all_language_tokens)
        if tokenizer.no_speech is not None:
            ids.append(tokenizer.no_speech)
        mask[sorted(set(i for i in ids if i < dims.n_vocab))] = -np.inf
        # sot_sequence_including_notimestamps ⇒ timestamps never sampled
        mask[tokenizer.timestamp_begin :] = -np.inf
        return mask

    def bucket_for(self, n: int) -> int:
        for b in self.prefix_buckets:
            if n <= b:
                return b
        return self.prefix_buckets[-1]




# ---------------------------------------------------------------------------
# Facade re-exports (module split, round 5 — VERDICT r4 task #7): the pool
# containers, the host session planner, and the batch dispatch layer live in
# sibling modules; this module remains the import AND monkeypatch surface
# (dispatch looks the tick programs and AOT budget probes up through this
# module at call time).
# ---------------------------------------------------------------------------

from .pools import (  # noqa: E402  (re-export)
    AudioPool,
    EncPool,
    XKVAllocator,
    XKVGroupPool,
    _dispatch_pooled_recovering,
    _pool_gather,
    _pool_update,
    _recover_group,
)

#: names served lazily from sibling modules (PEP 562): session_plan and
#: dispatch import THIS module at load time, so importing them here eagerly
#: would be a cycle for any entry order that loads them first.
_LAZY_EXPORTS = {
    "TokenBufferCtx": "session_plan",
    "TickInputs": "session_plan",
    "TickOutputs": "session_plan",
    "AlignAttSession": "session_plan",
    "_skv_full_refresh_rows": "session_plan",
    "_collect_lane_arrays": "dispatch",
    "_core_device_args": "dispatch",
    "_gather_full_audio": "dispatch",
    "_scatter_outputs": "dispatch",
    "run_tick_batch": "dispatch",
    "_timed_pool_update": "dispatch",
    "dispatch_tick_batch": "dispatch",
    "finalize_tick_batch": "dispatch",
    "_dispatch_group_legacy": "dispatch",
    "_run_group_legacy": "dispatch",
    "_dispatch_group_anchor": "dispatch",
    "_dispatch_group_inc": "dispatch",
    "_whole_group_anchor_fits": "dispatch",
    "precompile_serving_programs": "dispatch",
    "_dispatch_group_xkv_inc": "dispatch",
    "_dispatch_group_xkv_anchor": "dispatch",
}


def __getattr__(name: str):
    mod = _LAZY_EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(f".{mod}", __package__), name)
