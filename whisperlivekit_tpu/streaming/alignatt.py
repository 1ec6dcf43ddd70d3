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


class TokenBufferCtx:
    """Scrolling text context prompt (reference simul_whisper/token_buffer.py)."""

    def __init__(self, tokenizer: Tokenizer, text: str = "", prefix_token_ids=None):
        self.tokenizer = tokenizer
        self.text = text
        self.prefix_token_ids = list(prefix_token_ids or [])
        self.pending_token_ids: List[int] = []

    def as_token_ids(self) -> List[int]:
        return self.prefix_token_ids + self.tokenizer.encode(self.text)

    def is_empty(self) -> bool:
        return not self.text

    def trim_words(self, num: int = 1, after: int = 0) -> int:
        ids = self.tokenizer.encode(self.text[after:])
        words, wids = self.tokenizer.split_to_word_tokens(ids)
        if not words:
            return 0
        self.text = self.text[:after] + "".join(words[num:])
        return sum(len(w) for w in wids[:num])

    def append_token_ids(self, token_ids: List[int]) -> None:
        all_tokens = self.pending_token_ids + list(token_ids)
        decoded = self.tokenizer.decode(all_tokens)
        if "�" in decoded:
            if len(all_tokens) > 1:
                partial_dec = self.tokenizer.decode(all_tokens[:-1])
                if "�" not in partial_dec:
                    self.text += partial_dec
                    self.pending_token_ids = [all_tokens[-1]]
                else:
                    self.pending_token_ids = all_tokens
            else:
                self.pending_token_ids = all_tokens
        else:
            self.text += decoded
            self.pending_token_ids = []


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


class XKVGroupPool:
    """Per-lane-group cross-KV cache resident in device HBM.

    k/v: [L, G, H, Dh, T] in ``dtype`` (bf16 exact, or f8_e4m3 to halve the
    footprint AND the decode-loop read — measured 24% faster 8-step loop on
    v5e, docs/perf/probe_xkv_f8). Slot order IS the batch order of the
    group's tick programs; sessions pin to a slot for their lifetime and a
    migration forces a re-anchor. Scale-out = more groups, not wider ones."""

    def __init__(
        self,
        group_width: int,
        dims: ModelDimensions,
        dtype=jnp.bfloat16,
        skv_width: int = 0,
        align_count: int = 0,
        skv_dtype=jnp.bfloat16,
    ):
        self.group_width = group_width
        t_pad = -(-dims.n_audio_ctx // 128) * 128  # splice DMA tile alignment
        shape = (
            dims.n_text_layer, group_width, dims.n_text_head,
            dims.head_dim, t_pad,
        )
        self.k = jnp.zeros(shape, dtype)
        self.v = jnp.zeros(shape, dtype)
        # persistent decoder state (see alignatt_tick_inc_skv): self-KV rows
        # for the prefix+decoded tokens, gate-stat running sums, and the
        # cache-row token mirror the dry penalty reads. Width covers the
        # serving prefix cap + the step budget + 1 scratch row (index Wc-1,
        # the park slot for inactive lanes' writes); sessions' prefixes are
        # trimmed/truncated to the cap (AlignAttSession.trim_context).
        self.skv_width = skv_width
        if skv_width:
            G = group_width
            sshape = (dims.n_text_layer, G, skv_width, dims.n_text_head, dims.head_dim)
            self.skv_k = jnp.zeros(sshape, skv_dtype)
            self.skv_v = jnp.zeros(sshape, skv_dtype)
            T = dims.n_audio_ctx
            self.asum = jnp.zeros((G, align_count, T), jnp.float32)
            self.asq = jnp.zeros((G, align_count, T), jnp.float32)
            self.alast = jnp.zeros((G, align_count, T), jnp.float32)
            self.acount = jnp.zeros((G,), jnp.float32)
            self.tok = jnp.zeros((G, dims.n_text_ctx), jnp.int32)
        self._free = list(range(group_width))
        # group-synchronized anchor epochs: the scheduler bumps `sub_epoch`
        # once per (eviction block / anchor_cohorts) of inc ticks; a session
        # in cohort c (= slot % cohorts) force-evicts (window permitting) and
        # plans an anchor when a sub-epoch with index ≡ c passes, so each
        # cohort re-anchors in ONE batched program — with cohorts=1 the whole
        # group anchors together (max batching, but the group stalls ~1 s at
        # large-v3); with cohorts>1 anchors stagger across sub-epochs and
        # each stall is a small chunked program (p95 tail latency)
        self.sub_epoch = 0
        self.ticks_since_epoch = 0
        # failure-recovery bookkeeping: a pooled program that dies with
        # donated inputs destroys this group's pools; _recover_group swaps
        # in fresh arrays and bumps `generation` so every session of the
        # group invalidates its device mirrors (skv_tokens) and re-anchors
        self.generation = 0
        # memoized "the whole-group anchor OOM'd here": never retry it on
        # this group topology (the chunked path is the survivable fallback)
        self.whole_anchor_blocked = False

    @staticmethod
    def row_bytes(
        dims: ModelDimensions, dtype, skv_width: int = 0, align_count: int = 0,
        skv_dtype=jnp.bfloat16,
    ) -> int:
        itemsize = jnp.dtype(dtype).itemsize
        t_pad = -(-dims.n_audio_ctx // 128) * 128
        b = (
            2 * dims.n_text_layer * dims.n_text_head * dims.head_dim
            * t_pad * itemsize
        )
        if skv_width:
            b += (
                2 * dims.n_text_layer * skv_width * dims.n_text_head
                * dims.head_dim * jnp.dtype(skv_dtype).itemsize
            )
            b += 3 * align_count * dims.n_audio_ctx * 4 + dims.n_text_ctx * 4 + 4
        return b

    def acquire(self) -> Optional[int]:
        return self._free.pop() if self._free else None

    def release(self, slot: int) -> None:
        self._free.append(slot)

    @property
    def occupancy(self) -> int:
        return self.group_width - len(self._free)


class XKVAllocator:
    """Scheduler-owned registry of cross-KV cache groups.

    Groups are created lazily up to an HBM budget; a session holds one
    (group, slot) for its lifetime (slot order IS batch order — the decode
    reads the pool directly, so slots cannot be regathered; see
    XKVGroupPool). ``epoch_period`` paces group-synchronized anchors;
    ``anchor_cohorts`` staggers them (slot % cohorts) so only ~G/cohorts
    lanes anchor per sub-epoch instead of the whole group at once."""

    def __init__(
        self,
        group_width: int,
        dims: ModelDimensions,
        dtype=jnp.bfloat16,
        budget_bytes: int = 9 << 30,
        epoch_period: int = 15,
        anchor_cohorts: int = 1,
        skv_width: int = 0,
        align_count: int = 0,
        skv_dtype=jnp.bfloat16,
    ):
        self.group_width = group_width
        self.dims = dims
        self.dtype = dtype
        self.skv_width = skv_width
        self.align_count = align_count
        self.skv_dtype = skv_dtype
        self.epoch_period = epoch_period
        self.anchor_cohorts = max(1, min(anchor_cohorts, epoch_period))
        self.sub_period = max(1, epoch_period // self.anchor_cohorts)
        row = XKVGroupPool.row_bytes(
            dims, dtype, skv_width=skv_width, align_count=align_count,
            skv_dtype=skv_dtype,
        )
        self.max_groups = max(1, int(budget_bytes // (row * group_width)))
        self.groups: List[XKVGroupPool] = []

    @classmethod
    def for_engine(cls, engine: "AlignAttEngine", group_width: int, **kw) -> "XKVAllocator":
        """Allocator sized for an engine's serving programs: self-KV width =
        serving prefix cap + step budget + 1 legit slot + 1 scratch row.

        The cap (not the top prefix bucket) sizes the pool: the decode loop
        copies the full pool every step (the cache rides the layer scan as
        xs and is restacked as ys), so tick time scales ~linearly with the
        width — top-bucket sizing (266 rows at large-v3) measured 581 ms vs
        356 at the 106-row cap for the same B=32 f8 tick, and OOM'd bf16
        (docs/perf/probe_skv_width.json; the r3 capacity regression)."""
        cfg = engine.cfg
        kw.setdefault("dtype", (
            jnp.float8_e4m3fn
            if getattr(cfg, "xkv_cache_dtype", "bf16") == "f8"
            else engine.params["decoder"]["tok_emb"].dtype
        ))
        kw.setdefault("skv_dtype", engine.params["decoder"]["tok_emb"].dtype)
        return cls(
            group_width, engine.dims,
            skv_width=(engine.serving_prefix_cap or engine.prefix_buckets[-1])
            + cfg.max_steps + 2,
            align_count=int(engine.align_layers.shape[0]),
            **kw,
        )

    def acquire(self) -> Optional[Tuple[int, int]]:
        for gi, g in enumerate(self.groups):
            slot = g.acquire()
            if slot is not None:
                return gi, slot
        if len(self.groups) < self.max_groups:
            self.groups.append(
                XKVGroupPool(
                    self.group_width, self.dims, dtype=self.dtype,
                    skv_width=self.skv_width, align_count=self.align_count,
                    skv_dtype=self.skv_dtype,
                )
            )
            return len(self.groups) - 1, self.groups[-1].acquire()
        return None

    def release(self, gi: int, slot: int) -> None:
        self.groups[gi].release(slot)

    def note_group_tick(self, gi: int) -> None:
        g = self.groups[gi]
        g.ticks_since_epoch += 1
        if g.ticks_since_epoch >= self.sub_period:
            g.ticks_since_epoch = 0
            g.sub_epoch += 1

    def stats(self) -> dict:
        return {
            "n_groups": len(self.groups),
            "max_groups": self.max_groups,
            "group_width": self.group_width,
            "anchor_cohorts": self.anchor_cohorts,
            "slots_used": sum(g.occupancy for g in self.groups),
            "epochs": [g.sub_epoch // self.anchor_cohorts for g in self.groups],
        }


class EncPool:
    """Per-lane encoder-frame caches resident in device HBM.

    [capacity, n_audio_ctx, n_audio_state] in the params dtype; rows are
    written by the anchor/incremental tick programs (donated in/out). Row 0
    is a scratch target for batch-padding lanes and never allocated."""

    SCRATCH = 0

    def __init__(self, capacity: int, dims: ModelDimensions, dtype=jnp.bfloat16):
        self.capacity = capacity
        self.pool = jnp.zeros((capacity, dims.n_audio_ctx, dims.n_audio_state), dtype)
        self._free = list(range(1, capacity))
        # bumped by _recover_group when a failed donated program destroyed
        # the pool; sessions re-sync (full re-anchor) on generation change
        self.generation = 0

    def acquire(self) -> Optional[int]:
        return self._free.pop() if self._free else None

    def release(self, lane: int) -> None:
        if lane != self.SCRATCH:
            self._free.append(lane)


# ---------------------------------------------------------------------------
# Device-resident audio pool
# ---------------------------------------------------------------------------


@partial(jax.jit, donate_argnums=(0,))
def _pool_update(
    pool: jnp.ndarray,    # [W, N] int16 (donated)
    lanes: jnp.ndarray,   # [U] int32
    shifts: jnp.ndarray,  # [U] int32 — samples evicted at window front
    starts: jnp.ndarray,  # [U] int32 — write offset after the shift
    lens: jnp.ndarray,    # [U] int32 — new samples
    chunks: jnp.ndarray,  # [U, C] int16
):
    N = pool.shape[1]
    C = chunks.shape[1]
    U = chunks.shape[0]
    rows = pool[lanes]

    # eviction shift: an element-granular minor-axis gather that XLA lowers
    # scalar-wise (~30 ms at U=24); shifts are zero outside eviction epochs
    # (1-in-15 ticks with epoch-synchronized eviction), so skip it then
    def do_shift(r):
        idx = jnp.arange(N, dtype=jnp.int32)[None, :] + shifts[:, None]
        sh = jnp.take_along_axis(r, jnp.minimum(idx, N - 1), axis=1)
        return jnp.where(idx < N, sh, 0)

    shifted = jax.lax.cond(jnp.any(shifts > 0), do_shift, lambda r: r, rows)

    # chunk write as a 128-sample ROW gather: `starts` are 128-aligned by
    # the session host (samples before the watermark are resent to pad), so
    # chunk element s - starts lives at row (s//128 - starts//128), lane
    # s%128 — contiguous rows instead of an element gather
    vals3 = jnp.take_along_axis(
        chunks.reshape(U, C // 128, 128),
        jnp.clip(
            jnp.arange(N // 128, dtype=jnp.int32)[None, :] - starts[:, None] // 128,
            0, C // 128 - 1,
        )[:, :, None],
        axis=1,
    )
    vals = vals3.reshape(U, N)
    pos = jnp.arange(N, dtype=jnp.int32)[None, :] - starts[:, None]
    in_chunk = (pos >= 0) & (pos < lens[:, None])
    new_rows = jnp.where(in_chunk, vals, shifted)
    return pool.at[lanes].set(new_rows)


@jax.jit
def _pool_gather(pool: jnp.ndarray, lanes: jnp.ndarray) -> jnp.ndarray:
    return pool[lanes]


class AudioPool:
    """Per-lane 30 s audio windows resident in device HBM.

    Sessions ship only the samples appended since their last tick (~32 KB/s
    int16) instead of re-uploading the whole window (~1 MB/tick); window
    eviction becomes an on-device roll. Chunk width is bucketed so the set
    of compiled update programs stays small.
    """

    CHUNK_BUCKETS = (32000, 160000, N_SAMPLES)  # 2 s / 10 s / full window

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.pool = jnp.zeros((capacity, N_SAMPLES), jnp.int16)
        self._free = list(range(capacity))
        self.n_updates = 0

    def acquire(self) -> Optional[int]:
        return self._free.pop() if self._free else None

    def release(self, lane: int) -> None:
        self._free.append(lane)

    def update(self, updates: List[Tuple[int, int, int, np.ndarray]]) -> None:
        """updates: (lane, shift, start, new_i16)."""
        if not updates:
            return
        U = len(updates)
        max_new = max(len(u[3]) for u in updates)
        C = next(b for b in self.CHUNK_BUCKETS if b >= max_new)
        lanes = np.zeros(U, np.int32)
        shifts = np.zeros(U, np.int32)
        starts = np.zeros(U, np.int32)
        lens = np.zeros(U, np.int32)
        chunks = np.zeros((U, C), np.int16)
        for i, (lane, shift, start, new) in enumerate(updates):
            lanes[i], shifts[i], starts[i], lens[i] = lane, shift, start, len(new)
            chunks[i, : len(new)] = new
        self.pool = _pool_update(
            self.pool,
            jnp.asarray(lanes),
            jnp.asarray(shifts),
            jnp.asarray(starts),
            jnp.asarray(lens),
            jnp.asarray(chunks),
        )
        self.n_updates += 1

    def gather(self, lanes: List[int]) -> jnp.ndarray:
        return _pool_gather(self.pool, jnp.asarray(np.asarray(lanes, np.int32)))


# ---------------------------------------------------------------------------
# Tick input/output records (host <-> device boundary)
# ---------------------------------------------------------------------------


@dataclass
class TickInputs:
    """Per-lane host-assembled inputs for one streaming tick."""

    audio: Optional[np.ndarray]  # [<=N_SAMPLES] float32; None in pool mode
    prefix_ids: List[int]
    sot_index: int
    content_frames: int
    last_attend: int
    is_last: bool
    max_new: int
    pool_lane: Optional[int] = None
    pool_update: Optional[Tuple[int, int, np.ndarray]] = None  # (shift, start, new_i16)
    # incremental-encoding plan (None = legacy full re-encode)
    enc_mode: Optional[str] = None   # "anchor" | "inc"
    enc_lane: Optional[int] = None
    tail_start: int = 0
    write_start: int = 0
    enc_commit: Optional[Tuple] = None  # ((gen, evicted), win) applied in finish_tick
    # group-resident cross-KV cache routing (XKVAllocator)
    xkv_gi: Optional[int] = None
    xkv_slot: Optional[int] = None
    # self-KV refresh plan (pooled inc ticks; see alignatt_tick_inc_skv):
    # slot 0 = sot row, slot R-1 = last prefix row, scratch-padded between
    skv_refresh_tokens: Optional[np.ndarray] = None  # [R] int32
    skv_refresh_pos: Optional[np.ndarray] = None     # [R] int32


@dataclass
class TickOutputs:
    """Per-lane device outputs of one streaming tick."""

    new_tokens: List[int]     # max_steps entries
    n_keep: int
    frames: np.ndarray        # [max_steps]
    reason: int
    no_speech_p: float
    last_attend: int
    fire: bool = True         # CIF end-of-word boundary at chunk end


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
# time, by encode-mode partition (exported via BatchScheduler.stats)
TICK_PHASE_STATS: dict = {}

# why lanes fell off the cheap "inc" path (exported next to TICK_PHASE_STATS;
# the e2e-vs-tick-model gap attribution needs to know whether anchors come
# from evictions — the 1-in-epoch cost the capacity model amortizes — or
# from resets/catch-up bursts the model does not see)
ANCHOR_REASONS: dict = {}


def _count_anchor(reason: str) -> None:
    ANCHOR_REASONS[reason] = ANCHOR_REASONS.get(reason, 0) + 1


def _dispatch_group_legacy(engine, ticks, tokenizer, pool):
    n = len(ticks)
    B = 1 << (n - 1).bit_length()
    p_max = max(engine.bucket_for(len(t.prefix_ids)) for t in ticks)
    arr = _collect_lane_arrays(engine, ticks, tokenizer, B, p_max)
    audio = _gather_full_audio(ticks, pool, B)
    args, statics = _core_device_args(engine, arr, tokenizer, p_max)
    raw = alignatt_tick(engine.params, audio, *args, **statics)
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
    raw = alignatt_tick_anchor(
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
    raw = alignatt_tick_inc(
        engine.params, pool.pool, enc_pool.pool,
        jnp.asarray(audio_lanes), jnp.asarray(enc_lanes),
        jnp.asarray(tail_start), jnp.asarray(win_frames),
        jnp.asarray(write_start),
        *args, **statics, tail_frames=engine.cfg.enc_tail_frames,
    )
    enc_pool.pool = raw[-1]
    return lambda: _scatter_outputs(raw[0], n, engine.cfg.max_steps)


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


def _whole_group_anchor_fits(engine, xkv: "XKVAllocator", gi: int, G: int, p_max: int) -> bool:
    """Budget-math guard for the whole-group anchor: its XLA temp must fit
    in the device's free HBM (pools of EVERY resident group count against
    it) with a safety margin. Falls back to the single-group proxy when the
    platform exposes no memory stats (e.g. CPU tests)."""
    g = xkv.groups[gi]
    if g.whole_anchor_blocked:
        return False
    free = _device_free_bytes()
    if free is None:
        return len(xkv.groups) == 1
    temp = _anchor_group_temp_bytes(engine, xkv, G, p_max)
    if temp is None:
        return len(xkv.groups) == 1
    return temp + _ANCHOR_HBM_MARGIN <= free


def precompile_serving_programs(
    engine, xkv: "XKVAllocator", enc_capacity: int, audio_capacity: int
) -> dict:
    """AOT-compile the steady-serving program set into the (persistent)
    compile cache so no session ever stalls on a mid-stream compile:

    - the group inc tick (alignatt_tick_inc_skv at the group width),
    - the chunked anchor (alignatt_tick_anchor_pooled at B=8 x cap bucket —
      the ONE shape capped engines route every chunk to),
    - the whole-group anchor (via _anchor_group_temp_bytes, which the
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
            alignatt_tick_inc_skv.lower(
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
    B = 8
    t0 = time.perf_counter()
    try:
        alignatt_tick_anchor_pooled.lower(
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
        times["anchor_pooled"] = round(time.perf_counter() - t0, 1)
    except Exception as e:
        logger.warning("precompile anchor_pooled failed: %s", e)
        times["anchor_pooled"] = None

    t0 = time.perf_counter()
    temp = _anchor_group_temp_bytes(engine, xkv, G, p_max)
    times["anchor_group"] = round(time.perf_counter() - t0, 1) if temp is not None else None
    logger.info("serving programs precompiled: %s", times)
    return times


def _recover_group(engine, xkv: "XKVAllocator", gi: int, enc_pool: Optional[EncPool]) -> None:
    """Rebuild a group's (and the encoder pool's) donated-and-destroyed
    arrays with fresh zeros and bump generations: sessions notice on their
    next prepare_tick (generation mismatch), drop their device mirrors, and
    re-anchor from host audio + prefix — the anchor prefill reseeds every
    pool row exactly, so recovery costs one anchor per session and loses no
    audio (host segments and the audio pool are intact)."""
    g = xkv.groups[gi]
    dims = engine.dims
    Tp = -(-dims.n_audio_ctx // 128) * 128
    G = g.group_width
    shape = (dims.n_text_layer, G, dims.n_text_head, dims.head_dim, Tp)
    g.k = jnp.zeros(shape, xkv.dtype)
    g.v = jnp.zeros(shape, xkv.dtype)
    if g.skv_width:
        K = int(engine.align_layers.shape[0])
        sshape = (dims.n_text_layer, G, g.skv_width, dims.n_text_head, dims.head_dim)
        g.skv_k = jnp.zeros(sshape, xkv.skv_dtype)
        g.skv_v = jnp.zeros(sshape, xkv.skv_dtype)
        T = dims.n_audio_ctx
        g.asum = jnp.zeros((G, K, T), jnp.float32)
        g.asq = jnp.zeros((G, K, T), jnp.float32)
        g.alast = jnp.zeros((G, K, T), jnp.float32)
        g.acount = jnp.zeros((G,), jnp.float32)
        g.tok = jnp.zeros((G, dims.n_text_ctx), jnp.int32)
    g.generation += 1
    if enc_pool is not None:
        enc_pool.pool = jnp.zeros(
            (enc_pool.capacity, dims.n_audio_ctx, dims.n_audio_state),
            engine.params["decoder"]["tok_emb"].dtype,
        )
        enc_pool.generation += 1
    n_t, tot, lanes = TICK_PHASE_STATS.get("pool_recovery", (0, 0.0, 0))
    TICK_PHASE_STATS["pool_recovery"] = (n_t + 1, tot, lanes)


def _dispatch_pooled_recovering(dispatch, engine, xkv, gi, enc_pool, ticks,
                                tokenizer, pool, what: str):
    """Dispatch a pooled group program; on failure AT EITHER PHASE (the
    dispatch, or the deferred fetch where async runtime errors surface),
    contain it: recover the group's pools and serve the in-flight ticks via
    the legacy full-window program (correct from host state alone). The
    whole-group anchor additionally memoizes the failure so it is never
    retried on this group (the chunked path takes over permanently).
    Returns a fetch closure either way."""

    def recover():
        logger.exception(
            "pooled %s program failed for group %d — recovering pools, "
            "serving %d lanes via the legacy program", what, gi, len(ticks)
        )
        if what == "anchor_group":
            xkv.groups[gi].whole_anchor_blocked = True
        _recover_group(engine, xkv, gi, enc_pool)
        return _run_group_legacy(engine, ticks, tokenizer, pool)

    try:
        fetch = dispatch()
    except (jax.errors.JaxRuntimeError, RuntimeError):
        outs = recover()
        return lambda: outs

    def safe_fetch():
        try:
            return fetch()
        except (jax.errors.JaxRuntimeError, RuntimeError):
            return recover()

    return safe_fetch


def _skv_full_refresh_rows(engine, skv_width: int) -> int:
    """Static width of the FULL-prefix refresh plan: slot 0 (sot row) + up
    to serving-cap prefix rows, rounded up to a multiple of 8 so the block
    decode keeps the flash-prefill path (decode() requires S % 8 == 0).
    One of exactly two compiled refresh widths (the other SKV_REFRESH_ROWS),
    so serving never compiles a fresh shape mid-stream."""
    cap = engine.serving_prefix_cap or (skv_width - engine.cfg.max_steps - 2)
    return -(-(cap + 1) // 8) * 8


def _dispatch_group_xkv_inc(engine, ticks, tokenizer, pool, enc_pool, xkv, gi):
    """Incremental ticks over the group-resident cross-KV AND self-KV pools
    (alignatt_tick_inc_skv — no per-tick prefill, no prefix upload, and no
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
        raw = alignatt_tick_inc_skv(
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
            raw = alignatt_tick_anchor_group(
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
    for c0 in range(0, len(ticks), CHUNK):
        chunk = ticks[c0 : c0 + CHUNK]
        n = len(chunk)
        # ONE compiled shape for every chunked anchor (capped engines): a
        # short chunk pads to the full CHUNK width and every prefix pads to
        # the cap's bucket. Joins waste a little prefill; serving never
        # stalls on a fresh (width, bucket) compile mid-stream (the r3 e2e
        # runs spent most of their measured window compiling straggler
        # anchor shapes — wall 798 s for a 60 s run at n=40).
        if engine.serving_prefix_cap:
            B = CHUNK
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
            raw = alignatt_tick_anchor_pooled(
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


class AlignAttSession:
    """Per-session mutable state + the infer() host policy.

    Equivalent of reference AlignAtt + DecoderState for one stream; all
    tensor work happens in AlignAttEngine's compiled tick.
    """

    def __init__(self, engine: AlignAttEngine, tokenizer: Optional[Tokenizer] = None):
        self.engine = engine
        self.cfg = engine.cfg
        self.tokenizer = tokenizer or engine.tokenizer
        self.speaker: int = -1
        self.global_time_offset = 0.0
        self.detected_language: Optional[str] = None
        self.first_timestamp: Optional[float] = None
        self.pool: Optional[AudioPool] = None  # set by the scheduler
        self.pool_lane: Optional[int] = None
        self._pool_synced: Optional[Tuple[int, int, int]] = None  # (gen, start, len)
        # incremental-encoding cache (set by the scheduler when enabled)
        self.enc_pool: Optional[EncPool] = None
        self.enc_lane: Optional[int] = None
        self._enc_synced_frames = 0
        self._enc_key: Optional[Tuple[int, int]] = None  # (audio_gen, evicted)
        self._enc_pool_gen = 0
        # group-resident cross-KV cache (set by the scheduler when enabled)
        self.xkv_alloc: Optional[XKVAllocator] = None
        self.xkv_gi: Optional[int] = None
        self.xkv_slot: Optional[int] = None
        self._xkv_epoch_seen = 0
        self._xkv_group_gen = 0
        self._reset_segment_state()
        max_ctx = self.cfg.max_context_tokens
        if max_ctx is None:
            # large class: keep steady-state prefixes inside the 128 bucket
            # (context 64 + sot 4 + current-window tokens) — prefill time
            # and the tick program's temp both scale with the bucket (see
            # prefix_buckets above); smaller models keep the reference-like
            # half-context default
            dims_ = engine.dims
            large = dims_.n_audio_state >= 1280 and dims_.n_text_layer >= 16
            max_ctx = 64 if large else dims_.n_text_ctx // 2
        self._max_ctx_auto = self.cfg.max_context_tokens is None
        self.max_context_tokens = max_ctx
        self.max_text_len = engine.dims.n_text_ctx

    # ---- state management ----------------------------------------------------

    def _reset_segment_state(self) -> None:
        self.segments: List[np.ndarray] = []
        self.committed_tokens: List[List[int]] = []  # per retained audio segment era
        self.context = TokenBufferCtx(
            self.tokenizer, prefix_token_ids=[self.tokenizer.sot_prev]
        )
        if self.cfg.static_init_prompt:
            self.context.text = self.cfg.static_init_prompt
        if self.cfg.init_prompt:
            self.context.text += self.cfg.init_prompt
        self.cumulative_time_offset = 0.0
        self.last_attend_frame = -self.cfg.rewind_threshold
        self.pending_incomplete_tokens: List[int] = []
        self.pending_incomplete_token_timestamps: List[float] = []
        self.pending_retries = 0
        # device self-KV cache token mirror (None = pooled rows invalid; the
        # next pooled tick rebuilds them via the anchor prefill)
        self.skv_tokens: Optional[List[int]] = None
        # prepare_tick's cap tail-keep: head tokens currently dropped (block-
        # aligned with hysteresis so the kept head stays put across ticks)
        self._cap_head_drop = 0
        # set when this tick will pay a full prefill anyway (eviction, pool
        # resync): trim_context then trims DEEP (two blocks under the cap)
        # so the cap does not bind again before the next forced anchor —
        # cap-trim head shifts between anchors each cost one extra full
        # prefill (measured e2e n=24: skv_miss.head_shift 580/1178 anchors)
        self._deep_trim = False
        # audio-pool sync bookkeeping
        self.evicted_samples = 0
        self._audio_gen = getattr(self, "_audio_gen", 0) + 1

    def refresh_segment(self, complete: bool = False) -> None:
        keep = [] if (complete or len(self.segments) <= 2) else self.segments[-2:]
        self._reset_segment_state()
        self.segments = list(keep)

    @property
    def initial_tokens(self) -> List[int]:
        return list(self.tokenizer.sot_sequence_including_notimestamps)

    def segments_len(self) -> float:
        return sum(s.shape[0] for s in self.segments) / SAMPLE_RATE

    def insert_audio(self, segment: Optional[np.ndarray] = None) -> float:
        """Append audio; evict oldest past audio_max_len, scrolling committed
        tokens into the text context (reference simul_whisper.py:219-237).

        With an encoder cache, eviction happens in blocks instead of
        continuously: every eviction shifts the window coordinates and
        invalidates the cached frames (one full re-anchor), so batching
        evictions amortizes re-anchors to ~1 per block instead of 1/tick."""
        if segment is not None:
            self.segments.append(np.asarray(segment, np.float32))
        removed = 0.0
        total = self.segments_len()
        limit = self.cfg.audio_max_len
        if (self.enc_pool is not None or self.xkv_slot is not None) and total > limit:
            block = self.cfg.evict_block_s or self.cfg.audio_max_len / 2
            limit = max(self.cfg.audio_max_len - block, 1.0)
        while len(self.segments) > 1 and total > limit:
            removed = self.segments[0].shape[0] / SAMPLE_RATE
            total -= removed
            self.last_attend_frame -= int(TOKENS_PER_SECOND * removed)
            self.cumulative_time_offset += removed
            self.evicted_samples += self.segments[0].shape[0]
            self.segments = self.segments[1:]
            if self.committed_tokens:
                self.context.append_token_ids(self.committed_tokens[0])
                self.committed_tokens = self.committed_tokens[1:]
            self._deep_trim = True  # eviction forces an anchor: trim deep
        return removed

    def trim_context(self) -> None:
        ctx_ids = self.context.as_token_ids()
        c = len(ctx_ids) - len(self.context.prefix_token_ids)
        committed = sum(len(t) for t in self.committed_tokens)
        l = len(self.initial_tokens) + committed + c
        # pooled serving bounds the WHOLE prefix (context + sot + in-window
        # committed) at the serving cap so the self-KV pool width stays
        # small (see serving_prefix_cap). Context is trimmed first: it is
        # scrolled committed history, so the effective text history is
        # still the last ~cap tokens — the split between "context" and
        # "committed" just shifts within the window as tokens commit.
        cap = self.engine.serving_prefix_cap if self.xkv_alloc is not None else 0
        total = l + len(self.context.prefix_token_ids)
        max_ctx = self.max_context_tokens
        if cap and self._max_ctx_auto:
            # let context fill the cap early in the epoch (the cap trim
            # below is the real bound); a fixed 64 would waste cap room
            max_ctx = max(max_ctx, cap)
        after = len(self.cfg.static_init_prompt or "")
        # Hysteresis on the cap trim: trimming exactly to the cap shifts the
        # prefix head EVERY tick once the session saturates it, which moves
        # every row's position, misses the self-KV refresh plan, and forces
        # a full prefill per tick (measured n=24 e2e: 975/1178 anchors were
        # skv_plan_miss). Trimming a block below the cap keeps the prefix
        # head stable for the next ~block of commits — one re-anchor per
        # block instead of one per tick. On ticks that pay a full prefill
        # anyway (eviction, mirror resync) trim TWO blocks deep so the cap
        # does not bind again before the next forced anchor.
        deep = self._deep_trim or self.skv_tokens is None
        blk = min(32, cap // 4) if cap else 0
        cap_lo = max(1, cap - (2 * blk if deep else blk)) if cap else 0
        trim_now = cap and (total > cap or (deep and total > cap_lo))
        cap_target = cap_lo if trim_now else cap
        while c > max_ctx or l > self.max_text_len - 20 or (cap and total > cap_target):
            t = self.context.trim_words(after=after)
            l -= t
            c -= t
            total -= t
            if t == 0:
                break

    def _prefix_ids(self) -> Tuple[List[int], int]:
        ids: List[int] = []
        if not self.context.is_empty() or self.context.prefix_token_ids:
            ctx = self.context.as_token_ids()
            if len(ctx) > 1:  # skip bare sot_prev with no text
                ids.extend(ctx)
        sot_index = len(ids) + self.tokenizer.sot_sequence.index(self.tokenizer.sot)
        ids.extend(self.initial_tokens)
        for seg_tokens in self.committed_tokens:
            ids.extend(seg_tokens)
        return ids, sot_index

    # ---- the per-tick inference ---------------------------------------------

    def prepare_tick(self, is_last: bool = False) -> Optional["TickInputs"]:
        """Host phase 1: assemble per-lane device inputs, or None (no work)."""
        if not self.segments:
            return None
        if self.segments_len() < self.cfg.audio_min_len:
            return None
        self._maybe_epoch_evict()

        eng = self.engine
        dims = eng.dims

        audio = np.concatenate(self.segments) if len(self.segments) > 1 else self.segments[0]
        audio = audio[:N_SAMPLES]  # first 30 s, like reference pad_or_trim(3000)
        audio_s = len(audio) / SAMPLE_RATE
        content_frames = int(len(audio) // 320)  # encoder frames (20 ms each)

        self._maybe_detect_language(audio)

        self.trim_context()
        prefix_ids, sot_index = self._prefix_ids()
        # pooled serving: hard cap even when context trimming could not get
        # under it (in-window committed + sot alone exceed the cap) — the
        # self-KV pool rows only exist up to the cap
        cap = eng.serving_prefix_cap if self.xkv_alloc is not None else 0
        p_need = eng.bucket_for(len(prefix_ids))
        if cap:
            p_need = min(p_need, eng.bucket_for(cap))
        keep_max = min(p_need, cap or p_need)
        if len(prefix_ids) > keep_max:
            # Block-aligned head drop with hysteresis (the tail-keep analog
            # of trim_context's cap_lo): keeping exactly the last `keep_max`
            # tokens moves the head every tick once in-window commits exceed
            # the cap — the dominant first-epoch case, since context is
            # empty until the first eviction (measured e2e n=24:
            # skv_miss.head_shift 593, one full prefill per tick). Dropping
            # a block EXTRA keeps the head fixed for the next ~block of
            # commits, so the self-KV refresh plan keeps hitting.
            drop_need = len(prefix_ids) - keep_max
            blk = min(32, max(8, keep_max // 4))
            extra = 2 * blk if (self._deep_trim or self.skv_tokens is None) else blk
            if (
                self._cap_head_drop < drop_need
                or self._cap_head_drop > drop_need + 2 * blk
                or self._cap_head_drop >= len(prefix_ids) - 1
            ):
                self._cap_head_drop = drop_need + extra
            drop = min(self._cap_head_drop, len(prefix_ids) - 1)
            prefix_ids = prefix_ids[drop:]
            sot_index = max(0, min(sot_index - drop, len(prefix_ids) - 1))
        else:
            self._cap_head_drop = 0
        self._deep_trim = False

        ti = TickInputs(
            audio=audio,
            prefix_ids=prefix_ids,
            sot_index=sot_index,
            content_frames=content_frames,
            last_attend=self.last_attend_frame,
            is_last=is_last,
            max_new=max(50, int(audio_s * 15 * 1.5)),
        )
        self._attach_pool_update(ti, audio)
        self._attach_enc_plan(ti)
        return ti

    def _maybe_epoch_evict(self) -> None:
        """Group-synchronized eviction: when a new anchor sub-epoch matching
        this session's cohort (slot % anchor_cohorts) has passed, evict a
        block early (window permitting) so the cohort re-anchors in one
        batched program and eviction phases stay aligned per cohort (the
        scheduler paces sub-epochs at anchor_cohorts per evict block of
        group ticks; cohorts=1 reproduces whole-group anchors)."""
        if self.xkv_alloc is None or self.xkv_slot is None:
            return
        g = self.xkv_alloc.groups[self.xkv_gi]
        cur = g.sub_epoch
        if cur == self._xkv_epoch_seen:
            return
        C = self.xkv_alloc.anchor_cohorts
        due = any(
            k % C == self.xkv_slot % C
            for k in range(self._xkv_epoch_seen + 1, cur + 1)
        )
        self._xkv_epoch_seen = cur
        if not due:
            return
        block = self.cfg.evict_block_s or self.cfg.audio_max_len / 2
        limit = max(self.cfg.audio_max_len - block, 1.0)
        total = self.segments_len()
        while len(self.segments) > 1 and total > limit:
            removed = self.segments[0].shape[0] / SAMPLE_RATE
            total -= removed
            self.last_attend_frame -= int(TOKENS_PER_SECOND * removed)
            self.cumulative_time_offset += removed
            self.evicted_samples += self.segments[0].shape[0]
            self.segments = self.segments[1:]
            if self.committed_tokens:
                self.context.append_token_ids(self.committed_tokens[0])
                self.committed_tokens = self.committed_tokens[1:]
        # eviction shifts coordinates -> _enc_key mismatch -> anchor plan;
        # sessions whose window was below the threshold anchor anyway (the
        # refresh is exact, and it keeps the whole group in one program)
        self._enc_key = None
        self._deep_trim = True

    def _attach_enc_plan(self, ti: TickInputs) -> None:
        """Choose how this tick encodes: "inc" extends the cached frames with
        a tail re-encode; "anchor" recomputes the full window (first tick,
        after eviction/reset, or when the lane fell too far behind)."""
        if ti.pool_lane is None:
            return  # tail slicing needs the device-resident audio window
        if self.cfg.decoder_type == "beam" and self.cfg.beam_size > 1:
            return
        # failure-recovery resync: a destroyed-and-rebuilt pool
        # (_recover_group generation bump) invalidates this session's device
        # mirrors — drop them so this tick re-anchors from host state
        if self.enc_pool is not None and self._enc_pool_gen != self.enc_pool.generation:
            self._enc_pool_gen = self.enc_pool.generation
            self._enc_key = None
            self._enc_synced_frames = 0
        if self.xkv_alloc is not None and self.xkv_slot is not None:
            gen = self.xkv_alloc.groups[self.xkv_gi].generation
            if self._xkv_group_gen != gen:
                self._xkv_group_gen = gen
                self.skv_tokens = None
        use_xkv = (
            self.xkv_alloc is not None
            and self.enc_pool is not None  # pooled ticks project from cached rows
            and not self.engine.use_cif
        )
        if use_xkv and self.xkv_slot is None:
            got = self.xkv_alloc.acquire()
            if got is not None:
                self.xkv_gi, self.xkv_slot = got
                self._xkv_epoch_seen = self.xkv_alloc.groups[self.xkv_gi].sub_epoch
                self._xkv_group_gen = self.xkv_alloc.groups[self.xkv_gi].generation
        if self.enc_pool is not None:
            if self.enc_lane is None:
                self.enc_lane = self.enc_pool.acquire()
            if self.enc_lane is None:
                return  # cache exhausted: legacy full re-encode
        else:
            return
        win = ti.content_frames
        key = (self._audio_gen, self.evicted_samples)
        tail = self.cfg.enc_tail_frames
        write_start = max(0, self._enc_synced_frames - self.cfg.enc_rewrite_margin)
        pooled = use_xkv and self.xkv_slot is not None
        if pooled:
            # the pool splice re-projects the aligned 256-column window
            # [align128(win-128), +256) from the updated rows: every
            # unsynced frame must fall inside it (longer catch-up bursts
            # re-anchor)
            dst0 = max(0, ((win - 128) // 128) * 128)
            splice_ok = write_start >= dst0
        else:
            splice_ok = True
        if (
            self._enc_key == key
            and 0 < self._enc_synced_frames <= win
            # tail - 2: the device rounds tail_start UP to even for the
            # aligned audio row gather, shortening coverage by <= 1 frame
            and win - write_start <= tail - 2
            and splice_ok
        ):
            ti.enc_mode = "inc"
            ti.write_start = write_start
            ti.tail_start = max(0, win - tail)
        else:
            ti.enc_mode = "anchor"
            if self._enc_key != key:
                _count_anchor("evict_or_reset")
            elif not (0 < self._enc_synced_frames <= win):
                _count_anchor("unsynced")
            elif win - write_start > tail - 2:
                _count_anchor("catchup_burst")
            else:
                _count_anchor("splice_window")
        if pooled and ti.enc_mode == "inc":
            plan = self._skv_refresh_plan(ti)
            if plan is None:
                # prefix shifted beyond the refresh reach (context trim,
                # truncation, >R-1 delta rows): rebuild the pooled decoder
                # state with a full prefill via the anchor path
                ti.enc_mode = "anchor"
                _count_anchor("skv_plan_miss")
            else:
                ti.skv_refresh_tokens, ti.skv_refresh_pos = plan
        if pooled:
            ti.xkv_gi, ti.xkv_slot = self.xkv_gi, self.xkv_slot
        ti.enc_lane = self.enc_lane
        ti.enc_commit = (key, win)

    def _skv_refresh_plan(self, ti: TickInputs):
        """Per-tick self-KV refresh rows (see alignatt_tick_inc_skv).

        The device cache mirror (``skv_tokens`` — prefix + kept tokens as of
        the last tick) tells which cache rows already match this tick's
        prefix; the refresh must cover the delta rows [common, plen) plus
        the always-fresh sot row (slot 0) and last prefix row (slot R-1).
        Returns (tokens [R], positions [R]) or None when the delta exceeds
        the refresh reach (→ full prefill)."""
        m = self.skv_tokens
        p = ti.prefix_ids
        plen = len(p)
        if m is None or plen == 0:
            _count_anchor("skv_miss.no_mirror")
            return None
        R = SKV_REFRESH_ROWS
        common = 0
        for a, b in zip(m, p):
            if a != b:
                break
            common += 1
        g = self.xkv_alloc.groups[self.xkv_gi]
        Wc = g.skv_width
        if plen > Wc - 2:  # would collide with the scratch row; anchor instead
            _count_anchor("skv_miss.width")
            return None
        if plen - common > R - 1:
            # Delta exceeds the slim refresh reach (prefix head moved — cap
            # trim / eviction reshuffle — or a commit burst). The encoder
            # state is still valid in inc mode, so a full-window anchor
            # would waste a 30 s re-encode on an unchanged window: instead
            # re-decode the WHOLE prefix through the same refresh machinery
            # (R_full rows; decode() scatters each row's K/V before
            # attending, so the rebuilt self-KV rows equal an anchor
            # prefill's). Gate running stats keep their inter-anchor
            # bounded staleness, same as the slim refresh.
            Rf = _skv_full_refresh_rows(self.engine, Wc)
            if plen > Rf - 1:
                _count_anchor(
                    "skv_miss.head_shift" if common < plen // 2
                    else "skv_miss.delta_burst"
                )
                return None
            _count_anchor(
                "fullrefresh.head_shift" if common < plen // 2
                else "fullrefresh.delta_burst"
            )
            R = Rf
            start = 0
        else:
            start = max(0, min(common, plen - 1), plen - (R - 1))
        rows = list(range(start, plen))
        tok = np.full(R, self.tokenizer.eot, np.int32)
        pos = np.full(R, Wc - 1, np.int32)  # scratch padding
        si = min(ti.sot_index, plen - 1)
        tok[0], pos[0] = p[si], si
        k = R - len(rows)
        for j, q in enumerate(rows):
            tok[k + j], pos[k + j] = p[q], q
        return tok, pos

    def _attach_pool_update(self, ti: TickInputs, audio: np.ndarray) -> None:
        """Compute the incremental device-window update for pool mode."""
        if self.pool is None:
            return
        if self.cfg.decoder_type == "beam" and self.cfg.beam_size > 1:
            return  # beam ticks use direct transfer; don't advance sync state
        if self.pool_lane is None:
            self.pool_lane = self.pool.acquire()
            if self.pool_lane is None:  # pool exhausted: plain transfer path
                return
        gen, cur_start, cur_len = self._audio_gen, self.evicted_samples, len(audio)

        def to_i16(a):
            return (np.clip(a, -1.0, 1.0 - 1 / 32768) * 32768.0).astype(np.int16)

        synced = self._pool_synced
        incremental = (
            synced is not None
            and synced[0] == gen
            and synced[1] <= cur_start
            and cur_start - synced[1] <= synced[2]
            and synced[1] + synced[2] <= cur_start + cur_len
            and cur_len <= N_SAMPLES
        )
        if incremental:
            shift = cur_start - synced[1]
            kept = synced[2] - shift
            # align the write start to a 128-sample boundary (resending the
            # <=127 overlapping samples) so the device-side chunk write is a
            # fast aligned row gather (_pool_update)
            start_al = (kept // 128) * 128
            ti.pool_update = (shift, start_al, to_i16(audio[start_al:]))
        else:
            ti.pool_update = (N_SAMPLES, 0, to_i16(audio))
        ti.pool_lane = self.pool_lane
        self._pool_synced = (gen, cur_start, cur_len)
        # ti.audio is kept as the fallback for mixed batches (pool exhausted
        # on some lanes); pool-mode batches never transfer it.

    def release_pool_lane(self) -> None:
        if self.pool is not None and self.pool_lane is not None:
            self.pool.release(self.pool_lane)
            self.pool_lane = None
            self._pool_synced = None
        if self.enc_pool is not None and self.enc_lane is not None:
            self.enc_pool.release(self.enc_lane)
            self.enc_lane = None
            self._enc_synced_frames = 0
            self._enc_key = None
        if self.xkv_alloc is not None and self.xkv_slot is not None:
            self.xkv_alloc.release(self.xkv_gi, self.xkv_slot)
            self.xkv_gi = None
            self.xkv_slot = None
            self._enc_synced_frames = 0
            self._enc_key = None
            self.skv_tokens = None

    def infer(self, is_last: bool = False) -> List[ASRToken]:
        ti = self.prepare_tick(is_last)
        if ti is None:
            return []
        if self.cfg.decoder_type == "beam" and self.cfg.beam_size > 1:
            from .alignatt_beam import run_tick_batch_beam

            outs = run_tick_batch_beam(self.engine, [ti], self.tokenizer, self.cfg.beam_size)
        else:
            outs = run_tick_batch(
                self.engine, [ti], self.tokenizer, pool=self.pool,
                enc_pool=self.enc_pool, xkv=self.xkv_alloc,
            )
        return self.finish_tick(ti, outs[0])

    def finish_tick(self, ti: "TickInputs", out: "TickOutputs") -> List[ASRToken]:
        """Host phase 2: gate results → words, update session state."""
        if ti.enc_commit is not None and ti.enc_mode is not None:
            # the cache rows were written on device; record what they cover
            self._enc_key, self._enc_synced_frames = ti.enc_commit
        cfg = self.cfg
        n = out.n_keep
        reason_code = out.reason
        self.last_stop_reason = reason_code  # final-flush drain reads this
        self.last_attend_frame = out.last_attend

        kept = list(out.new_tokens[:n])
        if ti.xkv_slot is not None and ti.enc_mode is not None:
            # the device cache rows hold prefix + kept MINUS the final kept
            # token: its decode can be the loop's dead last step (skipped —
            # see DEAD_DECODE_SKIP), so its K/V row may not exist. Leaving
            # it out of the mirror makes the next tick's refresh re-decode
            # it (the refresh always covers [common, plen) plus the last
            # row). Rows beyond are dropped-token leftovers, masked until
            # overwritten.
            mirror = kept if reason_code != STOP_REWIND else []
            self.skv_tokens = list(ti.prefix_ids) + [int(t) for t in mirror[:-1]]
        step_frames = out.frames
        # timestamps: one per executed step; token i gets frame of step i
        # (= attention of the previous token — reference off-by-one semantics,
    	# align_att_base.py:240-247).
        n_steps = max(n, 1)
        timestamps = [
            float(step_frames[min(i, cfg.max_steps - 1)]) * 0.02 + self.cumulative_time_offset
            for i in range(n_steps)
        ]

        if reason_code == STOP_REWIND:
            kept = []

        tokens_to_split = kept
        token_timestamps = self._normalize_ts(timestamps, len(tokens_to_split))
        if self.pending_incomplete_tokens:
            tokens_to_split = self.pending_incomplete_tokens + tokens_to_split
            token_timestamps = (
                self.pending_incomplete_token_timestamps + token_timestamps
            )

        if cfg.never_fire:
            fire_detected = False
        elif self.engine.use_cif:
            fire_detected = out.fire
        else:
            fire_detected = True  # CIF absent ⇒ always_fire
        new_hypothesis, split_words, split_tokens = self._split_tokens(
            tokens_to_split, fire_detected, ti.is_last
        )

        if new_hypothesis:
            self.committed_tokens.append(list(new_hypothesis))

        if len(timestamps) >= 2 and self.first_timestamp is None:
            self.first_timestamp = timestamps[0]

        words = self._build_timestamped_words(split_words, split_tokens, token_timestamps)
        self._handle_pending(split_words, split_tokens, token_timestamps)
        return words

    def _maybe_detect_language(self, audio: np.ndarray) -> None:
        if (
            self.cfg.language == "auto"
            and self.detected_language is None
            and self.first_timestamp is not None
            and self.segments_len() - self.first_timestamp >= 2.0
        ):
            from ..decoding.task import WhisperDecoder

            dec = WhisperDecoder(self.engine.params, self.engine.dims)
            mel = pad_or_trim(
                log_mel_spectrogram(
                    jnp.asarray(audio), n_mels=self.engine.dims.n_mels,
                    padding=N_SAMPLES - len(audio),
                ),
                2 * self.engine.dims.n_audio_ctx,
            )[None]
            enc = wm.encode_jit(self.engine.params, mel, self.engine.dims)
            codes, probs = dec.detect_language(enc, self.tokenizer)
            top = codes[0]
            logger.info("Detected language: %s", top)
            from ..models.whisper.tokenizer import get_tokenizer

            self.tokenizer = get_tokenizer(
                True,
                num_languages=self.engine.dims.num_languages,
                language=top,
                task=self.cfg.task,
            )
            self.last_attend_frame = -self.cfg.rewind_threshold
            self.cumulative_time_offset = 0.0
            self.committed_tokens = []
            self.context = TokenBufferCtx(
                self.tokenizer, prefix_token_ids=[self.tokenizer.sot_prev]
            )
            self.skv_tokens = None
            self.detected_language = top

    # ---- post-decode helpers (reference align_att_base.py:325-470) -----------

    @staticmethod
    def _normalize_ts(timestamps: List[float], expected: int) -> List[float]:
        norm = [float(t) for t in timestamps[:expected]]
        if len(norm) >= expected:
            return norm
        fallback = norm[-1] if norm else 0.0
        return norm + [fallback] * (expected - len(norm))

    def _split_tokens(self, tokens_list, fire_detected, is_last):
        if fire_detected or is_last:
            new_hypothesis = tokens_list
            split_words, split_tokens = self.tokenizer.split_to_word_tokens(tokens_list)
        else:
            split_words, split_tokens = self.tokenizer.split_to_word_tokens(tokens_list)
            if len(split_words) > 1:
                new_hypothesis = [i for sub in split_tokens[:-1] for i in sub]
            else:
                new_hypothesis = []
        return new_hypothesis, split_words, split_tokens

    def _build_timestamped_words(self, split_words, split_tokens, token_timestamps):
        MIN_WORD_DURATION = 0.02
        FALLBACK_WORD_DURATION = 0.10
        out: List[ASRToken] = []
        ts_idx = 0
        for word, wtoks in zip(split_words, split_tokens):
            count = len(wtoks)
            if "�" in word:
                cleaned = word.replace("�", "")
                if not cleaned.strip():
                    ts_idx += count
                    continue
                word = cleaned
            wts = token_timestamps[ts_idx : ts_idx + count]
            if not wts:
                fallback = (
                    token_timestamps[min(ts_idx, len(token_timestamps) - 1)]
                    if token_timestamps
                    else 0.0
                )
                wts = [fallback]
            start = wts[0]
            nxt = ts_idx + count
            if nxt < len(token_timestamps):
                end = token_timestamps[nxt]
            else:
                end = wts[-1] + FALLBACK_WORD_DURATION
            end = max(end, start + MIN_WORD_DURATION)
            ts_idx += count
            out.append(
                ASRToken(
                    start=round(start, 2),
                    end=round(end, 2),
                    text=word,
                    speaker=self.speaker,
                    detected_language=self.detected_language,
                ).with_offset(self.global_time_offset)
            )
        return out

    def _handle_pending(self, split_words, split_tokens, token_timestamps):
        MAX_PENDING_TOKENS = 10
        MAX_PENDING_RETRIES = 2
        if split_words and "�" in split_words[-1]:
            self.pending_retries += 1
            if self.pending_retries > MAX_PENDING_RETRIES:
                self.pending_incomplete_tokens = []
                self.pending_incomplete_token_timestamps = []
                self.pending_retries = 0
            elif len(split_tokens[-1]) <= MAX_PENDING_TOKENS:
                self.pending_incomplete_tokens = split_tokens[-1]
                start_idx = sum(len(t) for t in split_tokens[:-1])
                pend_ts = token_timestamps[start_idx : start_idx + len(split_tokens[-1])]
                self.pending_incomplete_token_timestamps = self._normalize_ts(
                    pend_ts, len(split_tokens[-1])
                )
            else:
                self.pending_incomplete_tokens = []
                self.pending_incomplete_token_timestamps = []
                self.pending_retries = 0
        else:
            self.pending_incomplete_tokens = []
            self.pending_incomplete_token_timestamps = []
            self.pending_retries = 0
