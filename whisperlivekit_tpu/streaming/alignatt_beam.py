"""Beam-search variant of the AlignAtt streaming tick.

Reference: simul_whisper decodes with BeamSearchDecoder when --beams > 1
(reference simul_whisper/beam.py, decoder_state + KV rearrange on reorder).
In-graph design: each lane carries ``beam`` sub-lanes (flattened batch
B*beam); per step the top-``beam`` continuations per lane are selected over
[beam x vocab] scores, the KV cache / token buffers / attention statistics
are gathered along the sub-lane axis, and EOT-finished beams freeze (they
re-emit EOT at zero added score). The emission gate, rewind and timestamps
evaluate on the current best beam, matching the reference's use of beam 0.

Kept separate from the greedy program deliberately: the greedy path is the
battle-tested default; this file isolates beam complexity.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.mel import log_mel_spectrogram, pad_or_trim
from ..models.whisper import model as wm
from ..models.whisper.dims import ModelDimensions
from ..ops.median import median_filter
from .alignatt import (
    DEC_PAD,
    RUNNING,
    STOP_CAP,
    STOP_CTX,
    STOP_EOT,
    STOP_GATE,
    STOP_NOSPEECH,
    STOP_REWIND,
    TickInputs,
    TickOutputs,
    dry_penalty,
)


@partial(
    jax.jit,
    static_argnames=(
        "dims", "p_max", "max_steps", "beam", "eot", "ts_begin",
        "no_speech_tok", "space_tok",
    ),
)
def alignatt_tick_beam(
    params,
    audio: jnp.ndarray,          # [B, N_SAMPLES] int16/f32
    prefix: jnp.ndarray,         # [B, p_max]
    prefix_len: jnp.ndarray,     # [B]
    sot_index: jnp.ndarray,      # [B]
    content_frames: jnp.ndarray, # [B]
    last_attend: jnp.ndarray,    # [B]
    is_last: jnp.ndarray,        # [B]
    max_new: jnp.ndarray,        # [B]
    suppress_mask: jnp.ndarray,  # [V]
    align_layers: jnp.ndarray,
    align_heads: jnp.ndarray,
    frame_threshold: jnp.ndarray,
    rewind_threshold: jnp.ndarray,
    nonspeech_prob: jnp.ndarray,
    active_in: jnp.ndarray,
    dims: ModelDimensions,
    p_max: int,
    max_steps: int,
    beam: int,
    eot: int,
    ts_begin: int,
    no_speech_tok: int,
    space_tok: int,
):
    B = audio.shape[0]
    BM = B * beam
    align = wm.AlignSpec(layers=align_layers, heads=align_heads)
    T = dims.n_audio_ctx

    if audio.dtype == jnp.int16:
        audio = audio.astype(jnp.float32) / 32768.0
    mel = pad_or_trim(
        log_mel_spectrogram(audio, n_mels=dims.n_mels, precision=jax.lax.Precision.DEFAULT),
        2 * T,
    )
    enc = wm.encode(params, mel, dims)
    # transposed layout ([B,H,Dh,T]) — the decode-step fast path; exact
    # bf16 numerics (see model.cross_kv)
    xkv_b = wm.cross_kv(params, enc, dims, transposed=True)
    # replicate per-lane cross KV over beams: [L, B*beam, H, Dh, T]
    xkv = wm.CrossKV(
        k=jnp.repeat(xkv_b.k, beam, axis=1), v=jnp.repeat(xkv_b.v, beam, axis=1)
    )
    cache = wm.init_cache(
        dims, BM, dtype=params["decoder"]["tok_emb"].dtype,
        width=p_max + max_steps + 1,
    )

    prefix_bm = jnp.repeat(prefix, beam, axis=0)
    plen_bm = jnp.repeat(prefix_len, beam, axis=0)

    # prefill with in-scan alignment reductions (see alignatt._tick_core)
    row_mask = (jnp.arange(p_max)[None, :] < plen_bm[:, None]).astype(jnp.float32)
    last_onehot = (
        jnp.arange(p_max)[None, :] == (plen_bm - 1)[:, None]
    ).astype(jnp.float32)
    prefill_logits, (asum, asq, last_row), cache = wm.decode(
        params, prefix_bm, jnp.zeros((BM,), jnp.int32), xkv, cache, dims,
        align=align, align_reduce=(row_mask, last_onehot), xkv_transposed=True,
    )
    acount = plen_bm.astype(jnp.float32)

    no_speech_logits = jnp.take_along_axis(
        prefill_logits, jnp.repeat(sot_index, beam)[:, None, None], axis=1
    )[:, 0]
    no_speech_p = jax.nn.softmax(no_speech_logits, axis=-1)[:, no_speech_tok].reshape(B, beam)[:, 0]

    logits0 = jnp.take_along_axis(
        prefill_logits, (plen_bm - 1)[:, None, None], axis=1
    )[:, 0]

    tokens_buf = jnp.full((BM, dims.n_text_ctx), eot, jnp.int32)
    tokens_buf = jax.lax.dynamic_update_slice(tokens_buf, prefix_bm, (0, 0))

    frame_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    neg_inf = jnp.float32(-jnp.inf)
    lane_base = (jnp.arange(B, dtype=jnp.int32) * beam)[:, None]  # [B,1]

    init = dict(
        cache=cache,
        tokens=tokens_buf,
        logits=logits0,
        cum=jnp.where(jnp.arange(beam)[None, :] == 0, 0.0, neg_inf).repeat(B, 0),  # [B,beam]
        beam_done=jnp.zeros((B, beam), bool),
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
        cur_len = plen_bm + k  # [BM]

        # ---- filters per sub-lane ----
        lg = s["logits"] + suppress_mask[None, :]
        vocab_idx = jnp.arange(lg.shape[-1], dtype=jnp.int32)[None, :]
        blank = (vocab_idx == space_tok) | (vocab_idx == eot)
        lg = jnp.where((k == 0) & blank, neg_inf, lg)
        lg = dry_penalty(lg, s["tokens"], cur_len, eot)

        logprobs = jax.nn.log_softmax(lg, axis=-1).reshape(B, beam, -1)
        V = logprobs.shape[-1]
        # frozen beams: only EOT continues, at zero added score
        frozen = s["beam_done"][:, :, None]
        cont = jnp.where(vocab_idx[None] == eot, 0.0, neg_inf)
        logprobs = jnp.where(frozen, cont, logprobs)

        scores = s["cum"][:, :, None] + logprobs  # [B,beam,V]
        top_vals, top_idx = jax.lax.top_k(scores.reshape(B, beam * V), beam)
        src_beam = (top_idx // V).astype(jnp.int32)   # [B,beam]
        next_tok = (top_idx % V).astype(jnp.int32)

        src_lane = (lane_base + src_beam).reshape(-1)  # [BM]

        # ---- reorder sub-lane state ----
        def g(x):
            return jnp.take(x, src_lane, axis=0)

        tokens = g(s["tokens"])
        asum_r, asq_r, acount_r = g(s["asum"]), g(s["asq"]), g(s["acount"])
        last_row_r = g(s["last_row"])
        cache_r = wm.KVCache(
            k=jnp.take(s["cache"].k, src_lane, axis=1),
            v=jnp.take(s["cache"].v, src_lane, axis=1),
        )

        tok_flat = next_tok.reshape(-1)
        completed_beam = (tok_flat == eot).reshape(B, beam) | jnp.take_along_axis(
            s["beam_done"], src_beam, axis=1
        )
        cum = top_vals

        # ---- attention gate on the best beam (sub-lane 0 of each lane) ----
        mean = asum_r / jnp.maximum(acount_r, 1.0)[:, None, None]
        var = asq_r / jnp.maximum(acount_r, 1.0)[:, None, None] - mean * mean
        z = (last_row_r - mean) / (jnp.sqrt(jnp.maximum(var, 0.0)) + 1e-8)
        gatt = median_filter(z, 7).mean(axis=1)  # [BM,T]
        gatt = jnp.where(frame_idx < jnp.repeat(content_frames, beam)[:, None], gatt, neg_inf)
        frame_bm = jnp.argmax(gatt, axis=-1).astype(jnp.int32)
        frame = frame_bm.reshape(B, beam)[:, 0]

        frames = s["frames"].at[:, k].set(jnp.where(s["active"], frame, 0))

        nospeech_stop = (k == 0) & (no_speech_p > nonspeech_prob)
        prev_tok = jnp.take_along_axis(tokens, (cur_len - 1)[:, None], axis=1)[:, 0]
        special_exempt = prev_tok.reshape(B, beam)[:, 0] >= DEC_PAD
        rewind_cond = (~is_last) & (s["last_attend"] - frame > rewind_threshold)
        do_rewind = rewind_cond & ~special_exempt
        new_last_attend = jnp.where(
            rewind_cond & special_exempt, frame,
            jnp.where(do_rewind, -rewind_threshold, frame),
        )
        thr = jnp.where(is_last, 4, frame_threshold)
        gate = (content_frames - frame) <= thr
        best_done = completed_beam[:, 0]
        ctx_full = (plen_bm.reshape(B, beam)[:, 0] + k + 1) >= dims.n_text_ctx
        cap = (k + 1) > max_new

        stop_keep_k = best_done | gate
        stop_keep_0 = do_rewind | nospeech_stop | cap
        stop_keep_k1 = ctx_full & ~stop_keep_k & ~stop_keep_0
        stopped_now = (stop_keep_k | stop_keep_0 | stop_keep_k1) & s["active"]

        reason = s["reason"]
        reason = jnp.where(stopped_now & best_done, STOP_EOT, reason)
        reason = jnp.where(stopped_now & gate & ~best_done, STOP_GATE, reason)
        reason = jnp.where(stopped_now & do_rewind, STOP_REWIND, reason)
        reason = jnp.where(stopped_now & nospeech_stop, STOP_NOSPEECH, reason)
        reason = jnp.where(stopped_now & cap, STOP_CAP, reason)
        reason = jnp.where(stopped_now & stop_keep_k1, STOP_CTX, reason)

        n_keep = jnp.where(
            s["active"],
            jnp.where(stop_keep_0, 0, jnp.where(stop_keep_k, k, k + 1)),
            s["n_keep"],
        )

        write_pos = jnp.minimum(cur_len, dims.n_text_ctx - 1)
        keep = jnp.repeat(s["active"], beam)
        tokens = tokens.at[jnp.arange(BM), write_pos].set(
            jnp.where(keep, tok_flat, tokens[jnp.arange(BM), write_pos])
        )
        # record the best beam's token history each step (retroactive: the
        # best beam's full suffix is re-read at the end, so per-step token
        # recording only needs the final best lane — handled after the loop)

        active = s["active"] & ~stopped_now
        last_attend_out = jnp.where(s["active"], new_last_attend, s["last_attend"])

        new_logits, step_aprobs, cache_n = wm.decode(
            params, tok_flat[:, None], write_pos, xkv, cache_r, dims, align=align,
            xkv_transposed=True
        )
        step_row = step_aprobs.transpose(1, 0, 2, 3)[:, :, 0, :]
        upd = keep.astype(jnp.float32)[:, None, None]
        return dict(
            cache=cache_n,
            tokens=tokens,
            logits=new_logits[:, 0],
            cum=cum,
            beam_done=completed_beam,
            k=k + 1,
            active=active,
            n_keep=n_keep,
            reason=reason,
            new_tokens=s["new_tokens"],
            frames=frames,
            asum=asum_r + step_row * upd,
            asq=asq_r + step_row * step_row * upd,
            acount=acount_r + keep.astype(jnp.float32),
            last_row=jnp.where(keep[:, None, None], step_row, last_row_r),
            last_attend=last_attend_out,
        )

    out = jax.lax.while_loop(cond, body, init)
    # lanes active at exhaustion keep everything decoded (see alignatt_tick)
    reason = jnp.where(out["active"], STOP_CAP, out["reason"])
    n_keep = jnp.where(out["active"], jnp.int32(max_steps), out["n_keep"])

    # best beam per lane = sub-lane 0 (kept sorted by top_k each step)
    best_lane = jnp.arange(B, dtype=jnp.int32) * beam
    best_tokens = out["tokens"][best_lane]  # [B, n_ctx]
    # new tokens live at positions prefix_len .. prefix_len+max_steps
    step_pos = prefix_len[:, None] + jnp.arange(max_steps, dtype=jnp.int32)[None, :]
    new_tokens = jnp.take_along_axis(
        best_tokens, jnp.minimum(step_pos, dims.n_text_ctx - 1), axis=1
    )
    return (
        new_tokens,
        n_keep,
        out["frames"],
        reason,
        no_speech_p,
        out["last_attend"],
        jnp.ones((B,), bool),  # fire: CIF not wired for beam yet (always_fire)
    )


def run_tick_batch_beam(engine, ticks: List[TickInputs], tokenizer, beam: int) -> List[TickOutputs]:
    """Beam counterpart of run_tick_batch (no pool mode; direct transfer)."""
    from .alignatt import N_SAMPLES

    n = len(ticks)
    B = 1 << (n - 1).bit_length()
    cfg = engine.cfg
    dims = engine.dims
    p_max = max(engine.bucket_for(len(t.prefix_ids)) for t in ticks)

    audio = np.zeros((B, N_SAMPLES), np.int16)
    prefix = np.full((B, p_max), tokenizer.eot, np.int32)
    prefix_len = np.ones(B, np.int32)
    sot_index = np.zeros(B, np.int32)
    content_frames = np.zeros(B, np.int32)
    last_attend = np.zeros(B, np.int32)
    is_last = np.zeros(B, bool)
    max_new = np.ones(B, np.int32)
    active = np.zeros(B, bool)
    for i, t in enumerate(ticks):
        a = t.audio
        if a.dtype != np.int16:
            a = (np.clip(a, -1.0, 1.0 - 1 / 32768) * 32768.0).astype(np.int16)
        audio[i, : len(a)] = a
        prefix[i, : len(t.prefix_ids)] = t.prefix_ids
        prefix_len[i] = len(t.prefix_ids)
        sot_index[i] = t.sot_index
        content_frames[i] = t.content_frames
        last_attend[i] = t.last_attend
        is_last[i] = t.is_last
        max_new[i] = t.max_new
        active[i] = True

    import jax.numpy as jnp

    outs = alignatt_tick_beam(
        engine.params,
        jnp.asarray(audio),
        jnp.asarray(prefix),
        jnp.asarray(prefix_len),
        jnp.asarray(sot_index),
        jnp.asarray(content_frames),
        jnp.asarray(last_attend),
        jnp.asarray(is_last),
        jnp.asarray(max_new),
        engine.suppress_mask,
        engine.align_layers,
        engine.align_heads,
        jnp.int32(cfg.frame_threshold),
        jnp.int32(cfg.rewind_threshold),
        jnp.float32(cfg.nonspeech_prob),
        jnp.asarray(active),
        dims,
        p_max,
        cfg.max_steps,
        beam,
        tokenizer.eot,
        tokenizer.timestamp_begin,
        tokenizer.no_speech,
        tokenizer.encode(" ")[0],
    )
    for o in outs:  # overlap fetches: one tunnel round-trip each on axon
        if hasattr(o, "copy_to_host_async"):
            o.copy_to_host_async()
    new_tokens, n_keep, frames, reason, no_speech_p, last_attend_out, fire = [
        np.asarray(o) for o in outs
    ]
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
