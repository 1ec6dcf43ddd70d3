"""Beam-search decoding (reference whisper/decoding.py BeamSearchDecoder:299-377).

Host-driven control with device steps: logit filtering runs in the same
jitted rule code as the greedy path; the per-step top-k bookkeeping and the
finished-sequence dictionaries live on host (they are tiny and irregular),
and beam reordering is a jitted lane-gather on the KV cache — the XLA
equivalent of the reference's `rearrange_kv_cache`.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.whisper import model as wm
from .options import DecodingOptions, DecodingResult, compression_ratio


@partial(jax.jit, donate_argnames=("cache",))
def _reorder_cache(cache: wm.KVCache, src: jnp.ndarray) -> wm.KVCache:
    return wm.KVCache(k=jnp.take(cache.k, src, axis=1), v=jnp.take(cache.v, src, axis=1))


def beam_decode(
    decoder,
    enc: jnp.ndarray,
    options: DecodingOptions,
    tokenizer,
    language: str,
    lang_probs: Optional[list],
) -> List[DecodingResult]:
    from .task import RuleConsts, _apply_filters, build_initial_tokens, get_suppress_tokens

    dims = decoder.dims
    n_audio = enc.shape[0]
    beam = options.beam_size
    patience = options.patience or 1.0
    max_candidates = round(beam * patience)
    lanes = n_audio * beam

    initial = build_initial_tokens(tokenizer, options, dims.n_text_ctx)
    if len(initial) > decoder.prompt_width:
        initial = initial[-decoder.prompt_width :]
    sample_begin = len(initial)
    sot_index = initial.index(tokenizer.sot)
    sample_len = options.sample_len or dims.n_text_ctx // 2
    sample_len = min(sample_len, dims.n_text_ctx - sample_begin - 1)

    suppress_mask = np.zeros(dims.n_vocab, np.float32)
    suppress_mask[list(get_suppress_tokens(tokenizer, options))] = -np.inf
    suppress_mask = jnp.asarray(suppress_mask)
    if options.max_initial_timestamp is None:
        max_init_idx = dims.n_vocab
    else:
        max_init_idx = int(options.max_initial_timestamp / 0.02)

    consts = RuleConsts(
        eot=tokenizer.eot,
        ts_begin=tokenizer.timestamp_begin,
        no_ts=tokenizer.no_timestamps,
        space_tok=tokenizer.encode(" ")[0],
        prompt_width=decoder.prompt_width,
        n_ctx=dims.n_text_ctx,
        use_timestamps=not options.without_timestamps,
        suppress_blank=options.suppress_blank,
    )

    filter_fn = jax.jit(
        lambda logits, k, last, penult, last_ts, has_ts: _apply_filters(
            logits, k, last, penult, last_ts, has_ts, suppress_mask,
            jnp.int32(max_init_idx), consts,
        )
    )

    enc_rep = jnp.repeat(enc, beam, axis=0)
    xkv = wm.cross_kv_jit(decoder.params, enc_rep, dims)
    dtype = decoder.params["decoder"]["tok_emb"].dtype
    cache = wm.init_cache(dims, lanes, dtype=dtype)

    prompt = np.full((lanes, decoder.prompt_width), tokenizer.eot, np.int32)
    prompt[:, :sample_begin] = initial

    prefill_logits, _, cache = wm.decode_jit(
        decoder.params, jnp.asarray(prompt), jnp.zeros((lanes,), jnp.int32), xkv, cache, dims
    )
    no_speech_prob = np.asarray(
        jax.nn.softmax(prefill_logits[:, sot_index], axis=-1)[:, tokenizer.no_timestamps - 1]
    )
    logits = prefill_logits[:, sample_begin - 1]

    eot = tokenizer.eot
    ts_begin = tokenizer.timestamp_begin

    # Host beam state.
    sequences: List[List[int]] = [[] for _ in range(lanes)]
    cum_logprobs = np.zeros(lanes, np.float64)
    # Only lane 0 of each audio is "live" initially so identical beams don't
    # tie (reference seeds all beams equal and dedups via the sequence dict;
    # we instead start the others at -inf).
    for a in range(n_audio):
        for g in range(1, beam):
            cum_logprobs[a * beam + g] = -np.inf
    finished: List[dict] = [{} for _ in range(n_audio)]

    for k in range(sample_len):
        # filter-rule state per lane from host sequences
        last = np.array([s[-1] if s else -1 for s in sequences], np.int32)
        penult = np.array([s[-2] if len(s) > 1 else -1 for s in sequences], np.int32)
        last_ts_arr = np.full(lanes, ts_begin, np.int32)
        has_ts_arr = np.zeros(lanes, bool)
        for i, s in enumerate(sequences):
            tss = [t for t in s if t >= ts_begin]
            if tss:
                last_ts_arr[i] = tss[-1]
                has_ts_arr[i] = True

        flogits = filter_fn(
            logits, jnp.int32(k), jnp.asarray(last), jnp.asarray(penult),
            jnp.asarray(last_ts_arr), jnp.asarray(has_ts_arr),
        )
        logprobs = np.asarray(jax.nn.log_softmax(flogits, axis=-1), np.float64)

        next_tokens = np.zeros(lanes, np.int32)
        src_idx = np.arange(lanes, dtype=np.int32)
        new_sequences: List[List[int]] = [None] * lanes
        new_cum = np.zeros(lanes, np.float64)

        all_done = True
        for a in range(n_audio):
            scores: dict = {}
            sources: dict = {}
            for g in range(beam):
                lane = a * beam + g
                if not np.isfinite(cum_logprobs[lane]):
                    continue
                top = np.argpartition(-logprobs[lane], beam + 1)[: beam + 1]
                for tok in top:
                    seq = tuple(sequences[lane]) + (int(tok),)
                    scores[seq] = cum_logprobs[lane] + logprobs[lane, int(tok)]
                    sources[seq] = lane

            saved = 0
            for seq in sorted(scores, key=scores.get, reverse=True):
                if seq[-1] == eot:
                    if len(finished[a]) < max_candidates:
                        finished[a][seq] = scores[seq]
                    continue
                lane = a * beam + saved
                new_sequences[lane] = list(seq)
                new_cum[lane] = scores[seq]
                next_tokens[lane] = seq[-1]
                src_idx[lane] = sources[seq]
                saved += 1
                if saved == beam:
                    break
            for g in range(saved, beam):
                lane = a * beam + g
                new_sequences[lane] = sequences[lane]
                new_cum[lane] = -np.inf
            if len(finished[a]) < max_candidates:
                all_done = False

        sequences = new_sequences
        cum_logprobs = new_cum
        if all_done or k == sample_len - 1 or sample_begin + k + 1 >= dims.n_text_ctx:
            break

        cache = _reorder_cache(cache, jnp.asarray(src_idx))
        pos = jnp.full((lanes,), sample_begin + k, jnp.int32)
        step_logits, _, cache = wm.decode_jit(
            decoder.params, jnp.asarray(next_tokens)[:, None], pos, xkv, cache, dims
        )
        logits = step_logits[:, 0]

    # Drain: unfinished beams count as candidates too (reference finalize).
    for a in range(n_audio):
        if len(finished[a]) == 0:
            for g in range(beam):
                lane = a * beam + g
                if np.isfinite(cum_logprobs[lane]) and sequences[lane]:
                    finished[a][tuple(sequences[lane]) + (eot,)] = cum_logprobs[lane]

    results = []
    for a in range(n_audio):
        best_score, best_seq, best_lp = -np.inf, (), 0.0
        for seq, lp in finished[a].items():
            n = len(seq)
            if options.length_penalty is None:
                penalty = n
            else:
                penalty = ((5 + n) / 6) ** options.length_penalty
            score = lp / max(penalty, 1e-9)
            if score > best_score:
                best_score, best_seq, best_lp = score, seq, lp
        toks = [t for t in best_seq if t != eot]
        text = tokenizer.decode(toks).strip()
        results.append(
            DecodingResult(
                language=language,
                language_probs=lang_probs[a] if lang_probs else None,
                tokens=toks,
                text=text,
                avg_logprob=float(best_lp / max(len(best_seq), 1)),
                no_speech_prob=float(no_speech_prob[a * beam]),
                temperature=options.temperature,
                compression_ratio=compression_ratio(text),
            )
        )
    return results
