"""Batch decoding machinery: greedy + logit filters + timestamp rules.

Functional equivalent of the reference DecodingTask (reference
whisper/decoding.py:18-821) redesigned for XLA: the whole sampling loop is a
single jitted ``lax.while_loop`` whose carry holds the KV cache, the token
buffer, per-lane finished flags and the timestamp-rule state. Prompt length,
sample length, and every filter decision are *dynamic* values inside one
compiled program — prompts are right-padded to a fixed width and the pad
slots are later overwritten by sampled tokens (their cache entries are never
visible through the causal mask), so changing prompt size never recompiles.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.whisper import model as wm
from ..models.whisper.dims import ModelDimensions
from ..models.whisper.tokenizer import Tokenizer
from .options import DecodingOptions, DecodingResult, compression_ratio


# ---------------------------------------------------------------------------
# Static token plumbing (host side)
# ---------------------------------------------------------------------------


def get_suppress_tokens(tokenizer: Tokenizer, options: DecodingOptions) -> Tuple[int, ...]:
    """Resolve options.suppress_tokens to the full static suppression set
    (reference whisper/decoding.py `_get_suppress_tokens`)."""
    suppress = options.suppress_tokens
    if isinstance(suppress, str):
        suppress = [int(t) for t in suppress.split(",")] if suppress else []
    else:
        suppress = list(suppress) if suppress else []

    if -1 in suppress:
        suppress = [t for t in suppress if t >= 0]
        suppress.extend(tokenizer.non_speech_tokens)

    suppress.extend([tokenizer.transcribe, tokenizer.translate, tokenizer.sot,
                     tokenizer.sot_prev, tokenizer.sot_lm])
    if tokenizer.no_speech is not None:
        suppress.append(tokenizer.no_speech)
    return tuple(sorted(set(suppress)))


def build_initial_tokens(
    tokenizer: Tokenizer, options: DecodingOptions, n_ctx: int
) -> List[int]:
    """sot sequence + optional prefix/prompt conditioning (reference
    whisper/decoding.py `_get_initial_tokens`)."""
    tokens = list(tokenizer.sot_sequence)
    if options.without_timestamps:
        tokens.append(tokenizer.no_timestamps)
    sample_len = options.sample_len or n_ctx // 2

    if options.prefix is not None:
        prefix = (
            tokenizer.encode(" " + options.prefix.strip())
            if isinstance(options.prefix, str)
            else list(options.prefix)
        )
        max_prefix_len = n_ctx // 2 - sample_len
        if max_prefix_len > 0:
            prefix = prefix[-max_prefix_len:]
        tokens = tokens + prefix

    if options.prompt is not None:
        prompt = (
            tokenizer.encode(" " + options.prompt.strip())
            if isinstance(options.prompt, str)
            else list(options.prompt)
        )
        tokens = [tokenizer.sot_prev] + prompt[-(n_ctx // 2 - 1):] + tokens
    return tokens


def truncate_initial_tokens(initial: List[int], width: int, sot_prev: int) -> List[int]:
    """Fit the initial sequence into the static prefill width, always
    retaining <|startofprev|> at position 0 when present — raw prompt tokens
    without it are out-of-distribution for the model."""
    if len(initial) <= width:
        return initial
    if initial[0] == sot_prev:
        return [sot_prev] + initial[-(width - 1) :]
    return initial[-width:]


# ---------------------------------------------------------------------------
# Jitted greedy sampling loop
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RuleConsts:
    """Static scalars baked into the compiled loop."""

    eot: int
    ts_begin: int
    no_ts: int
    space_tok: int          # first token of " " — blank suppression
    prompt_width: int       # static right-padded prompt width
    n_ctx: int
    use_timestamps: bool
    suppress_blank: bool


def _apply_filters(
    logits: jnp.ndarray,  # [B, V] f32
    k: jnp.ndarray,  # scalar step index (0 = first sampled token)
    last_tok: jnp.ndarray,  # [B]
    penult_tok: jnp.ndarray,  # [B]
    last_ts: jnp.ndarray,  # [B] last sampled timestamp token (ts_begin if none)
    has_ts: jnp.ndarray,  # [B] bool
    suppress_mask: jnp.ndarray,  # [V] additive 0/-inf
    max_initial_ts_index: jnp.ndarray,  # scalar int32 (or huge when unlimited)
    c: RuleConsts,
):
    V = logits.shape[-1]
    vocab_idx = jnp.arange(V, dtype=jnp.int32)[None, :]
    neg_inf = jnp.float32(-jnp.inf)

    if c.suppress_blank:
        blank = (vocab_idx == c.space_tok) | (vocab_idx == c.eot)
        logits = jnp.where((k == 0) & blank, neg_inf, logits)

    logits = logits + suppress_mask[None, :]

    if not c.use_timestamps:
        return logits

    is_ts = vocab_idx >= c.ts_begin
    is_text = vocab_idx < c.eot

    # no_timestamps token never allowed under timestamp rules.
    logits = jnp.where(vocab_idx == c.no_ts, neg_inf, logits)

    last_was_ts = (k > 0) & (last_tok >= c.ts_begin)
    penult_was_ts = (k < 2) | (penult_tok >= c.ts_begin)

    # Timestamp pairing: <ts><ts> → text next; <text><ts> → must pair another ts.
    mask_ts_pair = (last_was_ts & penult_was_ts)[:, None] & is_ts
    mask_text_pair = (last_was_ts & ~penult_was_ts)[:, None] & is_text
    logits = jnp.where(mask_ts_pair | mask_text_pair, neg_inf, logits)

    # Non-decreasing timestamps.
    ts_floor = jnp.where(last_was_ts & ~penult_was_ts, last_ts, last_ts + 1)
    mask_floor = has_ts[:, None] & is_ts & (vocab_idx < ts_floor[:, None])
    logits = jnp.where(mask_floor, neg_inf, logits)

    # First sampled token must be a timestamp, capped by max_initial_timestamp.
    first = k == 0
    init_mask = (~is_ts) | (vocab_idx > c.ts_begin + max_initial_ts_index)
    logits = jnp.where(first & init_mask, neg_inf, logits)

    # If total timestamp probability beats every text token, force a timestamp.
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_logprob = jax.nn.logsumexp(
        jnp.where(is_ts, logprobs, neg_inf), axis=-1
    )  # [B]
    max_text = jnp.max(jnp.where(is_ts, neg_inf, logprobs), axis=-1)
    force_ts = (ts_logprob > max_text)[:, None] & ~is_ts
    logits = jnp.where(force_ts, neg_inf, logits)
    return logits


@partial(
    jax.jit,
    static_argnames=("dims", "consts", "batch"),
    donate_argnames=("cache",),
)
def greedy_loop(
    params,
    xkv: wm.CrossKV,
    cache: wm.KVCache,
    prompt: jnp.ndarray,  # [B, prompt_width] right-padded with eot
    sample_begin: jnp.ndarray,  # scalar int32 — true prompt length
    sot_index: jnp.ndarray,  # scalar int32 — sot position for no_speech prob
    sample_len: jnp.ndarray,  # scalar int32 — max new tokens
    suppress_mask: jnp.ndarray,  # [V]
    max_initial_ts_index: jnp.ndarray,  # scalar int32
    temperature: jnp.ndarray,  # scalar f32; 0 = argmax
    key: jax.Array,
    dims: ModelDimensions,
    consts: RuleConsts,
    batch: int,
):
    """One compiled program: prefill + filtered greedy/temperature sampling.

    Returns (tokens [B, n_ctx], lengths [B], sum_logprobs [B],
    no_speech_prob [B], cache).
    """
    B = batch
    c = consts

    prefill_logits, _, cache = wm.decode(
        params, prompt, jnp.zeros((B,), jnp.int32), xkv, cache, dims
    )
    no_speech_logits = jnp.take(prefill_logits, sot_index, axis=1)
    no_speech_prob = jax.nn.softmax(no_speech_logits, axis=-1)[:, c.no_ts - 1]
    # ^ no_speech token id == no_ts - 1 in the whisper vocab layout.

    first_logits = jnp.take(prefill_logits, sample_begin - 1, axis=1)

    tokens_buf = jnp.full((B, c.n_ctx), c.eot, jnp.int32)
    tokens_buf = jax.lax.dynamic_update_slice(
        tokens_buf, prompt, (0, 0)
    )

    init = dict(
        cache=cache,
        tokens=tokens_buf,
        logits=first_logits,
        k=jnp.int32(0),
        finished=jnp.zeros((B,), bool),
        sum_logprobs=jnp.zeros((B,), jnp.float32),
        last_tok=jnp.full((B,), -1, jnp.int32),
        penult_tok=jnp.full((B,), -1, jnp.int32),
        last_ts=jnp.full((B,), c.ts_begin, jnp.int32),
        has_ts=jnp.zeros((B,), bool),
        key=key,
    )

    def cond(s):
        return (
            (s["k"] < sample_len)
            & jnp.logical_not(jnp.all(s["finished"]))
            & (sample_begin + s["k"] < c.n_ctx)
        )

    def body(s):
        logits = _apply_filters(
            s["logits"], s["k"], s["last_tok"], s["penult_tok"], s["last_ts"],
            s["has_ts"], suppress_mask, max_initial_ts_index, c,
        )
        key, sub = jax.random.split(s["key"])
        greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        sampled_tok = jax.random.categorical(sub, logits / jnp.maximum(temperature, 1e-6))
        tok = jnp.where(temperature > 0, sampled_tok.astype(jnp.int32), greedy_tok)

        logprobs = jax.nn.log_softmax(logits, axis=-1)
        tok_logprob = jnp.take_along_axis(logprobs, tok[:, None], axis=-1)[:, 0]
        active = jnp.logical_not(s["finished"])
        sum_logprobs = s["sum_logprobs"] + jnp.where(active, tok_logprob, 0.0)
        tok = jnp.where(active, tok, c.eot)
        finished = s["finished"] | (tok == c.eot)

        pos = sample_begin + s["k"]
        tokens = s["tokens"].at[jnp.arange(B), pos].set(tok)

        is_ts_tok = (tok >= c.ts_begin) & active
        last_ts = jnp.where(is_ts_tok, tok, s["last_ts"])
        has_ts = s["has_ts"] | is_ts_tok

        new_logits, _, cache = wm.decode(
            params, tok[:, None], jnp.broadcast_to(pos, (B,)), xkv, s["cache"], dims
        )
        return dict(
            cache=cache,
            tokens=tokens,
            logits=new_logits[:, 0],
            k=s["k"] + 1,
            finished=finished,
            sum_logprobs=sum_logprobs,
            last_tok=tok,
            penult_tok=s["last_tok"],
            last_ts=last_ts,
            has_ts=has_ts,
            key=key,
        )

    out = jax.lax.while_loop(cond, body, init)
    lengths = jnp.int32(0) + out["k"]  # sampled count incl. eot
    return out["tokens"], lengths, out["sum_logprobs"], no_speech_prob, out["cache"]


# ---------------------------------------------------------------------------
# Host-side task driver
# ---------------------------------------------------------------------------


class WhisperDecoder:
    """Holds params + compiled entry points; the DecodingTask equivalent."""

    def __init__(self, params, dims: ModelDimensions, tokenizer_factory=None):
        self.params = params
        self.dims = dims
        # static prefill width: holds the maximal initial sequence —
        # sot_prev + (n_text_ctx//2 - 1) prompt tokens + sot sequence (≤4)
        # (reference whisper/decoding.py _get_initial_tokens bounds)
        self.prompt_width = min(dims.n_text_ctx // 2 + 8, dims.n_text_ctx - 8)
        self._tokenizers: dict = {}
        self._tokenizer_factory = tokenizer_factory

    def tokenizer_for(self, language: Optional[str], task: str) -> Tokenizer:
        from ..models.whisper.tokenizer import get_tokenizer

        key = (language, task)
        if key not in self._tokenizers:
            if self._tokenizer_factory is not None:
                self._tokenizers[key] = self._tokenizer_factory(language, task)
            else:
                self._tokenizers[key] = get_tokenizer(
                    self.dims.multilingual,
                    num_languages=self.dims.num_languages,
                    language=language,
                    task=task,
                )
        return self._tokenizers[key]

    # ---- language id -------------------------------------------------------

    def detect_language(self, enc: jnp.ndarray, tokenizer: Tokenizer):
        """Single forward from [sot]; returns (codes, prob dicts) per lane
        (reference whisper/decoding.py detect_language)."""
        B = enc.shape[0]
        xkv = wm.cross_kv(self.params, enc, self.dims)
        cache = wm.init_cache(self.dims, B, dtype=self.params["decoder"]["tok_emb"].dtype)
        tokens = jnp.full((B, 1), tokenizer.sot, jnp.int32)
        logits, _, _ = wm.decode(
            self.params, tokens, jnp.zeros((B,), jnp.int32), xkv, cache, self.dims
        )
        logits = np.asarray(logits[:, 0])
        mask = np.full(logits.shape[-1], -np.inf, np.float32)
        lang_tokens = list(tokenizer.all_language_tokens)
        mask[lang_tokens] = 0.0
        probs = jax.nn.softmax(jnp.asarray(logits + mask), axis=-1)
        probs = np.asarray(probs)
        codes = []
        prob_maps = []
        for b in range(B):
            best = int(np.argmax(probs[b]))
            codes.append(tokenizer._token_to_code(best))
            prob_maps.append(
                {code: float(probs[b, t]) for code, t in zip(tokenizer.all_language_codes, lang_tokens)}
            )
        return codes, prob_maps

    # ---- main entry ----------------------------------------------------------

    def decode(
        self,
        mel: jnp.ndarray,  # [B, n_mels, 3000] or [n_mels, 3000]
        options: DecodingOptions = DecodingOptions(),
        enc: Optional[jnp.ndarray] = None,
    ) -> List[DecodingResult]:
        if mel is not None and mel.ndim == 2:
            mel = mel[None]
        if enc is None:
            enc = wm.encode_jit(self.params, mel, self.dims)
        B = enc.shape[0]

        language = options.language
        lang_probs: Optional[list] = None
        if self.dims.multilingual and language is None:
            det_tok = self.tokenizer_for("en", options.task)
            codes, lang_probs = self.detect_language(enc, det_tok)
            language = codes[0]  # windows share a language per call
        elif not self.dims.multilingual:
            language = "en"

        tokenizer = self.tokenizer_for(language, options.task)

        if options.beam_size is not None:
            from .beam import beam_decode

            return beam_decode(self, enc, options, tokenizer, language, lang_probs)

        n_group = options.best_of if (options.best_of and options.temperature > 0) else 1
        initial = build_initial_tokens(tokenizer, options, self.dims.n_text_ctx)
        sample_begin = len(initial)
        sot_index = initial.index(tokenizer.sot)
        sample_len = options.sample_len or self.dims.n_text_ctx // 2

        initial = truncate_initial_tokens(initial, self.prompt_width, tokenizer.sot_prev)
        sample_begin = len(initial)
        sot_index = initial.index(tokenizer.sot)
        sample_len = min(sample_len, self.dims.n_text_ctx - sample_begin - 1)

        prompt = np.full((B * n_group, self.prompt_width), tokenizer.eot, np.int32)
        prompt[:, :sample_begin] = initial

        suppress_mask = np.zeros(self.dims.n_vocab, np.float32)
        suppress_mask[list(get_suppress_tokens(tokenizer, options))] = -np.inf

        if options.max_initial_timestamp is None:
            max_init_idx = self.dims.n_vocab
        else:
            max_init_idx = int(options.max_initial_timestamp / 0.02)

        consts = RuleConsts(
            eot=tokenizer.eot,
            ts_begin=tokenizer.timestamp_begin,
            no_ts=tokenizer.no_timestamps,
            space_tok=tokenizer.encode(" ")[0],
            prompt_width=self.prompt_width,
            n_ctx=self.dims.n_text_ctx,
            use_timestamps=not options.without_timestamps,
            suppress_blank=options.suppress_blank,
        )

        if n_group > 1:
            enc_rep = jnp.repeat(enc, n_group, axis=0)
        else:
            enc_rep = enc
        xkv = wm.cross_kv_jit(self.params, enc_rep, self.dims)
        cache = wm.init_cache(
            self.dims, B * n_group, dtype=self.params["decoder"]["tok_emb"].dtype
        )

        tokens, lengths, sum_logprobs, no_speech_prob, _ = greedy_loop(
            self.params,
            xkv,
            cache,
            jnp.asarray(prompt),
            jnp.int32(sample_begin),
            jnp.int32(sot_index),
            jnp.int32(sample_len),
            jnp.asarray(suppress_mask),
            jnp.int32(max_init_idx),
            jnp.float32(options.temperature),
            jax.random.PRNGKey(int(options.temperature * 1e6) + 42),
            self.dims,
            consts,
            B * n_group,
        )
        tokens = np.asarray(tokens)
        sum_logprobs = np.asarray(sum_logprobs, np.float64)
        no_speech_prob = np.asarray(no_speech_prob)

        results = []
        for b in range(B):
            # Rank the n_group samples by length-penalized avg logprob
            # (MaximumLikelihoodRanker, whisper/decoding.py:272-297).
            best_score, best = -np.inf, 0
            cands = []
            for g in range(n_group):
                lane = b * n_group + g
                seq = tokens[lane, sample_begin:]
                eots = np.where(seq == tokenizer.eot)[0]
                seq = seq[: eots[0]] if len(eots) else seq
                n = len(seq) + 1
                if options.length_penalty is None:
                    penalty = n
                else:
                    penalty = ((5 + n) / 6) ** options.length_penalty
                score = sum_logprobs[lane] / max(penalty, 1e-9)
                cands.append((list(int(t) for t in seq), sum_logprobs[lane], n))
                if score > best_score:
                    best_score, best = score, g
            seq, slp, n = cands[best]
            text = tokenizer.decode(seq).strip()
            results.append(
                DecodingResult(
                    audio_features=None,
                    language=language,
                    language_probs=lang_probs[b] if lang_probs else None,
                    tokens=seq,
                    text=text,
                    avg_logprob=float(slp / n),
                    no_speech_prob=float(no_speech_prob[b * n_group]),
                    temperature=options.temperature,
                    compression_ratio=compression_ratio(text),
                )
            )
        return results
