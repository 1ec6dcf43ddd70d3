"""Qwen3-ASR causal backend: append-only KV semantics + streaming policy.

Pins the properties the reference's causal mode promises (reference
README.md:210-230): blocks are encoded exactly once, block features are
independent of FUTURE blocks (causality), per-tick compute is constant in
stream length (bounded window + resets), and commits are monotonic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperlivekit_tpu.models import llama as lm
from whisperlivekit_tpu.models import qwen3_asr as qm
from whisperlivekit_tpu.streaming.qwen3_causal import (
    Qwen3CausalASR,
    Qwen3CausalProcessor,
    StablePrefixCommitter,
)


@pytest.fixture(scope="module")
def setup():
    dims = qm.DEV_TINY
    params = qm.init_params(dims, jax.random.PRNGKey(0))
    return dims, params


def mel_block(dims, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((1, dims.n_mels, 2 * dims.block_frames)).astype(np.float32))


def test_block_features_are_causal(setup):
    """Block i's features must not change when later blocks are appended."""
    dims, params = setup
    blocks = [mel_block(dims, i) for i in range(4)]

    def run(n):
        cache = qm.init_tower_cache(dims, 1)
        feats = []
        for i in range(n):
            f, cache = qm.encode_block(
                params, blocks[i], cache, jnp.asarray([i * dims.block_frames], jnp.int32), dims
            )
            feats.append(np.asarray(f))
        return feats

    short = run(2)
    full = run(4)
    np.testing.assert_array_equal(short[0], full[0])
    np.testing.assert_array_equal(short[1], full[1])


def test_block_attends_to_history(setup):
    """Non-causality in the other direction: later blocks MUST see earlier
    ones (otherwise it's a chunked encoder, not a causal one)."""
    dims, params = setup
    b0a, b0b, b1 = mel_block(dims, 0), mel_block(dims, 7), mel_block(dims, 1)

    def second_feats(first):
        cache = qm.init_tower_cache(dims, 1)
        _, cache = qm.encode_block(params, first, cache, jnp.asarray([0], jnp.int32), dims)
        f, _ = qm.encode_block(
            params, b1, cache, jnp.asarray([dims.block_frames], jnp.int32), dims
        )
        return np.asarray(f)

    assert not np.array_equal(second_feats(b0a), second_feats(b0b))


def test_hypothesis_kv_is_disposable(setup):
    """Decoding a hypothesis then appending audio must give the same state
    as appending audio without decoding (the hypothesis region is simply
    overwritten — no cache copies per tick)."""
    dims, params = setup
    B = 1
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)

    def prime():
        tc = qm.init_tower_cache(dims, B)
        xc = lm.init_cache(dims.text, B, 96)
        _, xc = lm.forward(
            params["text"], lm.embed_tokens(params["text"], prompt),
            jnp.zeros((B,), jnp.int32), xc, dims.text,
        )
        return tc, xc

    pos0 = jnp.asarray([3], jnp.int32)

    # path A: audio, hypothesis, audio
    tc, xc = prime()
    tc, xc, _ = qm.append_audio_block(params, mel_block(dims, 0), tc, xc, jnp.asarray([0], jnp.int32), pos0, dims)
    toks_a, n_a, xc = qm.decode_hypothesis(
        params, xc, jnp.asarray([[4]], jnp.int32), pos0 + dims.block_tokens, 0, dims, max_new=8
    )
    tc, xc, _ = qm.append_audio_block(
        params, mel_block(dims, 1), tc, xc,
        jnp.asarray([dims.block_frames], jnp.int32), pos0 + dims.block_tokens, dims,
    )
    toks_a2, n_a2, _ = qm.decode_hypothesis(
        params, xc, jnp.asarray([[4]], jnp.int32), pos0 + 2 * dims.block_tokens, 0, dims, max_new=8
    )

    # path B: audio, audio, hypothesis (no intermediate decode)
    tc, xc = prime()
    tc, xc, _ = qm.append_audio_block(params, mel_block(dims, 0), tc, xc, jnp.asarray([0], jnp.int32), pos0, dims)
    tc, xc, _ = qm.append_audio_block(
        params, mel_block(dims, 1), tc, xc,
        jnp.asarray([dims.block_frames], jnp.int32), pos0 + dims.block_tokens, dims,
    )
    toks_b2, n_b2, _ = qm.decode_hypothesis(
        params, xc, jnp.asarray([[4]], jnp.int32), pos0 + 2 * dims.block_tokens, 0, dims, max_new=8
    )

    assert int(n_a2[0]) == int(n_b2[0])
    np.testing.assert_array_equal(np.asarray(toks_a2), np.asarray(toks_b2))


def test_committer_monotonic():
    c = StablePrefixCommitter(hold_back=1)
    new, tail = c.step(["a", "b", "c"])
    assert new == [] and tail == ["a", "b", "c"]  # nothing agreed yet
    new, tail = c.step(["a", "b", "d"])
    assert new == ["a", "b"][: len(new)] and c.n_committed <= 2
    new2, _ = c.step(["a", "b", "d", "e"])
    # committed words never retract
    assert c.n_committed >= 2
    new3, tail3 = c.step(["a", "b", "d", "e", "f"], final=True)
    assert c.n_committed == 5 and tail3 == []


def audio_seconds(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * n)) / 16000
    return (0.3 * np.sin(2 * np.pi * 200 * t) + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)


def test_processor_streams_and_bounds_compute(setup):
    dims, params = setup
    holder = Qwen3CausalASR(params, dims, window_s=2.0, max_new=8)
    proc = Qwen3CausalProcessor(holder)

    committed = []
    t = 0.0
    for i in range(8):
        t += 1.0
        proc.insert_audio_chunk(audio_seconds(1, seed=i), t)
        tokens, upto = proc.process_iter()
        committed.extend(tokens)
        assert upto <= t + 1e-6
    tokens, upto = proc.finish()
    committed.extend(tokens)

    # every block encoded exactly once: 8 s / 0.4 s-blocks = 20 blocks
    expected_blocks = int(8.0 / (dims.block_samples / 16000))
    assert proc.n_blocks_encoded == expected_blocks
    # window bound: segment resets keep the live window under window_s
    assert proc.blocks_this_segment * dims.block_samples / 16000 <= 2.0 + 0.5
    # commits are time-monotonic
    ends = [tok.end for tok in committed]
    assert ends == sorted(ends)


def test_processor_long_silence_resets(setup):
    dims, params = setup
    holder = Qwen3CausalASR(params, dims, window_s=4.0, max_new=8)
    proc = Qwen3CausalProcessor(holder)
    proc.insert_audio_chunk(audio_seconds(2), 2.0)
    proc.process_iter()
    proc.end_silence(7.0, 2.0)  # >= 5 s: full segment reset
    assert proc.blocks_this_segment == 0
    proc.insert_audio_chunk(audio_seconds(1, seed=3), 10.0)
    tokens, _ = proc.process_iter(is_last=True)
    for tok in tokens:
        assert tok.start >= 9.0 - 1e-6  # offset past the silence


def test_engine_routing_random_weights():
    from whisperlivekit_tpu.config import WLKConfig
    from whisperlivekit_tpu.engine.core import TranscriptionEngine, online_factory

    TranscriptionEngine.reset()
    cfg = WLKConfig(
        backend="qwen3", backend_policy="causal", model_size="random:dev-tiny",
        lan="en", vac=False, pcm_input=True, scheduler=False, log_level="ERROR",
    )
    engine = TranscriptionEngine(cfg)
    proc = online_factory(cfg, engine.asr)
    assert isinstance(proc, Qwen3CausalProcessor)
    proc.insert_audio_chunk(audio_seconds(1), 1.0)
    tokens, upto = proc.process_iter(is_last=True)
    assert upto > 0
    TranscriptionEngine.reset()


def test_voxtral_realtime_routing_and_stream():
    """Voxtral realtime-causal rides the same block-causal machinery
    (reference voxtral_hf_streaming.py role): 80 ms/token geometry, streams
    with random dev weights through the engine routing."""
    from whisperlivekit_tpu.config import WLKConfig
    from whisperlivekit_tpu.engine.core import TranscriptionEngine, online_factory
    from whisperlivekit_tpu.streaming.voxtral_realtime import VoxtralRealtimeASR

    TranscriptionEngine.reset()
    cfg = WLKConfig(
        backend="voxtral", backend_policy="causal", model_size="random:dev-tiny",
        lan="en", vac=False, pcm_input=True, scheduler=False, log_level="ERROR",
    )
    engine = TranscriptionEngine(cfg)
    assert isinstance(engine.asr, VoxtralRealtimeASR)
    proc = online_factory(cfg, engine.asr)
    proc.insert_audio_chunk(audio_seconds(1), 1.0)
    tokens, upto = proc.process_iter(is_last=True)
    assert upto > 0
    TranscriptionEngine.reset()


def test_voxtral_projector_mlp(setup):
    """proj2 (voxtral's gelu-MLP projector) changes the projection path."""
    import jax.numpy as jnp

    dims, params = setup
    feats = jnp.ones((1, dims.downsample * 2, dims.d_audio))
    single = qm.project_audio_tokens(params, feats, dims)
    p2 = {
        **params,
        "tower": {
            **params["tower"],
            "proj2": {"w": jnp.eye(dims.text.hidden_size) * 2.0},
        },
    }
    double = qm.project_audio_tokens(p2, feats, dims)
    assert double.shape == single.shape
    assert not np.allclose(np.asarray(double), np.asarray(single))


def test_sentence_reset_commits_held_back_words(setup):
    """A sentence boundary resets the window — but only AFTER committing the
    held-back frontier words (their audio is unrecoverable post-reset)."""
    dims, params = setup

    class PunctTokenizer:
        eos_id = 0

        def decode(self, ids):
            # deterministic hypothesis containing a sentence end + frontier
            return "alpha beta. gamma delta"[: 6 + 7 * len(ids)]

        def encode(self, text):
            return []

    holder = Qwen3CausalASR(
        params, dims, tokenizer=PunctTokenizer(), window_s=30.0,
        hold_back_words=2, max_new=8,
    )
    proc = Qwen3CausalProcessor(holder)
    committed = []
    for i in range(3):
        proc.insert_audio_chunk(audio_seconds(1, seed=i), float(i + 1))
        tokens, _ = proc.process_iter()
        committed.extend(tokens)
        if proc.blocks_this_segment == 0 and committed:
            break  # a sentence reset happened
    texts = [t.text.strip() for t in committed]
    if any("." in t for t in texts):
        # everything decoded before the reset must have been committed —
        # including the frontier words after the punctuation
        assert texts[-1] in ("gamma", "delta", "beta.") or len(texts) >= 3


def test_cumulative_diarization_replaces_history():
    """diart-style cumulative snapshots must REPLACE retained diarization
    history in TokensAlignment, not append duplicates."""
    import asyncio

    from types import SimpleNamespace

    from whisperlivekit_tpu.session.alignment import TokensAlignment
    from whisperlivekit_tpu.session.processor import StateStore
    from whisperlivekit_tpu.timed import SpeakerSegment

    async def main():
        store = StateStore(retention_seconds=300.0)
        ta = TokensAlignment(store.state, SimpleNamespace(diarization=True), " ")
        # two cumulative snapshots: second relabels + extends the first
        await store.merge_diarization(
            [SpeakerSegment(speaker=0, start=0.0, end=1.0)], replace=True
        )
        ta.update()
        await store.merge_diarization(
            [SpeakerSegment(speaker=1, start=0.0, end=2.0)], replace=True
        )
        ta.update()
        return ta

    ta = asyncio.run(main())
    assert len(ta.all_diarization_segments) == 1
    assert ta.all_diarization_segments[0].speaker == 1


def test_qwen3_causal_full_pipeline_e2e():
    """Through the whole session pipeline (AudioProcessor + harness), not
    just the processor: feed → incremental updates → finish."""
    import asyncio

    from whisperlivekit_tpu.engine.core import TranscriptionEngine
    from whisperlivekit_tpu.harness.harness import TestHarness

    TranscriptionEngine.reset()

    async def main():
        async with TestHarness(
            backend="qwen3", backend_policy="causal",
            model_size="random:dev-tiny", lan="en", vac=False, pcm_input=True,
            scheduler=False, log_level="ERROR",
        ) as h:
            pcm = (np.clip(audio_seconds(3), -1, 1) * 32767).astype("<i2").tobytes()
            await h.feed_pcm(pcm, speed=0)
            await h.drain(1.0)
            final = await h.finish(timeout=120)
            return final

    final = asyncio.run(main())
    assert final is not None
    TranscriptionEngine.reset()


# ---- reference qwen3_streaming knobs (reference config.py:104-149) ----------


def test_segment_max_steps_forces_flush_with_carry(setup):
    """A runaway hypothesis (segment_max_steps decode steps without a
    sentence boundary) forces a segment flush; keep_tail/prompt-context
    words are tokenized into the next segment's prime."""
    dims, params = setup
    holder = Qwen3CausalASR(
        params, dims, window_s=30.0, max_new=8,
        segment_max_steps=1, segment_keep_tail_steps=2, prompt_context_words=2,
    )
    assert holder.ctx_budget == Qwen3CausalASR.CTX_BUDGET
    proc = Qwen3CausalProcessor(holder)
    t = 0.0
    committed = []
    for i in range(3):
        t += 1.0
        proc.insert_audio_chunk(audio_seconds(1, seed=i), t)
        tokens, _ = proc.process_iter()
        committed.extend(tokens)
    # with max_steps=1 every decoded hypothesis forces a flush: the window
    # stays near-empty even though window_s is huge
    assert proc.blocks_this_segment == 0
    assert committed, "forced flush must commit the hypothesis"
    # the committed tail is carried into the next prime
    assert proc._carry_ids == holder.tokenizer.encode(
        " ".join(proc._recent_words[-2:])
    )[-holder.ctx_budget:]
    assert proc._needs_prime
    # the next tick re-primes with the carry and still streams
    t += 1.0
    proc.insert_audio_chunk(audio_seconds(1, seed=9), t)
    proc.process_iter()
    assert proc.text_pos >= len(holder.prompt_ids) + len(proc._carry_ids)


def test_no_carry_without_knobs(setup):
    """ctx_budget stays 0 (no cache growth) when neither carry knob is set."""
    dims, params = setup
    holder = Qwen3CausalASR(params, dims, window_s=2.0, max_new=8)
    assert holder.ctx_budget == 0
    proc = Qwen3CausalProcessor(holder)
    t = 0.0
    for i in range(5):
        t += 1.0
        proc.insert_audio_chunk(audio_seconds(1, seed=i), t)
        proc.process_iter()
    assert proc._carry_ids == []


def test_static_context_extends_shared_prompt(setup):
    """qwen3_context tokens join the shared prompt (same for every lane)."""
    dims, params = setup
    h0 = Qwen3CausalASR(params, dims, window_s=2.0)
    h1 = Qwen3CausalASR(params, dims, window_s=2.0, context="t7 t8")
    assert h1.prompt_ids == h0.prompt_ids + [7, 8]
    assert h1.text_cache_len == h0.text_cache_len + 2
