"""Decoding machinery invariants with a tiny random-weight model.

Quality cannot be asserted without real weights (no network in CI); these
tests pin the *rules*: timestamp grammar, suppression, fallback ladder flow,
segmentation arithmetic, writer formats, beam bookkeeping.
"""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_asset
from whisperlivekit_tpu.decoding.options import DecodingOptions
from whisperlivekit_tpu.decoding.task import WhisperDecoder
from whisperlivekit_tpu.decoding import writers
from whisperlivekit_tpu.models.whisper import model as M
from whisperlivekit_tpu.models.whisper.dims import ModelDimensions

needs_vocab = pytest.mark.skipif(
    reference_asset("whisperlivekit/whisper/assets/multilingual.tiktoken") is None,
    reason="tokenizer vocab assets unavailable",
)

TS_BEGIN = 50364


@pytest.fixture(scope="module")
def tiny():
    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=64, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    params = M.init_params(dims, jax.random.PRNGKey(0))
    return WhisperDecoder(params, dims)


@pytest.fixture(scope="module")
def mel(tiny):
    from whisperlivekit_tpu.audio.mel import N_SAMPLES, log_mel_spectrogram, pad_or_trim

    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(16000 * 3)).astype(np.float32)
    m = log_mel_spectrogram(jnp.asarray(audio), padding=N_SAMPLES - len(audio))
    return pad_or_trim(m, 3000)


@needs_vocab
def test_timestamp_grammar(tiny, mel):
    res = tiny.decode(mel, DecodingOptions(language="en", sample_len=16))[0]
    toks = res.tokens
    assert toks[0] >= TS_BEGIN, "must start with a timestamp"
    # pairing: a timestamp following text must be followed by a timestamp or end
    for i in range(1, len(toks) - 1):
        if toks[i] >= TS_BEGIN and toks[i - 1] < TS_BEGIN:
            assert toks[i + 1] >= TS_BEGIN
    # nondecreasing
    ts = [t for t in toks if t >= TS_BEGIN]
    assert ts == sorted(ts)


@needs_vocab
def test_without_timestamps(tiny, mel):
    res = tiny.decode(mel, DecodingOptions(language="en", sample_len=16, without_timestamps=True))[0]
    assert all(t < TS_BEGIN for t in res.tokens)


@needs_vocab
def test_prompt_does_not_recompile_or_crash(tiny, mel):
    for prompt in (None, "short", "a much longer prompt with many words " * 3):
        res = tiny.decode(
            mel, DecodingOptions(language="en", sample_len=8, prompt=prompt)
        )[0]
        assert isinstance(res.text, str)


@needs_vocab
def test_temperature_sampling(tiny, mel):
    res = tiny.decode(
        mel, DecodingOptions(language="en", sample_len=8, temperature=0.8, best_of=2)
    )[0]
    assert res.temperature == 0.8
    assert np.isfinite(res.avg_logprob)


@needs_vocab
def test_beam_decode(tiny, mel):
    res = tiny.decode(
        mel, DecodingOptions(language="en", sample_len=8, beam_size=2)
    )[0]
    assert isinstance(res.tokens, list)
    assert np.isfinite(res.avg_logprob)


@needs_vocab
def test_transcribe_flow(tiny):
    from whisperlivekit_tpu.decoding.transcribe import transcribe

    rng = np.random.default_rng(1)
    audio = (0.1 * rng.standard_normal(16000 * 4)).astype(np.float32)
    out = transcribe(
        tiny, audio,
        temperature=0.0,
        compression_ratio_threshold=None,
        logprob_threshold=None,
        no_speech_threshold=None,
        language="en",
        sample_len=8,
    )
    assert out["language"] == "en"
    assert isinstance(out["segments"], list) and len(out["segments"]) >= 1
    for seg in out["segments"]:
        assert 0 <= seg["start"] <= seg["end"]


@needs_vocab
def test_word_timestamps_smoke(tiny):
    from whisperlivekit_tpu.decoding.timing import find_alignment
    from whisperlivekit_tpu.models.whisper.tokenizer import get_tokenizer

    tok = get_tokenizer(True, language="en", task="transcribe")
    align = M.AlignSpec.from_pairs([(0, 0), (1, 1)])
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((80, 3000)).astype(np.float32))
    words = find_alignment(
        tiny.params, tiny.dims, align, tok,
        tok.encode(" hello world this is streaming"), mel, num_frames=600,
    )
    assert len(words) >= 2
    for w in words:
        assert 0 <= w.start <= w.end <= 30.0
    # monotonic starts
    starts = [w.start for w in words]
    assert starts == sorted(starts)


def test_writers():
    result = {
        "text": "hello world",
        "segments": [
            {"start": 0.0, "end": 1.5, "text": " hello"},
            {"start": 1.5, "end": 3.25, "text": " world"},
        ],
        "language": "en",
    }
    buf = io.StringIO()
    writers.write_srt(result, buf)
    srt = buf.getvalue()
    assert "00:00:00,000 --> 00:00:01,500" in srt and "1\n" in srt
    buf = io.StringIO()
    writers.write_vtt(result, buf)
    assert buf.getvalue().startswith("WEBVTT")
    buf = io.StringIO()
    writers.write_tsv(result, buf)
    assert "0\t1500\thello" in buf.getvalue()
    assert writers.get_writer("json")
    with pytest.raises(ValueError):
        writers.get_writer("nope")


@needs_vocab
def test_transcribe_clip_timestamps(tiny):
    from whisperlivekit_tpu.decoding.transcribe import transcribe

    rng = np.random.default_rng(5)
    audio = (0.1 * rng.standard_normal(16000 * 6)).astype(np.float32)
    out = transcribe(
        tiny, audio,
        temperature=0.0,
        compression_ratio_threshold=None,
        logprob_threshold=None,
        no_speech_threshold=None,
        language="en",
        sample_len=6,
        clip_timestamps="1,3",  # only transcribe 1s..3s
    )
    # decode windows start inside the clip; predicted (random-weight)
    # timestamp tokens can still claim times past the clip end, as in the
    # reference, so only the window placement is asserted.
    for seg in out["segments"]:
        assert seg["start"] >= 1.0 - 0.01
        assert seg["seek"] >= 100 and seg["seek"] < 300


@needs_vocab
def test_transcribe_hallucination_threshold_runs(tiny):
    from whisperlivekit_tpu.decoding.transcribe import transcribe

    rng = np.random.default_rng(6)
    audio = (0.1 * rng.standard_normal(16000 * 4)).astype(np.float32)
    out = transcribe(
        tiny, audio,
        temperature=0.0,
        compression_ratio_threshold=None,
        logprob_threshold=None,
        no_speech_threshold=None,
        language="en",
        sample_len=6,
        word_timestamps=True,
        hallucination_silence_threshold=2.0,
    )
    assert isinstance(out["segments"], list)
