"""Tokenizer parity: special-token layout, round-trip, word splitting."""

import pytest

from conftest import reference_asset
from whisperlivekit_tpu.models.whisper import tokenizer as T

pytestmark = pytest.mark.skipif(
    reference_asset("whisperlivekit/whisper/assets/multilingual.tiktoken") is None
    and "WLK_TPU_ASSET_DIR" not in __import__("os").environ,
    reason="tokenizer vocab assets unavailable",
)


@pytest.fixture(scope="module")
def tok():
    return T.get_tokenizer(multilingual=True, language="en", task="transcribe")


def test_special_token_layout(tok):
    # Known public ids for the multilingual vocab (51865 total).
    assert tok.eot == 50257
    assert tok.sot == 50258
    assert tok.to_language_token("en") == 50259
    assert tok.transcribe == 50359
    assert tok.translate == 50358
    assert tok.sot_prev == 50361
    assert tok.no_speech == 50362
    assert tok.no_timestamps == 50363
    assert tok.timestamp_begin == 50364
    assert tok.encoding.n_vocab == 51865


def test_sot_sequence(tok):
    assert tok.sot_sequence == (50258, 50259, 50359)
    assert tok.sot_sequence_including_notimestamps == (50258, 50259, 50359, 50363)


def test_round_trip(tok):
    text = " Hello world, this is a streaming test."
    ids = tok.encode(text)
    assert tok.decode(ids) == text


def test_decode_skips_timestamps(tok):
    # decode() drops timestamp tokens but renders other specials verbatim,
    # matching reference whisper/tokenizer.py decode semantics.
    ids = [*tok.encode(" hi"), tok.timestamp_begin + 50]
    assert tok.decode(ids) == " hi"
    with_ts = tok.decode_with_timestamps([tok.timestamp_begin + 50, *tok.encode(" hi")])
    assert "<|1.00|>" in with_ts and " hi" in with_ts


def test_split_tokens_on_spaces(tok):
    ids = tok.encode(" hello beautiful world!")
    words, word_tokens = tok.split_to_word_tokens(ids)
    assert [w.strip() for w in words if w.strip() not in "!"] == [
        "hello",
        "beautiful",
        "world",
    ] or "".join(words) == " hello beautiful world!"
    assert sum(word_tokens, []) == ids


def test_split_unicode_language():
    tok = T.get_tokenizer(multilingual=True, language="zh", task="transcribe")
    ids = tok.encode("你好世界")
    words, word_tokens = tok.split_to_word_tokens(ids)
    assert "".join(words) == "你好世界"
    assert sum(word_tokens, []) == ids


def test_non_speech_tokens(tok):
    nst = tok.non_speech_tokens
    assert len(nst) > 20
    # " -" and " '" leading tokens must be included
    assert tok.encode(" -")[0] in nst
    assert tok.encode(" '")[0] in nst


def test_language_normalization():
    assert T.normalize_language("FRENCH") == "fr"
    assert T.normalize_language("mandarin") == "zh"
    with pytest.raises(ValueError):
        T.normalize_language("klingon")


def test_gpt2_english_tokenizer():
    tok = T.get_tokenizer(multilingual=False)
    assert tok.language is None and tok.task is None
    assert tok.sot_sequence == (tok.sot,)
    assert tok.decode(tok.encode(" test")) == " test"
