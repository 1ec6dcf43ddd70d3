"""EnglishTextNormalizer parity against the reference implementation.

Published Whisper WERs are computed after this normalizer; WER numbers are
methodology-comparable only if ours matches the reference's byte-for-byte
(reference whisper/normalizers/english.py). The reference module is imported
directly as the oracle; tests skip when the checkout is absent.
"""

import importlib.util
import sys
from pathlib import Path

import pytest

from conftest import REFERENCE_DIR
from whisperlivekit_tpu.harness.normalizers import (
    BasicTextNormalizer,
    EnglishNumberNormalizer,
    EnglishTextNormalizer,
)

_REF_PKG = REFERENCE_DIR / "whisperlivekit" / "whisper" / "normalizers"

pytestmark = pytest.mark.skipif(
    not (_REF_PKG / "english.py").is_file(), reason="reference normalizers unavailable"
)


@pytest.fixture(scope="module")
def oracle():
    """Load the reference normalizers package in isolation."""
    spec = importlib.util.spec_from_file_location(
        "_ref_normalizers",
        _REF_PKG / "__init__.py",
        submodule_search_locations=[str(_REF_PKG)],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_normalizers"] = mod
    spec.loader.exec_module(mod)
    return mod


CASES = [
    # passthrough / basic cleanup
    "Hello, World!",
    "The quick brown fox; jumps over the lazy dog.",
    "  [laughter] so (um) YES <noise> please  ",
    "it's John's idea, isn't it?",
    "won't can't let's ain't y'all wanna gotta gonna i'ma imma",
    "woulda coulda shoulda ma'am",
    "Mr Brown met Mrs Smith and Dr Jones at St Mary's",
    "Capt Kirk, Gov Smith, Gen Lee, Sen Warren, Rep Young, Pres Lincoln",
    "he'd been there, she's been here, they'd gone, he's gone, we'd done it",
    "she's got it, you're right, he's tall, I'd go, we'll see, can't've",
    "I'm sure they've left",
    "hmm mm mhm mmm uh um filler words",
    # numbers: cardinals
    "one two three four five",
    "twenty one",
    "twenty-one pilots",
    "one hundred",
    "one hundred and one dalmatians",
    "two hundred and fifty six",
    "nineteen eighty four",
    "one thousand nine hundred and ninety nine",
    "three million four hundred thousand",
    "seven billion people",
    "twelve thousand and twelve",
    "a hundred and one",  # "a" is not a number word
    "four score and seven years ago",
    # o / oh / zero digit sequences
    "one oh one",
    "double o seven",
    "triple seven",
    "oh seven hundred hours",
    "four zero four error",
    # ordinals and plurals
    "first second third fourth fifth twelfth",
    "the twenty first of june",
    "nineteen sixties",
    "the nineteen hundreds",
    "hundredth thousandth millionth",
    "sixes and sevens",
    "he came in two hundred and seventy fourth place",
    "thirty second and thirty third",
    # decimals / point
    "three point one four one five nine",
    "zero point five",
    "point five",
    "one point oh",
    "nine point nine nine",
    # and-a-half
    "two and a half hours",
    "a mile and a half",
    "three and a half million",
    "six and a half percent",
    # currency
    "twenty dollars",
    "twenty dollars and seven cents",
    "five pounds",
    "ninety nine cents",
    "two euros and fifty cents",
    "twenty million dollars",
    "minus five dollars",
    "a dollar and one cent",
    # percent
    "fifty percent",
    "two per cent",
    "one hundred per cent sure",
    "per capita income",
    # signs
    "minus forty degrees",
    "plus one",
    "negative three point five",
    "positive thinking",
    # arabic numerals mixed in
    "he was born in 1984",
    "it costs 1,234,567 dollars",
    "room 101 on the 2nd floor",
    "version 3.5 was released",
    "the 1960s were wild",
    "call 555 0123 now",
    "10.0.0.1 is a private address",
    "He owes $1,000,000 already",
    # literal one(s)
    "one of a kind",
    "the little ones",
    "which one is it",
    "ones and zeros",
    # diacritics / unicode
    "naïve café résumé",
    "Łódź and Ærøskøbing",
    "the straße was empty",
    "smörgåsbord",
    # messy spacing / punctuation
    "well ... yes!!! maybe??",
    "a-b-c d.e.f",
    "U.S.A. and U.K. relations",
    "co-operate re-enter",
    # spelling normalization (UK -> US)
    "the colour of the armour in the centre of the theatre",
    "he apologised while travelling to the harbour",
    "organisation and realisation",
    # tricky number boundaries
    "thousand island dressing",
    "a million reasons",
    "hundred",
    "two hundred thousand million",
    "seventeen seventy six",
    "twenty twenty",
    "twenty twenty one",
    "fifty five thousand five hundred and fifty five",
    "six hundredths",
    "five thirtieths",
    "one and one",
    "one one one",
    "ten four good buddy",
    "seven forty seven airplane",
]


def test_english_parity(oracle):
    ours = EnglishTextNormalizer()
    ref = oracle.EnglishTextNormalizer()
    mismatches = []
    for case in CASES:
        got, want = ours(case), ref(case)
        if got != want:
            mismatches.append((case, got, want))
    assert not mismatches, "\n".join(
        f"IN : {c!r}\nGOT: {g!r}\nREF: {w!r}\n" for c, g, w in mismatches
    )


def test_number_normalizer_parity(oracle):
    import importlib

    ours = EnglishNumberNormalizer()
    ref = importlib.import_module("_ref_normalizers.english").EnglishNumberNormalizer()
    for case in CASES:
        lowered = case.lower()
        assert ours(lowered) == ref(lowered), f"number mismatch on {case!r}"


def test_basic_parity(oracle):
    for kwargs in ({}, {"remove_diacritics": True}, {"split_letters": True}):
        ours = BasicTextNormalizer(**kwargs)
        ref = oracle.BasicTextNormalizer(**kwargs)
        for case in CASES:
            assert ours(case) == ref(case), f"basic mismatch on {case!r} {kwargs}"


def test_spelling_asset_loaded():
    norm = EnglishTextNormalizer()
    assert norm.standardize_spellings.mapping, "english.json asset must resolve"
    assert norm("the colour centre") == "the color center"
