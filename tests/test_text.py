"""Text frontend tests (symbol table contract + cleaners + id mapping)."""

from matcha_tpu.text import cleaned_text_to_sequence, sequence_to_text, text_to_sequence
from matcha_tpu.text.cleaners import (
    basic_cleaners,
    collapse_whitespace,
    english_cleaners_no_espeak,
    expand_abbreviations,
    transliteration_cleaners,
)
from matcha_tpu.text.numbers import normalize_numbers, number_to_words
from matcha_tpu.text.symbols import SPACE_ID, symbols
from matcha_tpu.utils.utils import intersperse


def test_symbol_table_contract():
    # The checkpoint contract: 178 symbols, pad at 0, space id stable.
    assert len(symbols) == 178
    assert symbols[0] == "_"
    assert symbols[SPACE_ID] == " "
    assert len(set(symbols)) == len(symbols) - 1  # "'" appears twice in the IPA tail
    # Golden spot-checks against the reference table.
    assert symbols[1] == ";"
    assert symbols[16] == " "
    assert symbols[17] == "A"
    assert symbols[43] == "a"


def test_text_roundtrip():
    text = "hello world!"
    seq = text_to_sequence(text, ["basic_cleaners"])
    assert sequence_to_text(seq) == text
    assert cleaned_text_to_sequence(text) == seq


def test_cleaners():
    assert basic_cleaners("Hello   WORLD") == "hello world"
    assert collapse_whitespace("a  b\tc\nd") == "a b c d"
    assert expand_abbreviations("Dr. Smith met Mr. Jones") == "doctor Smith met mister Jones"
    assert transliteration_cleaners("Crème  Brûlée") == "creme brulee"
    out = english_cleaners_no_espeak("Dr. Strange has $12.50 and 3 cats.")
    assert out == "doctor strange has twelve dollars, fifty cents and three cats."


def test_number_normalization():
    assert number_to_words(0) == "zero"
    assert number_to_words(21) == "twenty-one"
    assert number_to_words(105) == "one hundred five"
    assert number_to_words(1234567) == "one million two hundred thirty-four thousand five hundred sixty-seven"
    # 1234 falls in the year-reading branch (matches the reference's
    # inflect group=2 behaviour for 1000 < n < 3000).
    assert normalize_numbers("1,234 things") == "twelve thirty-four things"
    assert normalize_numbers("4,234 things") == "four thousand two hundred thirty-four things"
    assert normalize_numbers("in 1905") == "in nineteen oh five"
    assert normalize_numbers("the 3rd time") == "the third time"
    assert normalize_numbers("the 22nd") == "the twenty-second"
    assert normalize_numbers("in 2005") == "in two thousand five"
    assert normalize_numbers("in 1999") == "in nineteen ninety-nine"
    assert normalize_numbers("£5") == "five pounds"


def test_intersperse():
    assert intersperse([1, 2, 3], 0) == [0, 1, 0, 2, 0, 3, 0]
    assert intersperse([], 0) == [0]


def test_phonemize_filelist_tool(tmp_path):
    """matcha-phonemize: one-time cleaning pass; training then uses
    cleaners=[] on the pre-cleaned filelist and yields identical ids."""
    from matcha_tpu.text import text_to_sequence
    from matcha_tpu.text.phonemize import phonemize_filelist

    src = tmp_path / "fl.txt"
    src.write_text("a.wav|Dr. Smith has 2 cats.\nb.wav|hello world\n", encoding="utf-8")
    out = tmp_path / "fl_ph.txt"
    n = phonemize_filelist(str(src), str(out), cleaner="english_cleaners_no_espeak")
    assert n == 2
    lines = out.read_text(encoding="utf-8").splitlines()
    assert lines[0].startswith("a.wav|")
    cleaned = lines[0].split("|", 1)[1]
    # ids from the pre-cleaned text with NO cleaner == ids from the raw
    # text with the cleaner
    assert text_to_sequence(cleaned, []) == text_to_sequence("Dr. Smith has 2 cats.", ["english_cleaners_no_espeak"])

    # multi-speaker format preserved
    src2 = tmp_path / "fl2.txt"
    src2.write_text("a.wav|3|hello\n", encoding="utf-8")
    out2 = tmp_path / "fl2_ph.txt"
    phonemize_filelist(str(src2), str(out2), cleaner="english_cleaners_no_espeak", n_spks=2)
    assert out2.read_text(encoding="utf-8").split("|")[1] == "3"
