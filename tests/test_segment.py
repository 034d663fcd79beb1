"""Sentence segmentation for long-form synthesis."""

from matcha_tpu.text.segment import split_sentences


def test_basic_split():
    text = "Hello world. How are you? I am fine!"
    assert split_sentences(text, max_chars=20) == [
        "Hello world.", "How are you?", "I am fine!",
    ]


def test_abbreviations_not_split():
    text = "Dr. Smith met Mr. Jones. They talked."
    chunks = split_sentences(text, max_chars=30)
    assert chunks == ["Dr. Smith met Mr. Jones.", "They talked."]


def test_greedy_merge():
    text = "One. Two. Three. Four."
    assert split_sentences(text, max_chars=12) == ["One. Two.", "Three. Four."]


def test_overlong_sentence_wraps():
    text = "word " * 50
    chunks = split_sentences(text.strip(), max_chars=26)
    assert all(len(c) <= 26 for c in chunks)
    assert " ".join(chunks) == text.strip()


def test_empty():
    assert split_sentences("") == []
    assert split_sentences("   ") == []


def test_quotes_and_ellipsis():
    text = 'He said "stop." Then he left… And returned.'
    chunks = split_sentences(text, max_chars=25)
    assert chunks[0] == 'He said "stop."'
    assert len(chunks) == 3
