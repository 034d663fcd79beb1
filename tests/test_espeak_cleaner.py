"""english_cleaners2 contract tests (espeak G2P path).

espeak-ng/phonemizer are absent from this image, so the live cleaner
cannot run here; what CAN be pinned (VERDICT r2 item 8):

1. the IPA alphabet contract — representative strings in the
   english_cleaners2 output alphabet (espeak en-us IPA + stress marks +
   preserved punctuation) must map losslessly through the 178-symbol ID
   path that trained checkpoints expect,
2. the cleaner's gating — calling it without phonemizer must raise the
   documented actionable error (not an AttributeError deep inside),
3. when phonemizer IS present (real deployments), the live output must
   stay inside the symbol table and round-trip the ID path.

Reference: matcha/text/cleaners.py:99-116, symbols.py:5-14.
"""

import pytest

from matcha_tpu.text import cleaned_text_to_sequence, sequence_to_text
from matcha_tpu.text.cleaners import english_cleaners2
from matcha_tpu.text.symbols import symbols
from matcha_tpu.utils.utils import intersperse

# Representative english_cleaners2-alphabet strings (espeak en-us IPA with
# with_stress=True + preserve_punctuation=True conventions).
IPA_FIXTURES = [
    "həlˈoʊ wˈɜːld.",
    "ðə kwˈɪk bɹˈaʊn fˈɑːks dʒˈʌmps ˈoʊvɚ ðə lˈeɪzi dˈɔːɡ.",
    "ɪts ˈoʊnli wˈʌn θˈɪŋ ænd ðˈɛn ɐnˈʌðɚ?",
    "nˈaʊ æt tˈɛn θˈɜːɾi fˈaɪv,",
]


def _phonemizer_available():
    try:
        import phonemizer

        phonemizer.backend.EspeakBackend("en-us")
        return True
    except Exception:
        return False


@pytest.mark.parametrize("ipa", IPA_FIXTURES)
def test_ipa_fixture_round_trips_the_id_path(ipa):
    """Every char the espeak pipeline can emit for these sentences is in
    the 178-symbol table, the ID mapping is lossless, and intersperse
    (blank id 0) produces the trained-checkpoint input convention."""
    assert all(c in set(symbols) for c in ipa), [c for c in ipa if c not in set(symbols)]
    seq = cleaned_text_to_sequence(ipa)
    assert len(seq) == len(ipa) and all(i > 0 for i in seq)
    assert sequence_to_text(seq) == ipa
    inter = intersperse(seq, 0)
    assert len(inter) == 2 * len(seq) + 1
    assert inter[::2] == [0] * (len(seq) + 1) and inter[1::2] == seq


def test_cleaner_without_phonemizer_raises_actionable_error():
    if _phonemizer_available():
        pytest.skip("phonemizer installed; gating path not reachable")
    with pytest.raises((ImportError, RuntimeError), match="phonemizer|espeak"):
        english_cleaners2("hello world")


def test_live_espeak_output_stays_in_symbol_table():
    if not _phonemizer_available():
        pytest.skip("phonemizer/espeak-ng not installed")
    out = english_cleaners2("Hello world, it is ten thirty five!")
    assert out
    unknown = [c for c in out if c not in set(symbols)]
    assert not unknown, f"espeak emitted symbols outside the table: {unknown}"
    assert sequence_to_text(cleaned_text_to_sequence(out)) == out
