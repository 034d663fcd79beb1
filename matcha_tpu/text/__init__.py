"""Text frontend: string -> phoneme-id sequences.

Host-side preprocessing (outside the compiled graph). Public surface
mirrors the reference (matcha/text/__init__.py:10-53):
``text_to_sequence``, ``cleaned_text_to_sequence``, ``sequence_to_text``.
"""

from matcha_tpu.text import cleaners
from matcha_tpu.text.symbols import symbols

# Mappings from symbol to numeric ID and vice versa:
_symbol_to_id = {s: i for i, s in enumerate(symbols)}
_id_to_symbol = dict(enumerate(symbols))


def text_to_sequence(text: str, cleaner_names) -> list:
    """Convert a text string to a sequence of symbol IDs.

    Args:
        text: string to convert to a sequence
        cleaner_names: names of the cleaner functions to run the text through

    Returns:
        List of integers corresponding to the symbols in the text.
    """
    clean_text = _clean_text(text, cleaner_names)
    return [_symbol_to_id[symbol] for symbol in clean_text if symbol in _symbol_to_id]


def cleaned_text_to_sequence(cleaned_text: str) -> list:
    """Convert an already-cleaned string to a sequence of symbol IDs."""
    return [_symbol_to_id[symbol] for symbol in cleaned_text]


def sequence_to_text(sequence) -> str:
    """Convert a sequence of IDs back to a string."""
    return "".join(_id_to_symbol[int(symbol_id)] for symbol_id in sequence)


def _clean_text(text: str, cleaner_names) -> str:
    for name in cleaner_names:
        cleaner = getattr(cleaners, name, None)
        if cleaner is None:
            raise ValueError(f"Unknown cleaner: {name}")
        text = cleaner(text)
    return text
