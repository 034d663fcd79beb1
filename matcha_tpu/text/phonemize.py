"""``matcha-phonemize``: pre-phonemize a training filelist once, offline.

The reference re-runs espeak G2P inside dataloader workers EVERY epoch
(matcha/data/text_mel_datamodule.py:189-194) — the single slowest
host-side stage at training scale (SURVEY.md §7.3.6). This tool runs the
cleaner pipeline over a `path|[spk|]text` filelist once and writes a new
filelist whose text column is the CLEANED (phonemized) string; train with
``data.cleaners=[]`` (or leave the ``phonemized=true`` marker comment in
place and the datamodule's in-memory cache makes repeat epochs free).

Usage:
    matcha-phonemize input_filelist.txt output_filelist.txt \
        [--cleaner english_cleaners2] [--n-spks 1]
"""

import argparse
import sys

from matcha_tpu.text import _clean_text
from matcha_tpu.training.data import parse_filelist


def phonemize_filelist(input_path: str, output_path: str,
                       cleaner: str = "english_cleaners2", n_spks: int = 1) -> int:
    entries = parse_filelist(input_path)
    n = 0
    with open(output_path, "w", encoding="utf-8") as f:
        for entry in entries:
            if n_spks > 1:
                path, spk, text = entry[0], entry[1], "|".join(entry[2:])
                cleaned = _clean_text(text, [cleaner])
                f.write(f"{path}|{spk}|{cleaned}\n")
            else:
                path, text = entry[0], "|".join(entry[1:])
                cleaned = _clean_text(text, [cleaner])
                f.write(f"{path}|{cleaned}\n")
            n += 1
    return n


def main(argv=None):
    p = argparse.ArgumentParser(description="Pre-phonemize a Matcha filelist (one-time espeak pass)")
    p.add_argument("input", type=str, help="`path|[spk|]text` filelist")
    p.add_argument("output", type=str, help="output filelist with cleaned/phonemized text")
    p.add_argument("--cleaner", type=str, default="english_cleaners2",
                   help="cleaner pipeline to apply once (default english_cleaners2)")
    p.add_argument("--n-spks", type=int, default=1)
    args = p.parse_args(argv)
    n = phonemize_filelist(args.input, args.output, args.cleaner, args.n_spks)
    print(f"[🍵] Phonemized {n} utterances -> {args.output}")
    print("     Train with: data.train_filelist_path=... data.cleaners=[]")
    return n


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
