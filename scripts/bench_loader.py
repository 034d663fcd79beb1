"""Host data-loader throughput: mel frontend x worker count.

The train step consumes B=32 utterances every ~60 ms (PERFORMANCE.md), i.e.
the loader must sustain ~530 items/s to keep the chip fed. The reference
feeds this with 20 torch dataloader worker PROCESSES re-running espeak +
torch.stft every epoch (configs/data/ljspeech.yaml); here the hot op is
numpy or the C++/OpenMP frontend (native/audio/) under a thread pool
(both release the GIL), with phoneme results cached after first touch.

Usage: python scripts/bench_loader.py [n_utts] [seconds_per_utt]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 22050


def make_corpus(root: str, n: int, dur_s: float) -> str:
    from matcha_tpu.utils.utils import write_wav

    rng = np.random.default_rng(0)
    entries = []
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dogs"]
    for i in range(n):
        t = np.arange(int(SR * dur_s)) / SR
        audio = (0.4 * np.sin(2 * np.pi * (150 + 7 * i) * t)).astype(np.float32)
        audio += rng.normal(0, 0.01, audio.shape).astype(np.float32)
        p = os.path.join(root, f"utt{i}.wav")
        write_wav(p, audio, SR)
        text = " ".join(rng.choice(words, size=12))
        entries.append(f"{p}|{text}")
    fl = os.path.join(root, "train.txt")
    with open(fl, "w", encoding="utf-8") as f:
        f.write("\n".join(entries))
    return fl


def run(fl: str, frontend: str, workers: int, batch_size: int = 32,
        mel_cache_dir=None) -> float:
    from matcha_tpu.training.data import TextMelDataModule

    dm = TextMelDataModule(
        name="bench", train_filelist_path=fl, valid_filelist_path=fl,
        batch_size=batch_size, num_workers=workers,
        cleaners=["english_cleaners_no_espeak"],
        data_statistics={"mel_mean": -5.5, "mel_std": 2.1},
        # steady-state training protocol (and the docstring's claim):
        # phonemes cached after the warm-up epoch, mel is the hot op
        seed=1, frontend=frontend, phoneme_cache=True,
        mel_cache_dir=mel_cache_dir,
    )
    # warm-up epoch builds the native lib / numpy caches out of the timing
    n_items = 0
    for b in dm.train_batches(0):
        n_items += b["x"].shape[0]
    t0 = time.time()
    for b in dm.train_batches(1):
        pass
    dt = time.time() - t0
    return n_items / dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dur = float(sys.argv[2]) if len(sys.argv) > 2 else 6.5
    with tempfile.TemporaryDirectory() as root:
        fl = make_corpus(root, n, dur)
        print(f"{n} utts x {dur}s | need ~530 items/s to saturate the 60 ms train step")
        print(f"{'frontend':<8} {'workers':>7} {'items/s':>9} {'audio-sec/s':>12}")
        for frontend in ("numpy", "native"):
            for workers in (0, 4, 8):
                try:
                    ips = run(fl, frontend, workers)
                except Exception as e:
                    print(f"{frontend:<8} {workers:>7}  failed: {e}")
                    continue
                print(f"{frontend:<8} {workers:>7} {ips:>9.1f} {ips*dur:>12.0f}")
        # steady-state training feed rate: epochs >= 2 hit the mel cache
        cache = os.path.join(root, "melcache")
        ips = run(fl, "native", 4, mel_cache_dir=cache)
        print(f"{'cached':<8} {4:>7} {ips:>9.1f} {ips*dur:>12.0f}")


if __name__ == "__main__":
    main()
