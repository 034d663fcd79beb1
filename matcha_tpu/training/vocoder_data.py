"""Vocoder-training dataset (the reference's hifigan MelDataset analog).

The reference ships a vocoder dataset (matcha/hifigan/meldataset.py:105 —
random 8192-sample segment crops, mel targets, optional fine-tuning from
precomputed mels) but no vocoder training entry point; vocoder weights
are downloaded pretrained. This module provides the dataset plus batching
for :mod:`matcha_tpu.training.vocoder_trainer`, which closes that gap
with a JAX GAN training step.
"""

import random
from typing import Iterator, List, Optional

import numpy as np

from matcha_tpu.audio.mel import mel_spectrogram_np
from matcha_tpu.training.data import parse_filelist
from matcha_tpu.utils.utils import read_wav


class MelDataset:
    """Random fixed-length waveform segments + mel targets."""

    def __init__(
        self,
        filelist_path: str,
        segment_size: int = 8192,
        n_fft: int = 1024,
        num_mels: int = 80,
        hop_size: int = 256,
        win_size: int = 1024,
        sampling_rate: int = 22050,
        fmin: float = 0.0,
        fmax: float = 8000.0,
        fmax_loss: Optional[float] = None,
        split: bool = True,
        shuffle: bool = True,
        seed: int = 1234,
        fine_tuning: bool = False,
        base_mels_path: Optional[str] = None,
    ):
        entries = parse_filelist(filelist_path)
        self.audio_files = [e[0] for e in entries]
        if shuffle:
            random.Random(seed).shuffle(self.audio_files)
        self.segment_size = segment_size
        self.n_fft = n_fft
        self.num_mels = num_mels
        self.hop_size = hop_size
        self.win_size = win_size
        self.sampling_rate = sampling_rate
        self.fmin = fmin
        self.fmax = fmax
        self.fmax_loss = fmax_loss if fmax_loss is not None else fmax
        self.split = split
        self.fine_tuning = fine_tuning
        self.base_mels_path = base_mels_path
        self._rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.audio_files)

    def __getitem__(self, index: int) -> dict:
        path = self.audio_files[index]
        audio, sr = read_wav(path)
        assert sr == self.sampling_rate

        if self.fine_tuning:
            # Fine-tune on PRECOMPUTED (synthesized) mels: the conditioning
            # mel comes from base_mels_path/<stem>.npy while the target
            # audio (and mel_loss) stay ground-truth — the reference's
            # fine-tuning branch (matcha/hifigan/meldataset.py:184-201).
            import os

            stem = os.path.splitext(os.path.basename(path))[0]
            mel = np.load(os.path.join(self.base_mels_path, stem + ".npy"))
            if mel.ndim == 3:
                mel = mel[0]
            if self.split:
                frames_per_seg = -(-self.segment_size // self.hop_size)
                # start range clamped by BOTH the mel and the audio (a
                # synthesized mel can be a few frames longer than the wav)
                max_start = min(mel.shape[1] - frames_per_seg - 1,
                                audio.shape[0] // self.hop_size - frames_per_seg)
                if audio.shape[0] >= self.segment_size and max_start > 0:
                    mel_start = self._rng.randint(0, max_start)
                    mel = mel[:, mel_start : mel_start + frames_per_seg]
                    audio = audio[mel_start * self.hop_size : (mel_start + frames_per_seg) * self.hop_size]
                else:
                    mel = np.pad(mel, ((0, 0), (0, max(0, frames_per_seg - mel.shape[1]))))
                    audio = np.pad(audio, (0, max(0, self.segment_size - audio.shape[0])))
                    mel = mel[:, :frames_per_seg]
                    audio = audio[: self.segment_size]
        else:
            if self.split:
                if audio.shape[0] >= self.segment_size:
                    start = self._rng.randint(0, audio.shape[0] - self.segment_size)
                    audio = audio[start : start + self.segment_size]
                else:
                    audio = np.pad(audio, (0, self.segment_size - audio.shape[0]))
            mel = mel_spectrogram_np(
                audio, self.n_fft, self.num_mels, self.sampling_rate,
                self.hop_size, self.win_size, self.fmin, self.fmax,
            )

        mel_loss = mel_spectrogram_np(
            audio, self.n_fft, self.num_mels, self.sampling_rate,
            self.hop_size, self.win_size, self.fmin, self.fmax_loss,
        )
        return {"mel": mel, "audio": audio, "mel_loss": mel_loss}

    def batches(self, batch_size: int, epoch: int = 0) -> Iterator[dict]:
        idx = list(range(len(self)))
        random.Random(epoch).shuffle(idx)
        for i in range(0, len(idx) - batch_size + 1, batch_size):
            items: List[dict] = [self[j] for j in idx[i : i + batch_size]]
            yield {
                # channels-last for the flax generator
                "mel": np.stack([it["mel"].T for it in items]),        # (B, T, M)
                "mel_loss": np.stack([it["mel_loss"].T for it in items]),
                "audio": np.stack([it["audio"][:, None] for it in items]),  # (B, T, 1)
            }
