"""Native C++ audio frontend parity vs the numpy mel pipeline."""

import numpy as np
import pytest


@pytest.mark.parametrize("n_samples", [2560, 22050])
def test_native_mel_matches_numpy(rng, n_samples):
    from matcha_tpu.audio.mel import mel_spectrogram_np
    from matcha_tpu.audio.native import mel_spectrogram_native

    y = rng.uniform(-0.9, 0.9, size=(n_samples,)).astype(np.float32)
    ref = mel_spectrogram_np(y)
    got = mel_spectrogram_native(y)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_native_mel_tone(rng):
    from matcha_tpu.audio.native import mel_spectrogram_native

    sr = 22050
    t = np.arange(sr // 2) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mel = mel_spectrogram_native(tone)
    peaks = mel.argmax(axis=0)
    # stable peak channel across frames for a pure tone
    assert np.bincount(peaks).max() > 0.9 * peaks.size
