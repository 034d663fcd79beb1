"""Mel pipeline parity tests.

The filterbank/STFT numerics are verified against torch (available on CPU
in this environment) implementing the same HiFi-GAN convention the
reference uses — torch.stft(center=False) with manual reflect padding.
"""

import numpy as np
import pytest

from matcha_tpu.audio import mel_spectrogram, mel_spectrogram_np
from matcha_tpu.audio.mel import hann_window_periodic, mel_filterbank

torch = pytest.importorskip("torch")


def _torch_reference_mel(y: np.ndarray, fb: np.ndarray) -> np.ndarray:
    """HiFi-GAN-convention mel via torch ops (oracle for our numerics)."""
    n_fft, hop, win = 1024, 256, 1024
    yt = torch.from_numpy(y)[None]
    yt = torch.nn.functional.pad(
        yt.unsqueeze(1), (int((n_fft - hop) / 2), int((n_fft - hop) / 2)), mode="reflect"
    ).squeeze(1)
    spec = torch.view_as_real(
        torch.stft(
            yt,
            n_fft,
            hop_length=hop,
            win_length=win,
            window=torch.hann_window(win),
            center=False,
            pad_mode="reflect",
            normalized=False,
            onesided=True,
            return_complex=True,
        )
    )
    spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    spec = torch.matmul(torch.from_numpy(fb), spec)
    spec = torch.log(torch.clamp(spec, min=1e-5))
    return spec.numpy()[0]


def test_hann_window_matches_torch():
    w = hann_window_periodic(1024)
    wt = torch.hann_window(1024).numpy()
    np.testing.assert_allclose(w, wt, atol=1e-6)


def test_mel_filterbank_sane():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert fb.min() >= 0.0
    # Triangles tile the band: every FFT bin inside (f_lo, f_hi) gets weight.
    covered = (fb.sum(axis=0) > 0).mean()
    assert covered > 0.7
    # Each mel filter is non-empty.
    assert (fb.sum(axis=1) > 0).all()


@pytest.mark.parametrize("n_samples", [2560, 22050])
def test_mel_matches_torch_stft(rng, n_samples):
    y = rng.uniform(-0.9, 0.9, size=(n_samples,)).astype(np.float32)
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    ref = _torch_reference_mel(y, fb)

    ours_np = mel_spectrogram_np(y)
    np.testing.assert_allclose(ours_np, ref, atol=2e-4)

    # JAX CPU f32 rfft accumulates slightly more rounding than torch's
    # (max ~3e-3 in the log domain); parity-critical numerics are covered
    # by the numpy twin above at 2e-4.
    ours_jax = np.asarray(mel_spectrogram(y))
    np.testing.assert_allclose(ours_jax, ref, atol=1e-2)

    # Frame count follows the reference: one frame per hop.
    assert ours_np.shape == (80, n_samples // 256)


def test_mel_filterbank_slaney_properties():
    """Analytic properties of the Slaney filterbank (librosa-compatible).

    Below 1 kHz the mel scale is linear with slope 3/200 mel/Hz, so the
    first filters' edge frequencies land at multiples of the linear band
    spacing; each filter is area-normalised to 2/(f_hi - f_lo).
    """
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    fft_freqs = np.linspace(0, 22050 / 2, 513)
    # Peak weight of filter m should equal 2/(f_{m+2} - f_m) at the centre.
    for m in (0, 10, 40, 79):
        peak_bin = fb[m].argmax()
        assert fb[m, peak_bin] > 0
        # Filter support is contiguous.
        nz = np.nonzero(fb[m])[0]
        assert (np.diff(nz) == 1).all()
    # Filters are ordered by centre frequency.
    centers = [fft_freqs[fb[m].argmax()] for m in range(80)]
    assert (np.diff(centers) > 0).all()
