"""Centered STFT / iSTFT parity vs torch, and denoiser behaviour."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from matcha_tpu.audio.stft import istft, stft_magnitude_phase  # noqa: E402


def test_stft_matches_torch(rng):
    audio = rng.uniform(-0.8, 0.8, size=(4096,)).astype(np.float32)
    mag, phase = stft_magnitude_phase(jnp.asarray(audio))
    spec_t = torch.stft(
        torch.from_numpy(audio), 1024, hop_length=256, win_length=1024,
        window=torch.hann_window(1024), return_complex=True, center=True,
        pad_mode="reflect",
    )
    mag_t = spec_t.abs().numpy()
    phase_t = torch.angle(spec_t).numpy()
    assert mag.shape == mag_t.shape
    np.testing.assert_allclose(np.asarray(mag), mag_t, atol=2e-3)
    # compare phases where magnitude is non-negligible (phase of ~0 bins is noise)
    mask = mag_t > 1e-2
    dphi = np.angle(np.exp(1j * (np.asarray(phase) - phase_t)))
    assert np.abs(dphi[mask]).max() < 5e-2


def test_istft_roundtrip_matches_torch(rng):
    audio = rng.uniform(-0.8, 0.8, size=(4096,)).astype(np.float32)
    mag, phase = stft_magnitude_phase(jnp.asarray(audio))
    recon = np.asarray(istft(mag, phase, length=4096))

    spec_t = torch.stft(
        torch.from_numpy(audio), 1024, hop_length=256, win_length=1024,
        window=torch.hann_window(1024), return_complex=True, center=True,
        pad_mode="reflect",
    )
    recon_t = torch.istft(
        spec_t, 1024, hop_length=256, win_length=1024,
        window=torch.hann_window(1024), length=4096,
    ).numpy()
    np.testing.assert_allclose(recon, recon_t, atol=2e-3)
    # and the roundtrip reconstructs the signal
    np.testing.assert_allclose(recon, audio, atol=2e-3)


def test_denoiser_subtracts_bias(rng):
    """denoise() with strength=0 is identity (up to iSTFT error); with a
    large strength it reduces energy at the bias frequencies."""
    from matcha_tpu.models.denoiser import compute_bias_spec, denoise

    sr = 22050
    t = np.arange(8192) / sr
    tone = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

    # A fake vocoder that always emits a 60 Hz hum (its "bias").
    hum = (0.05 * np.sin(2 * np.pi * 60 * np.arange(88 * 256 + 768) / sr)).astype(np.float32)

    def fake_vocoder(mel):
        return jnp.asarray(hum)[None, :, None]

    bias = compute_bias_spec(fake_vocoder)
    assert bias.shape == (513, 1)

    noisy = tone + 0.05 * np.sin(2 * np.pi * 60 * np.arange(8192) / sr).astype(np.float32)
    out0 = np.asarray(denoise(jnp.asarray(noisy), jnp.asarray(bias), strength=0.0))
    np.testing.assert_allclose(out0, noisy, atol=5e-3)

    out = np.asarray(denoise(jnp.asarray(noisy), jnp.asarray(bias), strength=1.0))

    def band_energy(x, f0):
        spec = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(len(x), 1 / sr)
        sel = (freqs > f0 - 15) & (freqs < f0 + 15)
        return spec[sel].sum()

    # magnitude-domain subtraction is phase-blind; expect a substantial
    # (not total) reduction of the hum band
    assert band_energy(out, 60) < 0.7 * band_energy(noisy, 60)
    # the 440 Hz content survives
    assert band_energy(out, 440) > 0.8 * band_energy(noisy, 440)
