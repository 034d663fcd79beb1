"""Spectral-subtraction vocoder-bias denoiser.

Rebuild of the reference's WaveGlow-style denoiser
(matcha/hifigan/denoiser.py:7-64): run the vocoder on a zero mel input to
record its bias spectrum, then subtract ``strength * bias`` from synthesis
magnitudes and resynthesize with the original phases. Pure functions over
JAX arrays; the bias is precomputed once at load time.
"""

from typing import Callable

import jax.numpy as jnp

from matcha_tpu.audio.stft import istft, stft_magnitude_phase


def compute_bias_spec(
    vocoder_apply: Callable[[jnp.ndarray], jnp.ndarray],
    n_feats: int = 80,
    n_frames: int = 88,
    filter_length: int = 1024,
    n_overlap: int = 4,
    win_length: int = 1024,
    mode: str = "zeros",
    key=None,
) -> jnp.ndarray:
    """Bias magnitude spectrum of the vocoder on a zero (or random) mel.

    Returns (n_freq, 1) — the first STFT frame, like the reference
    (denoiser.py:56).
    """
    hop_length = filter_length // n_overlap
    if mode == "zeros":
        mel = jnp.zeros((1, n_frames, n_feats))
    elif mode == "normal":
        import jax

        mel = jax.random.normal(key, (1, n_frames, n_feats))
    else:
        raise ValueError(f"Mode {mode} is not supported")
    bias_audio = vocoder_apply(mel).reshape(-1)  # (T,)
    bias_spec, _ = stft_magnitude_phase(bias_audio, filter_length, hop_length, win_length)
    return bias_spec[:, 0:1]


def denoise(
    audio: jnp.ndarray,
    bias_spec: jnp.ndarray,
    strength: float = 0.00025,
    filter_length: int = 1024,
    n_overlap: int = 4,
    win_length: int = 1024,
) -> jnp.ndarray:
    """Subtract the vocoder bias in the magnitude domain.

    Args:
        audio: (T,) or (B, T) waveform.
        bias_spec: (n_freq, 1) from :func:`compute_bias_spec`.

    Returns:
        Denoised waveform, same leading shape as input.
    """
    hop_length = filter_length // n_overlap
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    mag, phase = stft_magnitude_phase(audio, filter_length, hop_length, win_length)
    mag = jnp.clip(mag - bias_spec[None] * strength, min=0.0)
    out = istft(mag, phase, filter_length, hop_length, win_length)
    return out[0] if squeeze else out
