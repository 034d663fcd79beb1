"""Centered STFT / inverse STFT in JAX (for the vocoder-bias denoiser).

Matches torch.stft/torch.istft defaults used by the reference denoiser
(matcha/hifigan/denoiser.py:25-50): center=True with reflect padding,
periodic Hann window, onesided, no normalization.
"""

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tpu.audio.mel import _frame_indices, hann_window_periodic


def _frame_slices(audio: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Sliding frames via pure reshape+slice (requires hop | n_fft).

    Gather-free: TPU gathers over big index tables are slow; when the
    overlap factor R = n_fft/hop is an integer, frame f is the
    concatenation of R consecutive hop-size blocks starting at block f.
    Returns (..., n_frames, n_fft).
    """
    R = n_fft // hop_length
    L = audio.shape[-1]
    n_frames = 1 + (L - n_fft) // hop_length
    used = hop_length * (n_frames - 1 + R)
    blocks = audio[..., :used].reshape(*audio.shape[:-1], n_frames - 1 + R, hop_length)
    return jnp.concatenate([blocks[..., c : c + n_frames, :] for c in range(R)], axis=-1)


def stft_magnitude_phase(
    audio: jnp.ndarray, n_fft: int = 1024, hop_length: int = 256, win_length: int = 1024
):
    """Centered STFT -> (magnitude, phase), each (..., n_freq, n_frames)."""
    pad = n_fft // 2
    pad_widths = [(0, 0)] * (audio.ndim - 1) + [(pad, pad)]
    audio = jnp.pad(audio, pad_widths, mode="reflect")

    if n_fft % hop_length == 0:
        frames = _frame_slices(audio, n_fft, hop_length)
    else:
        idx = _frame_indices(audio.shape[-1], n_fft, hop_length)
        frames = audio[..., idx]
    window = jnp.asarray(hann_window_periodic(win_length))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2)
    phase = jnp.arctan2(jnp.imag(spec), jnp.real(spec))
    # (..., n_frames, n_freq) -> (..., n_freq, n_frames)
    return jnp.swapaxes(mag, -1, -2), jnp.swapaxes(phase, -1, -2)


def istft(
    magnitude: jnp.ndarray,
    phase: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    length: int = None,
):
    """Inverse STFT with window-square overlap-add normalization.

    Args:
        magnitude/phase: (n_freq, n_frames) or (B, n_freq, n_frames).

    Returns:
        waveform (..., n_samples) with the center padding removed, matching
        torch.istft(center=True).
    """
    squeeze = magnitude.ndim == 2
    if squeeze:
        magnitude, phase = magnitude[None], phase[None]

    # Build the complex spectrum from real ops only: complex ELEMENTWISE
    # arithmetic (mag * exp(1j*phase)) is UNIMPLEMENTED on some TPU
    # runtimes, while the FFT ops themselves are fine.
    spec = jax.lax.complex(magnitude * jnp.cos(phase), magnitude * jnp.sin(phase))
    spec = jnp.swapaxes(spec, -1, -2)  # (B, n_frames, n_freq)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # (B, n_frames, n_fft)

    window = jnp.asarray(hann_window_periodic(win_length))
    frames = frames * window

    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)

    if n_fft % hop_length == 0:
        # Scatter-free overlap-add: frame f's R hop-size chunks land in
        # output blocks f..f+R-1 — R shifted pads summed (TPU scatter-add
        # over a 500k index table is the slow path this replaces).
        R = n_fft // hop_length
        B = frames.shape[0]
        chunks = frames.reshape(B, n_frames, R, hop_length)
        signal = None
        for c in range(R):
            piece = jnp.pad(chunks[:, :, c, :], ((0, 0), (c, R - 1 - c), (0, 0)))
            signal = piece if signal is None else signal + piece
        signal = signal.reshape(B, out_len)
    else:
        idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
        flat_idx = idx.reshape(-1)

        def ola(fr):
            out = jnp.zeros((out_len,), dtype=fr.dtype)
            return out.at[flat_idx].add(fr.reshape(-1))

        signal = jax.vmap(ola)(frames)

    # window-square normalizer is input-independent -> a host-side constant
    wsq_np = np.zeros((out_len,), np.float64)
    w2 = np.asarray(hann_window_periodic(win_length), np.float64) ** 2
    for f in range(n_frames):
        wsq_np[f * hop_length : f * hop_length + n_fft] += w2
    wsq = jnp.asarray(wsq_np, dtype=window.dtype)
    signal = signal / jnp.maximum(wsq, 1e-11)

    pad = n_fft // 2
    signal = signal[:, pad : out_len - pad]
    if length is not None:
        signal = signal[:, :length]
    return signal[0] if squeeze else signal
